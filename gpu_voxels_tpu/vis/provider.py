"""VisProvider: per-map visualization publisher (vis_interface equivalent).

The CUDA reference publishes device pointers over CUDA IPC + boost shm to a
separate viewer process (VisProvider.h:49-73). The TPU equivalent is an
async host-readback publisher: visualize() snapshots the map into a
directory (PLY + HTML) only when the content changed, so a file-watching
viewer (or a browser on the HTML) plays the reference viewer's role.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

from . import export


class VisProvider:
    def __init__(self, name: str, out_dir: Optional[str] = None):
        self.name = name
        self.out_dir = Path(out_dir or os.environ.get("GPU_VOXELS_VIS_DIR", "/tmp/gpu_voxels_tpu_vis"))
        self._last_fingerprint = None

    # viewer budget: multi-level extraction truncates (coarsest-first) past
    # this many cubes — a 32768^3 paged world stays interactive
    MAX_CUBES = 1_000_000

    def visualize(self, m, force_repaint: bool = True, threshold: float = 0.5) -> bool:
        """Publish the map snapshot; skips unchanged content unless forced.

        Hierarchical / paged maps publish MULTI-LEVEL cubes (one per uniform
        octree node, the reference's VisNTree extractCubes path,
        NTree.hpp:2637) so octree-scale worlds render with O(allocated)
        cubes; distance maps additionally publish a distance-gradient slice
        layer (the reference viewer's DistanceVoxel coloring)."""
        import numpy as np

        if hasattr(m, "ids"):  # voxel lists: content = ids + payload + count
            parts = (m.ids, m.ids_hi, m.payload, m.count)
            fp = hash(b"".join(np.asarray(p).tobytes() for p in parts))
        else:
            for attr in ("data", "occupancy", "pool"):
                if hasattr(m, attr):
                    ground_truth = getattr(m, attr)
                    break
            else:  # deterministic hierarchical tier: level-0 statuses
                ground_truth = m.pyramid[0]
            fp = hash(np.asarray(ground_truth).tobytes())
        if not force_repaint and fp == self._last_fingerprint:
            return False
        self._last_fingerprint = fp
        self.out_dir.mkdir(parents=True, exist_ok=True)
        # extract once, feed all three writers (the octree tiers make each
        # extraction a full host readback)
        from ..maps.hierarchical import _PyramidQueries
        from ..maps.paged import PagedHierarchicalMap
        from .extract import extract_cubes, extract_multilevel_cubes
        from .serve import publish_cubes

        if isinstance(m, (PagedHierarchicalMap, _PyramidQueries)):
            corners, sizes, types = extract_multilevel_cubes(
                m, max_cubes=self.MAX_CUBES
            )
            side = float(m.side_length)
            centers = (corners.astype(np.float64) + sizes[:, None] / 2.0) * side
            cubes = (centers, types, sizes.astype(np.float64) * side)
        else:
            cubes = extract_cubes(m, threshold)
        export.write_ply(self.out_dir / f"{self.name}.ply", m, threshold, cubes=cubes)
        export.write_html(
            self.out_dir / f"{self.name}.html", {self.name: m}, threshold,
            cubes={self.name: cubes},
        )
        # feed the live viewer process (vis/serve.py) as well
        publish_cubes(self.out_dir, self.name, m, threshold, cubes=cubes)
        from ..maps.distance_map import DistanceVoxelMap

        if isinstance(m, DistanceVoxelMap):
            from .serve import publish_distance_layer

            publish_distance_layer(self.out_dir, f"{self.name}.distance", m)
        return True
