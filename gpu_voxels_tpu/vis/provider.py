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

    def visualize(self, m, force_repaint: bool = True, threshold: float = 0.5) -> bool:
        """Publish the map snapshot; skips unchanged content unless forced."""
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
        from .extract import extract_cubes

        cubes = extract_cubes(m, threshold)
        export.write_ply(self.out_dir / f"{self.name}.ply", m, threshold, cubes=cubes)
        export.write_html(
            self.out_dir / f"{self.name}.html", {self.name: m}, threshold,
            cubes={self.name: cubes},
        )
        # feed the live viewer process (vis/serve.py) as well
        from .serve import publish_cubes

        publish_cubes(self.out_dir, self.name, m, threshold, cubes=cubes)
        return True
