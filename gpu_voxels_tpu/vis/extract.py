"""Cube extraction: device maps -> renderable cube sets.

Equivalent of the extractCubes paths (TemplateVoxelList.hpp:704,
NTree.hpp:2637) feeding the visualizer. The CUDA reference shares device
memory with a viewer process over CUDA IPC; on TPU the visualizer is an
async host readback consumer: extract the occupied voxel coordinates (+ a
type id per cube) and hand them to an exporter (vis.export) or any viewer.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def occupied_coords(m, threshold: float = 0.5, max_cubes: Optional[int] = None) -> np.ndarray:
    """int32[K, 3] coordinates of occupied voxels (host readback).

    Works for ProbVoxelMap (occupancy >= threshold), BitVectorVoxelMap
    (!noneButEmpty), CountingVoxelMap (count >= 1), DistanceVoxelMap
    (distance == 0), and voxel lists.
    """
    from ..maps.distance_map import DistanceVoxelMap
    from ..maps.voxellist import VoxelList
    from ..maps.voxelmap import BitVectorVoxelMap, CountingVoxelMap, ProbVoxelMap

    if isinstance(m, VoxelList):
        n = int(m.count)
        return np.asarray(m.coords_from_ids(m.ids[:n], m.ids_hi[:n]))
    from ..maps.hierarchical import HierarchicalProbMap

    if isinstance(m, HierarchicalProbMap):
        # honor the caller's threshold against the ground-truth occupancy
        # grid (the status pyramid bakes the octree's fixed
        # THRESHOLD_OCCUPANCY, which is the probe contract, not the
        # visualization contract)
        from ..constants import UNKNOWN_PROBABILITY, float_to_probability

        occ = np.asarray(m.occupancy)
        t = float_to_probability(threshold)
        mask3 = (occ.astype(np.int32) >= t) & (occ != UNKNOWN_PROBABILITY)
        z, y, x = np.nonzero(mask3)
        keep = (x < m.dims[0]) & (y < m.dims[1]) & (z < m.dims[2])
        coords = np.stack([x[keep], y[keep], z[keep]], axis=1).astype(np.int32)
        return coords[:max_cubes] if max_cubes is not None else coords
    if hasattr(m, "extract_occupied_coords"):  # deterministic + paged tiers
        coords = np.asarray(m.extract_occupied_coords())
        return coords[:max_cubes] if max_cubes is not None else coords
    if isinstance(m, ProbVoxelMap):
        mask = np.asarray(m.occupied_mask(threshold))
    elif isinstance(m, BitVectorVoxelMap):
        mask = np.asarray(m.occupied_mask())
    elif isinstance(m, CountingVoxelMap):
        mask = np.asarray(m.occupied_mask(1))
    elif isinstance(m, DistanceVoxelMap):
        mask = np.asarray(m.obstacle_mask())
    else:
        raise TypeError(type(m))
    dx, dy, _ = m.dims
    idx = np.nonzero(mask)[0]
    if max_cubes is not None:
        idx = idx[:max_cubes]
    z = idx // (dx * dy)
    rem = idx - z * dx * dy
    y = rem // dx
    x = rem - y * dx
    return np.stack([x, y, z], axis=1).astype(np.int32)


def extract_cubes(m, threshold: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """(centers float32[K,3] in metric space, types uint8[K]).

    Types: for bit maps the lowest set meaning bit per voxel; for prob maps
    eBVM_OCCUPIED; mirrors what the reference visualizer colors by.
    """
    from ..maps.voxelmap import BitVectorVoxelMap

    coords = occupied_coords(m, threshold)
    centers = (coords.astype(np.float32) + 0.5) * m.side_length
    if isinstance(m, BitVectorVoxelMap):
        dx, dy, _ = m.dims
        lin = coords[:, 2] * dx * dy + coords[:, 1] * dx + coords[:, 0]
        planes = np.asarray(m.data)[:, lin]  # [8, K]
        types = np.zeros(len(lin), np.uint8)
        found = np.zeros(len(lin), bool)
        for p in range(planes.shape[0]):
            w = planes[p]
            for b in range(32):
                bitset = ((w >> b) & 1).astype(bool) & ~found
                if p == 0 and b == 0:
                    continue  # skip eBVM_FREE
                types[bitset] = p * 32 + b
                found |= bitset
        return centers, types
    return centers, np.full(len(centers), 1, np.uint8)  # eBVM_OCCUPIED
