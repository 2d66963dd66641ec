"""High-level map converters (reference: helpers_highlevel/DistanceMapConverter).

Distance map -> other representations, plus general map-to-map transfers
(the GpuVoxelsMap::merge cross-type paths).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import BitVoxelMeaning
from .maps.distance_map import DistanceVoxelMap
from .maps.voxelmap import BitVectorVoxelMap, ProbVoxelMap


def distance_map_to_prob_map(dm: DistanceVoxelMap, clearance: float = 0.0) -> ProbVoxelMap:
    """Voxels within `clearance` of an obstacle become occupied."""
    d2 = dm.squared_distances().reshape(-1)
    thresh = int(np.ceil((clearance / dm.side_length) ** 2))
    occ = jnp.where(d2 <= thresh, jnp.int8(127), jnp.int8(-127))
    return ProbVoxelMap(occ, dm.dims, dm.side_length)


def distance_map_to_bit_map(dm: DistanceVoxelMap, clearance: float = 0.0,
                            meaning=BitVoxelMeaning.eBVM_OCCUPIED) -> BitVectorVoxelMap:
    from . import bitops

    d2 = dm.squared_distances().reshape(-1)
    thresh = int(np.ceil((clearance / dm.side_length) ** 2))
    mask = d2 <= thresh
    planes = bitops.zeros((dm.voxelmap_size,))
    p = bitops.bit_plane(int(meaning))
    word = bitops.UINT32(bitops.bit_word(int(meaning)))
    planes = planes.at[p].set(jnp.where(mask, word, bitops.UINT32(0)))
    occ = (mask & (int(meaning) != 0)).astype(jnp.uint8)
    return BitVectorVoxelMap(planes, dm.dims, dm.side_length, occ=occ)


def prob_map_to_bit_map(pm: ProbVoxelMap, threshold: float = 0.5,
                        meaning=BitVoxelMeaning.eBVM_OCCUPIED) -> BitVectorVoxelMap:
    from . import bitops
    from .constants import float_to_probability

    mask = pm.data.astype(jnp.int32) >= float_to_probability(threshold)
    planes = bitops.zeros((pm.voxelmap_size,))
    p = bitops.bit_plane(int(meaning))
    word = bitops.UINT32(bitops.bit_word(int(meaning)))
    planes = planes.at[p].set(jnp.where(mask, word, bitops.UINT32(0)))
    occ = (mask & (int(meaning) != 0)).astype(jnp.uint8)
    return BitVectorVoxelMap(planes, pm.dims, pm.side_length, occ=occ)


def bit_map_to_prob_map(bm: BitVectorVoxelMap) -> ProbVoxelMap:
    from . import bitops

    occ = jnp.where(bm.occupied_mask(), jnp.int8(127), jnp.int8(-128))
    return ProbVoxelMap(occ, bm.dims, bm.side_length)
