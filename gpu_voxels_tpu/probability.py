"""int8 log-odds occupancy arithmetic (reference: voxel/ProbabilisticVoxel.hpp)."""
from __future__ import annotations

import jax.numpy as jnp

from .constants import MAX_PROBABILITY, MIN_PROBABILITY, UNKNOWN_PROBABILITY


def update_occupancy(occupancy: jnp.ndarray, delta) -> jnp.ndarray:
    """Saturating log-odds update (ProbabilisticVoxel.hpp:51-57).

    int32 add, clamped to [MIN_PROBABILITY, MAX_PROBABILITY]. Note the clamp
    floor is -127, so a single update moves a voxel out of UNKNOWN (-128).
    """
    s = occupancy.astype(jnp.int32) + jnp.asarray(delta, dtype=jnp.int32)
    return jnp.clip(s, MIN_PROBABILITY, MAX_PROBABILITY).astype(jnp.int8)


def is_occupied(occupancy: jnp.ndarray, threshold) -> jnp.ndarray:
    """ProbabilisticVoxel::isOccupied: occupancy >= threshold.

    The reference compares int8 against a float threshold; comparing in int32
    against an int8 threshold from float_to_probability is equivalent for the
    integer thresholds used throughout.
    """
    return occupancy.astype(jnp.int32) >= jnp.asarray(threshold, dtype=jnp.int32)


def is_unknown(occupancy: jnp.ndarray) -> jnp.ndarray:
    return occupancy == jnp.int8(UNKNOWN_PROBABILITY)
