"""Primitive arrays for visualization overlays.

Equivalent of primitive_array/PrimitiveArray.{h,cu}: a device array of
spheres or cuboids, each a Vector4 (position + diameter), purely for the
visualization layer.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np


class PrimitiveType(enum.IntEnum):
    ePRIM_SPHERE = 0
    ePRIM_CUBOID = 1


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PrimitiveArray:
    """positions_diameters: float32[N, 4] (x, y, z, diameter)."""

    positions_diameters: jnp.ndarray
    prim_type: PrimitiveType = field(metadata=dict(static=True))

    @staticmethod
    def create(prim_type: PrimitiveType) -> "PrimitiveArray":
        return PrimitiveArray(jnp.zeros((0, 4), jnp.float32), PrimitiveType(prim_type))

    @property
    def size(self) -> int:
        return self.positions_diameters.shape[0]

    def set_points(self, positions, diameter=None) -> "PrimitiveArray":
        """modifyPrimitives overloads: [N,4] directly, or [N,3] + diameter."""
        arr = np.asarray(positions, np.float32)
        if arr.ndim != 2:
            arr = arr.reshape(-1, arr.shape[-1])
        if arr.shape[1] == 3:
            if diameter is None:
                raise ValueError("diameter required for [N,3] positions")
            arr = np.concatenate([arr, np.full((len(arr), 1), diameter, np.float32)], axis=1)
        return replace(self, positions_diameters=jnp.asarray(arr))
