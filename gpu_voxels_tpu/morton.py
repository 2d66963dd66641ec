"""Morton (Z-order) codes, bit-compatible with the reference octree.

Reference: packages/gpu_voxels/src/gpu_voxels/octree/Morton.h:80-160.

The reference uses 60-bit codes (3 x 20-bit coordinates) stored in uint64.
JAX disables 64-bit ints by default, so codes are carried as a pair of uint32
words ``(hi30, lo30)`` exactly matching the reference's
``morton_code60 = (morton_code(hi bits) << 30) | morton_code(lo bits)``
decomposition; most maps only need the 30-bit low word (coords < 1024).
"""
from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every third position (Morton.h:80-100)."""
    x = x.astype(U32)
    x = (x | (x << U32(16))) & U32(0x030000FF)
    x = (x | (x << U32(8))) & U32(0x0300F00F)
    x = (x | (x << U32(4))) & U32(0x030C30C3)
    x = (x | (x << U32(2))) & U32(0x09249249)
    return x


def _compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _part1by2 (Morton.h Compact1By2)."""
    x = x.astype(U32) & U32(0x09249249)
    x = (x ^ (x >> U32(2))) & U32(0x030C30C3)
    x = (x ^ (x >> U32(4))) & U32(0x0300F00F)
    x = (x ^ (x >> U32(8))) & U32(0xFF0000FF)
    x = (x ^ (x >> U32(16))) & U32(0x000003FF)
    return x


def morton_code30(x, y, z) -> jnp.ndarray:
    """30-bit Morton code of coordinates < 1024 (Morton.h morton_code)."""
    return _part1by2(x) | (_part1by2(y) << U32(1)) | (_part1by2(z) << U32(2))


def inv_morton_code30(code):
    code = jnp.asarray(code, dtype=U32)
    return _compact1by2(code), _compact1by2(code >> U32(1)), _compact1by2(code >> U32(2))


def morton_code60(x, y, z):
    """60-bit Morton code as (hi30, lo30) uint32 pair (Morton.h morton_code60)."""
    x = jnp.asarray(x, dtype=U32)
    y = jnp.asarray(y, dtype=U32)
    z = jnp.asarray(z, dtype=U32)
    lo = morton_code30(x & U32(1023), y & U32(1023), z & U32(1023))
    hi = morton_code30(x >> U32(10), y >> U32(10), z >> U32(10))
    return hi, lo


def inv_morton_code60(hi, lo):
    """(hi30, lo30) -> (x, y, z) (Morton.h inv_morton_code60)."""
    xl, yl, zl = inv_morton_code30(lo)
    xh, yh, zh = inv_morton_code30(hi)
    return (
        (xh << U32(10)) | xl,
        (yh << U32(10)) | yl,
        (zh << U32(10)) | zl,
    )
