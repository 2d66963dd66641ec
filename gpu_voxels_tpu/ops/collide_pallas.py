"""Pallas TPU kernels for the hot collision-count sweeps.

The reference's metric kernel is kernelCollideVoxelMapsDebug
(voxelmap/kernels/VoxelMapOperations.hpp:129-184): a grid-stride sweep with a
shared-memory block reduction, 65535 uint16 partials copied to the host and
summed there. Here the whole sweep is one Pallas kernel: tiles stream
HBM->VMEM, the VPU does the compare/AND, and a scalar accumulator in SMEM
carries the count across sequential grid steps — no partials, no host sum.

Layout notes:
  * prob maps: int8[N] viewed as [rows, 128] with rows a multiple of 32
    (int8 min tile is (32, 128)).
  * bit maps: uint32[8, N] viewed as [8, rows, 128]; plane axis unrolls into
    8 registers per lane-tile.
Tail handling: N is padded with values that can never collide
(UNKNOWN_PROBABILITY / zero bit vectors), so no masking is needed in-kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import UNKNOWN_PROBABILITY

LANES = 128
SUBLANES = 32  # int8 sublane quantum
# rows per grid step; 8 * 512 * 128 = 512K voxels/step -> ~1MB VMEM for 2 maps
TILE_ROWS = 4096


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU test mesh)."""
    return jax.devices()[0].platform != "tpu"


def _pad_rows(n: int) -> int:
    per_tile = TILE_ROWS * LANES
    return -(-n // per_tile) * per_tile // LANES


def _as_tiles(flat: jnp.ndarray, rows: int, fill) -> jnp.ndarray:
    n = flat.shape[-1]
    pad = rows * LANES - n
    padded = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, pad)], constant_values=fill)
    return padded.reshape(flat.shape[:-1] + (rows, LANES))


def _count_prob_kernel(t_ref, a_ref, b_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[0] = jnp.int32(0)

    t1 = t_ref[0]
    t2 = t_ref[1]
    hit = (a_ref[:].astype(jnp.int32) >= t1) & (b_ref[:].astype(jnp.int32) >= t2)
    acc_ref[0] += jnp.sum(hit.astype(jnp.int32))

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = acc_ref[0]


@functools.partial(jax.jit, static_argnames=())
def count_prob_prob(a: jnp.ndarray, b: jnp.ndarray, t1, t2) -> jnp.ndarray:
    """Count collider.collide(a[i], b[i]) over flat int8 occupancy arrays."""
    n = a.shape[-1]
    rows = _pad_rows(n)
    a2 = _as_tiles(a, rows, UNKNOWN_PROBABILITY)
    b2 = _as_tiles(b, rows, UNKNOWN_PROBABILITY)
    thresholds = jnp.stack([jnp.asarray(t1, jnp.int32), jnp.asarray(t2, jnp.int32)])
    grid = rows // TILE_ROWS
    out = pl.pallas_call(
        _count_prob_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interpret(),
    )(thresholds, a2, b2)
    return out[0].astype(jnp.uint32)


def _count_bit_kernel(a_ref, b_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[0] = jnp.int32(0)

    # occupied = !noneButEmpty: any bit except bit 0 of plane 0
    a_occ = (a_ref[0] & jnp.uint32(0xFFFFFFFE)) != 0
    b_occ = (b_ref[0] & jnp.uint32(0xFFFFFFFE)) != 0
    for p in range(1, a_ref.shape[0]):
        a_occ |= a_ref[p] != 0
        b_occ |= b_ref[p] != 0
    acc_ref[0] += jnp.sum((a_occ & b_occ).astype(jnp.int32))

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = acc_ref[0]


BIT_TILE_ROWS = 512  # 8 planes * 512 * 128 * 4B = 2MB/map per step


@jax.jit
def count_bit_bit(a_planes: jnp.ndarray, b_planes: jnp.ndarray) -> jnp.ndarray:
    """Count voxels where both 256-bit vectors are !noneButEmpty."""
    n = a_planes.shape[-1]
    per_tile = BIT_TILE_ROWS * LANES
    rows = -(-n // per_tile) * per_tile // LANES
    a2 = _as_tiles(a_planes, rows, 0)
    b2 = _as_tiles(b_planes, rows, 0)
    grid = rows // BIT_TILE_ROWS
    nplanes = a_planes.shape[0]
    out = pl.pallas_call(
        _count_bit_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((nplanes, BIT_TILE_ROWS, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nplanes, BIT_TILE_ROWS, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interpret(),
    )(a2, b2)
    return out[0].astype(jnp.uint32)


def _count_mark_prob_kernel(t_ref, a_ref, b_ref, out_ref, marked_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[0] = jnp.int32(0)

    t1 = t_ref[0]
    t2 = t_ref[1]
    a = a_ref[:]
    hit = (a.astype(jnp.int32) >= t1) & (b_ref[:].astype(jnp.int32) >= t2)
    acc_ref[0] += jnp.sum(hit.astype(jnp.int32))
    marked_ref[:] = jnp.where(hit, jnp.int8(127), a)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = acc_ref[0]


@jax.jit
def count_and_mark_prob(a: jnp.ndarray, b: jnp.ndarray, t1, t2):
    """kernelCollideVoxelMapsDebug: count + insert eBVM_COLLISION into `a`.

    Returns (count, marked_a). One pass over both maps, two outputs.
    """
    n = a.shape[-1]
    rows = _pad_rows(n)
    a2 = _as_tiles(a, rows, UNKNOWN_PROBABILITY)
    b2 = _as_tiles(b, rows, UNKNOWN_PROBABILITY)
    thresholds = jnp.stack([jnp.asarray(t1, jnp.int32), jnp.asarray(t2, jnp.int32)])
    grid = rows // TILE_ROWS
    count, marked = pl.pallas_call(
        _count_mark_prob_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int8),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interpret(),
    )(thresholds, a2, b2)
    return count[0].astype(jnp.uint32), marked.reshape(-1)[:n]
