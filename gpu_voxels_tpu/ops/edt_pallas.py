"""Pallas kernel for short-range JFA rounds (EDT hot loop).

One fused XLA round still reads the grid ~26x from HBM (once per neighbor
slice). This kernel DMAs each tile + halo into VMEM once and performs all 26
merges on-chip, cutting per-round HBM traffic to a few reads + one write.

Mosaic DMA slices must be aligned to the (8, 128) tile: the input is padded
so that the fetched block's y size is a multiple of 8 (pad 8 >= s) and the x
fetch covers the full padded row (x pad 64 each side, keeping the row length
a multiple of 128 when dx is). Neighbor windows are then value slices inside
VMEM. Only steps <= MAX_STEP qualify (halo must fit the alignment pads).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_OBSTACLE_DISTANCE, PBA_UNINITIALISED_COORD, PBA_UNINITIALISED_PACKED

Dims = Tuple[int, int, int]
I32 = jnp.int32
U32 = jnp.uint32

TILE_Y = 64
PAD_Y = 8  # >= MAX_STEP, multiple of 8 (sublane tiling)
PAD_X = 64  # >= MAX_STEP, keeps row length a multiple of 128
MAX_STEP = 8

_YZ_OFFSETS = [(oy, oz) for oy in (-1, 0, 1) for oz in (-1, 0, 1)]


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _round_kernel(s: int, dx: int, TILE_Z: int, offs_ref, pg_ref, pd_ref, og_ref, od_ref, gbuf, dbuf, sem):
    """Grid (Z/TZ, Y/TY); padded inputs in ANY (HBM): z pad s, y pad PAD_Y,
    x pad PAD_X per side."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    hz = TILE_Z + 2 * s
    hy = TILE_Y + 2 * PAD_Y
    wx = dx + 2 * PAD_X

    cp1 = pltpu.make_async_copy(
        pg_ref.at[pl.ds(i * TILE_Z, hz), pl.ds(j * TILE_Y, hy), :],
        gbuf,
        sem.at[0],
    )
    cp2 = pltpu.make_async_copy(
        pd_ref.at[pl.ds(i * TILE_Z, hz), pl.ds(j * TILE_Y, hy), :],
        dbuf,
        sem.at[1],
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    pz = jax.lax.broadcasted_iota(I32, (TILE_Z, TILE_Y, dx), 0) + i * TILE_Z
    py = jax.lax.broadcasted_iota(I32, (TILE_Z, TILE_Y, dx), 1) + j * TILE_Y
    px = jax.lax.broadcasted_iota(I32, (TILE_Z, TILE_Y, dx), 2)

    best_g = gbuf[s : s + TILE_Z, PAD_Y : PAD_Y + TILE_Y, PAD_X : PAD_X + dx]
    best_d = dbuf[s : s + TILE_Z, PAD_Y : PAD_Y + TILE_Y, PAD_X : PAD_X + dx]

    # lane-dim (x) slice offsets must be static, so the x offset is a python
    # unroll (3 values) while the 9 (y, z) combos run in a fori_loop — a full
    # 27-way unroll overflows the Mosaic value stack (~47 MB of live tiles)
    def make_body(ox: int):
        def body(t, carry):
            bg, bd = carry
            oy = offs_ref[t, 0]
            oz = offs_ref[t, 1]
            cand = gbuf[
                pl.ds(s + oz * s, TILE_Z),
                pl.ds(PAD_Y + oy * s, TILE_Y),
                PAD_X + ox * s : PAD_X + ox * s + dx,
            ]
            cx = (cand & U32(0x3FF)).astype(I32)
            cy = ((cand >> U32(10)) & U32(0x3FF)).astype(I32)
            cz = (cand >> U32(20)).astype(I32)
            un = (cx == PBA_UNINITIALISED_COORD) | (cy == PBA_UNINITIALISED_COORD) | (cz == PBA_UNINITIALISED_COORD)
            d2 = (px - cx) ** 2 + (py - cy) ** 2 + (pz - cz) ** 2
            d2 = jnp.where(un, I32(MAX_OBSTACLE_DISTANCE), d2)
            take = d2 < bd
            return jnp.where(take, cand, bg), jnp.where(take, d2, bd)

        return body

    for ox in (-1, 0, 1):
        # the (0,0,0) entry merges the center against itself: harmless (never
        # strictly closer), so all 9 (y,z) combos run for every ox
        best_g, best_d = jax.lax.fori_loop(
            0, 9, make_body(ox), (best_g, best_d)
        )
    og_ref[:] = best_g
    od_ref[:] = best_d


def jfa_round_pallas(grid: jnp.ndarray, best_d2: jnp.ndarray, s: int, dims: Dims):
    """One 26-neighbor JFA round via the halo kernel. Returns None when the
    shape/step is unsupported (caller falls back to the XLA round)."""
    dz, dy, dx = grid.shape
    # VMEM budget (scratch + double-buffered outputs + loop carries <= 16MB)
    TILE_Z = 8
    if s > MAX_STEP or dz % TILE_Z or dy % TILE_Y or dx % 128 or dx > 1024:
        return None
    pad = ((s, s), (PAD_Y, PAD_Y), (PAD_X, PAD_X))
    pg = jnp.pad(grid, pad, constant_values=int(PBA_UNINITIALISED_PACKED))
    pd = jnp.pad(best_d2, pad, constant_values=int(MAX_OBSTACLE_DISTANCE))
    out_g, out_d = pl.pallas_call(
        functools.partial(_round_kernel, s, dx, TILE_Z),
        grid=(dz // TILE_Z, dy // TILE_Y),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((TILE_Z, TILE_Y, dx), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Z, TILE_Y, dx), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((dz, dy, dx), jnp.uint32),
            jax.ShapeDtypeStruct((dz, dy, dx), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_Z + 2 * s, TILE_Y + 2 * PAD_Y, dx + 2 * PAD_X), jnp.uint32),
            pltpu.VMEM((TILE_Z + 2 * s, TILE_Y + 2 * PAD_Y, dx + 2 * PAD_X), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(jnp.asarray(_YZ_OFFSETS, I32), pg, pd)
    return out_g, out_d
