"""Multi-chip EDT: jump flooding on a z-sharded grid with halo exchange.

The grid lives as contiguous z-slabs, one per chip (see parallel/sharded).
The multiresolution structure maps naturally to the mesh:

  * the coarse grid is tiny (1/c^3): all_gather it and run the long-range
    JFA rounds replicated on every chip (cheaper than communicating rounds);
  * fine short-range rounds (step s <= slab thickness) only need an s-thick
    halo from the two z-neighbors per round — one ppermute pair each way;
  * the step-1 fixpoint repair iterates with a psum'd convergence flag.

This is the halo-exchange pattern SURVEY.md §7.11 prescribes for EDT sweeps.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import MAX_OBSTACLE_DISTANCE, PBA_UNINITIALISED_COORD, PBA_UNINITIALISED_PACKED
from ..ops import edt

Dims = Tuple[int, int, int]
I32 = jnp.int32
UNINIT = jnp.uint32(PBA_UNINITIALISED_PACKED)


def _halo_exchange_z(local: jnp.ndarray, s: int, axis: str) -> jnp.ndarray:
    """[zl, Y, X] -> [zl + 2s, Y, X] with s-thick z-halos from neighbors."""
    n = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    up = jax.lax.ppermute(local[-s:], axis, [(k, k + 1) for k in range(n - 1)])
    down = jax.lax.ppermute(local[:s], axis, [(k + 1, k) for k in range(n - 1)])
    # edge shards receive zeros from ppermute; zeros decode as a valid site
    # at the origin, so replace them with UNINIT
    up = jnp.where(i == 0, UNINIT, up)
    down = jnp.where(i == n - 1, UNINIT, down)
    return jnp.concatenate([up, local, down], axis=0)


def _local_d2(grid: jnp.ndarray, z0, dims: Dims) -> jnp.ndarray:
    """Squared distances for a slab whose global z starts at z0 (traced)."""
    dz_l, dy, dx = grid.shape
    ox, oy, oz = edt.unpack(grid)
    px = jax.lax.broadcasted_iota(I32, grid.shape, 2)
    py = jax.lax.broadcasted_iota(I32, grid.shape, 1)
    pz = jax.lax.broadcasted_iota(I32, grid.shape, 0) + z0
    un = (
        (ox == PBA_UNINITIALISED_COORD)
        | (oy == PBA_UNINITIALISED_COORD)
        | (oz == PBA_UNINITIALISED_COORD)
    )
    d = (
        (px - ox.astype(I32)) ** 2
        + (py - oy.astype(I32)) ** 2
        + (pz - oz.astype(I32)) ** 2
    )
    return jnp.where(un, I32(MAX_OBSTACLE_DISTANCE), d)


def _sharded_round(local, best_d2, s: int, z0, axis: str):
    """One 26-neighbor JFA round on a z-slab with halo exchange."""
    dz_l, dy, dx = local.shape
    haloed = _halo_exchange_z(local, s, axis)
    p = jnp.pad(haloed, ((0, 0), (s, s), (s, s)), constant_values=int(PBA_UNINITIALISED_PACKED))
    px = jax.lax.broadcasted_iota(I32, local.shape, 2)
    py = jax.lax.broadcasted_iota(I32, local.shape, 1)
    pz = jax.lax.broadcasted_iota(I32, local.shape, 0) + z0
    for off in edt._NEIGHBORS:
        ox_, oy_, oz_ = off
        cand = jax.lax.slice(
            p,
            (s + oz_ * s, s + oy_ * s, s + ox_ * s),
            (s + oz_ * s + dz_l, s + oy_ * s + dy, s + ox_ * s + dx),
        )
        cx, cy, cz = edt.unpack(cand)
        un = (
            (cx == PBA_UNINITIALISED_COORD)
            | (cy == PBA_UNINITIALISED_COORD)
            | (cz == PBA_UNINITIALISED_COORD)
        )
        d2 = (
            (px - cx.astype(I32)) ** 2
            + (py - cy.astype(I32)) ** 2
            + (pz - cz.astype(I32)) ** 2
        )
        d2 = jnp.where(un, I32(MAX_OBSTACLE_DISTANCE), d2)
        take = d2 < best_d2
        local = jnp.where(take, cand, local)
        best_d2 = jnp.where(take, d2, best_d2)
    return local, best_d2


def build_sharded_edt(
    mesh: Mesh,
    dims: Dims,
    coarse_factor: int = 4,
    fine_steps=(8, 4, 2, 1, 1),
):
    """Jitted fn(packed_flat uint32[N]) -> packed_flat, computed across the
    mesh's 'z' axis with slab sharding. Matches edt.jump_flood_multires."""
    dx, dy, dz = dims
    nz = mesh.shape["z"]
    if dz % nz:
        raise ValueError("dimz must divide the z mesh")
    zl = dz // nz
    c = coarse_factor
    if zl % c or dy % c or dx % c:
        raise ValueError("dims must divide the coarse factor per slab")
    if max(fine_steps) > zl:
        raise ValueError("fine steps must not exceed the slab thickness")

    def _shard_fn(local_flat):
        local = local_flat.reshape(zl, dy, dx)
        zi = jax.lax.axis_index("z")
        z0 = zi * zl

        # --- local coarsen (same representative rule as jump_flood_multires;
        # strided pairwise merges avoid 6D-reshape layout blowups)
        cxg, cyg, czg = edt.unpack(local)
        lx = jax.lax.broadcasted_iota(I32, local.shape, 2)
        ly = jax.lax.broadcasted_iota(I32, local.shape, 1)
        lz = jax.lax.broadcasted_iota(I32, local.shape, 0) + z0
        bx = (lx // c) * (2 * c) + (c - 1)
        by = (ly // c) * (2 * c) + (c - 1)
        bz = (lz // c) * (2 * c) + (c - 1)
        un = (
            (cxg == PBA_UNINITIALISED_COORD)
            | (cyg == PBA_UNINITIALISED_COORD)
            | (czg == PBA_UNINITIALISED_COORD)
        )
        dd = (
            (2 * cxg.astype(I32) - bx) ** 2
            + (2 * cyg.astype(I32) - by) ** 2
            + (2 * czg.astype(I32) - bz) ** 2
        )
        dd = jnp.where(un, I32(MAX_OBSTACLE_DISTANCE), dd)
        coarse_local, dd_c = local, dd
        halvings = 0
        cc = c
        while cc > 1:
            cc //= 2
            halvings += 1
        for axis in (2, 1, 0):
            for _ in range(halvings):
                sl0 = [slice(None)] * 3
                sl1 = [slice(None)] * 3
                sl0[axis] = slice(0, None, 2)
                sl1[axis] = slice(1, None, 2)
                s0, s1 = coarse_local[tuple(sl0)], coarse_local[tuple(sl1)]
                d0, d1 = dd_c[tuple(sl0)], dd_c[tuple(sl1)]
                take = d1 < d0
                coarse_local = jnp.where(take, s1, s0)
                dd_c = jnp.where(take, d1, d0)

        # --- gather the full coarse grid and flood it (replicated) ----------
        coarse_full = jax.lax.all_gather(coarse_local, "z", axis=0, tiled=True)
        cdims = (dx // c, dy // c, dz // c)

        def coarse_d2(cand):
            sx, sy, sz = edt.unpack(cand)
            u2 = (
                (sx == PBA_UNINITIALISED_COORD)
                | (sy == PBA_UNINITIALISED_COORD)
                | (sz == PBA_UNINITIALISED_COORD)
            )
            qx = jax.lax.broadcasted_iota(I32, cand.shape, 2) * (2 * c) + (c - 1)
            qy = jax.lax.broadcasted_iota(I32, cand.shape, 1) * (2 * c) + (c - 1)
            qz = jax.lax.broadcasted_iota(I32, cand.shape, 0) * (2 * c) + (c - 1)
            v = (
                (2 * sx.astype(I32) - qx) ** 2
                + (2 * sy.astype(I32) - qy) ** 2
                + (2 * sz.astype(I32) - qz) ** 2
            )
            return jnp.where(u2, I32(MAX_OBSTACLE_DISTANCE), v)

        cg = coarse_full
        cbest = coarse_d2(cg)
        step = 1
        while step * 2 < max(cdims):
            step *= 2
        s = step
        while s >= 1:
            czs, cys, cxs = cg.shape
            pc = jnp.pad(cg, s, constant_values=int(PBA_UNINITIALISED_PACKED))
            for off in edt._NEIGHBORS:
                ox_, oy_, oz_ = off
                cand = jax.lax.slice(
                    pc,
                    (s + oz_ * s, s + oy_ * s, s + ox_ * s),
                    (s + oz_ * s + czs, s + oy_ * s + cys, s + ox_ * s + cxs),
                )
                nd = coarse_d2(cand)
                take = nd < cbest
                cg = jnp.where(take, cand, cg)
                cbest = jnp.where(take, nd, cbest)
            s //= 2

        # --- upsample my slab's portion --------------------------------------
        my_coarse = jax.lax.dynamic_slice_in_dim(cg, zi * (zl // c), zl // c, axis=0)
        up = jnp.repeat(jnp.repeat(jnp.repeat(my_coarse, c, 0), c, 1), c, 2)
        d2 = _local_d2(local, z0, dims)
        up_d2 = _local_d2(up, z0, dims)
        take = up_d2 < d2
        local = jnp.where(take, up, local)
        d2 = jnp.where(take, up_d2, d2)

        # --- fine rounds with halo exchange -----------------------------------
        for s in fine_steps:
            local, d2 = _sharded_round(local, d2, s, z0, "z")

        # --- fixpoint repair with a global convergence flag -------------------
        def cond(state):
            _, _, changed = state
            return changed

        def body(state):
            g, d, _ = state
            g2, d2b = _sharded_round(g, d, 1, z0, "z")
            changed = jax.lax.psum(jnp.any(d2b != d).astype(jnp.int32), "z") > 0
            return g2, d2b, changed

        local, d2, _ = jax.lax.while_loop(cond, body, (local, d2, jnp.bool_(True)))
        return local.reshape(-1)

    fn = jax.shard_map(_shard_fn, mesh=mesh, in_specs=P("z"), out_specs=P("z"))
    return jax.jit(fn)
