"""Euclidean distance transforms on dense voxel grids.

Equivalents of voxelmap/DistanceVoxelMap.{h,hpp} + kernels/VoxelMapOperations*.
The reference offers three algorithms (exact brute force, jump flood, PBA);
tests cross-check them (testing_distance.cu:79-119). Here:

  * exact_distances: brute force vs an explicit obstacle list — the oracle
    (kernelExactDistances3D, VoxelMapOperations.h:454-456).
  * jump_flood: 3D JFA over the packed-coordinate grid, log2(maxdim) rounds
    of 26-neighbor min-merges (kernelJumpFlood3D, VoxelMapOperations.h:448),
    each round a fused elementwise pass. `extra_rounds` adds 1+JFA passes
    (step-1 refinements) which remove JFA's rare inexact cells.
  * manhattan_distance: exact separable L1 transform (init_floodfill
    analogue) via 6 directional scans.

Grids hold DistanceVoxel-packed uint32 values: x | y<<10 | z<<20, with
uninitialised = 1023 per field (DistanceVoxel.hpp:31-101); distances to
uninitialised voxels are MAX_OBSTACLE_DISTANCE (DistanceVoxel.hpp:39-54).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import (
    MAX_OBSTACLE_DISTANCE,
    PBA_UNINITIALISED_COORD,
    PBA_UNINITIALISED_PACKED,
)

Dims = Tuple[int, int, int]
U32 = jnp.uint32
I32 = jnp.int32


def pack(x, y, z) -> jnp.ndarray:
    return (
        jnp.asarray(x, U32)
        | (jnp.asarray(y, U32) << U32(10))
        | (jnp.asarray(z, U32) << U32(20))
    )


def unpack(packed) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    p = jnp.asarray(packed, U32)
    return p & U32(0x3FF), (p >> U32(10)) & U32(0x3FF), p >> U32(20)


def _position_grids(dims: Dims):
    dx, dy, dz = dims
    z = jax.lax.broadcasted_iota(I32, (dz, dy, dx), 0)
    y = jax.lax.broadcasted_iota(I32, (dz, dy, dx), 1)
    x = jax.lax.broadcasted_iota(I32, (dz, dy, dx), 2)
    return x, y, z


def squared_distance_grid(packed_grid: jnp.ndarray, dims: Dims) -> jnp.ndarray:
    """int32[Z,Y,X]: squared distance to the stored obstacle; uninitialised
    voxels give MAX_OBSTACLE_DISTANCE (DistanceVoxel::squaredObstacleDistance)."""
    dx, dy, dz = dims
    g = packed_grid.reshape(dz, dy, dx)
    ox, oy, oz = unpack(g)
    px, py, pz = _position_grids(dims)
    uninit = (ox == PBA_UNINITIALISED_COORD) | (oy == PBA_UNINITIALISED_COORD) | (oz == PBA_UNINITIALISED_COORD)
    d = (
        (px - ox.astype(I32)) ** 2
        + (py - oy.astype(I32)) ** 2
        + (pz - oz.astype(I32)) ** 2
    )
    return jnp.where(uninit, I32(MAX_OBSTACLE_DISTANCE), d)


def init_from_obstacle_mask(mask_flat: jnp.ndarray, dims: Dims) -> jnp.ndarray:
    """uint32[N]: obstacle voxels hold their own coords, others uninit."""
    dx, dy, dz = dims
    px, py, pz = _position_grids(dims)
    own = pack(px, py, pz).reshape(-1)
    return jnp.where(mask_flat, own, U32(PBA_UNINITIALISED_PACKED))


def exact_distances(obstacle_coords: jnp.ndarray, dims: Dims) -> jnp.ndarray:
    """Brute-force oracle: nearest of M obstacle coords per voxel.

    obstacle_coords: int32[M, 3] (x,y,z); invalid rows marked x==1023.
    Returns packed uint32[N]. O(N*M) — use on small scenes/tests only,
    like the reference's exactDistances3D.
    """
    dx, dy, dz = dims
    px, py, pz = _position_grids(dims)
    pos = jnp.stack([px, py, pz], axis=-1).reshape(-1, 3)  # [N,3]
    obs = jnp.asarray(obstacle_coords, I32)  # [M,3]
    valid = obs[:, 0] != PBA_UNINITIALISED_COORD

    def per_voxel(p):
        d = jnp.sum((obs - p[None, :]) ** 2, axis=-1)
        d = jnp.where(valid, d, MAX_OBSTACLE_DISTANCE)
        i = jnp.argmin(d)
        best = obs[i]
        hit = d[i] < MAX_OBSTACLE_DISTANCE
        return jnp.where(
            hit,
            pack(best[0].astype(U32), best[1].astype(U32), best[2].astype(U32)),
            U32(PBA_UNINITIALISED_PACKED),
        )

    return jax.lax.map(per_voxel, pos, batch_size=4096)


def _merge(best_packed, best_d2, cand_packed, dims):
    """Keep the closer of current best and candidate (strictly closer wins,
    like updateMinVoxel)."""
    dx, dy, dz = dims
    cx, cy, cz = unpack(cand_packed)
    px, py, pz = _position_grids(dims)
    uninit = (cx == PBA_UNINITIALISED_COORD) | (cy == PBA_UNINITIALISED_COORD) | (cz == PBA_UNINITIALISED_COORD)
    d2 = (
        (px - cx.astype(I32)) ** 2 + (py - cy.astype(I32)) ** 2 + (pz - cz.astype(I32)) ** 2
    )
    d2 = jnp.where(uninit, I32(MAX_OBSTACLE_DISTANCE), d2)
    take = d2 < best_d2
    return jnp.where(take, cand_packed, best_packed), jnp.where(take, d2, best_d2)


_NEIGHBORS = [
    (ox, oy, oz)
    for ox in (-1, 0, 1)
    for oy in (-1, 0, 1)
    for oz in (-1, 0, 1)
    if (ox, oy, oz) != (0, 0, 0)
]


def _shift3d(grid, off, fill):
    """grid shifted so result[p] = grid[p + off] (zeros -> fill outside)."""
    oz, oy, ox = off[2], off[1], off[0]
    g = grid
    for axis, o in ((0, oz), (1, oy), (2, ox)):
        if o == 0:
            continue
        g = jnp.roll(g, -o, axis=axis)
        idx = [slice(None)] * 3
        if o > 0:
            idx[axis] = slice(g.shape[axis] - o, None)
        else:
            idx[axis] = slice(0, -o)
        g = g.at[tuple(idx)].set(fill)
    return g


def jump_flood(packed_flat: jnp.ndarray, dims: Dims, extra_rounds: int = 1) -> jnp.ndarray:
    """3D jump flooding over the packed grid (jumpFlood3D,
    DistanceVoxelMap.hpp:136). extra_rounds appends step-1 JFA+k refinement
    passes that repair the algorithm's rare inexact cells."""
    dx, dy, dz = dims
    grid = packed_flat.reshape(dz, dy, dx)
    best_d2 = squared_distance_grid(packed_flat, dims)

    step = 1
    while step * 2 < max(dims):
        step *= 2
    steps = []
    s = step
    while s >= 1:
        steps.append(s)
        s //= 2
    steps.extend([1] * int(extra_rounds))

    for s in steps:
        for off in _NEIGHBORS:
            cand = _shift3d(grid, (off[0] * s, off[1] * s, off[2] * s), U32(PBA_UNINITIALISED_PACKED))
            grid, best_d2 = _merge(grid, best_d2, cand, dims)
    return grid.reshape(-1)


def differences(packed_a: jnp.ndarray, packed_b: jnp.ndarray, dims: Dims) -> jnp.ndarray:
    """differences3D (DistanceVoxelMap.hpp:723): count voxels whose squared
    obstacle distances disagree."""
    da = squared_distance_grid(packed_a, dims)
    db = squared_distance_grid(packed_b, dims)
    return jnp.sum(da != db, dtype=jnp.uint32)


def extract_byte_distances(packed_flat: jnp.ndarray, dims: Dims, robot_radius: int = 0) -> jnp.ndarray:
    """extract_distances thrust functor (DistanceVoxel.h:154-205): int8
    free-space per voxel = clamp(sqrt(d2) - robot_radius? , ..., 127).

    The reference returns min(127, floor(sqrt(d2))) and flags obstacle cells
    with 0; robot_radius shifts the usable free space."""
    d2 = squared_distance_grid(packed_flat, dims).astype(jnp.float32)
    free = jnp.floor(jnp.sqrt(jnp.where(d2 >= MAX_OBSTACLE_DISTANCE, jnp.float32(127 * 127), d2)))
    free = jnp.clip(free - robot_radius, 0, 127)
    return free.astype(jnp.int8).reshape(-1)


def manhattan_distance(obstacle_mask_flat: jnp.ndarray, dims: Dims, cap: int = 32767) -> jnp.ndarray:
    """Exact separable L1 distance transform (init_floodfill analogue,
    DistanceVoxelMap.h getManhattanDistances): 2 directional scans per axis."""
    dx, dy, dz = dims
    big = I32(cap)
    d = jnp.where(obstacle_mask_flat.reshape(dz, dy, dx), I32(0), big)

    def sweep(dist, axis):
        def fwd(carry, row):
            carry = jnp.minimum(carry + 1, row)
            return carry, carry

        moved = jnp.moveaxis(dist, axis, 0)
        _, f = jax.lax.scan(fwd, jnp.full(moved.shape[1:], big, I32), moved)
        _, b = jax.lax.scan(fwd, jnp.full(moved.shape[1:], big, I32), moved[::-1])
        out = jnp.minimum(f, b[::-1])
        return jnp.moveaxis(out, 0, axis)

    for axis in (0, 1, 2):
        d = sweep(d, axis)
    return jnp.minimum(d, big).reshape(-1)
