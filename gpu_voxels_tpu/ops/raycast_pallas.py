"""Pallas projective free-space carve (the sensor-fusion hot kernel).

The XLA projective carve (ops/raycast.projective_free_space) is exact but
per-voxel depth-image gathers dominate it: 16.7M gathers at ~1e8/s = ~195 ms
per 640x480 frame into 256^3 (the math itself measures 0.1 ms). TPU gathers
are latency-bound and masked gathers still pay full cost, so this kernel
eliminates them:

  * the depth image is min-pooled PxP conservatively (invalid pixels carve
    nothing -> -inf), giving a table that fits VMEM;
  * each voxel tile projects its 8 corners to bound the pooled-cell bbox it
    can see (scalar work); tiles outside the frustum write "not free" and
    stop — the frustum-AABB restriction for free;
  * the tile then loops ONLY its bbox's pooled cells, each iteration one
    fused vector compare over the tile (zero gathers): free |= (cell match)
    & (sz < pooled_min - eps).

Semantics: carve iff sz < (min depth over the voxel's PxP pixel tile) - eps.
Strictly conservative vs the exact per-pixel carve (min <= d), i.e. it never
frees a voxel the exact carve would keep; near depth discontinuities it
under-carves by at most the tile's depth range. The reference's own carve is
a racy per-ray Bresenham (VoxelMapOperations.h:199-334) — both formulations
are visibility carves, and the pooled variant is the TPU-native speed/
quality knob (P=1 equals the exact carve).

projective_free_space_pooled (pure XLA, any platform) defines the semantics;
the Pallas kernel must match it exactly — tests compare them bit-for-bit.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dims = Tuple[int, int, int]
F32 = jnp.float32
I32 = jnp.int32

_NEG_INF = -3.0e38

import os as _os


def _parse_tile(spec: str) -> Tuple[int, int, int]:
    """Validate the GV_CARVE_TILE override (TZ,TY,TX). TPU layout demands
    TX % 128 == 0 and TZ/TY multiples of 8 (sublane tiling); a malformed or
    layout-violating value falls back to the 8,8,128 default with a warning
    instead of an opaque Mosaic error (or an import-time crash)."""
    default = (8, 8, 128)
    try:
        tile = tuple(int(v) for v in spec.split(","))
    except ValueError:
        tile = ()
    if (len(tile) != 3 or min(tile) <= 0 or tile[2] % 128
            or tile[0] % 8 or tile[1] % 8):
        if spec != "8,8,128":
            import warnings

            warnings.warn(
                f"GV_CARVE_TILE={spec!r} invalid (need TZ,TY,TX with "
                f"TZ%8==TY%8==0 and TX%128==0); using {default}",
                RuntimeWarning,
            )
        return default
    return tile


_TILE = _parse_tile(_os.environ.get('GV_CARVE_TILE', '8,8,128'))


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def min_pool_depth(
    depth: jnp.ndarray, pool: int, invalid_value: float = 0.0
) -> jnp.ndarray:
    """Conservative PxP min-pool: invalid pixels -> -inf (carve nothing)."""
    h, w = depth.shape
    d = jnp.where(depth == invalid_value, jnp.float32(_NEG_INF), depth)
    ph, pw = -(-h // pool), -(-w // pool)
    if ph * pool != h or pw * pool != w:
        # out-of-image pixels are never indexed (the in-FOV test rejects
        # them), so edge-tile padding must be min-neutral, not -inf
        d = jnp.pad(
            d,
            ((0, ph * pool - h), (0, pw * pool - w)),
            constant_values=3.0e38,
        )
    return jnp.min(d.reshape(ph, pool, pw, pool), axis=(1, 3))


def projective_free_space_pooled(
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    side_length: float,
    dims: Dims,
    invalid_value: float = 0.0,
    eps_vox: float = 1.0,
    pool: int = 4,
) -> jnp.ndarray:
    """Reference semantics of the pooled carve (pure XLA, exact spec):
    free iff in-FOV, in front, and sz < pooled_min[v//P, u//P] - eps."""
    h, w = depth.shape
    pm = min_pool_depth(depth, pool, invalid_value)
    pose = jnp.asarray(pose, jnp.float32)
    rot_t = pose[:3, :3].T
    origin = pose[:3, 3]
    dx, dy, dz = dims
    zi = jax.lax.broadcasted_iota(F32, (dz, dy, dx), 0)
    yi = jax.lax.broadcasted_iota(F32, (dz, dy, dx), 1)
    xi = jax.lax.broadcasted_iota(F32, (dz, dy, dx), 2)
    side = jnp.float32(side_length)
    wx = (xi + 0.5) * side - origin[0]
    wy = (yi + 0.5) * side - origin[1]
    wz = (zi + 0.5) * side - origin[2]
    sx = rot_t[0, 0] * wx + rot_t[0, 1] * wy + rot_t[0, 2] * wz
    sy = rot_t[1, 0] * wx + rot_t[1, 1] * wy + rot_t[1, 2] * wz
    sz = rot_t[2, 0] * wx + rot_t[2, 1] * wy + rot_t[2, 2] * wz
    in_front = sz > jnp.float32(1e-6)
    safe_z = jnp.where(in_front, sz, 1.0)
    u = jnp.floor(fx * sx / safe_z + cx).astype(I32)
    v = jnp.floor(fy * sy / safe_z + cy).astype(I32)
    in_fov = in_front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    ui = jnp.clip(u // pool, 0, pm.shape[1] - 1)
    vi = jnp.clip(v // pool, 0, pm.shape[0] - 1)
    d = pm[vi, ui]
    free = in_fov & (sz < d - eps_vox * side)
    return free.reshape(-1)


def max_pool_depth(
    depth: jnp.ndarray, pool: int, invalid_value: float = 0.0
) -> jnp.ndarray:
    """PxP max-pool companion of min_pool_depth: invalid pixels -> -inf
    (they carve nothing, so they never extend the ambiguity band upward);
    edge-tile padding is -inf (max-neutral)."""
    h, w = depth.shape
    d = jnp.where(depth == invalid_value, jnp.float32(_NEG_INF), depth)
    ph, pw = -(-h // pool), -(-w // pool)
    if ph * pool != h or pw * pool != w:
        d = jnp.pad(
            d,
            ((0, ph * pool - h), (0, pw * pool - w)),
            constant_values=_NEG_INF,
        )
    return jnp.max(d.reshape(ph, pool, pw, pool), axis=(1, 3))


def _cell_major_depth(
    depth: jnp.ndarray, pool: int, invalid_value: float = 0.0
) -> jnp.ndarray:
    """f32[ph*pw, 128]: per pooled cell, its PxP pixel depths row-major in
    the first P*P lanes. Invalid and out-of-image pixels are -inf (carve
    nothing). Lives in VMEM; the refinement loop fetches one row by dynamic
    sublane index (lane indices stay static)."""
    h, w = depth.shape
    d = jnp.where(depth == invalid_value, jnp.float32(_NEG_INF), depth)
    ph, pw = -(-h // pool), -(-w // pool)
    d = jnp.pad(
        d, ((0, ph * pool - h), (0, pw * pool - w)), constant_values=_NEG_INF
    )
    t = d.reshape(ph, pool, pw, pool).transpose(0, 2, 1, 3).reshape(ph * pw, pool * pool)
    return jnp.pad(t, ((0, 0), (0, 128 - pool * pool)), constant_values=_NEG_INF)


_SUP = 8  # supercell = SUP x SUP pooled cells (second pooling level)


def _pool2(t: jnp.ndarray, neutral: float, take_min: bool) -> jnp.ndarray:
    """Second-level SUPxSUP pooling of a cell table (pad with `neutral`)."""
    ph, pw = t.shape
    p2h, p2w = -(-ph // _SUP), -(-pw // _SUP)
    t = jnp.pad(
        t, ((0, p2h * _SUP - ph), (0, p2w * _SUP - pw)), constant_values=neutral
    )
    t = t.reshape(p2h, _SUP, p2w, _SUP)
    return jnp.min(t, axis=(1, 3)) if take_min else jnp.max(t, axis=(1, 3))


def _carve_exact_kernel(
    fx, fy, cx, cy, side, eps, w, h, pool, TZ, TY, TX, max_cells,
    pmin_ref, pmax_ref, pmin2_ref, pmax2_ref, rot_ref, org_ref, dcell_ref,
    out_ref, acc_ref, flag_ref,
):
    """One [TZ, TY, TX] voxel tile: EXACT per-pixel carve
    (raycast.projective_free_space semantics, bit-identical) with zero
    full-grid depth gathers, in two phases over the tile's pooled-cell bbox:

    Phase A: per cell, mark sz < pmin(cell) - eps voxels certainly free
    (d(v,u) >= pmin and x - eps is monotone in f32, so sz < d - eps holds
    for the voxel's own pixel) — the conservative pooled kernel's exact
    cost — plus a PURE-SCALAR flag: does the cell's ambiguity band
    [pmin-eps, pmax-eps) intersect the tile's own camera-depth window?
    Voxels outside the band are decided (sz >= pmax-eps => d <= pmax =>
    not free); per-cell vector work for ambiguity would dominate the whole
    kernel (measured 4x the pooled cost on noisy frames, where EVERY cell's
    band is nonempty), so ambiguity detection must cost scalars only.

    Phase B: re-loop the bbox branching on the SMEM flags; guarded cells
    compute the real per-voxel band mask, and only when a voxel truly is
    ambiguous (depth discontinuity, noise shell, invalid-pixel beam) pay
    the exact per-pixel resolve: one VMEM row of the cell's PxP true
    depths, a select chain building each ambiguous voxel's own threshold
    d(v,u) - eps, ONE exact compare.

    Tiles are [TZ, TY, TX] — tiled along X too (TX=128), not full rows:
    a full-X tile spans the whole world along one axis, so its camera-depth
    window [tsz_min, tsz_max] is as wide as the scene and the scalar band
    guard passes for nearly every cell — measured 1.74 s/frame at 512^3.
    Compact tiles keep the window ~tile-sized, the guard selective, and the
    per-guarded-cell vector work 4x smaller: 52 ms at 512^3, 33x faster,
    bit-identical.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    ph = pmin_ref.shape[0]
    pw = pmin_ref.shape[1]
    zi = (jax.lax.broadcasted_iota(I32, (TZ, TY, TX), 0) + i * TZ).astype(F32)
    yi = (jax.lax.broadcasted_iota(I32, (TZ, TY, TX), 1) + j * TY).astype(F32)
    xi = (jax.lax.broadcasted_iota(I32, (TZ, TY, TX), 2) + k * TX).astype(F32)
    ox = org_ref[0, 0]
    oy = org_ref[0, 1]
    oz = org_ref[0, 2]
    wx = (xi + 0.5) * side - ox
    wy = (yi + 0.5) * side - oy
    wz = (zi + 0.5) * side - oz
    sx = rot_ref[0, 0] * wx + rot_ref[0, 1] * wy + rot_ref[0, 2] * wz
    sy = rot_ref[1, 0] * wx + rot_ref[1, 1] * wy + rot_ref[1, 2] * wz
    sz = rot_ref[2, 0] * wx + rot_ref[2, 1] * wy + rot_ref[2, 2] * wz
    in_front = sz > jnp.float32(1e-6)
    safe_z = jnp.where(in_front, sz, 1.0)
    u = jnp.floor(jnp.float32(fx) * sx / safe_z + jnp.float32(cx)).astype(I32)
    v = jnp.floor(jnp.float32(fy) * sy / safe_z + jnp.float32(cy)).astype(I32)
    in_fov = in_front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    cu = jnp.clip(u // pool, 0, pw - 1)
    cv = jnp.clip(v // pool, 0, ph - 1)
    # fused single-compare keys: pooled cell id (out-of-FOV folded to -1 so
    # one compare does match+fov) and in-cell pixel id
    cell = jnp.where(in_fov, cv * pw + cu, -1)
    pic = (v - cv * pool) * pool + (u - cu * pool)  # [0, P^2) when in-FOV

    big = jnp.int32(1 << 30)
    cu_min = jnp.min(jnp.where(in_fov, cu, big))
    cu_max = jnp.max(jnp.where(in_fov, cu, -1))
    cv_min = jnp.min(jnp.where(in_fov, cv, big))
    cv_max = jnp.max(jnp.where(in_fov, cv, -1))
    wb = jnp.maximum(cu_max - cu_min + 1, 0)
    n_cells = jnp.minimum(
        jnp.maximum(cv_max - cv_min + 1, 0) * wb, jnp.int32(max_cells)
    )
    acc_ref[...] = jnp.zeros((TZ, TY, TX), jnp.uint8)

    # the tile's own camera-depth window, once: a cell can hold ambiguous
    # voxels only if its band intersects it. Tiles are 8 voxels thin along
    # z, so for near-axis cameras this window is narrow and the PURE-SCALAR
    # guard below skips nearly every cell's band work; an oblique camera
    # widens the window, which costs time but never correctness.
    tsz_min = jnp.min(jnp.where(in_fov, sz, jnp.float32(3e38)))
    tsz_max = jnp.max(jnp.where(in_fov, sz, jnp.float32(-3e38)))

    # WHOLE-TILE early decide over the supercell tables (a handful of scalar
    # reads): most tiles are interior — certainly free (the carved volume's
    # bulk) or certainly not free (behind every surface their bbox can see)
    # — and must not pay the per-cell loops at all; only the O(surface)
    # straddling tiles do. PMIN_min/PMAX_max bound pmin/pmax over a SUPERSET
    # of the tile's cell bbox, so both decisions are conservative.
    sw = jnp.maximum(cu_max // _SUP - cu_min // _SUP + 1, 0)
    n_sc = jnp.maximum(cv_max // _SUP - cv_min // _SUP + 1, 0) * sw

    def sc_body(r, carry):
        mn, mx = carry
        rv = cv_min // _SUP + r // jnp.maximum(sw, 1)
        rc = cu_min // _SUP + r % jnp.maximum(sw, 1)
        return jnp.minimum(mn, pmin2_ref[rv, rc]), jnp.maximum(mx, pmax2_ref[rv, rc])

    pmin_lo, pmax_hi = jax.lax.fori_loop(
        0, n_sc, sc_body, (jnp.float32(3e38), jnp.float32(-3e38))
    )
    # every in-FOV voxel: sz <= tsz_max < pmin_lo - eps <= d(its pixel) - eps
    all_free = tsz_max < pmin_lo - jnp.float32(eps)
    # no voxel can be free: sz >= tsz_min >= pmax_hi - eps >= d - eps
    none_free = tsz_min >= pmax_hi - jnp.float32(eps)

    @pl.when(all_free)
    def _():
        acc_ref[...] = in_fov.astype(jnp.uint8)

    @pl.when(jnp.logical_not(all_free) & jnp.logical_not(none_free))
    def _():
        def cell_of(r):
            rv = cv_min + r // jnp.maximum(wb, 1)
            rc = cu_min + r % jnp.maximum(wb, 1)
            return rv, rc

        def body_a(r, _a):
            rv, rc = cell_of(r)
            # same f32 "- eps" expression as the XLA spec (see _carve_kernel)
            pmn_e = pmin_ref[rv, rc] - jnp.float32(eps)
            pmx_e = pmax_ref[rv, rc] - jnp.float32(eps)
            match = cell == rv * pw + rc
            acc_ref[...] = acc_ref[...] | (match & (sz < pmn_e)).astype(jnp.uint8)
            # scalar-only band test: nonempty and intersecting the tile window
            flag_ref[r] = (
                (pmx_e > pmn_e) & (pmx_e > tsz_min) & (pmn_e <= tsz_max)
            ).astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, n_cells, body_a, 0)

        def body_b(r, _b):
            @pl.when(flag_ref[r] != 0)
            def _():
                rv, rc = cell_of(r)
                rcell = rv * pw + rc
                pmn_e = pmin_ref[rv, rc] - jnp.float32(eps)
                pmx_e = pmax_ref[rv, rc] - jnp.float32(eps)
                match = cell == rcell
                amb = match & (sz < pmx_e) & jnp.logical_not(sz < pmn_e)

                # the scalar guard is a superset (band may miss every voxel
                # of this tile); pay the cross-lane reduce only for guarded
                # cells, and the P^2 select chain only when a voxel really
                # is ambiguous
                @pl.when(jnp.any(amb))
                def _():
                    row = dcell_ref[pl.ds(rcell, 1), :]  # [1,128] pixel depths
                    thr = jnp.full((TZ, TY, TX), jnp.float32(_NEG_INF))
                    ambpic = jnp.where(amb, pic, -1)
                    for px in range(pool * pool):
                        thr = jnp.where(
                            ambpic == px, row[0, px] - jnp.float32(eps), thr
                        )
                    acc_ref[...] = acc_ref[...] | (sz < thr).astype(jnp.uint8)

            return 0

        jax.lax.fori_loop(0, n_cells, body_b, 0)

    out_ref[...] = acc_ref[...]


def projective_free_space_exact_tpu(
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    side_length: float,
    dims: Dims,
    invalid_value: float = 0.0,
    eps_vox: float = 1.0,
    tile_pool: int = 8,
) -> jnp.ndarray:
    """EXACT per-pixel projective carve, bit-identical to
    raycast.projective_free_space, via the two-phase Pallas band kernel
    (_carve_exact_kernel). tile_pool is an internal tiling parameter
    (tile_pool^2 <= 128), not a semantics knob. Falls back to the XLA spec
    implementation for awkward dims (identical output either way)."""
    dx, dy, dz = dims
    TZ, TY, TX = _TILE
    if dz % TZ or dy % TY or dx % TX or tile_pool * tile_pool > 128:
        return projective_free_space_xla(
            depth, pose, fx, fy, cx, cy, side_length, dims, invalid_value, eps_vox
        )
    h, w = depth.shape
    pmin = min_pool_depth(depth, tile_pool, invalid_value)
    pmax = max_pool_depth(depth, tile_pool, invalid_value)
    pmin2 = _pool2(pmin, 3.0e38, take_min=True)
    pmax2 = _pool2(pmax, _NEG_INF, take_min=False)
    dcell = _cell_major_depth(depth, tile_pool, invalid_value)
    pose = jnp.asarray(pose, jnp.float32)
    rot_t = pose[:3, :3].T
    origin = pose[:3, 3].reshape(1, 3)
    # the spec computes the threshold as f32(eps_vox) * f32(side) IN f32;
    # fold the identical f32 product here so the band edges and the refine
    # compare use the spec's exact value (a python-double product can be
    # 1 ulp off, which would break the certainty claims)
    import numpy as _np

    eps = float(_np.float32(eps_vox) * _np.float32(side_length))
    max_cells = pmin.shape[0] * pmin.shape[1]
    kern = functools.partial(
        _carve_exact_kernel,
        float(fx), float(fy), float(cx), float(cy),
        float(side_length), eps,
        int(w), int(h), int(tile_pool), TZ, TY, TX, max_cells,
    )
    out = pl.pallas_call(
        kern,
        grid=(dz // TZ, dy // TY, dx // TX),
        in_specs=[
            # scalar-indexed per cell -> SMEM
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pmin
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pmax
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pmin2 (supercells)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pmax2 (supercells)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rot
            pl.BlockSpec(memory_space=pltpu.SMEM),  # origin
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cell-major pixel depths
        ],
        out_specs=pl.BlockSpec(
            (TZ, TY, TX), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((dz, dy, dx), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((TZ, TY, TX), jnp.uint8),
            pltpu.SMEM((max_cells,), jnp.int32),
        ],
        interpret=_interpret(),
    )(pmin, pmax, pmin2, pmax2, rot_t, origin, dcell)
    return (out != 0).reshape(-1)


def projective_free_space_xla(
    depth, pose, fx, fy, cx, cy, side_length, dims, invalid_value=0.0, eps_vox=1.0
):
    from .raycast import projective_free_space

    return projective_free_space(
        depth, pose, fx, fy, cx, cy, side_length, dims, invalid_value, eps_vox
    )


def _carve_kernel(
    fx, fy, cx, cy, side, eps, w, h, pool, TZ, TY, TX,
    pm_ref, pm2min_ref, pm2max_ref, rot_ref, org_ref, out_ref, acc_ref,
):
    """One [TZ, TY, TX] voxel tile: pooled conservative carve (X-tiled like
    the exact kernel).

    pm_ref f32[PH, PW] pooled min-depth (VMEM); rot_ref f32[3,3] = R^T,
    org_ref f32[1,3] origin (VMEM); out_ref bool-as-int8 is not supported
    everywhere, so out is uint8 {0,1}.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    ph = pm_ref.shape[0]
    pw = pm_ref.shape[1]
    zi = (jax.lax.broadcasted_iota(I32, (TZ, TY, TX), 0) + i * TZ).astype(F32)
    yi = (jax.lax.broadcasted_iota(I32, (TZ, TY, TX), 1) + j * TY).astype(F32)
    xi = (jax.lax.broadcasted_iota(I32, (TZ, TY, TX), 2) + k * TX).astype(F32)
    ox = org_ref[0, 0]
    oy = org_ref[0, 1]
    oz = org_ref[0, 2]
    wx = (xi + 0.5) * side - ox
    wy = (yi + 0.5) * side - oy
    wz = (zi + 0.5) * side - oz
    sx = rot_ref[0, 0] * wx + rot_ref[0, 1] * wy + rot_ref[0, 2] * wz
    sy = rot_ref[1, 0] * wx + rot_ref[1, 1] * wy + rot_ref[1, 2] * wz
    sz = rot_ref[2, 0] * wx + rot_ref[2, 1] * wy + rot_ref[2, 2] * wz
    in_front = sz > jnp.float32(1e-6)
    safe_z = jnp.where(in_front, sz, 1.0)
    u = jnp.floor(jnp.float32(fx) * sx / safe_z + jnp.float32(cx)).astype(I32)
    v = jnp.floor(jnp.float32(fy) * sy / safe_z + jnp.float32(cy)).astype(I32)
    in_fov = in_front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    cu = jnp.clip(u // pool, 0, pw - 1)
    cv = jnp.clip(v // pool, 0, ph - 1)

    # pooled-cell bbox of the in-FOV voxels of this tile (vector reduce; an
    # all-outside tile yields an empty range and the loop is skipped)
    big = jnp.int32(1 << 30)
    cu_min = jnp.min(jnp.where(in_fov, cu, big))
    cu_max = jnp.max(jnp.where(in_fov, cu, -1))
    cv_min = jnp.min(jnp.where(in_fov, cv, big))
    cv_max = jnp.max(jnp.where(in_fov, cv, -1))

    # single flattened bbox loop accumulating into VMEM scratch: Mosaic does
    # not legalize nested dynamic loops carrying large vectors
    wb = jnp.maximum(cu_max - cu_min + 1, 0)
    n_cells = jnp.maximum(cv_max - cv_min + 1, 0) * wb
    acc_ref[...] = jnp.zeros((TZ, TY, TX), jnp.uint8)

    # whole-tile early decide over the supercell pm tables (see
    # _carve_exact_kernel): interior tiles skip the per-cell loop entirely
    tsz_min = jnp.min(jnp.where(in_fov, sz, jnp.float32(3e38)))
    tsz_max = jnp.max(jnp.where(in_fov, sz, jnp.float32(-3e38)))
    sw = jnp.maximum(cu_max // _SUP - cu_min // _SUP + 1, 0)
    n_sc = jnp.maximum(cv_max // _SUP - cv_min // _SUP + 1, 0) * sw

    def sc_body(r, carry):
        mn, mx = carry
        rv = cv_min // _SUP + r // jnp.maximum(sw, 1)
        rc = cu_min // _SUP + r % jnp.maximum(sw, 1)
        return jnp.minimum(mn, pm2min_ref[rv, rc]), jnp.maximum(mx, pm2max_ref[rv, rc])

    pm_lo, pm_hi = jax.lax.fori_loop(
        0, n_sc, sc_body, (jnp.float32(3e38), jnp.float32(-3e38))
    )
    all_free = tsz_max < pm_lo - jnp.float32(eps)
    none_free = tsz_min >= pm_hi - jnp.float32(eps)

    @pl.when(all_free)
    def _():
        acc_ref[...] = in_fov.astype(jnp.uint8)

    @pl.when(jnp.logical_not(all_free) & jnp.logical_not(none_free))
    def _():
        def body(r, _a):
            rv = cv_min + r // jnp.maximum(wb, 1)
            rc = cu_min + r % jnp.maximum(wb, 1)
            pmv = pm_ref[rv, rc]
            # written as sz < pmv - eps, the SAME f32 expression as the XLA
            # spec (projective_free_space): sz + eps < pmv is mathematically
            # equal but can differ by one rounding step near binade
            # boundaries
            hit = (cu == rc) & (cv == rv) & (sz < pmv - jnp.float32(eps))
            acc_ref[...] = acc_ref[...] | hit.astype(jnp.uint8)
            return 0

        jax.lax.fori_loop(0, n_cells, body, 0)

    out_ref[...] = acc_ref[...] & in_fov.astype(jnp.uint8)


def projective_free_space_tpu(
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    side_length: float,
    dims: Dims,
    invalid_value: float = 0.0,
    eps_vox: float = 1.0,
    pool: int = 4,
) -> jnp.ndarray:
    """Pallas pooled carve; bit-identical to projective_free_space_pooled.

    Falls back to the XLA spec implementation off-TPU or for awkward dims.
    """
    dx, dy, dz = dims
    TZ, TY, TX = _TILE
    if dz % TZ or dy % TY or dx % TX:
        return projective_free_space_pooled(
            depth, pose, fx, fy, cx, cy, side_length, dims,
            invalid_value, eps_vox, pool,
        )
    h, w = depth.shape
    pm = min_pool_depth(depth, pool, invalid_value)
    pm2min = _pool2(pm, 3.0e38, take_min=True)
    pm2max = _pool2(pm, _NEG_INF, take_min=False)
    pose = jnp.asarray(pose, jnp.float32)
    rot_t = pose[:3, :3].T
    origin = pose[:3, 3].reshape(1, 3)
    kern = functools.partial(
        _carve_kernel,
        float(fx), float(fy), float(cx), float(cy),
        float(side_length), float(eps_vox) * float(side_length),
        int(w), int(h), int(pool), TZ, TY, TX,
    )
    out = pl.pallas_call(
        kern,
        grid=(dz // TZ, dy // TY, dx // TX),
        in_specs=[
            # the pooled table is scalar-indexed with dynamic (row, col) —
            # that is SMEM's job (VMEM loads need 128-aligned lane indices)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pm
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pm2min (supercells)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pm2max (supercells)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rot
            pl.BlockSpec(memory_space=pltpu.SMEM),  # origin
        ],
        out_specs=pl.BlockSpec(
            (TZ, TY, TX), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((dz, dy, dx), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((TZ, TY, TX), jnp.uint8)],
        interpret=_interpret(),
    )(pm, pm2min, pm2max, rot_t, origin)
    return (out != 0).reshape(-1)
