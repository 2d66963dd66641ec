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
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)

    # fold the planes in uint32 FIRST (7 ORs/map), mask bit 0 of plane 0,
    # then one != 0 — fewer vector ops than per-plane boolean folds
    a_f = a_ref[0] & jnp.uint32(0xFFFFFFFE)
    b_f = b_ref[0] & jnp.uint32(0xFFFFFFFE)
    for p in range(1, a_ref.shape[0]):
        a_f |= a_ref[p]
        b_f |= b_ref[p]
    hit = ((a_f != 0) & (b_f != 0)).astype(jnp.int32)
    # accumulate into a VMEM vector: vertical adds only. A per-step scalar
    # jnp.sum into SMEM serializes the pipeline on a cross-lane reduce each
    # grid step (measured 4.5 ms vs 2.8 ms XLA); the one true reduce happens
    # once at the last step.
    rows = hit.shape[0]
    acc_ref[...] = acc_ref[...] + jnp.sum(
        hit.reshape(rows // 8, 8, hit.shape[1]), axis=0
    )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = jnp.sum(acc_ref[...])


BIT_TILE_ROWS = 512  # 8 planes * 512 * 128 * 4B = 2MB/map per step
# the types kernel holds window/record temporaries + an OR scratch in VMEM,
# so it runs smaller tiles (512 rows OOMs the 16M scoped vmem limit)
TYPES_TILE_ROWS = 256


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
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32)],
        interpret=_interpret(),
    )(a2, b2)
    return out[0].astype(jnp.uint32)


def _fold_or_rows(x: jnp.ndarray) -> jnp.ndarray:
    """OR-reduce a [R, 128] tile over rows with log2(R) vector ORs (R is a
    power of two; a general reduce-with-OR may not lower on all mosaic
    versions, halving folds always do)."""
    r = x.shape[0]
    while r > 1:
        r //= 2
        x = x[:r] | x[r:]
    return x[0]


def _shift_planes(planes, s: int):
    """Whole-vector bit shift on a list of 8 [R, 128] uint32 plane tiles:
    result bit b = input bit (b + s), zero fill (bitops.shift_bits semantics,
    unrolled on registers)."""
    n = len(planes)
    zero = jnp.zeros_like(planes[0])
    out = []
    if s >= 0:
        q, r = divmod(s, 32)
        for p in range(n):
            lo = planes[p + q] if (p + q) < n else zero
            if r == 0:
                out.append(lo)
            else:
                hi = planes[p + q + 1] if (p + q + 1) < n else zero
                out.append((lo >> jnp.uint32(r)) | (hi << jnp.uint32(32 - r)))
    else:
        q, r = divmod(-s, 32)
        for p in range(n):
            hi = planes[p - q] if (p - q) >= 0 else zero
            if r == 0:
                out.append(hi)
            else:
                lo = planes[p - q - 1] if (p - q - 1) >= 0 else zero
                out.append((hi << jnp.uint32(r)) | (lo >> jnp.uint32(32 - r)))
    return out


def _types_kernel(margin: int, mark: bool, gated: bool, *refs):
    """One pass: windowed SV collide (sv_offset=0, margin<=24) producing
    count + per-plane colliding-meanings OR (+ marked plane 0 when `mark`;
    callers with mark_collisions=False skip that whole output write).

    When `gated`, refs[0] is the scalar-prefetched int32[2, grid] meta table
    (row 0: tile liveness from the maps' occupancy summaries; row 1: the
    remapped block index the in_specs use) and dead tiles skip ALL window
    math — their input blocks were remapped to the previous live block, so
    the pipeline issues no new copies for them either."""
    if gated:
        meta_ref, a_ref, b_ref, count_ref, meanings_ref, *rest = refs
    else:
        meta_ref = None
        a_ref, b_ref, count_ref, meanings_ref, *rest = refs
    if mark:
        marked_ref, cacc_ref, macc_ref = rest
    else:
        marked_ref = None
        cacc_ref, macc_ref = rest

    @pl.when(pl.program_id(0) == 0)
    def _():
        cacc_ref[...] = jnp.zeros(cacc_ref.shape, jnp.int32)
        macc_ref[:] = jnp.zeros_like(macc_ref)

    nplanes = a_ref.shape[0]

    def _body():
        v2 = [b_ref[p] for p in range(nplanes)]
        v2[0] = v2[0] & jnp.uint32(0xFFFFFFF0)  # non-SV nibble never matches
        # window[b] = OR of v2 bits [b-margin, b+margin], built by OR-shift
        # doubling per direction. Each direction composes shifts of the SAME
        # sign only: same-sign composition never loses clipped contributions
        # (the intermediate index lies between the endpoints), whereas
        # shifting the down-window back up would zero-fill bits < margin that
        # the per-shift reference (bitops.bit_margin_collision_check_packed)
        # keeps.
        def one_sided(sign: int):
            w = list(v2)
            covered = 1
            while covered < margin + 1:
                step = min(covered, margin + 1 - covered)
                w = [x | s for x, s in zip(w, _shift_planes(w, sign * step))]
                covered += step
            return w

        if margin:
            down, up = one_sided(+1), one_sided(-1)
            win = [d | u for d, u in zip(down, up)]
        else:
            win = list(v2)

        rec = [a_ref[p] & win[p] for p in range(nplanes)]
        nz = rec[0] != 0
        for p in range(1, nplanes):
            nz |= rec[p] != 0
        # vector count accumulator (vertical adds only): a per-step scalar sum
        # into SMEM would stall the pipeline on a cross-lane reduce each step
        nzi = nz.astype(jnp.int32)
        cacc_ref[...] = cacc_ref[...] + jnp.sum(
            nzi.reshape(nzi.shape[0] // 8, 8, nzi.shape[1]), axis=0
        )
        # meanings accumulator: halving-fold each plane's record to 8 rows
        # (log2(R)-3 vector ORs — cheaper than OR-ing the full tile into a
        # full-tile scratch, and 32x less VMEM, freeing room for big tiles)
        for p in range(nplanes):
            r = rec[p]
            rr = r.shape[0]
            while rr > 8:
                rr //= 2
                r = r[:rr] | r[rr:]
            macc_ref[p] = macc_ref[p] | r
        if mark:
            marked_ref[:] = jnp.where(nz, a_ref[0] | jnp.uint32(1 << 2), a_ref[0])

    if gated:
        live = meta_ref[0, pl.program_id(0)] != 0
        pl.when(live)(_body)
        if mark:
            # dead tiles still own their marked-output block: pass a through
            # (a's block is NOT remapped when mark=True, see in_specs)
            @pl.when(jnp.logical_not(live))
            def _():
                marked_ref[:] = a_ref[0]
    else:
        _body()

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        count_ref[0] = jnp.sum(cacc_ref[...])
        for p in range(nplanes):
            meanings_ref[p] = _fold_or_rows(macc_ref[p])


@functools.partial(jax.jit, static_argnames=("margin", "mark"))
def collide_types_bit_bit(
    a_planes: jnp.ndarray,
    b_planes: jnp.ndarray,
    margin: int = 0,
    mark: bool = True,
    occ_a: jnp.ndarray | None = None,
    occ_b: jnp.ndarray | None = None,
):
    """kernelCollideVoxelMapsBitvector (BitVoxelMap.hpp:85-135) as ONE Pallas
    pass over both maps: count + colliding-meanings OR-reduce + eBVM_COLLISION
    marking, instead of XLA's separate count/reduce/mark sweeps. sv_offset=0,
    margin <= 24 (the hot swept-volume path); other domains take the packed
    XLA formulation. Bit-identical to ops.collide.collide_with_types_bit_bit's
    XLA path (asserted in tests on both platforms).

    When both maps' maintained occupancy summaries (uint8[N] !noneButEmpty,
    see BitVectorVoxelMap.occ) are given, tiles where either map is all-empty
    are provably hit-free and are skipped entirely: a scalar-prefetched meta
    table gates the window math, and the in_specs' index maps remap dead
    tiles' blocks to the previous live block so the Pallas pipeline issues no
    new HBM copies for them (with mark=True, `a` still streams every tile —
    dead tiles' marked output is the unchanged plane 0)."""
    if not (0 <= margin <= 24):
        raise ValueError("pallas path covers margin <= 24, sv_offset == 0")
    gated = occ_a is not None and occ_b is not None
    n = a_planes.shape[-1]
    per_tile = TYPES_TILE_ROWS * LANES
    rows = -(-n // per_tile) * per_tile // LANES
    a2 = _as_tiles(a_planes, rows, 0)
    b2 = _as_tiles(b_planes, rows, 0)
    grid = rows // TYPES_TILE_ROWS
    nplanes = a_planes.shape[0]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((nplanes, LANES), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((nplanes, LANES), jnp.uint32),
    ]
    if mark:
        out_specs.append(
            pl.BlockSpec((TYPES_TILE_ROWS, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((rows, LANES), jnp.uint32))
    scratch_shapes = [
        pltpu.VMEM((8, LANES), jnp.int32),
        pltpu.VMEM((nplanes, 8, LANES), jnp.uint32),
    ]
    kernel = functools.partial(_types_kernel, margin, mark, gated)
    if gated:
        live_a = _as_tiles(occ_a, rows, 0).reshape(grid, -1).max(axis=1) > 0
        live_b = _as_tiles(occ_b, rows, 0).reshape(grid, -1).max(axis=1) > 0
        if margin >= 4:
            # the occupancy summary is !noneButEmpty, which EXCLUDES bit 0
            # (eBVM_FREE) — but the oracle's hit predicate is v1 & window and
            # window bit 0 can be set once margin reaches the SV nibble
            # boundary (b bit >= 4 shifted down to 0). Bit-0-only voxels of
            # `a` therefore can hit at margin >= 4: OR plane 0's bit 0 into
            # the liveness so those tiles stay live (one extra plane read).
            a0 = (_as_tiles(a_planes[0], rows, 0) & jnp.uint32(1)).reshape(grid, -1)
            live_a = live_a | (a0.max(axis=1) > 0)
        flags = (live_a & live_b).astype(jnp.int32)
        idx = jnp.arange(grid, dtype=jnp.int32)
        # dead tiles re-present the previous live block index -> no new copy
        blk = jnp.maximum(
            jax.lax.cummax(jnp.where(flags != 0, idx, jnp.int32(-1))), 0
        )
        meta = jnp.stack([flags, blk])
        a_blk = (lambda i, m: (0, i, 0)) if mark else (lambda i, m: (0, m[1, i], 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((nplanes, TYPES_TILE_ROWS, LANES), a_blk),
                pl.BlockSpec((nplanes, TYPES_TILE_ROWS, LANES), lambda i, m: (0, m[1, i], 0)),
            ],
            out_specs=tuple(out_specs),
            scratch_shapes=scratch_shapes,
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shape),
            interpret=_interpret(),
        )(meta, a2, b2)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((nplanes, TYPES_TILE_ROWS, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nplanes, TYPES_TILE_ROWS, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch_shapes,
            interpret=_interpret(),
        )(a2, b2)
    count, meanings_lanes = outs[0], outs[1]
    meanings = jnp.bitwise_or.reduce(meanings_lanes, axis=1)
    if mark:
        # gated: dead-tile blocks hold the unchanged plane 0 (passthrough)
        new_a = a_planes.at[0].set(outs[2].reshape(-1)[:n])
    else:
        new_a = a_planes
    return count[0].astype(jnp.uint32), meanings, new_a


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
