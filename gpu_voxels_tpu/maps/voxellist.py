"""Sparse voxel lists (equivalents of voxellist/TemplateVoxelList + subclasses).

The reference keeps three parallel thrust::device_vectors (id, coord, voxel)
and maintains them sorted+unique after every insert
(TemplateVoxelList.hpp:142-209). Here a list is a fixed-capacity pytree:

    ids:    uint32[C]   sort key (low word); EMPTY (0xFFFFFFFF) pads the tail
    ids_hi: uint32[C]   sort key (high word); 0 for linear/short ids
    <payload>           per voxel kind (bit planes / occupancy / count)
    count: int32        number of valid entries (traced)

Capacity is static; by default inserts grow it by the (static) number of new
points like the reference's thrust vectors, and `with_capacity` re-fixes it.
Steady-state jit loops should pass ``grow=False`` to insert at constant
capacity (one compilation per (C, M) shape; overflow saturates sorted-first).
Coordinates are derived from ids on demand instead of being stored.

The make_unique step (sort_by_key + reversed inclusive_scan(Merge) +
unique_by_key, TemplateVoxelList.hpp:142-209) becomes argsort + a segmented
associative scan that merges duplicate-id payloads, then a prefix-sum
compaction — all fixed-shape, all on device. Payload merge semantics are
reference-exact per voxel kind: bit = OR; counting = wrapping int8 add
(CountingVoxel.hpp:75-80); probabilistic = the SEQUENTIAL saturating add of
the reference's reversed scan (each step clamps to [-127,127],
ProbabilisticVoxel.hpp:51-57), reproduced exactly via an associative scan
over composed clamp maps g(x)=clamp(x+a, lo, hi) — saturating adds are not
associative, but their function compositions are.

IDs: "linear" mode uses the dense map linear index (MapVoxelID, uint32);
"morton" mode uses the reference's 60-bit Morton codes — the reference's
BitVectorMortonVoxelList carries uint64 ids (common_defines.h:175-182,
octree/Morton.h:80-160). JAX disables 64-bit ints, so the code is carried as
the (hi30, lo30) uint32 pair with lexicographic ordering: a two-pass stable
argsort replaces sort_by_key, and a branchless pair binary search replaces
thrust::binary_search. Coordinates up to 2^20 per axis round-trip exactly.
Like the reference's list insert kernels, points are NOT bounds-checked
(VoxelListOperations.hpp:41-59) — out-of-range points produce out-of-range
ids (uint32 wraparound in linear mode).
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.io import DiskIO
from .. import bitops, morton, probability
from ..constants import (
    MAX_PROBABILITY,
    MIN_PROBABILITY,
    NUM_BIT_PLANES,
    UNKNOWN_PROBABILITY,
    BitVoxelMeaning,
    MapType,
)
from ..ops.insert import linear_offset, map_to_voxels
from ..utils.compiled import compiled

EMPTY_ID = jnp.uint32(0xFFFFFFFF)
Dims = Tuple[int, int, int]

KIND_BIT = "bit"
KIND_PROB = "prob"
KIND_COUNT = "count"


def _payload_init(kind: str, capacity: int):
    if kind == KIND_BIT:
        return jnp.zeros((NUM_BIT_PLANES, capacity), jnp.uint32)
    if kind == KIND_PROB:
        return jnp.full((capacity,), jnp.int8(UNKNOWN_PROBABILITY))
    if kind == KIND_COUNT:
        return jnp.zeros((capacity,), jnp.int8)
    raise ValueError(kind)


def _gather_payload(kind: str, payload, order):
    if kind == KIND_BIT:
        return payload[:, order]
    return payload[order]


def _where_payload(kind: str, mask, a, b):
    if kind == KIND_BIT:
        return jnp.where(mask[None, :], a, b)
    return jnp.where(mask, a, b)


def _pair_searchsorted(hi_arr, lo_arr, hi_q, lo_q):
    """Lower-bound positions of (hi_q, lo_q) in the lexicographically sorted
    pair arrays (branchless binary search; the thrust::binary_search
    replacement for 60-bit Morton ids)."""
    n = hi_arr.shape[0]
    pos = jnp.zeros(lo_q.shape, jnp.int32)
    step = 1
    while step < n:
        step <<= 1
    step >>= 1
    while step >= 1:
        cand = pos + step
        idx = jnp.minimum(cand - 1, n - 1)
        ha, la = hi_arr[idx], lo_arr[idx]
        less = (ha < hi_q) | ((ha == hi_q) & (la < lo_q))
        pos = jnp.where((cand <= n) & less, cand, pos)
        step >>= 1
    return pos


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class VoxelList(DiskIO):
    ids: jnp.ndarray  # uint32[C] low word, sorted (lexicographic with ids_hi)
    ids_hi: jnp.ndarray  # uint32[C] high word (0 in linear mode)
    payload: jnp.ndarray
    count: jnp.ndarray  # int32 scalar
    dims: Dims = field(metadata=dict(static=True))
    side_length: float = field(metadata=dict(static=True))
    kind: str = field(metadata=dict(static=True))
    id_mode: str = field(default="linear", metadata=dict(static=True))  # or "morton"
    map_type: MapType = field(default=MapType.MT_BITVECTOR_VOXELLIST, metadata=dict(static=True))

    # -- construction ---------------------------------------------------------
    @staticmethod
    def create(
        dims: Dims,
        side_length: float = 1.0,
        kind: str = KIND_BIT,
        capacity: int = 0,
        id_mode: str = "linear",
        map_type: Optional[MapType] = None,
    ) -> "VoxelList":
        if id_mode == "linear" and int(dims[0]) * int(dims[1]) * int(dims[2]) > 2**32:
            # the reference's MapVoxelID is uint32 too — linear ids past
            # 2^32 voxels silently wrap there; fail fast instead and point
            # at the octree-compatible 60-bit Morton mode
            raise ValueError(
                f"linear voxel-list ids are uint32; dims {tuple(dims)} span "
                f"{int(dims[0])*int(dims[1])*int(dims[2])} voxels — use "
                "id_mode='morton' (bit_vector_morton_voxel_list) at this scale"
            )
        if map_type is None:
            map_type = {
                (KIND_BIT, "linear"): MapType.MT_BITVECTOR_VOXELLIST,
                (KIND_BIT, "morton"): MapType.MT_BITVECTOR_MORTON_VOXELLIST,
                (KIND_PROB, "linear"): MapType.MT_PROBAB_VOXELLIST,
                (KIND_PROB, "morton"): MapType.MT_PROBAB_MORTON_VOXELLIST,
                (KIND_COUNT, "linear"): MapType.MT_COUNTING_VOXELLIST,
            }[(kind, id_mode)]
        return VoxelList(
            ids=jnp.full((capacity,), EMPTY_ID),
            ids_hi=jnp.full((capacity,), EMPTY_ID),
            payload=_payload_init(kind, capacity),
            count=jnp.int32(0),
            dims=tuple(dims),
            side_length=float(side_length),
            kind=kind,
            id_mode=id_mode,
            map_type=map_type,
        )

    @property
    def capacity(self) -> int:
        return self.ids.shape[0]

    # -- id <-> coordinate maps ----------------------------------------------
    def _ids_from_coords(self, coords: jnp.ndarray):
        """Returns (hi, lo) id words. Linear mode: hi = 0."""
        if self.id_mode == "morton":
            return morton.morton_code60(
                coords[..., 0].astype(jnp.uint32),
                coords[..., 1].astype(jnp.uint32),
                coords[..., 2].astype(jnp.uint32),
            )
        dx, dy, _ = self.dims
        # uint32 wraparound for out-of-range points, like the reference
        lo = (
            coords[..., 2].astype(jnp.uint32) * jnp.uint32(dx * dy)
            + coords[..., 1].astype(jnp.uint32) * jnp.uint32(dx)
            + coords[..., 0].astype(jnp.uint32)
        )
        return jnp.zeros_like(lo), lo

    def coords_from_ids(self, ids: jnp.ndarray, ids_hi=None) -> jnp.ndarray:
        if self.id_mode == "morton":
            if ids_hi is None:
                ids_hi = jnp.zeros_like(ids)
            hi = jnp.where(ids_hi == EMPTY_ID, jnp.uint32(0), ids_hi)
            x, y, z = morton.inv_morton_code60(hi, ids)
        else:
            dx, dy, _ = self.dims
            z = ids // jnp.uint32(dx * dy)
            rem = ids - z * jnp.uint32(dx * dy)
            y = rem // jnp.uint32(dx)
            x = rem - y * jnp.uint32(dx)
        return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)

    def entry_coords(self) -> jnp.ndarray:
        """int32[C, 3] coordinates of the stored entries."""
        return self.coords_from_ids(self.ids, self.ids_hi)

    def _sort_order(self, hi, lo):
        """Stable lexicographic argsort of (hi, lo). EMPTY pairs sort last."""
        if self.id_mode != "morton":
            return jnp.argsort(lo)
        order1 = jnp.argsort(lo, stable=True)
        order2 = jnp.argsort(hi[order1], stable=True)
        return order1[order2]

    # -- make_unique ----------------------------------------------------------
    def _make_unique(self, hi, lo, payload):
        """sort_by_key + unique_by_key(reduce_op) + compaction, fixed shape."""
        c = lo.shape[0]
        order = self._sort_order(hi, lo)
        hi = hi[order]
        lo = lo[order]
        payload = _gather_payload(self.kind, payload, order)

        diff = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        starts = jnp.concatenate([jnp.ones((1,), bool), diff])
        is_last = jnp.concatenate([diff, jnp.ones((1,), bool)])

        if self.kind == KIND_BIT:
            # segmented inclusive OR-scan: a run-start flag resets the merge
            def scan_op(a, b):
                fa, va = a
                fb, vb = b
                return fb | fa, jnp.where(fb[..., None], vb, va | vb)

            # flags is [C]; vals is [8, C] — scan runs along the C axis, which
            # is axis 0 of flags but axis 1 of vals, so transpose vals
            _, vals_s = jax.lax.associative_scan(scan_op, (starts, payload.T), axis=0)
            merged = vals_s.T
        elif self.kind == KIND_PROB:
            # ProbabilisticVoxel::reduce is a SEQUENTIAL saturating add: the
            # reference's reversed inclusive_scan (TemplateVoxelList.hpp:178-186)
            # seeds each run at its LAST entry and updateOccupancy()s backward,
            # clamping to [-127,127] at every step (ProbabilisticVoxel.hpp:51-57)
            # — intermediate clamps are observable, so sum-then-clamp is wrong
            # whenever a run's partial sums cross the clamp (and it corrupts a
            # lone UNKNOWN=-128 entry, which reduce never touches). Saturating
            # adds compose associatively as clamp maps g(x)=clamp(x+a, lo, hi):
            #   (g2∘g1)(x) = clamp(x + a1+a2, clamp(lo1+a2, lo2, hi2),
            #                                 clamp(hi1+a2, lo2, hi2))
            # so the exact sequential fold is an associative_scan over
            # (a, lo, hi) triples. Run-last entries enter as constant maps
            # (lo = hi = v), which both seeds the fold and segments the scan
            # (a constant annihilates everything composed before it).
            v32 = payload.astype(jnp.int32)
            a0 = jnp.where(is_last, 0, v32)
            l0 = jnp.where(is_last, v32, jnp.int32(MIN_PROBABILITY))
            h0 = jnp.where(is_last, v32, jnp.int32(MAX_PROBABILITY))

            def compose(f, g):  # g∘f, f applied first
                fa, fl, fh = f
                ga, gl, gh = g
                # |a|>255 already saturates every x in [-128,127]; the clip
                # only guards int32 overflow on very long runs
                return (
                    jnp.clip(fa + ga, -512, 512),
                    jnp.clip(fl + ga, gl, gh),
                    jnp.clip(fh + ga, gl, gh),
                )

            # reverse scan: at index i the composition covers i..end with
            # element i applied LAST; at a run start that is exactly the
            # newest-to-oldest saturated fold of the whole run (lo == hi)
            _, fold_at_start, _ = jax.lax.associative_scan(
                compose, (a0, l0, h0), axis=0, reverse=True
            )
            # route each run's fold (sitting at its start) to its last entry,
            # where the shared compaction below reads it
            idx = jnp.arange(c, dtype=jnp.int32)
            start_idx = jax.lax.associative_scan(
                jnp.maximum, jnp.where(starts, idx, -1), axis=0
            )
            merged = fold_at_start[start_idx].astype(jnp.int8)
        elif self.kind == KIND_COUNT:
            # CountingVoxel::reduce is a raw int8 wrapping add
            # (CountingVoxel.hpp:75-80) — associative and order-free: sum in
            # int32 and truncate once (two's-complement mod-256 wrap)
            v32 = payload.astype(jnp.int32)

            def scan_op(a, b):
                fa, va = a
                fb, vb = b
                return fb | fa, jnp.where(fb, vb, va + vb)

            _, merged32 = jax.lax.associative_scan(scan_op, (starts, v32), axis=0)
            merged = merged32.astype(jnp.int8)
        else:
            raise ValueError(self.kind)

        # last element of each run = fully merged payload
        valid = is_last & (lo != EMPTY_ID)
        # compaction: position = exclusive prefix sum of valid
        pos = jnp.cumsum(valid) - 1
        dest = jnp.where(valid, pos, c)  # dropped otherwise
        new_lo = jnp.full((c,), EMPTY_ID).at[dest].set(lo, mode="drop")
        new_hi = jnp.full((c,), EMPTY_ID).at[dest].set(hi, mode="drop")
        if self.kind == KIND_BIT:
            newp = jnp.zeros_like(merged).at[:, dest].set(merged, mode="drop")
        else:
            init = _payload_init(self.kind, c)
            newp = init.at[dest].set(merged, mode="drop")
        new_count = jnp.sum(valid).astype(jnp.int32)
        return new_hi, new_lo, newp, new_count

    # -- insertion --------------------------------------------------------
    @compiled("meaning", "grow", arrays=("points",))
    def insert_point_cloud(
        self, points, meaning=BitVoxelMeaning.eBVM_OCCUPIED, grow: bool = True
    ) -> "VoxelList":
        """Append + make_unique (TemplateVoxelList.hpp:142-209).

        ``grow=True`` mirrors the reference's thrust vectors: capacity grows
        by len(points) each call (every differently-sized result recompiles
        downstream programs). ``grow=False`` keeps the list's capacity fixed —
        the steady-state mode: a loop inserting M points into a capacity-C
        list compiles exactly one program. If the deduplicated content
        exceeds C, the largest ids are dropped and ``count`` saturates at C
        (entries are kept in sorted order, so the smallest ids survive).
        """
        points = jnp.asarray(points, jnp.float32)
        coords = map_to_voxels(points, self.side_length)
        new_hi, new_lo = self._ids_from_coords(coords)
        m = new_lo.shape[0]
        if self.kind == KIND_BIT:
            p = bitops.bit_plane(int(meaning))
            w = bitops.UINT32(bitops.bit_word(int(meaning)))
            newp = jnp.zeros((NUM_BIT_PLANES, m), jnp.uint32).at[p].set(w)
        elif self.kind == KIND_PROB:
            from ..constants import meaning_to_probability

            newp = jnp.full((m,), jnp.int8(meaning_to_probability(meaning)))
        else:
            newp = jnp.ones((m,), jnp.int8)
        hi = jnp.concatenate([self.ids_hi, new_hi])
        lo = jnp.concatenate([self.ids, new_lo])
        payload = jnp.concatenate([self.payload, newp], axis=-1)
        u_hi, u_lo, u_payload, count = self._make_unique(hi, lo, payload)
        out = replace(self, ids=u_lo, ids_hi=u_hi, payload=u_payload, count=count)
        return out if grow else out.with_capacity(self.capacity)

    def insert_coordinates(
        self, coords, meaning=BitVoxelMeaning.eBVM_OCCUPIED, grow: bool = True
    ) -> "VoxelList":
        pts = (jnp.asarray(coords, jnp.float32) + 0.5) * self.side_length
        return self.insert_point_cloud(pts, meaning, grow=grow)

    def insert_meta_point_cloud(self, meta, meanings=None, grow: bool = True) -> "VoxelList":
        if meanings is None:
            return self.insert_point_cloud(meta.points, grow=grow)
        if self.kind == KIND_BIT:
            # fused one-pass path (kernelInsertMetaPointCloudVoxelList with
            # per-subcloud meanings): all links scatter in ONE program
            sizes = [meta.get_cloud(i).shape[0] for i in range(meta.num_clouds)]
            per_point = np.repeat(np.asarray([int(m) for m in meanings], np.int32), sizes)
            return self.insert_point_cloud_with_meanings(meta.points, per_point, grow=grow)
        lst = self
        for i, meaning in enumerate(meanings):
            lst = lst.insert_point_cloud(meta.get_cloud(i), meaning, grow=grow)
        return lst

    @compiled("grow", arrays=("points", "meanings"))
    def insert_point_cloud_with_meanings(self, points, meanings, grow: bool = True) -> "VoxelList":
        """Fused PER-POINT-meaning bit insert: one compiled program for an
        arbitrary mixed-meaning cloud.

        This is the batched swept-volume insert for lists: the reference
        inserts a robot cloud per trajectory step with meaning
        eBVM_SWEPT_VOLUME_START + step % 249 in a host loop
        (gvl_ompl_planner_helper.cpp:102-137, RobotVsEnvironment.cpp:163-201);
        a loop here would recompile per growing list shape. Points colliding
        in one voxel OR their meaning bits (the TemplateVoxelList merge
        semantics, TemplateVoxelList.hpp:142-209). KIND_BIT lists only.
        """
        if self.kind != KIND_BIT:
            raise TypeError("per-point meanings require a bit-vector voxel list")
        points = jnp.asarray(points, jnp.float32)
        meanings = jnp.asarray(meanings, jnp.int32)
        coords = map_to_voxels(points, self.side_length)
        new_hi, new_lo = self._ids_from_coords(coords)
        m = new_lo.shape[0]
        plane = meanings // 32
        word = jnp.uint32(1) << (meanings % 32).astype(jnp.uint32)
        newp = (
            jnp.zeros((NUM_BIT_PLANES, m), jnp.uint32)
            .at[plane, jnp.arange(m)]
            .set(word)
        )
        hi = jnp.concatenate([self.ids_hi, new_hi])
        lo = jnp.concatenate([self.ids, new_lo])
        payload = jnp.concatenate([self.payload, newp], axis=-1)
        u_hi, u_lo, u_payload, count = self._make_unique(hi, lo, payload)
        out = replace(self, ids=u_lo, ids_hi=u_hi, payload=u_payload, count=count)
        return out if grow else out.with_capacity(self.capacity)

    def with_capacity(self, capacity: int) -> "VoxelList":
        """Re-fix capacity (truncating invalid tail / padding)."""
        c = self.capacity
        if capacity == c:
            return self
        if capacity > c:
            pad_ids = jnp.full((capacity - c,), EMPTY_ID)
            ids = jnp.concatenate([self.ids, pad_ids])
            ids_hi = jnp.concatenate([self.ids_hi, pad_ids])
            pad = _payload_init(self.kind, capacity - c)
            payload = jnp.concatenate([self.payload, pad], axis=-1)
            return replace(self, ids=ids, ids_hi=ids_hi, payload=payload)
        return replace(
            self,
            ids=self.ids[..., :capacity],
            ids_hi=self.ids_hi[..., :capacity],
            payload=self.payload[..., :capacity],
            count=jnp.minimum(self.count, capacity),
        )

    # -- membership / collision -------------------------------------------
    def _find_positions(self, other: "VoxelList", hi_q, lo_q):
        """Lower-bound positions + found mask of (hi_q, lo_q) in other."""
        if other.capacity == 0:
            return jnp.zeros(lo_q.shape, jnp.int32), jnp.zeros(lo_q.shape, bool)
        if self.id_mode == "morton" or other.id_mode == "morton":
            pos = _pair_searchsorted(other.ids_hi, other.ids, hi_q, lo_q)
        else:
            pos = jnp.searchsorted(other.ids, lo_q).astype(jnp.int32)
        pos = jnp.clip(pos, 0, other.capacity - 1)
        found = (
            (other.ids[pos] == lo_q)
            & (other.ids_hi[pos] == hi_q)
            & (lo_q != EMPTY_ID)
        )
        return pos, found

    def _membership(self, other: "VoxelList", offset=(0, 0, 0)) -> jnp.ndarray:
        """bool[C]: my id present in other (thrust::binary_search stencil)."""
        my_hi, my_lo = self.ids_hi, self.ids
        if tuple(offset) != (0, 0, 0):
            if self.id_mode == "morton":
                raise ValueError("offset not supported for morton lists")
            my_lo = my_lo + jnp.uint32(np.uint32(linear_offset(offset, self.dims) & 0xFFFFFFFF))
        _, found = self._find_positions(other, my_hi, my_lo)
        return found

    @compiled("offset")
    def _collide_voxellist(self, other: "VoxelList", offset=(0, 0, 0)) -> jnp.ndarray:
        return jnp.sum(self._membership(other, offset), dtype=jnp.uint32)

    @compiled("offset")
    def _collide_voxellist_cross_mode(
        self, other: "VoxelList", offset=(0, 0, 0)
    ) -> jnp.ndarray:
        """Linear-id list x morton-id list (either direction): compare in the
        OTHER list's key domain by re-encoding my entry coordinates. The
        reference cannot express this pair at all — BitVectorVoxelList and
        BitVectorMortonVoxelList are distinct template instantiations with no
        cross overload (common_defines.h:175-182) — and comparing raw ids
        across modes would silently report 0 collisions."""
        coords = self.entry_coords()
        if tuple(offset) != (0, 0, 0):
            coords = coords + jnp.asarray(offset, jnp.int32)
        hi_q, lo_q = other._ids_from_coords(coords)
        live = self.ids != EMPTY_ID
        # the re-encoding is only injective inside the target domain: a coord
        # outside a linear list's dims wraps onto a valid linear id (20 maps
        # to (4,1,0) on a 16-wide grid), and a negative coord scrambles the
        # morton spread — both would count phantom collisions
        if other.id_mode == "morton":
            bound = jnp.asarray((1 << 20,) * 3, jnp.int32)
        else:
            bound = jnp.asarray(other.dims, jnp.int32)
        live = live & jnp.all((coords >= 0) & (coords < bound), axis=-1)
        hi_q = jnp.where(live, hi_q, EMPTY_ID)
        lo_q = jnp.where(live, lo_q, EMPTY_ID)
        _, found = self._find_positions(other, hi_q, lo_q)
        return jnp.sum(found, dtype=jnp.uint32)

    def collide_with(self, other, offset=(0, 0, 0)) -> jnp.ndarray:
        """collideWith dispatch: list x list counts shared voxel ids
        (collideVoxellists, TemplateVoxelList.hpp:228-275); list x dense map
        is the per-entry lookup collide (CollidableWithBitVectorVoxelMap /
        CollidableWithProbVoxelMap on BitVoxelList, BitVoxelList.h:110-114,
        kernelCollideWithVoxelMap); list x octree forwards to the octree
        probe at self's coords + offset (CollidableWithBitVectorOctree,
        CollisionInterfaces.h:231-243 — the reference implements the mixin
        only inside GvlNTree, so the list side dispatches to it)."""
        from .hierarchical import _PyramidQueries
        from .paged import PagedHierarchicalMap
        from .voxelmap import BitVectorVoxelMap, ProbVoxelMap

        if isinstance(other, (_PyramidQueries, PagedHierarchicalMap)):
            return other.collide_with(self, offset=offset)
        if isinstance(other, (BitVectorVoxelMap, ProbVoxelMap)):
            return self.collide_with_dense(other, offset=offset)
        if isinstance(other, VoxelList) and other.id_mode != self.id_mode:
            return self._collide_voxellist_cross_mode(other, offset)
        return self._collide_voxellist(other, offset)

    def _coarse_pair_keys(self, coords: jnp.ndarray, level: int, valid: jnp.ndarray):
        """(hi, lo) uint32 sort keys of 2^level-coarse cells; invalid -> EMPTY.

        Coarse coords use 20 bits per axis (the morton60 coordinate domain):
        lo = cy[0:12] << 20 | cx, hi = cz << 8 | cy[12:20].
        """
        c = coords.astype(jnp.int32) >> int(level)
        in_range = valid & jnp.all((c >= 0) & (c < (1 << 20)), axis=-1)
        cu = c.astype(jnp.uint32)
        cx, cy, cz = cu[..., 0], cu[..., 1], cu[..., 2]
        lo = ((cy & jnp.uint32(0xFFF)) << 20) | cx
        hi = (cz << 8) | (cy >> 12)
        lo = jnp.where(in_range, lo, EMPTY_ID)
        hi = jnp.where(in_range, hi, EMPTY_ID)
        return hi, lo

    @compiled("coll_threshold", "resolution_level", "offset")
    def collide_with_resolution(
        self, other, coll_threshold: float = 1.0, resolution_level: int = 0, offset=(0, 0, 0)
    ):
        """collideWithResolution for lists (CollisionInterfaces.h:160-186).

        The reference declares the mixin for BitVectorVoxelList but implements
        it only in GvlNTree (where the level is validated then ignored,
        GvlNTree.hpp:221-243); here the documented halve-per-level contract is
        real: counts DISTINCT 2^level-coarse cells occupied by both sides.
        Works against another VoxelList or a dense map. offset is in
        fine-voxel units and translates self's occupied set by -offset
        (left[i+off] vs right[i] semantics)."""
        lvl = int(resolution_level)
        n_a = self.capacity
        if n_a == 0:
            return jnp.uint32(0)
        coords_a = self.entry_coords() - jnp.asarray(offset, jnp.int32)
        valid_a = jnp.arange(n_a) < self.count
        ha, la = self._coarse_pair_keys(coords_a, lvl, valid_a)
        # dedup self's coarse cells (entries are fine-sorted; coarse keys are
        # not, so sort the pair then mark first occurrences)
        order1 = jnp.argsort(la, stable=True)
        order2 = jnp.argsort(ha[order1], stable=True)
        order = order1[order2]
        ha, la = ha[order], la[order]
        # valid keys always have hi < 2^28 (cz<<8 | cy>>12), so hi==EMPTY
        # exactly identifies invalid/padded entries
        first = jnp.concatenate(
            [jnp.ones((1,), bool), (ha[1:] != ha[:-1]) | (la[1:] != la[:-1])]
        ) & (ha != EMPTY_ID)

        from .voxelmap import BitVectorVoxelMap, ProbVoxelMap
        from ..constants import float_to_probability
        from ..ops import collide as collide_ops

        if isinstance(other, VoxelList):
            n_b = other.capacity
            valid_b = jnp.arange(n_b) < other.count
            hb, lb = other._coarse_pair_keys(other.entry_coords(), lvl, valid_b)
            o1 = jnp.argsort(lb, stable=True)
            o2 = jnp.argsort(hb[o1], stable=True)
            ob = o1[o2]
            hb, lb = hb[ob], lb[ob]
            if n_b == 0:
                return jnp.uint32(0)
            pos = jnp.clip(_pair_searchsorted(hb, lb, ha, la), 0, n_b - 1)
            found = (hb[pos] == ha) & (lb[pos] == la)
            return jnp.sum(first & found, dtype=jnp.uint32)
        if isinstance(other, ProbVoxelMap):
            mask = collide_ops.prob_occupied(other.data, float_to_probability(coll_threshold))
        elif isinstance(other, BitVectorVoxelMap):
            mask = other.occupied_mask()
        else:
            raise TypeError(f"cannot collide VoxelList with {type(other)}")
        dx, dy, dz = other.dims
        pooled = collide_ops.or_pool(mask.reshape(dz, dy, dx), lvl)
        cz_, cy_, cx_ = pooled.shape
        c = (coords_a >> lvl).astype(jnp.int32)
        in_map = (
            valid_a
            & jnp.all(c >= 0, axis=-1)
            & (c[:, 0] < cx_) & (c[:, 1] < cy_) & (c[:, 2] < cz_)
        )
        flat = jnp.clip(c[:, 2] * (cy_ * cx_) + c[:, 1] * cx_ + c[:, 0], 0, cz_ * cy_ * cx_ - 1)
        hit = pooled.reshape(-1)[flat] & in_map
        # distinct coarse cells only: reuse the dedup mask computed above
        hit = hit[order]
        return jnp.sum(first & hit, dtype=jnp.uint32)

    def _require_same_id_mode(self, other, op: str) -> None:
        """Raw-id comparisons across linear/morton modes would silently match
        nothing; the reference's BitVectorVoxelList and BitVectorMortonVoxelList
        are distinct template types with no cross overload
        (common_defines.h:175-182), so refuse loudly. Plain collide_with DOES
        support the cross-mode pair (by coordinate re-encoding)."""
        if isinstance(other, VoxelList) and other.id_mode != self.id_mode:
            raise TypeError(
                f"{op}: id modes differ (self={self.id_mode!r}, "
                f"other={other.id_mode!r}); convert one list first"
            )

    def find_matching(self, other: "VoxelList"):
        """findMatchingVoxels (BitVoxelList.hpp:397-476): gather payload pairs
        at shared ids. Returns (mask[C], other_payload gathered to my frame)."""
        self._require_same_id_mode(other, "find_matching")
        pos, mask = self._find_positions(other, self.ids_hi, self.ids)
        other_payload = _gather_payload(other.kind, other.payload, pos)
        return mask, other_payload

    @compiled()
    def collide_with_types(self, other: "VoxelList"):
        """collideWithTypes (BitVoxelList.hpp:102-126): AND matched bitvectors,
        OR-reduce into types-in-collision. Returns (count, meanings[8])."""
        assert self.kind == KIND_BIT and other.kind == KIND_BIT
        mask, otherp = self.find_matching(other)
        # reference reduce_op is OR of the two voxels' vectors (matched pairs)
        merged = jnp.where(mask[None, :], self.payload | otherp, jnp.uint32(0))
        meanings = jnp.bitwise_or.reduce(merged, axis=1)
        return jnp.sum(mask, dtype=jnp.uint32), meanings

    @compiled("margin", "sv_offset")
    def collide_with_bitcheck(self, other: "VoxelList", margin: int = 0, sv_offset: int = 0):
        """collideWithBitcheck (BitVoxelList.hpp:268-297): same-bit collision
        with +-margin window over matched voxels."""
        assert self.kind == KIND_BIT and other.kind == KIND_BIT
        mask, otherp = self.find_matching(other)
        if sv_offset == 0:
            hit, _ = bitops.bit_margin_collision_check_packed(self.payload, otherp, margin)
        else:
            hit, _ = bitops.bit_margin_collision_check_packed_full(
                self.payload, otherp, bitops.zeros((self.capacity,)), margin, sv_offset
            )
        return jnp.sum(hit & mask, dtype=jnp.uint32)

    @compiled()
    def collide_counting_per_meaning(self, other: "VoxelList"):
        """collideCountingPerMeaning (BitVoxelList.hpp:301-395): per-meaning
        collision counts. Returns int32[256]."""
        assert self.kind == KIND_BIT and other.kind == KIND_BIT
        mask, otherp = self.find_matching(other)
        anded = jnp.where(mask[None, :], self.payload & otherp, jnp.uint32(0))
        bits = bitops.unpack(anded)  # [C, 256]
        return jnp.sum(bits, axis=0, dtype=jnp.int32)

    def _linear_ids_for(self, dense_dims) -> jnp.ndarray:
        """Entry ids as dense linear indices of a map with dense_dims."""
        if self.id_mode == "morton":
            coords = self.entry_coords()
            dx, dy, _ = dense_dims
            return (
                coords[:, 2].astype(jnp.uint32) * jnp.uint32(dx * dy)
                + coords[:, 1].astype(jnp.uint32) * jnp.uint32(dx)
                + coords[:, 0].astype(jnp.uint32)
            )
        return self.ids

    @compiled("coll_threshold", "offset")
    def collide_with_dense(self, dense_map, coll_threshold: float = 1.0, offset=(0, 0, 0)):
        """List x dense map lookup collide (kernelCollideWithVoxelMap,
        voxellist/kernels/VoxelListOperations.h:90-160)."""
        from ..constants import float_to_probability
        from .voxelmap import BitVectorVoxelMap, ProbVoxelMap

        lin = self._linear_ids_for(dense_map.dims)
        if tuple(offset) != (0, 0, 0):
            lin = lin + jnp.uint32(np.uint32(linear_offset(offset, dense_map.dims) & 0xFFFFFFFF))
        n = dense_map.voxelmap_size
        valid = (lin < n) & (self.ids != EMPTY_ID)
        idx = jnp.where(valid, lin, 0).astype(jnp.int32)
        if isinstance(dense_map, ProbVoxelMap):
            t = float_to_probability(coll_threshold)
            occ = dense_map.data[idx].astype(jnp.int32) >= t
        elif isinstance(dense_map, BitVectorVoxelMap):
            vox = dense_map.data[:, idx]
            occ = bitops.occupied(vox)
        else:
            raise TypeError(type(dense_map))
        mine = self._entry_occupied()
        return jnp.sum(occ & valid & mine, dtype=jnp.uint32)

    @compiled("coll_threshold", "offset")
    def collide_with_type_mask(
        self, dense_map, types_to_check, coll_threshold: float = 1.0, offset=(0, 0, 0)
    ):
        """collideWithTypeMask (BitVoxelList.hpp:219-262): like the dense-map
        collide, but only list entries whose bit vector intersects the given
        type mask participate. `types_to_check` is a uint32[8] plane vector
        (use bitops.set_bit on bitops.zeros(()))."""
        assert self.kind == KIND_BIT
        mask = jnp.asarray(types_to_check, jnp.uint32).reshape(NUM_BIT_PLANES, 1)
        matches = ~bitops.is_zero(self.payload & mask)
        from ..constants import float_to_probability
        from .voxelmap import BitVectorVoxelMap, ProbVoxelMap

        lin = self._linear_ids_for(dense_map.dims)
        if tuple(offset) != (0, 0, 0):
            lin = lin + jnp.uint32(np.uint32(linear_offset(offset, dense_map.dims) & 0xFFFFFFFF))
        n = dense_map.voxelmap_size
        valid = (lin < n) & (self.ids != EMPTY_ID)
        idx = jnp.where(valid, lin, 0).astype(jnp.int32)
        if isinstance(dense_map, ProbVoxelMap):
            t = float_to_probability(coll_threshold)
            occ = dense_map.data[idx].astype(jnp.int32) >= t
        elif isinstance(dense_map, BitVectorVoxelMap):
            # gather the maintained summary (1 byte/entry) when present
            # instead of 8 plane words per entry
            if dense_map.occ is not None:
                occ = dense_map.occ[idx] != 0
            else:
                occ = bitops.occupied(dense_map.data[:, idx])
        else:
            raise TypeError(type(dense_map))
        return jnp.sum(occ & valid & matches, dtype=jnp.uint32)

    def _entry_occupied(self) -> jnp.ndarray:
        if self.kind == KIND_BIT:
            return bitops.occupied(self.payload)
        if self.kind == KIND_PROB:
            return self.payload.astype(jnp.int32) >= 100  # DefaultCollider default
        return self.payload.astype(jnp.int32) > 0

    # -- set operations -----------------------------------------------------
    def merge(
        self,
        other: "VoxelList",
        offset=(0, 0, 0),
        new_meaning=None,
        metric_offset=None,
    ) -> "VoxelList":
        """Append + make_unique (TemplateVoxelList.hpp:537-607).

        The appended entries may be shifted by a signed voxel offset
        (applyOffsetOperator, TemplateVoxelList.h:66-89: the linear id gets
        the signed linear offset added, uint32 wraparound for out-of-range)
        and/or overwritten with a single-meaning payload before dedup
        (thrust::fill of a one-bit voxel, TemplateVoxelList.hpp:585-590 —
        bit lists only, as in the reference). `metric_offset` is the
        Vector3f overload (hpp:603-607): floor(metric / side_length) per
        axis via mapToVoxelsSigned (kernels/VoxelMapOperations.h:137-145).
        """
        assert self.kind == other.kind
        self._require_same_id_mode(other, "merge")
        if metric_offset is not None:
            offset = tuple(
                int(np.floor(float(m) / self.side_length)) for m in metric_offset
            )
        o_hi, o_lo, o_payload = other.ids_hi, other.ids, other.payload
        valid = o_lo != EMPTY_ID
        if tuple(offset) != (0, 0, 0):
            if self.id_mode == "morton":
                raise ValueError("offset not supported for morton lists")
            shift = jnp.uint32(np.uint32(linear_offset(offset, self.dims) & 0xFFFFFFFF))
            o_lo = jnp.where(valid, o_lo + shift, o_lo)
        if new_meaning is not None:
            if self.kind != KIND_BIT:
                raise TypeError("new_meaning applies to bit lists only")
            fill = jnp.zeros_like(o_payload).at[bitops.bit_plane(int(new_meaning))].set(
                bitops.UINT32(bitops.bit_word(int(new_meaning)))
            )
            o_payload = jnp.where(valid[None, :], fill, o_payload)
        hi = jnp.concatenate([self.ids_hi, o_hi])
        lo = jnp.concatenate([self.ids, o_lo])
        payload = jnp.concatenate([self.payload, o_payload], axis=-1)
        u_hi, u_lo, u_payload, count = self._make_unique(hi, lo, payload)
        merged = replace(self, ids=u_lo, ids_hi=u_hi, payload=u_payload, count=count)
        return merged.with_capacity(self.capacity + other.capacity)

    def memory_usage(self) -> int:
        """getMemoryUsage (TemplateVoxelList.h): device bytes of the list."""
        return int(
            self.ids.size * self.ids.dtype.itemsize
            + self.ids_hi.size * self.ids_hi.dtype.itemsize
            + self.payload.size * self.payload.dtype.itemsize
        )

    def subtract(self, other: "VoxelList", offset=(0, 0, 0), metric_offset=None) -> "VoxelList":
        """Remove entries present in other (TemplateVoxelList.hpp:610-643).
        `metric_offset` is the Vector3f overload: floor(metric/side) voxels."""
        self._require_same_id_mode(other, "subtract")
        if metric_offset is not None:
            offset = tuple(
                int(np.floor(float(m) / self.side_length)) for m in metric_offset
            )
        member = self._membership(other, offset)
        return self._compact(~member & (self.ids != EMPTY_ID))

    def shrink_to_fit(self) -> "VoxelList":
        """shrinkToFit (TemplateVoxelList.h:153): re-fix capacity to the live
        entry count (host sync on the traced count)."""
        return self.with_capacity(max(int(self.count), 1))

    def resize(self, new_size: int) -> "VoxelList":
        """resize (TemplateVoxelList.h:151): re-fix the backing capacity —
        growing pads EMPTY entries, shrinking truncates the sorted tail."""
        return self.with_capacity(int(new_size))

    def needs_rebuild(self) -> bool:
        """GpuVoxelsMap contract (AbstractVoxelList returns false): the list
        is kept sorted+compact after every insert."""
        return False

    def rebuild(self) -> "VoxelList":
        return self

    def insert_robot_configuration(self, robot_links, with_self_collision_test: bool = False):
        """insertRobotConfiguration (GpuVoxelsMap contract; unsupported in
        the reference's lists). Returns (new_list, ok)."""
        clash = jnp.zeros((), bool)
        if with_self_collision_test:
            seen = None
            for i in range(robot_links.num_clouds):
                # scratch list in self's own id mode: a LINEAR scratch would
                # raise at morton-scale dims (> 2^32 voxels)
                cur = VoxelList.create(
                    self.dims, self.side_length, kind=KIND_BIT, id_mode=self.id_mode
                ).insert_point_cloud(robot_links.get_cloud(i))
                if seen is not None:
                    clash = clash | (seen.collide_with(cur) > 0)
                    seen = seen.merge(cur)
                else:
                    seen = cur
        return self.insert_meta_point_cloud(robot_links), ~clash

    def clear_voxel_meaning(self, meaning) -> "VoxelList":
        """clearBitVoxelMeaning. The reference stubs this NOT_YET_SUPPORTED
        on lists (BitVoxelList.hpp:65-68); here it clears the meaning bit in
        every entry and drops entries whose bitvector becomes empty."""
        assert self.kind == KIND_BIT
        m = int(meaning)
        newp = self.payload.at[m >> 5].set(
            self.payload[m >> 5] & ~jnp.uint32(1 << (m & 31))
        )
        live = jnp.any(newp != 0, axis=0) & (self.ids != EMPTY_ID)
        return replace(self, payload=newp)._compact(live)

    def remove_underpopulated(self, threshold: int) -> "VoxelList":
        """CountingVoxelList::remove_underpopulated (CountingVoxelList.h:58)."""
        assert self.kind == KIND_COUNT
        keep = (self.payload.astype(jnp.int32) >= int(threshold)) & (self.ids != EMPTY_ID)
        return self._compact(keep)

    def _compact(self, keep: jnp.ndarray) -> "VoxelList":
        c = self.capacity
        pos = jnp.cumsum(keep) - 1
        dest = jnp.where(keep, pos, c)
        new_ids = jnp.full((c,), EMPTY_ID).at[dest].set(self.ids, mode="drop")
        new_hi = jnp.full((c,), EMPTY_ID).at[dest].set(self.ids_hi, mode="drop")
        if self.kind == KIND_BIT:
            newp = jnp.zeros_like(self.payload).at[:, dest].set(self.payload, mode="drop")
        else:
            newp = _payload_init(self.kind, c).at[dest].set(self.payload, mode="drop")
        return replace(
            self, ids=new_ids, ids_hi=new_hi, payload=newp,
            count=jnp.sum(keep).astype(jnp.int32),
        )

    def equals(self, other: "VoxelList") -> jnp.ndarray:
        self._require_same_id_mode(other, "equals")
        if self.capacity != other.capacity:
            common = min(self.capacity, other.capacity)
            a, b = self.with_capacity(common), other.with_capacity(common)
            return a.equals(b)
        same_ids = jnp.all((self.ids == other.ids) & (self.ids_hi == other.ids_hi))
        same_payload = jnp.all(self.payload == other.payload)
        return same_ids & same_payload & (self.count == other.count)

    # -- maintenance ----------------------------------------------------------
    def clear_map(self) -> "VoxelList":
        return replace(
            self,
            ids=jnp.full((self.capacity,), EMPTY_ID),
            ids_hi=jnp.full((self.capacity,), EMPTY_ID),
            payload=_payload_init(self.kind, self.capacity),
            count=jnp.int32(0),
        )

    def shift_left_swept_volume_ids(self, shift_size: int) -> "VoxelList":
        assert self.kind == KIND_BIT
        return replace(self, payload=bitops.perform_left_shift(self.payload, shift_size))

    def screendump(self, max_entries: int = 32) -> str:
        n = int(self.count)
        coords = np.asarray(
            self.coords_from_ids(self.ids[:max_entries], self.ids_hi[:max_entries])
        )
        lines = [f"VoxelList(kind={self.kind}, count={n}, capacity={self.capacity})"]
        for i in range(min(n, max_entries)):
            lines.append(f"  id={int(np.asarray(self.ids[i]))} xyz={coords[i].tolist()}")
        return "\n".join(lines)


def bit_vector_voxel_list(dims, side_length=1.0, capacity=0) -> VoxelList:
    return VoxelList.create(dims, side_length, KIND_BIT, capacity, "linear")


def bit_vector_morton_voxel_list(dims, side_length=1.0, capacity=0) -> VoxelList:
    return VoxelList.create(dims, side_length, KIND_BIT, capacity, "morton")


def prob_voxel_list(dims, side_length=1.0, capacity=0) -> VoxelList:
    return VoxelList.create(dims, side_length, KIND_PROB, capacity, "linear")


def counting_voxel_list(dims, side_length=1.0, capacity=0) -> VoxelList:
    return VoxelList.create(dims, side_length, KIND_COUNT, capacity, "linear")
