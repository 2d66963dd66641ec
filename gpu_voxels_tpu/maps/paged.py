"""Paged hierarchical map: octree-scale addressability on TPU.

The reference NTree spans 15 levels = 32768^3 virtual voxels with sparse
node allocation (octree/DataTypes.h, common_defines.h:189-191). The dense
status pyramid (maps/hierarchical.py) hits a memory wall near 1024^3, so
this tier splits the world VDB-style into dense-coarse + two sparse-fine
levels:

  * a 64^3-page coarse grid carries a dense status pyramid (a 32768^3 world
    is a 512^3 page grid = 134 MB of statuses; a 4096^3 world is 64^3 =
    262 KB), answering every query a uniform page can decide;
  * allocated pages own a 512-entry block-summary byte row and a 512-entry
    block->tile-slot row (sparse over pages, dense within a page);
  * mixed 8^3 blocks own an 8^3 tile of per-voxel status bytes in a fixed
    pool. Fine storage scales with occupied surface, not volume.

Tiles/pages are allocated by the host (inserts are host API calls already);
all bulk work — voxelizing, scattering statuses, rebuilding block/page
summaries and the coarse pyramid, probing — runs on device. Probes are pure
gathers: coarse pyramid descent, then a sorted-page-key binary search ->
block summary -> tile for undecided points. Status bytes are the
deterministic tier's (hard FREE/UNKNOWN/OCCUPIED + ns_STATIC_MAP/
ns_DYNAMIC_MAP flags, EnvironmentNodes.h:225-290); byte 0 = never-written =
UNKNOWN.

Capacity: virtual dims to 65536^3 (page keys must fit int32; the dense page
pyramid at 65536^3 is 1 GiB — 32768^3 and below is the practical envelope),
meeting and exceeding the reference's 15-level / 32768^3 NTree. min_level
probes resolve exactly at every level: >= 6 on the dense pyramid, 3-5 by
OR-ing block summaries, 0-2 inside tiles (kernel_Octree.h:383-423
semantics).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BitVoxelMeaning, MapType
from ..ops.insert import map_to_voxels
from .hierarchical import (
    NS_DYNAMIC_MAP,
    NS_FREE,
    NS_OCCUPIED,
    NS_STATIC_MAP,
    NS_UNKNOWN,
    STATUS_OCCUPANCY_MASK,
    U8,
    _build_pyramid,
    _is_uniform,
    _num_levels,
    _pad_dims,
)

Dims = Tuple[int, int, int]
B = 8  # tile edge (fine voxels per block axis)
SB = 8  # page edge (blocks per page axis); page covers (B*SB)^3 = 64^3 voxels
PAGE = SB * SB * SB
TILE = B * B * B
PAGE_EDGE = B * SB


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PagedSnapshot:
    """Immutable pytree view of a PagedHierarchicalMap's device state.

    This is what jitted consumers take as an ARGUMENT (the map itself is not
    a pytree because the host grows its arrays between steps). E.g. the
    motion-validity checkers probe a snapshot of a 32768^3 world inside one
    compiled batch program. All probe machinery lives here; the map
    delegates."""

    pyramid: Tuple[jnp.ndarray, ...]
    skeys: jnp.ndarray
    srows: jnp.ndarray
    pages: jnp.ndarray
    block_summaries: jnp.ndarray
    pool: jnp.ndarray
    dims: Dims = field(metadata=dict(static=True))
    sdims: Dims = field(metadata=dict(static=True))
    levels: int = field(metadata=dict(static=True))
    side_length: float = field(metadata=dict(static=True))

    def _page_rows_of(self, coords: jnp.ndarray):
        """(page_row, found) for fine coords via the sorted page-key table."""
        sx, sy, _ = self.sdims
        pc = coords // PAGE_EDGE
        skey = (pc[..., 2] * sy + pc[..., 1]) * sx + pc[..., 0]
        pos = jnp.clip(jnp.searchsorted(self.skeys, skey), 0, self.skeys.shape[0] - 1)
        found = self.skeys[pos] == skey
        return jnp.where(found, self.srows[pos], 0), found

    def probe_status(self, coords: jnp.ndarray, min_level: int = 0) -> jnp.ndarray:
        """Status byte per fine voxel coordinate. Levels >= 6 descend the
        dense page pyramid only; levels 3-5 refine through block summaries
        (OR over the 2^(l-3) block cube); levels 0-2 refine through the tile
        pool (0 = exact voxel, 1/2 = OR over the 2^l cube — the NTree
        min_level semantics, kernel_Octree.h:383-423)."""
        coords = jnp.asarray(coords, jnp.int32)
        pc = coords // PAGE_EDGE
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        decided = jnp.zeros(x.shape, bool)
        status = jnp.zeros(x.shape, U8)
        stop = max(min_level - 6, 0)
        for l in range(self.levels, stop - 1, -1):
            s = self.pyramid[l][z >> l, y >> l, x >> l]
            uni = _is_uniform(s) | (l == stop)
            take = uni & ~decided
            status = jnp.where(take, s, status)
            decided = decided | uni
        if min_level >= 6:
            return status

        # refine undecided (mixed-page) points through the block summaries
        needs = ~_is_uniform(status)
        page_row, found = self._page_rows_of(coords)
        bc = coords // B
        if min_level >= 3:
            # OR over the aligned 2^(l-3) block cube (always within one page)
            r = 1 << (min_level - 3)
            wb = bc % SB
            base = (wb // r) * r
            blk = jnp.zeros(x.shape, U8)
            for dz in range(r):
                for dy in range(r):
                    for dx in range(r):
                        widx = (
                            (base[..., 2] + dz) * (SB * SB)
                            + (base[..., 1] + dy) * SB
                            + (base[..., 0] + dx)
                        )
                        blk = blk | self.block_summaries[page_row, widx]
            blk = jnp.where((blk & U8(STATUS_OCCUPANCY_MASK)) == 0, blk | U8(NS_UNKNOWN), blk)
            return jnp.where(needs & found, blk, status)

        within_s = ((bc[..., 2] % SB) * SB + (bc[..., 1] % SB)) * SB + bc[..., 0] % SB
        blk = self.block_summaries[page_row, within_s]
        blk = jnp.where((blk & U8(STATUS_OCCUPANCY_MASK)) == 0, blk | U8(NS_UNKNOWN), blk)
        blk_uniform = _is_uniform(blk)

        # refine undecided (mixed-block) points through the tile pool
        slot = self.pages[page_row, within_s]
        have_tile = found & (slot >= 0)
        slot = jnp.maximum(slot, 0)
        wc = coords % B
        fine = jnp.zeros(x.shape, U8)
        r = 1 << min_level
        base = (wc // r) * r
        for dz in range(r):
            for dy in range(r):
                for dx in range(r):
                    widx = (
                        (base[..., 2] + dz) * (B * B)
                        + (base[..., 1] + dy) * B
                        + (base[..., 0] + dx)
                    )
                    fine = fine | self.pool[slot, widx]
        fine = jnp.where((fine & U8(STATUS_OCCUPANCY_MASK)) == 0, fine | U8(NS_UNKNOWN), fine)
        refined = jnp.where(blk_uniform | ~have_tile, blk, fine)
        return jnp.where(needs & found, refined, status)

    def probe(self, coords: jnp.ndarray, min_level: int = 0):
        status = self.probe_status(coords, min_level)
        occupied = (status & U8(NS_OCCUPIED)) != 0
        unknown = ((status & U8(NS_UNKNOWN)) != 0) & ~occupied
        free = (status & U8(STATUS_OCCUPANCY_MASK)) == U8(NS_FREE)
        return occupied, unknown, free


# -- compiled programs (module-level so the jit cache is shared) --------------
# Each eager op on the relayed TPU pays seconds of dispatch+compile latency,
# so the map's device work is consolidated into a handful of jitted programs.
# Shapes are stabilized (pow2-padded points, capacity-sized state arrays) so
# recompiles happen only on capacity doublings / new batch sizes.


def _pad_points_pow2(pts: jnp.ndarray) -> jnp.ndarray:
    """Pad [N,3] float points to the next power of two with far-outside
    sentinels (dropped by the inside mask downstream)."""
    n = max(int(pts.shape[0]), 1)
    cap = 1 << (n - 1).bit_length()
    if cap == pts.shape[0]:
        return pts
    pad = jnp.full((cap - pts.shape[0], 3), -1e9, pts.dtype)
    return jnp.concatenate([pts, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("side_length", "dims"))
def _voxelize_points(pts, side_length: float, dims: Dims):
    coords = map_to_voxels(pts, side_length)
    dims_arr = jnp.asarray(dims, jnp.int32)
    inside = jnp.all((coords >= 0) & (coords < dims_arr), axis=-1)
    return jnp.clip(coords, 0, dims_arr - 1), inside


@functools.partial(jax.jit, static_argnames=("sdims", "occ_bit", "flag"))
def _scatter_pool(pool, pages, skeys, srows, coords, inside, sdims: Dims,
                  occ_bit: int, flag: int):
    """Point -> page row -> tile slot -> hard status set, one program."""
    sx, sy, _ = sdims
    pc = coords // PAGE_EDGE
    skey = (pc[:, 2] * sy + pc[:, 1]) * sx + pc[:, 0]
    pos = jnp.clip(jnp.searchsorted(skeys, skey), 0, skeys.shape[0] - 1)
    found = skeys[pos] == skey
    page_row = jnp.where(found, srows[pos], 0)
    blocks = coords // B
    within_s = ((blocks[:, 2] % SB) * SB + (blocks[:, 1] % SB)) * SB + blocks[:, 0] % SB
    slot = pages[page_row, within_s]
    ok = inside & found & (slot >= 0)
    slot = jnp.maximum(slot, 0)
    within = ((coords[:, 2] % B) * B + (coords[:, 1] % B)) * B + coords[:, 0] % B
    old = pool[slot, within]
    new = (old & U8(0xFF ^ STATUS_OCCUPANCY_MASK)) | U8(occ_bit | flag)
    slot = jnp.where(ok, slot, pool.shape[0])
    return pool.at[slot, within].set(new, mode="drop")


@functools.partial(jax.jit, static_argnames=("coarse_shape", "levels"))
def _rebuild_programs(pool, slot_page, slot_within, page_coord, n_slots, n_pages,
                      coarse_shape, levels: int):
    """Tile summaries -> block summaries -> page statuses -> pyramid, one
    program over capacity-sized arrays (counts are dynamic scalars)."""
    cap_slots = pool.shape[0]
    cap_pages = page_coord.shape[0]
    summary = jnp.bitwise_or.reduce(pool, axis=1)
    summary = summary | jnp.where(jnp.any(pool == 0, axis=1), U8(NS_UNKNOWN), U8(0))
    valid_s = jnp.arange(cap_slots, dtype=jnp.int32) < n_slots
    bs = jnp.zeros((cap_pages, PAGE), jnp.uint8)
    bs = bs.at[jnp.where(valid_s, slot_page, cap_pages), slot_within].set(
        summary, mode="drop"
    )
    page_status = jnp.bitwise_or.reduce(bs, axis=1)
    page_status = page_status | jnp.where(jnp.any(bs == 0, axis=1), U8(NS_UNKNOWN), U8(0))
    valid_p = jnp.arange(cap_pages, dtype=jnp.int32) < n_pages
    zi = jnp.where(valid_p, page_coord[:, 2], coarse_shape[0])
    coarse0 = jnp.full(coarse_shape, U8(NS_UNKNOWN))
    coarse0 = coarse0.at[zi, page_coord[:, 1], page_coord[:, 0]].set(
        page_status, mode="drop"
    )
    return bs, tuple(_build_pyramid(coarse0, levels))


@functools.partial(jax.jit, static_argnames=("coarse_shape", "levels"))
def _empty_pyramid(coarse_shape, levels: int):
    return tuple(_build_pyramid(jnp.full(coarse_shape, U8(NS_UNKNOWN)), levels))


@functools.partial(jax.jit, static_argnames=("side_length", "dims", "max_steps"))
def _free_ray_cells(pts, origin, side_length: float, dims: Dims, max_steps: int):
    """[S,N,3] visited voxel coords + [S,N] live mask for origin->point rays
    (one dominant-axis voxel per step, endpoint excluded)."""
    side = jnp.float32(side_length)
    start_v = origin / side
    delta = pts / side - start_v[None, :]
    dominant = jnp.max(jnp.abs(delta), axis=-1)
    n_steps = jnp.ceil(dominant).astype(jnp.int32)
    inv = jnp.where(n_steps > 0, 1.0 / jnp.maximum(n_steps.astype(jnp.float32), 1.0), 0.0)
    step_vec = delta * inv[:, None]
    ks = jnp.arange(max_steps, dtype=jnp.int32)
    pos = start_v[None, None, :] + step_vec[None, :, :] * ks[:, None, None].astype(jnp.float32)
    # clamp before the int cast: padded sentinel points otherwise produce
    # float->int32 overflow (undefined, could wrap into range)
    coords = jnp.floor(jnp.clip(pos, -1.0, 2.0**30)).astype(jnp.int32)
    dims_arr = jnp.asarray(dims, jnp.int32)
    live = (ks[:, None] < n_steps[None, :]) & jnp.all(
        (coords >= 0) & (coords < dims_arr), axis=-1
    )
    return coords, live


_probe_status_jit = jax.jit(PagedSnapshot.probe_status, static_argnames=("min_level",))
_probe_jit = jax.jit(PagedSnapshot.probe, static_argnames=("min_level",))


class PagedHierarchicalMap:
    """Sparse deterministic hierarchical map (GvlNTree-scale worlds).

    Not a pytree: the host grows the pool/page arrays between jitted steps.
    Device state: coarse status pyramid over pages, sorted page-key table
    (skeys/srows int32[NP]), per-page block->slot rows (pages int32[NP,512])
    and block summaries (uint8[NP,512]), tile pool uint8[NT,512].
    """

    def __init__(self, dims: Dims, side_length: float = 1.0):
        if any(d % PAGE_EDGE for d in dims):
            raise ValueError(f"dims must be multiples of {PAGE_EDGE}")
        if (dims[0] // PAGE_EDGE) * (dims[1] // PAGE_EDGE) * (dims[2] // PAGE_EDGE) >= 2**31:
            raise ValueError("page count must fit int32 (dims <= 65536^3)")
        self.dims = tuple(int(d) for d in dims)
        self.side_length = float(side_length)
        self.map_type = MapType.MT_BITVECTOR_OCTREE
        self.cdims = tuple(d // B for d in self.dims)  # blocks per axis (x,y,z)
        self.sdims = tuple(d // PAGE_EDGE for d in self.dims)  # pages per axis
        # cap 16 (not the dense tier's 8): a 65536^3 world has a 1024^3 page
        # grid and needs 10 pyramid levels to reach a single root cell
        self.levels = _num_levels(self.sdims, cap=16)
        pd = _pad_dims(self.sdims, self.levels)
        self._coarse_shape = (pd[2], pd[1], pd[0])
        self.pyramid = _empty_pyramid(self._coarse_shape, self.levels)
        # sparse page directory (sorted int32 keys for device binary search)
        self.skeys = jnp.full((1,), jnp.int32(2**31 - 1))
        self.srows = jnp.zeros((1,), jnp.int32)
        self.pages = jnp.full((1, PAGE), jnp.int32(-1))  # block -> tile slot
        self.block_summaries = jnp.zeros((1, PAGE), jnp.uint8)
        self.page_coord = jnp.zeros((1, 3), jnp.int32)  # (px, py, pz) per page row
        self.pool = jnp.zeros((1, TILE), jnp.uint8)
        self.slot_block = jnp.zeros((1, 3), jnp.int32)  # (bx, by, bz) per slot
        self.slot_page = jnp.zeros((1,), jnp.int32)  # page row per slot
        self.slot_within = jnp.zeros((1,), jnp.int32)  # block index in page
        self._n_pages = 0
        self._n_slots = 0
        self._page_of: dict[int, int] = {}  # page key -> page row
        self._slot_of: dict[int, int] = {}  # block key -> pool row

    @property
    def fine_levels(self) -> int:
        """Octree height in fine-voxel levels (reference level_count analogue)."""
        return self.levels + 6

    # -- host-side allocation -------------------------------------------------
    def _ensure_capacity(self, arr, n_needed, fill):
        cap = arr.shape[0]
        if n_needed <= cap:
            return arr
        new_cap = max(n_needed, cap * 2)
        grown = jnp.full((new_cap,) + arr.shape[1:], fill, arr.dtype)
        return grown.at[:cap].set(arr)

    def _allocate(self, blocks_np: np.ndarray) -> None:
        """Host: ensure a tile slot (and page) exists for every (bx,by,bz)."""
        cx, cy, _ = self.cdims
        sx, sy, _ = self.sdims
        new_pages = []  # (page_row, px, py, pz)
        new_slots = []  # (page_row, within, slot, bx, by, bz)
        for bx, by, bz in blocks_np:
            key = (int(bz) * cy + int(by)) * cx + int(bx)  # python int: no overflow
            if key in self._slot_of:
                continue
            px, py, pz = int(bx) // SB, int(by) // SB, int(bz) // SB
            skey = (pz * sy + py) * sx + px  # < 2^30 by the dims check
            page = self._page_of.get(skey)
            if page is None:
                page = self._n_pages
                self._page_of[skey] = page
                self._n_pages += 1
                new_pages.append((page, px, py, pz))
            slot = self._n_slots
            self._slot_of[key] = slot
            self._n_slots += 1
            within = ((int(bz) % SB) * SB + (int(by) % SB)) * SB + int(bx) % SB
            new_slots.append((page, within, slot, int(bx), int(by), int(bz)))
        if new_pages:
            self.pages = self._ensure_capacity(self.pages, self._n_pages, jnp.int32(-1))
            self.block_summaries = self._ensure_capacity(
                self.block_summaries, self._n_pages, jnp.uint8(0)
            )
            self.page_coord = self._ensure_capacity(self.page_coord, self._n_pages, jnp.int32(0))
            arr = np.asarray(new_pages, np.int32)
            self.page_coord = self.page_coord.at[arr[:, 0]].set(arr[:, 1:4])
            # re-sort the page key directory, padded to pow2 capacity with
            # INT32_MAX sentinels (valid keys are < 2^30) so directory growth
            # does not change compiled-program shapes every allocation
            npg = len(self._page_of)
            keys = np.fromiter(self._page_of.keys(), np.int64, npg)
            rows = np.fromiter(self._page_of.values(), np.int32, npg)
            order = np.argsort(keys)
            cap = 1 << (npg - 1).bit_length() if npg else 1
            sk = np.full(cap, 2**31 - 1, np.int32)
            sr = np.zeros(cap, np.int32)
            sk[:npg] = keys[order].astype(np.int32)
            sr[:npg] = rows[order]
            self.skeys = jnp.asarray(sk)
            self.srows = jnp.asarray(sr)
        if new_slots:
            self.pool = self._ensure_capacity(self.pool, self._n_slots, jnp.uint8(0))
            self.slot_block = self._ensure_capacity(self.slot_block, self._n_slots, jnp.int32(0))
            self.slot_page = self._ensure_capacity(self.slot_page, self._n_slots, jnp.int32(0))
            self.slot_within = self._ensure_capacity(self.slot_within, self._n_slots, jnp.int32(0))
            arr = np.asarray(new_slots, np.int32)
            self.pages = self.pages.at[arr[:, 0], arr[:, 1]].set(arr[:, 2])
            self.slot_page = self.slot_page.at[arr[:, 2]].set(arr[:, 0])
            self.slot_within = self.slot_within.at[arr[:, 2]].set(arr[:, 1])
            self.slot_block = self.slot_block.at[arr[:, 2]].set(arr[:, 3:6])

    # -- device-side directory lookups ---------------------------------------
    def snapshot(self) -> PagedSnapshot:
        """Immutable pytree view for jitted consumers (arrays by reference)."""
        return PagedSnapshot(
            pyramid=self.pyramid,
            skeys=self.skeys,
            srows=self.srows,
            pages=self.pages,
            block_summaries=self.block_summaries,
            pool=self.pool,
            dims=self.dims,
            sdims=self.sdims,
            levels=self.levels,
            side_length=self.side_length,
        )

    def _page_rows_of(self, coords: jnp.ndarray):
        return self.snapshot()._page_rows_of(coords)

    # -- insertion --------------------------------------------------------------
    def insert_point_cloud(
        self,
        points,
        meaning=BitVoxelMeaning.eBVM_OCCUPIED,
        static_map: bool = True,
    ) -> "PagedHierarchicalMap":
        """Hard status insert (setOccupied/insertNode, kernel_common.h:186-245).

        eBVM_FREE marks cells hard-free, everything else hard-occupied;
        static_map picks the ns_STATIC_MAP vs ns_DYNAMIC_MAP tag. Free-space
        from a depth sensor enters as explicit free points (see
        gpu_voxels_tpu.ops.raycast.depth_image_to_point_cloud + ray sampling),
        mirroring the octree Sensor's sparse free-voxel list (Sensor.cu).
        """
        pts = _pad_points_pow2(jnp.asarray(points, jnp.float32))
        coords, inside = _voxelize_points(pts, self.side_length, self.dims)

        # host: allocate tiles for the touched blocks (dedup in int64 numpy —
        # block keys exceed int32 past 8192^3 worlds); ONE device fetch
        cx, cy, _ = self.cdims
        c_np, in_np = np.asarray(coords).astype(np.int64), np.asarray(inside)
        blk_np = c_np // B
        key64 = (blk_np[:, 2] * cy + blk_np[:, 1]) * cx + blk_np[:, 0]
        ukeys = np.unique(np.where(in_np, key64, -1))
        ukeys = ukeys[ukeys >= 0]
        ubx = ukeys % cx
        uby = (ukeys // cx) % cy
        ubz = ukeys // (cx * cy)
        self._allocate(np.stack([ubx, uby, ubz], axis=1))

        # device: one compiled scatter + one compiled summary/pyramid rebuild
        occ_bit = NS_FREE if int(meaning) == int(BitVoxelMeaning.eBVM_FREE) else NS_OCCUPIED
        flag = NS_STATIC_MAP if static_map else NS_DYNAMIC_MAP
        self.pool = _scatter_pool(
            self.pool, self.pages, self.skeys, self.srows, coords, inside,
            self.sdims, int(occ_bit), int(flag),
        )
        self._rebuild_coarse()
        return self

    def insert_point_cloud_with_free_space(
        self,
        points,
        sensor_origin=(0.0, 0.0, 0.0),
        max_steps: int = 128,
        static_map: bool = False,
    ) -> "PagedHierarchicalMap":
        """insertPointCloudWithFreespaceCalculation (GvlNTree.hpp:108-130) on
        the sparse tier: carve hard-FREE cells along each sensor ray, then
        insert the hits as occupied (hits override free, like NTree's object-
        over-freespace priority).

        Rays step one dominant-axis voxel at a time with the endpoint voxel
        excluded (the reference RayCaster's visiting rule, VoxelMapOperations.h:
        199-323), bounded at max_steps cells. This is the sparse-point-set
        analogue of the octree Sensor's free-voxel list (Sensor.cu:116-230);
        dense depth frames at sub-1024^3 scale should use the dense tier's
        projective carve instead.
        """
        pts = _pad_points_pow2(jnp.asarray(points, jnp.float32))
        origin = jnp.asarray(sensor_origin, jnp.float32)
        coords, live = _free_ray_cells(
            pts, origin, self.side_length, self.dims, max_steps
        )
        free_np = np.asarray(coords.reshape(-1, 3))[np.asarray(live).reshape(-1)]
        if free_np.size:
            free_pts = (free_np.astype(np.float32) + 0.5) * float(self.side_length)
            self.insert_point_cloud(free_pts, BitVoxelMeaning.eBVM_FREE, static_map)
        return self.insert_point_cloud(
            pts, BitVoxelMeaning.eBVM_OCCUPIED, static_map
        )

    def _rebuild_coarse(self) -> None:
        """Tile summaries -> block summaries -> page statuses -> pyramid
        (one compiled program; see _rebuild_programs)."""
        if self._n_slots == 0:
            return
        self.block_summaries, self.pyramid = _rebuild_programs(
            self.pool,
            self.slot_page,
            self.slot_within,
            self.page_coord,
            jnp.int32(self._n_slots),
            jnp.int32(self._n_pages),
            self._coarse_shape,
            self.levels,
        )

    # -- probing (compiled snapshot programs) ---------------------------------
    def probe_status(self, coords: jnp.ndarray, min_level: int = 0) -> jnp.ndarray:
        return _probe_status_jit(
            self.snapshot(), jnp.asarray(coords, jnp.int32), min_level=min_level
        )

    def probe(self, coords: jnp.ndarray, min_level: int = 0):
        return _probe_jit(
            self.snapshot(), jnp.asarray(coords, jnp.int32), min_level=min_level
        )

    def collide_with_coords(self, coords, min_level: int = 0) -> jnp.ndarray:
        occ, _, _ = self.probe(coords, min_level)
        return jnp.sum(occ, dtype=jnp.uint32)

    def collide_with(self, other, min_level: int = 0) -> jnp.ndarray:
        """intersect_sparse against a voxel list (the GvlNTree dispatch)."""
        coords = other.entry_coords()
        valid = (other.ids != jnp.uint32(0xFFFFFFFF)) & other._entry_occupied()
        occ, _, _ = self.probe(jnp.clip(coords, 0, jnp.asarray(self.dims) - 1), min_level)
        inside = jnp.all((coords >= 0) & (coords < jnp.asarray(self.dims)), axis=-1)
        return jnp.sum(occ & valid & inside, dtype=jnp.uint32)

    # -- maintenance --------------------------------------------------------------
    def memory_usage(self) -> int:
        total = 0
        for a in (
            self.skeys,
            self.srows,
            self.pages,
            self.block_summaries,
            self.page_coord,
            self.pool,
            self.slot_block,
            self.slot_page,
            self.slot_within,
        ):
            total += a.size * a.dtype.itemsize
        for p in self.pyramid:
            total += p.size * p.dtype.itemsize
        return int(total)

    def n_tiles(self) -> int:
        return self._n_slots

    def extract_occupied_coords(self, max_out: int | None = None) -> np.ndarray:
        """Occupied fine coords (extractCubes analogue), host-side."""
        n = self._n_slots
        if n == 0:
            return np.zeros((0, 3), np.int32)
        pool = np.asarray(self.pool[:n])
        sb = np.asarray(self.slot_block[:n])
        slot_i, widx = np.nonzero((pool & STATUS_OCCUPANCY_MASK) == NS_OCCUPIED)
        wz, rem = widx // (B * B), widx % (B * B)
        wy, wx = rem // B, rem % B
        out = np.stack(
            [
                sb[slot_i, 0] * B + wx,
                sb[slot_i, 1] * B + wy,
                sb[slot_i, 2] * B + wz,
            ],
            axis=1,
        ).astype(np.int32)
        return out[:max_out] if max_out is not None else out
