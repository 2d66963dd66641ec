"""Paged hierarchical map: octree-scale addressability on TPU.

The reference NTree spans 15 levels = 32768^3 virtual voxels with sparse
node allocation (octree/DataTypes.h, common_defines.h:189-191). The dense
status pyramid (maps/hierarchical.py) hits a memory wall near 1024^3, so
this tier splits the world VDB-style into dense-coarse + sparse-fine:

  * an 8^3-block coarse grid carries a dense status pyramid (the
    HierarchicalBitMap machinery at 1/8 resolution — 134 MB of statuses for
    a 4096^3 world, padded-pow2 pyramid on top), answering every query that
    a uniform block can decide;
  * mixed blocks own an 8^3 tile of per-voxel status bytes in a fixed pool,
    reached through a two-level page table (super-block -> page -> slot),
    so fine storage scales with occupied surface, not volume.

Tiles are allocated by the host (inserts are host API calls already); all
bulk work — voxelizing, scattering statuses, rebuilding tile summaries and
the coarse pyramid, probing — runs on device. Probes are pure gathers:
coarse pyramid descent, then page_table -> pages -> pool for undecided
points. Status bytes are the deterministic tier's (hard FREE/UNKNOWN/
OCCUPIED + ns_STATIC_MAP/ns_DYNAMIC_MAP flags, EnvironmentNodes.h:225-290);
byte 0 = never-written = UNKNOWN.

Capacity: virtual dims up to 8192^3 (coarse block keys must fit int32 for
the device-side searchsorted; beyond that the 60-bit Morton pair machinery
in morton.py is the extension path). A 4096^3 world with ~50M surface
voxels costs ~160 MB base + ~1 KB per mixed block.
"""
from __future__ import annotations

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
SB = 8  # super-block edge (blocks per page axis)
PAGE = SB * SB * SB
TILE = B * B * B


class PagedHierarchicalMap:
    """Sparse deterministic hierarchical map (GvlNTree-scale worlds).

    Not a pytree: the host grows the pool/page arrays between jitted steps.
    Device state: coarse status pyramid, page_table int32[SZ,SY,SX],
    pages int32[P,512], pool uint8[T,512], slot_block int32[T,3].
    """

    def __init__(self, dims: Dims, side_length: float = 1.0):
        if any(d % (B * SB) for d in dims):
            raise ValueError(f"dims must be multiples of {B * SB}")
        if (dims[0] // B) * (dims[1] // B) * (dims[2] // B) >= 2**31:
            raise ValueError("coarse block count must fit int32 (dims <= 8192^3)")
        self.dims = tuple(int(d) for d in dims)
        self.side_length = float(side_length)
        self.map_type = MapType.MT_BITVECTOR_OCTREE
        self.cdims = tuple(d // B for d in self.dims)  # blocks per axis (x,y,z)
        self.sdims = tuple(c // SB for c in self.cdims)
        self.levels = _num_levels(self.cdims)
        cz, cy, cx = self.cdims[2], self.cdims[1], self.cdims[0]
        pd = _pad_dims(self.cdims, self.levels)
        self._coarse_shape = (pd[2], pd[1], pd[0])
        coarse0 = jnp.full(self._coarse_shape, U8(NS_UNKNOWN))
        self.pyramid = tuple(_build_pyramid(coarse0, self.levels))
        sz, sy, sx = self.sdims[2], self.sdims[1], self.sdims[0]
        self.page_table = jnp.full((sz, sy, sx), jnp.int32(-1))
        self.pages = jnp.full((1, PAGE), jnp.int32(-1))
        self.pool = jnp.zeros((1, TILE), jnp.uint8)
        self.slot_block = jnp.zeros((1, 3), jnp.int32)  # (bx, by, bz) per slot
        self._n_pages = 0
        self._n_slots = 0
        self._page_of: dict[int, int] = {}  # super key -> page row
        self._slot_of: dict[int, int] = {}  # block key -> pool row

    # -- host-side allocation -------------------------------------------------
    def _block_key(self, bx, by, bz) -> np.ndarray:
        cx, cy, _ = self.cdims
        return (bz.astype(np.int64) * cy + by) * cx + bx

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
        new_pages = []  # (sz, sy, sx, page_idx)
        new_slots = []  # (page_idx, within, slot_idx, bx, by, bz)
        for bx, by, bz in blocks_np:
            key = int((int(bz) * cy + int(by)) * cx + int(bx))
            if key in self._slot_of:
                continue
            px, py, pz = bx // SB, by // SB, bz // SB
            skey = int((int(pz) * sy + int(py)) * sx + int(px))
            page = self._page_of.get(skey)
            if page is None:
                page = self._n_pages
                self._page_of[skey] = page
                self._n_pages += 1
                new_pages.append((int(pz), int(py), int(px), page))
            slot = self._n_slots
            self._slot_of[key] = slot
            self._n_slots += 1
            within = ((bz % SB) * SB + (by % SB)) * SB + (bx % SB)
            new_slots.append((page, int(within), slot, int(bx), int(by), int(bz)))
        if new_pages:
            self.pages = self._ensure_capacity(self.pages, self._n_pages, jnp.int32(-1))
            arr = np.asarray(new_pages, np.int32)
            self.page_table = self.page_table.at[arr[:, 0], arr[:, 1], arr[:, 2]].set(
                arr[:, 3]
            )
        if new_slots:
            self.pool = self._ensure_capacity(self.pool, self._n_slots, jnp.uint8(0))
            self.slot_block = self._ensure_capacity(
                self.slot_block, self._n_slots, jnp.int32(0)
            )
            arr = np.asarray(new_slots, np.int32)
            self.pages = self.pages.at[arr[:, 0], arr[:, 1]].set(arr[:, 2])
            self.slot_block = self.slot_block.at[arr[:, 2]].set(arr[:, 3:6])

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
        pts = jnp.asarray(points, jnp.float32)
        coords = map_to_voxels(pts, self.side_length)
        dims_arr = jnp.asarray(self.dims, jnp.int32)
        inside = jnp.all((coords >= 0) & (coords < dims_arr), axis=-1)
        coords = jnp.clip(coords, 0, dims_arr - 1)
        blocks = coords // B

        # host: allocate tiles for the touched blocks (device dedup first)
        cx, cy, _ = self.cdims
        bkey = (blocks[:, 2] * cy + blocks[:, 1]) * cx + blocks[:, 0]
        bkey = jnp.where(inside, bkey, jnp.int32(-1))
        ukeys = np.unique(np.asarray(bkey))
        ukeys = ukeys[ukeys >= 0]
        ubx = ukeys % cx
        uby = (ukeys // cx) % cy
        ubz = ukeys // (cx * cy)
        self._allocate(np.stack([ubx, uby, ubz], axis=1))

        # device: map each point's block key -> slot via the sorted key table
        keys_sorted = np.fromiter(self._slot_of.keys(), np.int64, len(self._slot_of))
        slots_np = np.fromiter(self._slot_of.values(), np.int32, len(self._slot_of))
        order = np.argsort(keys_sorted)
        keys_sorted = keys_sorted[order].astype(np.int32)
        slots_np = slots_np[order]
        pos = jnp.searchsorted(jnp.asarray(keys_sorted), bkey)
        pos = jnp.clip(pos, 0, len(slots_np) - 1)
        slot = jnp.asarray(slots_np)[pos]
        within = ((coords[:, 2] % B) * B + (coords[:, 1] % B)) * B + coords[:, 0] % B

        occ_bit = NS_FREE if int(meaning) == int(BitVoxelMeaning.eBVM_FREE) else NS_OCCUPIED
        flag = NS_STATIC_MAP if static_map else NS_DYNAMIC_MAP
        # hard set: old flags survive, occupancy bits replaced
        old = self.pool[slot, within]
        new = (old & U8(0xFF ^ STATUS_OCCUPANCY_MASK)) | U8(occ_bit | flag)
        slot = jnp.where(inside, slot, self.pool.shape[0])
        self.pool = self.pool.at[slot, within].set(new, mode="drop")
        self._rebuild_coarse()
        return self

    def _rebuild_coarse(self) -> None:
        """Tile summaries -> coarse block statuses -> pyramid (propagate)."""
        n = self._n_slots
        if n == 0:
            return
        live = self.pool[:n]
        summary = jnp.bitwise_or.reduce(live, axis=1)
        any_unwritten = jnp.any(live == 0, axis=1)
        summary = summary | jnp.where(any_unwritten, U8(NS_UNKNOWN), U8(0))
        sb = self.slot_block[:n]
        coarse0 = jnp.full(self._coarse_shape, U8(NS_UNKNOWN))
        coarse0 = coarse0.at[sb[:, 2], sb[:, 1], sb[:, 0]].set(summary)
        self.pyramid = tuple(_build_pyramid(coarse0, self.levels))

    # -- probing ----------------------------------------------------------------
    def probe_status(self, coords: jnp.ndarray, min_level: int = 0) -> jnp.ndarray:
        """Status byte per fine voxel coordinate. Levels >= 3 descend the
        coarse pyramid only (block granularity and up); levels 0..2 refine
        through the tile pool (0 = exact voxel, 1/2 = OR over the 2^l cube,
        the NTree min_level semantics, kernel_Octree.h:383-423)."""
        coords = jnp.asarray(coords, jnp.int32)
        bc = coords // B
        x, y, z = bc[..., 0], bc[..., 1], bc[..., 2]
        decided = jnp.zeros(x.shape, bool)
        status = jnp.zeros(x.shape, U8)
        stop = max(min_level - 3, 0)
        for l in range(self.levels, stop - 1, -1):
            s = self.pyramid[l][z >> l, y >> l, x >> l]
            uni = _is_uniform(s) | (l == stop)
            take = uni & ~decided
            status = jnp.where(take, s, status)
            decided = decided | uni
        if min_level >= 3:
            return status

        # refine undecided (mixed-block) points through the tile pool
        needs = ~_is_uniform(status)
        sxi, syi, szi = bc[..., 0] // SB, bc[..., 1] // SB, bc[..., 2] // SB
        page = self.page_table[szi, syi, sxi]
        within_s = ((bc[..., 2] % SB) * SB + (bc[..., 1] % SB)) * SB + bc[..., 0] % SB
        slot = self.pages[jnp.maximum(page, 0), within_s]
        have_tile = (page >= 0) & (slot >= 0)
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
        fine = jnp.where(
            (fine & U8(STATUS_OCCUPANCY_MASK)) == 0, fine | U8(NS_UNKNOWN), fine
        )
        use_fine = needs & have_tile
        return jnp.where(use_fine, fine, status)

    def probe(self, coords: jnp.ndarray, min_level: int = 0):
        status = self.probe_status(coords, min_level)
        occupied = (status & U8(NS_OCCUPIED)) != 0
        unknown = ((status & U8(NS_UNKNOWN)) != 0) & ~occupied
        free = (status & U8(STATUS_OCCUPANCY_MASK)) == U8(NS_FREE)
        return occupied, unknown, free

    def collide_with_coords(self, coords, min_level: int = 0) -> jnp.ndarray:
        occ, _, _ = self.probe(coords, min_level)
        return jnp.sum(occ, dtype=jnp.uint32)

    def collide_with(self, other, min_level: int = 0) -> jnp.ndarray:
        """intersect_sparse against a voxel list (the GvlNTree dispatch)."""
        coords = other.entry_coords()
        valid = (other.ids != jnp.uint32(0xFFFFFFFF)) & other._entry_occupied()
        occ, _, _ = self.probe(jnp.clip(coords, 0, jnp.asarray(self.dims) - 1))
        inside = jnp.all((coords >= 0) & (coords < jnp.asarray(self.dims)), axis=-1)
        return jnp.sum(occ & valid & inside, dtype=jnp.uint32)

    # -- maintenance --------------------------------------------------------------
    def memory_usage(self) -> int:
        total = 0
        for a in (self.page_table, self.pages, self.pool, self.slot_block):
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
