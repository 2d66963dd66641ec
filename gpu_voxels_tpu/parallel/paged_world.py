"""Multi-chip paged octree: z-slab decomposition of a `PagedHierarchicalMap`.

The paged tier is host-stateful (its tile pool grows on insert), so it cannot
be laid over a mesh with `NamedSharding` like the dense maps
(parallel/shard_value.py). Instead the virtual world is partitioned into
contiguous z-slabs, one independent `PagedHierarchicalMap` per device: each
chip owns its slab's page directory, tile pool AND allocator, so pool memory,
scatter/rebuild work and probe gathers all distribute. Tile (8), block-row
(64) and page (64) boundaries nest inside any 64-multiple slab, so every
tile belongs to exactly one slab and per-shard results partition the
single-device ones exactly (asserted by tests and the driver dryrun).

This is a new capability vs the single-GPU reference (SURVEY §2.4 grid
scaling); the per-shard semantics are the single-device NTree ones
(`maps/paged.py`, GvlNTree.hpp:150-330). Design notes:

  * Points/depth frames are replicated to every shard (they are small
    relative to the grid); each shard voxelizes in the GLOBAL frame and
    shifts the resulting coords by its integer slab offset
    (`voxel_offset=(0,0,z0)`, maps/paged.py) — NEVER by translating the
    float points first, which would move `floor(p/side)` decisions at cell
    boundaries whenever side_length is not exactly representable in float32.
    The scatter drops out-of-slab cells — no host-side routing, no
    collectives. Free-space rays crossing slab boundaries walk the global
    ray geometry and carve each slab's own cells (the ray walk is
    replicated, the scatters are local).
  * All per-shard inputs are `jax.device_put` onto the shard's device first:
    jit outputs are committed, and a committed-elsewhere operand would make
    the shard's programs fail device placement.
  * Every collide direction reduces to the single-device call with the
    offset translated by the slab origin (both probe directions use
    `c = coords ± offset`, so `offset_z - z0` lands queries in the slab
    frame); per-shard counts sum because each global cell is inside exactly
    one slab.
  * min_level probes OR over aligned 2^l cubes; a cube never crosses a slab
    boundary iff 2^min_level divides the slab depth — coarser levels raise.
"""
from __future__ import annotations

import weakref
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BitVoxelMeaning
from ..maps.paged import (
    B,
    PAGE_EDGE,
    PagedHierarchicalMap,
    meta_first_meaning,
    robot_self_collision_clash,
)

Dims = Tuple[int, int, int]

_PINNED_FIELDS = (
    "pyramid", "skeys", "srows", "pages", "block_summaries", "page_coord",
    "pool", "occ_pool", "slot_block", "slot_page", "slot_within",
)


@jax.jit
def _translate_clip(coords, off, hi):
    return jnp.clip(coords - off, 0, hi)


def _pin(m: PagedHierarchicalMap, device) -> None:
    """Commit every device array of a slab map onto its device. Idempotent;
    called after construction and after host allocation (which creates
    uncommitted arrays on the default device)."""
    for name in _PINNED_FIELDS:
        v = getattr(m, name, None)
        if v is not None:
            setattr(m, name, jax.device_put(v, device))


class ShardedPagedWorld:
    """Z-slab-sharded sparse hierarchical world over `devices`.

    Same insert/probe/collide surface as `PagedHierarchicalMap` (both NTree
    instantiations: deterministic hard-status and probabilistic log-odds),
    with memory and work distributed one slab per device. Counts and probe
    statuses are exactly the single-device map's (tests assert equality).
    """

    def __init__(
        self,
        dims: Dims,
        side_length: float = 1.0,
        probabilistic: bool = False,
        devices: Sequence | None = None,
    ):
        devices = list(devices if devices is not None else jax.devices())
        if not devices:
            raise ValueError("need at least one device")
        dx, dy, dz = (int(d) for d in dims)
        nz = len(devices)
        if dz % nz:
            raise ValueError(f"dimz {dz} must divide over {nz} devices")
        self.slab_dz = dz // nz
        if self.slab_dz % PAGE_EDGE:
            raise ValueError(
                f"slab depth {self.slab_dz} must be a multiple of {PAGE_EDGE} "
                "(tiles/pages may not cross slab boundaries)"
            )
        self.dims: Dims = (dx, dy, dz)
        self.side_length = float(side_length)
        self.probabilistic = bool(probabilistic)
        self.devices = devices
        self.z0s = [k * self.slab_dz for k in range(nz)]
        self._replica_cache: dict = {}
        self.shards = []
        for dev in devices:
            m = PagedHierarchicalMap((dx, dy, self.slab_dz), side_length, probabilistic)
            _pin(m, dev)
            self.shards.append(m)

    # -- helpers ---------------------------------------------------------------
    def _put_points(self, points, k: int) -> jnp.ndarray:
        """Replicate `points` onto shard k — UNtranslated: the slab shift
        happens in integer voxel space via `voxel_offset` (module docstring)."""
        return jax.device_put(jnp.asarray(points, jnp.float32), self.devices[k])

    def _voff(self, k: int) -> tuple:
        return (0, 0, self.z0s[k])

    def _put_coords(self, coords, k: int) -> jnp.ndarray:
        return jax.device_put(jnp.asarray(coords, jnp.int32), self.devices[k])

    def _shard_offset(self, offset, k: int) -> tuple:
        ox, oy, oz = (int(v) for v in np.asarray(offset).ravel())
        return (ox, oy, oz - self.z0s[k])

    def _check_min_level(self, min_level: int) -> None:
        if min_level and self.slab_dz % (1 << min_level):
            raise ValueError(
                f"min_level {min_level} cubes (edge {1 << min_level}) would "
                f"cross slab boundaries (slab depth {self.slab_dz}); use a "
                "single-device map or fewer/deeper slabs for coarser probes"
            )

    # -- insertion ---------------------------------------------------------------
    def insert_point_cloud(
        self, points, meaning=BitVoxelMeaning.eBVM_OCCUPIED, static_map: bool = True
    ) -> "ShardedPagedWorld":
        for k, m in enumerate(self.shards):
            m.insert_point_cloud(
                self._put_points(points, k), meaning, static_map,
                voxel_offset=self._voff(k),
            )
            _pin(m, self.devices[k])
        return self

    def insert_point_cloud_with_free_space(
        self,
        points,
        sensor_origin=(0.0, 0.0, 0.0),
        max_steps: int = 128,
        static_map: bool = False,
    ) -> "ShardedPagedWorld":
        for k, m in enumerate(self.shards):
            m.insert_point_cloud_with_free_space(
                self._put_points(points, k), sensor_origin, max_steps,
                static_map, voxel_offset=self._voff(k),
            )
            _pin(m, self.devices[k])
        return self

    def insert_depth_image(self, depth, sensor, max_steps: int = 128) -> "ShardedPagedWorld":
        """Octree sensor pipeline on the sharded world: each shard
        back-projects + ray-carves on its own device in the GLOBAL frame
        (replicated compute, Sensor.cu semantics via the slab maps), with
        only the visited cells shifted into the slab."""
        depth = jnp.asarray(depth, jnp.float32)
        for k, m in enumerate(self.shards):
            m.insert_depth_image(
                jax.device_put(depth, self.devices[k]), sensor, max_steps,
                voxel_offset=self._voff(k),
            )
            _pin(m, self.devices[k])
        return self

    def insert_meta_point_cloud(self, meta, meanings=None) -> "ShardedPagedWorld":
        """insertMetaPointCloud (GvlNTree.hpp:437-453): per-subcloud meanings
        degrade to the FIRST meaning (shared rule: maps/paged.py)."""
        return self.insert_point_cloud(meta.points, meta_first_meaning(meanings))

    def insert_robot_configuration(self, robot_links, with_self_collision_test: bool = False):
        """insertRobotConfiguration (GpuVoxelsMap contract); the
        self-collision test is the host cell-set check shared with the
        single-device map (maps/paged.py). Returns (world, ok)."""
        ok = True
        if with_self_collision_test:
            ok = not robot_self_collision_clash(robot_links, self.side_length)
        return self.insert_meta_point_cloud(robot_links), ok

    def build(self, points, free_bounding_box: bool = False) -> "ShardedPagedWorld":
        """NTree::build (NTree.hpp:385-540) over the slabs; the free AABB
        carve spans slabs like any other insert."""
        from ..maps.paged import _free_box_cloud

        free = _free_box_cloud(points, self.side_length) if free_bounding_box else None
        self.clear_map()
        if free is not None:
            self.insert_point_cloud(free, BitVoxelMeaning.eBVM_FREE)
        return self.insert_point_cloud(points, BitVoxelMeaning.eBVM_OCCUPIED)

    def clear_voxel_meaning(self, meaning) -> "ShardedPagedWorld":
        """clearBitVoxelMeaning (GvlNTree.hpp:487-494 semantics per slab)."""
        for k, m in enumerate(self.shards):
            m.clear_voxel_meaning(meaning)
            _pin(m, self.devices[k])
        return self

    def needs_rebuild(self) -> bool:
        return any(m.needs_rebuild() for m in self.shards)

    def rebuild(self) -> "ShardedPagedWorld":
        for m in self.shards:
            m.rebuild()
        return self

    # -- probing -------------------------------------------------------------------
    def _owner_mask(self, coords_np: np.ndarray, k: int) -> np.ndarray:
        """Which query coords slab k answers. Out-of-range z CLAMPS to the
        first/last slab, matching the single-device map's clamped gathers
        (PagedSnapshot.probe_status never rejects coords — border cells
        answer), so sharded probes equal single-device probes on ANY input."""
        zc = np.clip(coords_np[..., 2], 0, self.dims[2] - 1)
        return (zc >= self.z0s[k]) & (zc < self.z0s[k] + self.slab_dz)

    def _gather_shard_probe(self, coords, min_level, fn, init):
        """Combine a per-slab probe over the owning slabs (z clamped into the
        slab exactly like the single-device map clamps into the grid)."""
        coords_np = np.asarray(coords, np.int64)
        out = init(coords_np.shape[:-1])
        parts = []
        for k, m in enumerate(self.shards):
            ck = self._put_coords(coords_np, k)
            off = np.asarray([0, 0, self.z0s[k]], np.int32)
            hi = np.asarray(
                [self.dims[0] - 1, self.dims[1] - 1, self.slab_dz - 1], np.int32
            )
            parts.append(fn(m, _translate_clip(ck, off, hi), min_level))
        for k, st in enumerate(parts):
            out = np.where(self._owner_mask(coords_np, k), np.asarray(st), out)
        return out

    def probe_status(self, coords, min_level: int = 0) -> np.ndarray:
        """Status byte per fine voxel (kernel_Octree.h:383-423 semantics),
        combined from the owning slabs."""
        self._check_min_level(min_level)
        return self._gather_shard_probe(
            coords, min_level,
            lambda m, c, lv: m.probe_status(c, lv),
            lambda shape: np.zeros(shape, np.uint8),
        )

    def probe(self, coords, min_level: int = 0):
        from ..maps.hierarchical import decode_status_flags

        return decode_status_flags(self.probe_status(coords, min_level))

    def probe_occupancy(self, coords) -> np.ndarray:
        """int8 log-odds per fine voxel (probabilistic tier)."""
        if not self.probabilistic:
            raise TypeError("probe_occupancy requires a probabilistic paged world")
        from ..constants import UNKNOWN_PROBABILITY

        return self._gather_shard_probe(
            coords, 0,
            lambda m, c, lv: m.probe_occupancy(c),
            lambda shape: np.full(shape, UNKNOWN_PROBABILITY, np.int8),
        )

    # -- collision ---------------------------------------------------------------
    def _sum_shard_counts(self, fn) -> int:
        vals = [fn(k, m) for k, m in enumerate(self.shards)]  # async dispatch
        return sum(int(v) for v in vals)

    def collide_with_coords(self, coords, min_level: int = 0, offset=(0, 0, 0)) -> int:
        self._check_min_level(min_level)
        return self._sum_shard_counts(
            lambda k, m: m.collide_with_coords(
                self._put_coords(coords, k), min_level, self._shard_offset(offset, k)
            )
        )

    def collide_with_counting_unknown_coords(
        self, coords, min_level: int = 0, offset=(0, 0, 0)
    ):
        self._check_min_level(min_level)
        pairs = [
            m.collide_with_counting_unknown_coords(
                self._put_coords(coords, k), min_level, self._shard_offset(offset, k)
            )
            for k, m in enumerate(self.shards)
        ]
        return (
            sum(int(c) for c, _ in pairs),
            sum(int(u) for _, u in pairs),
        )

    def _replicas(self, other):
        """One committed copy of `other` per device, cached by object
        identity (maps are immutable pytrees, so identity pins content; a
        weakref guard rejects stale id-reuse after collection). Without the
        cache every collide in a sense loop re-ships the full map to every
        device."""
        key = id(other)
        hit = self._replica_cache.get(key)
        if hit is not None and hit[0]() is other:
            return hit[1]
        reps = [jax.device_put(other, d) for d in self.devices]
        try:
            self._replica_cache[key] = (weakref.ref(other), reps)
            while len(self._replica_cache) > 8:  # bound: drop oldest entries
                self._replica_cache.pop(next(iter(self._replica_cache)))
        except TypeError:
            pass  # not weakref-able: just don't cache
        return reps

    def collide_with(self, other, min_level: int = 0, offset=(0, 0, 0)) -> int:
        """collideWith dispatch (GvlNTree.hpp:150-330) over the slabs: lists,
        dense maps, paged maps and sharded worlds. Each direction is the
        single-device call with the slab-translated offset; counts sum."""
        from ..maps.hierarchical import _reject_octree_offset
        from ..maps.voxellist import VoxelList
        from ..maps.voxelmap import BitVectorVoxelMap, ProbVoxelMap

        self._check_min_level(min_level)
        if isinstance(other, (VoxelList, ProbVoxelMap, BitVectorVoxelMap)):
            reps = self._replicas(other)
            return self._sum_shard_counts(
                lambda k, m: m.collide_with(
                    reps[k], min_level, self._shard_offset(offset, k)
                )
            )
        if isinstance(other, (PagedHierarchicalMap, ShardedPagedWorld)):
            # NTree x NTree (NTree.hpp:1139): probe self at the other octree's
            # exact occupied set; nonzero offsets rejected like the reference
            # (GvlNTree.hpp:260-262)
            _reject_octree_offset(tuple(int(v) for v in np.asarray(offset).ravel()))
            oc = other.extract_occupied_coords()
            if oc.shape[0] == 0:
                return 0
            return self.collide_with_coords(oc, min_level)
        raise TypeError(type(other))

    def collide_with_counting_unknown(self, other, min_level: int = 0, offset=(0, 0, 0)):
        """collideWithTypesConsideringUnknownCells (GvlNTree.h:115-129):
        (collisions, unknown-cell hits) summed over slabs."""
        self._check_min_level(min_level)
        reps = self._replicas(other)
        pairs = [
            m.collide_with_counting_unknown(
                reps[k], min_level, self._shard_offset(offset, k)
            )
            for k, m in enumerate(self.shards)
        ]
        return (
            sum(int(c) for c, _ in pairs),
            sum(int(u) for _, u in pairs),
        )

    # -- maintenance ---------------------------------------------------------------
    def clear_map(self) -> "ShardedPagedWorld":
        for k, m in enumerate(self.shards):
            m.clear_map()
            _pin(m, self.devices[k])
        return self

    def check_tree(self) -> bool:
        return all(m.check_tree() for m in self.shards)

    def n_tiles(self) -> int:
        return sum(m.n_tiles() for m in self.shards)

    def memory_usage(self) -> int:
        return sum(m.memory_usage() for m in self.shards)

    def extract_occupied_coords(self, max_out: int | None = None) -> np.ndarray:
        parts = []
        for k, m in enumerate(self.shards):
            c = m.extract_occupied_coords()
            if c.shape[0]:
                c = c.copy()
                c[:, 2] += self.z0s[k]
            parts.append(c)
        out = np.concatenate(parts, axis=0) if parts else np.zeros((0, 3), np.int32)
        return out[:max_out] if max_out is not None else out

    @property
    def map_type(self):
        return self.shards[0].map_type

    # -- conversion / persistence ----------------------------------------------
    def to_paged_map(self) -> PagedHierarchicalMap:
        """Gather the slabs into ONE single-device `PagedHierarchicalMap`
        over the global dims (tile ground truth is copied; directory,
        summaries and pyramid are rebuilt as invariants, mirroring the
        disk-read path in utils/io.py)."""
        from ..maps.hierarchical import _status_from_occupancy

        out = PagedHierarchicalMap(self.dims, self.side_length, self.probabilistic)
        blocks, payloads = [], []
        for k, m in enumerate(self.shards):
            n = m.n_tiles()
            if not n:
                continue
            sb = np.asarray(m.slot_block[:n]).copy()
            sb[:, 2] += self.z0s[k] // B  # slab z0 is a block multiple
            blocks.append(sb)
            payloads.append(
                np.asarray(m.occ_pool[:n] if self.probabilistic else m.pool[:n])
            )
        if blocks:
            merged = np.concatenate(blocks, axis=0)
            body = jnp.asarray(np.concatenate(payloads, axis=0))
            out._allocate(merged)
            n = merged.shape[0]
            if self.probabilistic:
                out.occ_pool = out.occ_pool.at[:n].set(body)
                out.pool = out.pool.at[:n].set(_status_from_occupancy(out.occ_pool[:n]))
            else:
                out.pool = out.pool.at[:n].set(body)
            out._rebuild_coarse()
        return out

    @classmethod
    def from_paged_map(
        cls, m: PagedHierarchicalMap, devices: Sequence | None = None
    ) -> "ShardedPagedWorld":
        """Distribute an existing single-device paged map over `devices`:
        every tile belongs to exactly one z-slab (slab depth is a block
        multiple), so the split is a partition of the tile pool."""
        from ..maps.hierarchical import _status_from_occupancy

        world = cls(m.dims, m.side_length, m.probabilistic, devices)
        n = m.n_tiles()
        if n:
            sb = np.asarray(m.slot_block[:n])
            body = np.asarray(m.occ_pool[:n] if m.probabilistic else m.pool[:n])
            slab_blocks = world.slab_dz // B
            owner = sb[:, 2] // slab_blocks
            for k, shard in enumerate(world.shards):
                sel = owner == k
                if not sel.any():
                    continue
                local = sb[sel].copy()
                local[:, 2] -= k * slab_blocks
                shard._allocate(local)
                nk = local.shape[0]
                payload = jax.device_put(jnp.asarray(body[sel]), world.devices[k])
                if m.probabilistic:
                    shard.occ_pool = shard.occ_pool.at[:nk].set(payload)
                    shard.pool = shard.pool.at[:nk].set(
                        _status_from_occupancy(shard.occ_pool[:nk])
                    )
                else:
                    shard.pool = shard.pool.at[:nk].set(payload)
                shard._rebuild_coarse()
                _pin(shard, world.devices[k])
        return world

    def write_to_disk(self, path) -> bool:
        """writeToDisk with format parity: the file is the single-device
        `write_paged_map` layout (NTree::serialize analogue; tile slots
        ordered slab-major), so it reads back into either form."""
        return self.to_paged_map().write_to_disk(path)

    def read_from_disk(self, path) -> "ShardedPagedWorld":
        """readFromDisk (returns a NEW world on the same devices, matching
        the repo-wide operations-return-new-instances convention)."""
        from ..utils import io as map_io

        m = map_io.read_map(path)
        if int(m.map_type) != int(self.map_type):
            raise ValueError(
                f"file holds map type {int(m.map_type)}, world is {int(self.map_type)}"
            )
        return type(self).from_paged_map(m, self.devices)

    def assert_distributed(self) -> None:
        """Fail loudly if the shards' pools are NOT on distinct devices —
        the paged analogue of shard_value.assert_sharded (catches a silent
        single-device fallback slipping into a future edit)."""
        seen = set()
        for m, want in zip(self.shards, self.devices):
            devs = {d for d in m.pool.devices()}
            if devs != {want}:
                raise AssertionError(f"shard pool on {devs}, want {{{want}}}")
            seen |= devs
        if len(seen) != len(self.devices):
            raise AssertionError(
                f"{len(seen)} distinct devices hold pools, want {len(self.devices)}"
            )
