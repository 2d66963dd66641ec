"""ShardedPagedWorld: z-slab multi-device paged octree vs the single-device
PagedHierarchicalMap oracle (runs on the virtual 8-device CPU mesh).

Every result — probe statuses, occupancies, all collide directions, tile
counts — must EQUAL the single-device map's; the sharding is a layout, not a
semantic fork. `assert_distributed` pins that the pools really live on
distinct devices (a silent single-device fallback would still pass the
equality checks)."""
import jax
import numpy as np
import pytest

from gpu_voxels_tpu.constants import BitVoxelMeaning
from gpu_voxels_tpu.maps.paged import PagedHierarchicalMap
from gpu_voxels_tpu.parallel import ShardedPagedWorld

DIMS = (64, 64, 512)  # 8 slabs of 64 -> one page of depth per device


def _devices(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return devs[:n]


def _scene(seed=0, n=400):
    """Points spread across every slab (cluster + uniform spray)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([0, 0, 0], [64, 64, 512], size=(n, 3)).astype(np.float32)
    cluster = rng.normal([32, 32, 250], 6.0, size=(64, 3)).astype(np.float32)
    return np.concatenate([pts, cluster], axis=0)


def _queries(seed=1, q=2048):
    rng = np.random.default_rng(seed)
    return rng.integers([0, 0, 0], [64, 64, 512], size=(q, 3)).astype(np.int32)


def test_deterministic_world_matches_single_device():
    devs = _devices()
    pts = _scene()
    free = _scene(seed=7, n=100)

    single = PagedHierarchicalMap(DIMS, 1.0)
    single.insert_point_cloud(pts)
    single.insert_point_cloud(free, BitVoxelMeaning.eBVM_FREE, static_map=False)

    world = ShardedPagedWorld(DIMS, 1.0, devices=devs)
    world.insert_point_cloud(pts)
    world.insert_point_cloud(free, BitVoxelMeaning.eBVM_FREE, static_map=False)

    world.assert_distributed()
    assert world.check_tree()
    # tiles partition exactly: slab boundaries are page boundaries
    assert world.n_tiles() == single.n_tiles()
    # at least two slabs hold tiles (the scene spans the world)
    assert sum(1 for m in world.shards if m.n_tiles()) >= 2

    q = _queries()
    want = np.asarray(single.probe_status(q))
    assert (world.probe_status(q) == want).all()
    occ_w, unk_w, free_w = world.probe(q)
    occ_s, unk_s, free_s = (np.asarray(a) for a in single.probe(q))
    assert (occ_w == occ_s).all() and (unk_w == unk_s).all() and (free_w == free_s).all()

    assert world.collide_with_coords(q) == int(single.collide_with_coords(q))
    cw, uw = world.collide_with_counting_unknown_coords(q)
    cs, us = single.collide_with_counting_unknown_coords(q)
    assert (cw, uw) == (int(cs), int(us))

    # occupied extraction matches as a set
    ws = {tuple(r) for r in world.extract_occupied_coords()}
    ss = {tuple(r) for r in single.extract_occupied_coords()}
    assert ws == ss


def test_free_space_rays_cross_slabs():
    """A sensor in slab 0 looking down +z: rays traverse many slabs and every
    slab's cells must carve exactly like the single-device walk."""
    devs = _devices()
    origin = (32.5, 32.5, 4.5)
    rng = np.random.default_rng(3)
    hits = rng.uniform([8, 8, 300], [56, 56, 500], size=(95, 3)).astype(np.float32)
    # one ray straight down +z so specific mid-slab cells are provably carved
    hits = np.concatenate([hits, [[32.5, 32.5, 490.5]]]).astype(np.float32)

    single = PagedHierarchicalMap(DIMS, 1.0)
    single.insert_point_cloud_with_free_space(hits, origin, max_steps=512)
    world = ShardedPagedWorld(DIMS, 1.0, devices=devs)
    world.insert_point_cloud_with_free_space(hits, origin, max_steps=512)

    assert world.n_tiles() == single.n_tiles()
    q = _queries(seed=5)
    assert (world.probe_status(q) == np.asarray(single.probe_status(q))).all()
    # cells along the optical axis in middle slabs really read FREE
    mid = np.array([[32, 32, 200], [32, 32, 340]], np.int32)
    assert world.probe(mid)[2].all()


def test_probabilistic_world_occupancy():
    devs = _devices()
    origin = (32.5, 32.5, 4.5)
    hits = _scene(seed=11, n=64)[:, :]
    hits[:, 2] = np.clip(hits[:, 2], 64, 511)  # endpoints beyond slab 0

    single = PagedHierarchicalMap(DIMS, 1.0, probabilistic=True)
    single.insert_point_cloud_with_free_space(hits, origin, max_steps=512)
    world = ShardedPagedWorld(DIMS, 1.0, probabilistic=True, devices=devs)
    world.insert_point_cloud_with_free_space(hits, origin, max_steps=512)

    q = _queries(seed=13)
    assert (world.probe_occupancy(q) == np.asarray(single.probe_occupancy(q))).all()
    assert (world.probe_status(q) == np.asarray(single.probe_status(q))).all()


def test_collide_directions_match_single_device():
    from gpu_voxels_tpu.maps.voxellist import VoxelList
    from gpu_voxels_tpu.maps.voxelmap import ProbVoxelMap

    devs = _devices()
    pts = _scene(seed=17)
    single = PagedHierarchicalMap(DIMS, 1.0)
    single.insert_point_cloud(pts)
    world = ShardedPagedWorld(DIMS, 1.0, devices=devs)
    world.insert_point_cloud(pts)

    other_pts = _scene(seed=19, n=300)
    lst = VoxelList.create(DIMS, 1.0, "bit", 4096, "linear").insert_point_cloud(other_pts)
    dense = ProbVoxelMap.create(DIMS, 1.0).insert_point_cloud(other_pts)

    for off in ((0, 0, 0), (2, -1, 67)):
        assert world.collide_with(lst, offset=off) == int(
            single.collide_with(lst, offset=off)
        )
        assert world.collide_with(dense, offset=off) == int(
            single.collide_with(dense, offset=off)
        )
        cw, uw = world.collide_with_counting_unknown(lst, offset=off)
        cs, us = single.collide_with_counting_unknown(lst, offset=off)
        assert (cw, uw) == (int(cs), int(us))
    assert world.collide_with(lst) > 0

    # paged x paged (NTree x NTree): world vs single-device octree
    other_paged = PagedHierarchicalMap(DIMS, 1.0).insert_point_cloud(other_pts)
    assert world.collide_with(other_paged) == int(single.collide_with(other_paged))
    with pytest.raises(ValueError):
        world.collide_with(other_paged, offset=(1, 0, 0))


def test_min_level_probes_and_guard():
    devs = _devices()
    pts = _scene(seed=23)
    single = PagedHierarchicalMap(DIMS, 1.0).insert_point_cloud(pts)
    world = ShardedPagedWorld(DIMS, 1.0, devices=devs).insert_point_cloud(pts)

    q = _queries(seed=29, q=512)
    for lvl in (1, 3, 6):  # 2^6 = 64 divides the slab depth
        assert (
            world.probe_status(q, min_level=lvl)
            == np.asarray(single.probe_status(q, min_level=lvl))
        ).all()
        assert world.collide_with_coords(q, min_level=lvl) == int(
            single.collide_with_coords(q, min_level=lvl)
        )
    with pytest.raises(ValueError):
        world.probe_status(q, min_level=7)  # 128-cube would cross 64-slabs


def test_depth_image_matches_single_device():
    from gpu_voxels_tpu.sensors import Sensor

    devs = _devices()
    cam = Sensor(
        position=np.array([32.5, 32.5, 8.5], np.float32),
        data_width=16, data_height=16, fx=16.0, fy=16.0, cx=8.0, cy=8.0,
    )
    depth = np.full((16, 16), 300.0, np.float32)  # rays span ~5 slabs
    depth[0, 0] = 0.0  # invalid pixel

    single = PagedHierarchicalMap(DIMS, 1.0, probabilistic=True)
    single.insert_depth_image(depth, cam, max_steps=512)
    world = ShardedPagedWorld(DIMS, 1.0, probabilistic=True, devices=devs)
    world.insert_depth_image(depth, cam, max_steps=512)

    q = _queries(seed=31)
    assert (world.probe_occupancy(q) == np.asarray(single.probe_occupancy(q))).all()
    assert world.n_tiles() == single.n_tiles()


def test_world_validation_errors():
    devs = _devices()
    with pytest.raises(ValueError):
        ShardedPagedWorld((64, 64, 500), devices=devs)  # 500 % 8 != 0
    with pytest.raises(ValueError):
        ShardedPagedWorld((64, 64, 256), devices=devs)  # 32-deep slabs < page
