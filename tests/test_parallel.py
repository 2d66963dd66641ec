"""Sharded grid cycle on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from gpu_voxels_tpu.geometry import generation
from gpu_voxels_tpu.maps.voxelmap import ProbVoxelMap
from gpu_voxels_tpu.parallel import build_sharded_cycle, make_grid_mesh, sharded_collide_count


def test_sharded_cycle_matches_single_device():
    mesh = make_grid_mesh(8, world=1)
    dims = (32, 32, 32)
    p1 = jnp.asarray(generation.create_box_of_points((2.1,) * 3, (20.1,) * 3, 0.5))
    p2 = jnp.asarray(generation.create_box_of_points((3.1,) * 3, (21.1,) * 3, 0.5))
    fn = build_sharded_cycle(mesh, dims, 1.0, 0.1)
    got = int(fn(p1, p2))
    m1 = ProbVoxelMap.create(dims).insert_point_cloud(p1)
    m2 = ProbVoxelMap.create(dims).insert_point_cloud(p2)
    assert got == int(m1.collide_with(m2, 0.1))
    assert got > 0


def test_sharded_cycle_with_world_axis():
    mesh = make_grid_mesh(8, world=2)
    dims = (16, 16, 16)
    p1 = jnp.asarray(generation.create_box_of_points((1.1,) * 3, (8.1,) * 3, 1.0))
    p2a = jnp.asarray(generation.create_box_of_points((2.1,) * 3, (9.1,) * 3, 1.0))
    p2b = p2a + 100.0  # second world: no overlap
    fn = build_sharded_cycle(mesh, dims, 1.0, 0.1)
    pa = jnp.stack([p1, p1])
    pb = jnp.stack([p2a, p2b])
    counts = np.asarray(fn(pa, pb))
    m1 = ProbVoxelMap.create(dims).insert_point_cloud(p1)
    m2 = ProbVoxelMap.create(dims).insert_point_cloud(p2a)
    assert counts[0] == int(m1.collide_with(m2, 0.1))
    assert counts[1] == 0


def test_sharded_collide_presharded():
    mesh = make_grid_mesh(8, world=1)
    dims = (8, 8, 8)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-128, 128, 512).astype(np.int8))
    b = jnp.asarray(rng.integers(-128, 128, 512).astype(np.int8))
    got = int(sharded_collide_count(mesh, a, b, 0, 0))
    expect = int(((np.asarray(a).astype(int) >= 0) & (np.asarray(b).astype(int) >= 0)).sum())
    assert got == expect
