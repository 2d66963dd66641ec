"""Sensor insertion + free-space carving tests (vs a numpy Bresenham oracle)."""
import numpy as np
import jax.numpy as jnp

from gpu_voxels_tpu.constants import SENSOR_MODEL_FREE, SENSOR_MODEL_OCCUPIED
from gpu_voxels_tpu.maps.voxelmap import BitVectorVoxelMap, ProbVoxelMap
from gpu_voxels_tpu.ops import raycast

DIMS = (16, 16, 16)


def test_occupied_hits_accumulate():
    m = ProbVoxelMap.create(DIMS)
    pts = np.array([[4.5, 4.5, 4.5], [4.5, 4.5, 4.5]], np.float32)
    m2 = m.insert_sensor_data(pts, sensor_origin=(0.5, 4.5, 4.5), enable_raycasting=False)
    d = np.asarray(m2.as_3d())
    # two hits: -128 -> clamped add: max(-127, -128+144) = 16
    assert d[4, 4, 4] == min(127, max(-127, -128 + 2 * SENSOR_MODEL_OCCUPIED))
    assert (d != -128).sum() == 1


def test_axis_aligned_ray_marks_free_cells():
    m = ProbVoxelMap.create(DIMS)
    # ray along +x from (0.5,4.5,4.5) to hit at (8.5,4.5,4.5)
    m2 = m.insert_sensor_data(
        np.array([[8.5, 4.5, 4.5]], np.float32), sensor_origin=(0.5, 4.5, 4.5)
    )
    d = np.asarray(m2.as_3d())
    # cells x=0..7 at y=z=4 crossed exactly once -> -128-10 clamped to -127
    for x in range(0, 8):
        assert d[4, 4, x] == -127, x
    assert d[4, 4, 8] == -128 + SENSOR_MODEL_OCCUPIED
    # nothing else touched
    assert (d != -128).sum() == 9


def test_free_space_counts_match_bresenham_dominant_axis():
    origin = np.array([0.5, 0.5, 0.5], np.float32)
    end = np.array([10.5, 5.5, 2.5], np.float32)
    counts = np.asarray(
        raycast.ray_crossing_counts(origin, end[None, :], 1.0, DIMS)
    ).reshape(16, 16, 16)  # [Z,Y,X]
    # dominant axis is x with 10 steps -> 10 visited cells, one per x-column
    assert counts.sum() == 10
    xs = sorted(np.argwhere(counts > 0)[:, 2].tolist())
    assert xs == list(range(0, 10))
    # the endpoint's voxel is NOT carved
    assert counts[2, 5, 10] == 0


def test_cut_real_robot_skips_robot_voxels():
    robot = BitVectorVoxelMap.create(DIMS).insert_point_cloud(
        np.array([[8.5, 4.5, 4.5]], np.float32), 1
    )
    m = ProbVoxelMap.create(DIMS)
    m2 = m.insert_sensor_data(
        np.array([[8.5, 4.5, 4.5]], np.float32),
        sensor_origin=(0.5, 4.5, 4.5),
        enable_raycasting=False,
        cut_real_robot=True,
        robot_map=robot,
    )
    d = np.asarray(m2.as_3d())
    assert d[4, 4, 8] == -128  # hit suppressed


def test_nan_points_are_dropped():
    m = ProbVoxelMap.create(DIMS)
    pts = np.array([[np.nan, np.nan, np.nan], [4.5, 4.5, 4.5]], np.float32)
    m2 = m.insert_sensor_data(pts, sensor_origin=(0.5, 4.5, 4.5), enable_raycasting=False)
    d = np.asarray(m2.as_3d())
    assert (d != -128).sum() == 1


def test_depth_image_backprojection():
    depth = np.zeros((4, 4), np.float32)
    depth[2, 3] = 2.0
    pts = np.asarray(raycast.depth_image_to_point_cloud(depth, fx=2.0, fy=2.0, cx=2.0, cy=2.0))
    valid = pts[np.isfinite(pts).all(axis=1)]
    assert valid.shape == (1, 3)
    np.testing.assert_allclose(valid[0], [(3 - 2) * 2 / 2, (2 - 2) * 2 / 2, 2.0], atol=1e-6)
    assert np.isnan(pts[0]).all()


def test_full_kinect_style_cycle():
    """Config #2 shape: depth image -> insert -> collide vs static env map."""
    import jax

    depth = np.full((48, 64), 6.0, np.float32)
    env_pts = np.array([[6.5, 8.5, 8.5]], np.float32)

    @jax.jit
    def cycle(depth_img):
        pts = raycast.depth_image_to_point_cloud(depth_img, 32.0, 32.0, 32.0, 24.0)
        world = pts + jnp.asarray([8.0, 8.0, 2.0])  # sensor pose: translation
        m = ProbVoxelMap.create(DIMS).insert_sensor_data(
            world, sensor_origin=(8.0, 8.0, 2.0), enable_raycasting=False
        )
        env = ProbVoxelMap.create(DIMS).insert_point_cloud(jnp.asarray(env_pts))
        return m.collide_with(env, 0.7)

    cnt = int(cycle(jnp.asarray(depth)))
    assert cnt in (0, 1)


def test_projective_carving_matches_dda_on_axis_ray():
    """A single axis-aligned ray: projective visibility and the DDA walk
    must carve the same cells (modulo the sensor's own voxel)."""
    from gpu_voxels_tpu.sensors import Sensor

    # camera at (0.5, 4.5, 4.5) looking... build a pose mapping camera +z to
    # world +x: R = [[0,0,1],[1,0,0],[0,1,0]] columns = camera axes in world
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32)
    pose[:3, 3] = [0.5, 4.5, 4.5]
    depth = np.full((3, 3), 8.0, np.float32)  # 3x3 image, all rays 8m
    m = ProbVoxelMap.create(DIMS)
    from gpu_voxels_tpu.ops import raycast as rc
    new = rc.insert_depth_image(
        m.data, jnp.asarray(depth), jnp.asarray(pose), 300.0, 300.0, 1.5, 1.5, 1.0, DIMS
    )
    d = np.asarray(new).reshape(16, 16, 16)
    # all 9 near-parallel rays hit voxel x=8: 9 * 72 clamps to 127
    assert d[4, 4, 8] == 127
    # voxels x=1..6 on the ray carved free (x=7 is within eps of the hit)
    for x in range(1, 7):
        assert d[4, 4, x] == -127, x
    # far-off voxels untouched
    assert d[10, 10, 10] == -128


def test_projective_invalid_pixels_carve_nothing():
    from gpu_voxels_tpu.ops import raycast as rc

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32)
    pose[:3, 3] = [0.5, 4.5, 4.5]
    depth = np.zeros((3, 3), np.float32)  # all invalid
    free = np.asarray(
        rc.projective_free_space(jnp.asarray(depth), jnp.asarray(pose), 300.0, 300.0, 1.5, 1.5, 1.0, DIMS)
    )
    assert free.sum() == 0


def test_pooled_carve_matches_spec_and_is_conservative():
    """The Pallas pooled carve must equal its XLA spec bit-for-bit and never
    free a voxel the exact per-pixel carve keeps."""
    from gpu_voxels_tpu.ops import raycast as rc
    from gpu_voxels_tpu.ops import raycast_pallas as rp

    dims = (64, 64, 64)
    rng = np.random.default_rng(3)
    depth = rng.uniform(10, 50, (48, 64)).astype(np.float32)
    depth[5:9, 10:20] = 0.0  # invalid patch
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [32, 32, 1]
    exact = np.asarray(
        rc.projective_free_space(jnp.asarray(depth), jnp.asarray(pose), 52.0, 52.0, 32.0, 24.0, 1.0, dims)
    )
    for pool in (1, 4, 8):
        spec = np.asarray(
            rp.projective_free_space_pooled(jnp.asarray(depth), jnp.asarray(pose), 52.0, 52.0, 32.0, 24.0, 1.0, dims, pool=pool)
        )
        got = np.asarray(
            rp.projective_free_space_tpu(jnp.asarray(depth), jnp.asarray(pose), 52.0, 52.0, 32.0, 24.0, 1.0, dims, pool=pool)
        )
        np.testing.assert_array_equal(got, spec, err_msg=f"pool={pool}")
        assert not (spec & ~exact).any()  # conservative
    p1 = np.asarray(
        rp.projective_free_space_pooled(jnp.asarray(depth), jnp.asarray(pose), 52.0, 52.0, 32.0, 24.0, 1.0, dims, pool=1)
    )
    np.testing.assert_array_equal(p1, exact)  # pool=1 == exact carve


def test_exact_band_refinement_carve_bit_identical():
    """The Pallas band-refinement kernel must equal the exact per-pixel
    carve BIT-FOR-BIT — including depth discontinuities (ambiguity bands),
    invalid patches, image edges, and off-axis poses — for any tiling
    parameter."""
    from gpu_voxels_tpu.ops import raycast as rc
    from gpu_voxels_tpu.ops import raycast_pallas as rp

    dims = (64, 64, 64)
    rng = np.random.default_rng(7)

    # scene 1: smooth + step discontinuity + invalid patch + noise band
    d1 = np.full((48, 64), 40.0, np.float32)
    d1[:, 32:] = 20.0  # step edge straight through pooled cells
    d1[10:14, 5:9] = 0.0  # invalid patch
    d1[30:34, :] += rng.uniform(-5, 5, (4, 64)).astype(np.float32)  # noisy rows
    # scene 2: adversarial per-pixel noise (every cell ambiguous)
    d2 = rng.uniform(5, 60, (48, 64)).astype(np.float32)
    d2[d2 < 6] = 0.0

    poses = []
    p = np.eye(4, dtype=np.float32)
    p[:3, 3] = [32, 32, 1]
    poses.append(p)
    th = 0.4  # tilted + shifted camera
    rot = np.array(
        [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]],
        np.float32,
    )
    p2 = np.eye(4, dtype=np.float32)
    p2[:3, :3] = rot
    p2[:3, 3] = [20, 45, 3]
    poses.append(p2)

    for depth in (d1, d2):
        for pose in poses:
            exact = np.asarray(
                rc.projective_free_space(
                    jnp.asarray(depth), jnp.asarray(pose), 52.0, 52.0, 32.0, 24.0, 1.0, dims
                )
            )
            for tp in (4, 8):
                got = np.asarray(
                    rp.projective_free_space_exact_tpu(
                        jnp.asarray(depth), jnp.asarray(pose), 52.0, 52.0, 32.0, 24.0,
                        1.0, dims, tile_pool=tp,
                    )
                )
                np.testing.assert_array_equal(got, exact, err_msg=f"tile_pool={tp}")
            assert exact.sum() > 0  # the scenes actually carve


def test_exact_carve_invalid_beam_regions():
    """Large invalid regions pull pmin to -inf, making whole beams ambiguous
    — the refinement must still resolve them bit-identically."""
    from gpu_voxels_tpu.ops import raycast as rc
    from gpu_voxels_tpu.ops import raycast_pallas as rp

    dims = (64, 64, 64)
    rng = np.random.default_rng(9)
    depth = rng.uniform(5, 60, (48, 64)).astype(np.float32)
    depth[8:40, 16:48] = 0.0  # big invalid block
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [32, 32, 1]
    exact = np.asarray(
        rc.projective_free_space(jnp.asarray(depth), jnp.asarray(pose), 52.0, 52.0, 32.0, 24.0, 1.0, dims)
    )
    got = np.asarray(
        rp.projective_free_space_exact_tpu(
            jnp.asarray(depth), jnp.asarray(pose), 52.0, 52.0, 32.0, 24.0, 1.0, dims
        )
    )
    np.testing.assert_array_equal(got, exact)
