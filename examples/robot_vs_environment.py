"""Port of examples/RobotVsEnvironment.cpp: live sensor loop (synthetic depth
camera instead of a Kinect) vs an animated robot — the full
sense -> insert -> collide cycle, one jitted program per frame."""
import numpy as np
import jax
import jax.numpy as jnp

from gpu_voxels_tpu.geometry.pointcloud import MetaPointCloud
from gpu_voxels_tpu.maps.voxelmap import BitVectorVoxelMap, ProbVoxelMap
from gpu_voxels_tpu.ops import raycast
from gpu_voxels_tpu.robot.dh import DHParameters, KinematicChain
from gpu_voxels_tpu.utils.perfmon import PerformanceMonitor

DIMS = (128, 128, 128)
SIDE = 0.05


def make_robot():
    params = [DHParameters(0, 0, 1.5, 0), DHParameters(0, 0, 1.5, 0)]
    clouds = MetaPointCloud.from_clouds(
        [np.linspace([0.1, 0, 0], [1.4, 0, 0], 27).astype(np.float32)] * 2,
        names=("link1", "link2"),
    )
    return KinematicChain(["link1", "link2"], params, clouds)


def main(frames: int = 10):
    robot = make_robot()
    base = jnp.asarray([3.2, 3.2, 3.2])

    @jax.jit
    def frame(depth, joints):
        # sense: synthetic 64x48 depth camera at the origin looking +z
        pts = raycast.depth_image_to_point_cloud(depth, 40.0, 40.0, 32.0, 24.0)
        world = pts + jnp.asarray([3.2, 3.2, 0.5])
        env = ProbVoxelMap.create(DIMS, SIDE).insert_sensor_data(
            world, sensor_origin=(3.2, 3.2, 0.5), max_steps=128
        )
        # robot FK + insert
        clouds = robot.transformed_clouds_for(joints)
        rob = BitVectorVoxelMap.create(DIMS, SIDE).insert_point_cloud(clouds.points + base)
        # collide
        return rob.collide_with(env, 0.7)

    pm = PerformanceMonitor.instance()
    pm.enable("rve")
    rng = np.random.default_rng(0)
    total = 0
    for i in range(frames):
        depth = rng.uniform(1.0, 3.0, (48, 64)).astype(np.float32)
        joints = jnp.asarray([i * 0.1, i * 0.05], jnp.float32)
        pm.start("frame")
        n = int(frame(jnp.asarray(depth), joints))
        pm.measure("frame", "sense_insert_collide", "rve")
        total += n
        print(f"frame {i}: {n} collisions")
    print(pm.summary("rve"))
    return total


if __name__ == "__main__":
    main()
