"""Port of examples/swept_fitter: multi-robot trajectory deconfliction.

Each robot's trajectory is inserted as a swept volume (time encoded in SV
bits); pairwise windowed bit collisions then tell whether two schedules
conflict, and shifting one robot's sweep in time (shiftLeftSweptVolumeIDs /
margin windows) finds a collision-free start delay — the reference Fitter's
strategy, evaluated entirely on-device.
"""
from dataclasses import replace

import numpy as np

from gpu_voxels_tpu.geometry.pointcloud import MetaPointCloud
from gpu_voxels_tpu.maps.voxelmap import BitVectorVoxelMap
from gpu_voxels_tpu.robot.dh import DHParameters, KinematicChain
from gpu_voxels_tpu.robot.swept_volume import insert_swept_volume

DIMS = (64, 64, 64)
SIDE = 0.125
STEPS = 10


class BasedArm:
    """Planar arm whose base sits at `base` in world coordinates."""

    def __init__(self, base):
        self.base = np.asarray(base, np.float32)
        params = [DHParameters(0, 0, 0.0, 0), DHParameters(0, 0, 1.2, 0), DHParameters(0, 0, 0.0, 0)]
        cloud = np.linspace([0.1, 0, 0], [1.1, 0, 0], 11).astype(np.float32)
        self.chain = KinematicChain(["base", "upper", "fore"], params,
                                    MetaPointCloud.from_clouds([cloud, cloud], names=("upper", "fore")))

    def transformed_clouds_for(self, cfg):
        import jax.numpy as jnp

        full = jnp.concatenate([jnp.asarray(cfg, jnp.float32), jnp.zeros((2,), jnp.float32)])[:3]
        c = self.chain.transformed_clouds_for(full)
        return replace(c, points=c.points + self.base)


def sweep_map(robot, start, end):
    traj = [np.array([t], np.float32) for t in np.linspace(start, end, STEPS)]
    return insert_swept_volume(BitVectorVoxelMap.create(DIMS, SIDE), robot, traj)


def main():
    # bases 3.5 m apart, reach 2.3 m each: workspaces overlap in a small
    # middle band that robot A visits early (pointing +x) and robot B also
    # visits early (pointing -x)
    a = sweep_map(BasedArm([2.0, 4.0, 4.0]), 0.0, np.pi / 2)   # +x -> +y
    b = sweep_map(BasedArm([5.5, 4.0, 4.0]), np.pi, np.pi / 2)  # -x -> +y

    window = 1  # robots may not be in the same voxel within +-1 step
    print("spatial overlap (any time):", int(a.collide_with(b)))
    results = {}
    best = None
    for delay in range(0, 9):
        shifted = b if delay == 0 else b.shift_left_swept_volume_ids(delay)
        n = int(a.collide_with_bitcheck(shifted, margin=window))
        results[delay] = n
        print(f"delay {delay}: {n} conflicts")
        if n == 0 and best is None:
            best = delay
    assert results[0] > 0, "schedules should conflict when started together"
    assert best is not None, "a conflict-free delay should exist"
    print(f"first conflict-free delay: {best} steps")
    return best


if __name__ == "__main__":
    main()
