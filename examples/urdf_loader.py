"""Port of examples/URDF_Loader.cpp: load a URDF robot, animate a joint and
collide against an environment map. Uses a small built-in URDF when no path
is given (the reference ships binary robot models we do not copy)."""
import sys
import tempfile
from pathlib import Path

import numpy as np

from gpu_voxels_tpu.api import GpuVoxels
from gpu_voxels_tpu.constants import BitVoxelMeaning, MapType

DEMO_URDF = """<?xml version="1.0"?>
<robot name="pan_tilt">
  <link name="base"/>
  <link name="pan"/>
  <link name="tilt"/>
  <joint name="pan_joint" type="revolute">
    <parent link="base"/> <child link="pan"/>
    <origin xyz="0 0 0.5" rpy="0 0 0"/> <axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14"/>
  </joint>
  <joint name="tilt_joint" type="revolute">
    <parent link="pan"/> <child link="tilt"/>
    <origin xyz="0.4 0 0" rpy="0 0 0"/> <axis xyz="0 1 0"/>
    <limit lower="-1.57" upper="1.57"/>
  </joint>
</robot>
"""


def main(urdf_path=None):
    gvl = GpuVoxels.get_instance()
    gvl.initialize(128, 128, 128, 0.02)
    gvl.add_map(MapType.MT_BITVECTOR_VOXELMAP, "robot_map")
    gvl.add_map(MapType.MT_PROBAB_VOXELMAP, "env_map")

    if urdf_path is None:
        tmp = Path(tempfile.mkdtemp()) / "demo.urdf"
        tmp.write_text(DEMO_URDF)
        urdf_path = tmp
    gvl.add_robot("bot", urdf_path)
    robot = gvl.get_robot("bot")
    # give the tilt link some geometry (the reference loads .binvox files)
    robot.update_point_cloud("tilt", np.linspace([0.05, 0, 0], [0.5, 0, 0], 12).astype(np.float32))

    gvl.insert_box_into_map((1.4, 0.9, 1.4), (1.8, 1.2, 1.8), "env_map", BitVoxelMeaning.eBVM_OCCUPIED)

    base_offset = np.array([1.2, 1.2, 1.0], np.float32)
    for i, pan in enumerate(np.linspace(0, np.pi / 2, 5)):
        gvl.set_robot_configuration("bot", {"pan_joint": float(pan), "tilt_joint": 0.2})
        gvl.clear_map("robot_map")
        clouds = robot.get_transformed_clouds()
        gvl.insert_point_cloud_into_map(np.asarray(clouds.points) + base_offset, "robot_map")
        n = int(gvl.get_map("robot_map").collide_with(gvl.get_map("env_map"), 0.7))
        print(f"pan={pan:.2f}: {n} collisions")
    return n


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
