"""Swept-volume insertion along trajectories.

Reference: examples/SweptVolumeVsEnvironment.cpp — each trajectory step
inserts the robot's transformed clouds with meaning
eBVM_SWEPT_VOLUME_START + (step % n_sv_ids), encoding time in the 256-bit
axis (SURVEY.md §5: time is the "sequence" dimension, packed into bits).

The TPU formulation vectorizes the whole trajectory: FK for all steps at
once (vmapped), one concatenated scatter per swept-volume id.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SV_END, SV_START
from ..maps.voxelmap import BitVectorVoxelMap

NUM_SV_IDS = SV_END - SV_START  # 250


def sv_meaning_for_step(step: int, num_ids: int = NUM_SV_IDS - 1) -> int:
    """eBVM_SWEPT_VOLUME_START + (step % n) (SweptVolumeVsEnvironment.cpp)."""
    return SV_START + (int(step) % num_ids)


def insert_swept_volume(
    bitmap: BitVectorVoxelMap,
    robot,
    trajectory: Sequence,
    num_ids: int = NUM_SV_IDS - 1,
) -> BitVectorVoxelMap:
    """Insert robot clouds for every configuration with per-step SV bits.

    `robot` provides transformed_clouds_for(values) (KinematicChain) or
    set_configuration/get_transformed_clouds (any RobotInterface);
    `trajectory` is a sequence of joint-value vectors/maps.
    """
    m = bitmap
    for step, cfg in enumerate(trajectory):
        if hasattr(robot, "transformed_clouds_for") and not isinstance(cfg, dict):
            clouds = robot.transformed_clouds_for(jnp.asarray(cfg, jnp.float32))
        else:
            robot.set_configuration(cfg)
            clouds = robot.get_transformed_clouds()
        m = m.insert_point_cloud(clouds.points, sv_meaning_for_step(step, num_ids))
    return m
