"""Denavit-Hartenberg kinematic chains (reference: robot/dh_robot/*).

KinematicChain::setConfiguration (KinematicChain.cu:93-126) transforms link
i's cloud by the product DH_0 * ... * DH_{i-1} (identity for the first link,
i.e. the cloud transform happens BEFORE the link's own matrix is multiplied
in). Here the per-link matrices are built on host (tiny), stacked, and all
link clouds move in ONE fused transform (MetaPointCloud.transformed_per_cloud)
instead of a kernel launch per link.

The whole FK + transform also works traced: `link_matrices` accepts a traced
joint-value vector, so a full trajectory sweep vmaps over configurations.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..geometry import transforms
from ..geometry.pointcloud import MetaPointCloud
from .robot import JointValueMap, RobotInterface


class DHJointType(enum.IntEnum):
    REVOLUTE = transforms.REVOLUTE
    PRISMATIC = transforms.PRISMATIC


@dataclass
class DHParameters:
    """d, theta, a, alpha (+ joint value) (KinematicLink.h)."""

    d: float
    theta: float
    a: float
    alpha: float
    value: float = 0.0
    joint_type: DHJointType = DHJointType.REVOLUTE

    def matrix(self, value=None, xp=jnp):
        v = self.value if value is None else value
        return transforms.dh_matrix(
            self.d, self.theta, self.a, self.alpha, v, int(self.joint_type), xp=xp
        )


class KinematicChain(RobotInterface):
    """DH robot: ordered links, each with an optional geometry cloud."""

    def __init__(
        self,
        link_names: Sequence[str],
        dh_params: Sequence[DHParameters],
        link_clouds: MetaPointCloud,
        lower_limits: Optional[JointValueMap] = None,
        upper_limits: Optional[JointValueMap] = None,
    ):
        if len(link_names) != len(dh_params):
            raise ValueError("DH parameter count must match link count")
        self.link_names = list(link_names)
        self.dh = {n: p for n, p in zip(link_names, dh_params)}
        self.clouds = link_clouds  # cloud names subset of link names
        self.joint_values: JointValueMap = {n: p.value for n, p in self.dh.items()}
        self._lower = lower_limits or {}
        self._upper = upper_limits or {}
        self._transformed = link_clouds

    # -- FK -------------------------------------------------------------------
    def link_matrices(self, values=None) -> jnp.ndarray:
        """[num_clouds, 4, 4]: accumulated DH product per link *cloud*.

        values: optional vector/list of joint values ordered by link_names
        (traced values allowed); defaults to the stored configuration.
        """
        mats = []
        acc = transforms.identity()
        by_name = {}
        for i, name in enumerate(self.link_names):
            by_name[name] = acc  # transform BEFORE this link's own DH matrix
            v = (
                self.joint_values[name]
                if values is None
                else (values[i] if not isinstance(values, dict) else values.get(name, self.joint_values[name]))
            )
            acc = transforms.matmul(acc, self.dh[name].matrix(v))
        return jnp.stack([by_name[n] for n in self.clouds.names], axis=0)

    def set_configuration(self, joint_values: JointValueMap) -> None:
        for k, v in joint_values.items():
            if k in self.joint_values:
                self.joint_values[k] = v
        self._transformed = self.clouds.transformed_per_cloud(self.link_matrices())

    def get_configuration(self) -> JointValueMap:
        return dict(self.joint_values)

    def get_joint_names(self) -> List[str]:
        return list(self.link_names)

    def get_transformed_clouds(self) -> MetaPointCloud:
        return self._transformed

    def transformed_clouds_for(self, values) -> MetaPointCloud:
        """Pure-functional FK: traced joint vector -> transformed clouds."""
        return self.clouds.transformed_per_cloud(self.link_matrices(values))

    def get_lower_joint_limits(self) -> JointValueMap:
        return dict(self._lower)

    def get_upper_joint_limits(self) -> JointValueMap:
        return dict(self._upper)

    def update_point_cloud(self, link_name: str, cloud) -> None:
        idx = self.clouds.cloud_index(link_name)
        self.clouds = self.clouds.updated_cloud(idx, cloud)
        self._transformed = self.clouds.transformed_per_cloud(self.link_matrices())
