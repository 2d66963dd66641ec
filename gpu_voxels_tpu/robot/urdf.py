"""URDF robots: XML parse + forward kinematics + per-link binvox clouds.

Equivalent of robot/urdf_robot/* (robot.h:182-196, robot_to_gpu.cu:68-88).
The reference parses URDF with urdfdom and runs FK through KDL; here the tiny
joint tree is parsed with xml.etree and FK is a direct tree walk — no
external deps. Like the reference, *meshes are never voxelized at runtime*: a
same-named `.binvox` cloud file is loaded per mesh (robot_link.cpp:226).

setConfiguration computes one 4x4 per link and moves all link clouds in one
fused transform.
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..geometry import files, transforms
from ..geometry.pointcloud import MetaPointCloud
from .robot import JointValueMap, RobotInterface


@dataclass
class UrdfJoint:
    name: str
    jtype: str  # fixed | revolute | continuous | prismatic
    parent: str
    child: str
    origin_xyz: np.ndarray
    origin_rpy: np.ndarray
    axis: np.ndarray
    lower: float = 0.0
    upper: float = 0.0


@dataclass
class UrdfLink:
    name: str
    mesh_file: Optional[str] = None
    visual_origin_xyz: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    visual_origin_rpy: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    scale: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))


def _vec(el, attr, default):
    if el is None or el.get(attr) is None:
        return np.asarray(default, np.float32)
    return np.asarray([float(v) for v in el.get(attr).split()], np.float32)


def parse_urdf(path) -> tuple[Dict[str, UrdfLink], List[UrdfJoint], str]:
    """Parse links, joints and the root link name from a URDF file."""
    tree = ET.parse(path)
    robot = tree.getroot()
    links: Dict[str, UrdfLink] = {}
    for link_el in robot.findall("link"):
        link = UrdfLink(name=link_el.get("name"))
        visual = link_el.find("visual")
        if visual is not None:
            origin = visual.find("origin")
            link.visual_origin_xyz = _vec(origin, "xyz", (0, 0, 0))
            link.visual_origin_rpy = _vec(origin, "rpy", (0, 0, 0))
            mesh = visual.find("geometry/mesh")
            if mesh is not None and mesh.get("filename"):
                link.mesh_file = mesh.get("filename")
                link.scale = _vec(mesh, "scale", (1, 1, 1))
        links[link.name] = link

    joints: List[UrdfJoint] = []
    children = set()
    for j in robot.findall("joint"):
        origin = j.find("origin")
        limit = j.find("limit")
        joints.append(
            UrdfJoint(
                name=j.get("name"),
                jtype=j.get("type", "fixed"),
                parent=j.find("parent").get("link"),
                child=j.find("child").get("link"),
                origin_xyz=_vec(origin, "xyz", (0, 0, 0)),
                origin_rpy=_vec(origin, "rpy", (0, 0, 0)),
                axis=_vec(j.find("axis"), "xyz", (1, 0, 0)),
                lower=float(limit.get("lower", 0)) if limit is not None else 0.0,
                upper=float(limit.get("upper", 0)) if limit is not None else 0.0,
            )
        )
        children.add(j.find("child").get("link"))
    roots = [n for n in links if n not in children]
    root = roots[0] if roots else next(iter(links))
    return links, joints, root


def _mesh_to_binvox(mesh_file: str) -> str:
    """Reference convention: same-named .binvox next to the mesh
    (robot_link.cpp:226)."""
    base, _ = os.path.splitext(mesh_file)
    for prefix in ("package://", "file://"):
        if base.startswith(prefix):
            base = base[len(prefix):]
    return base + ".binvox"


class UrdfRobot(RobotInterface):
    """URDF robot with per-link binvox point clouds."""

    def __init__(self, urdf_path, model_root: Optional[str] = None, load_clouds: bool = True):
        self.links, self.joints, self.root = parse_urdf(urdf_path)
        self.joint_by_child = {j.child: j for j in self.joints}
        self.actuated = [j for j in self.joints if j.jtype in ("revolute", "continuous", "prismatic")]
        self.joint_values: JointValueMap = {j.name: 0.0 for j in self.actuated}
        self._lower = {j.name: j.lower for j in self.actuated}
        self._upper = {j.name: j.upper for j in self.actuated}

        clouds, names = [], []
        if load_clouds:
            root_dir = model_root or os.path.dirname(str(urdf_path))
            entries = []  # (link name, binvox path, scale)
            for name, link in self.links.items():
                if link.mesh_file is None:
                    continue
                bv = os.path.join(root_dir, _mesh_to_binvox(link.mesh_file))
                if os.path.exists(bv):
                    entries.append((name, bv, link.scale))
            if entries:
                # threaded batch decode with per-link mesh scales (the native
                # RLE path releases the GIL, so this scales with core count)
                # explicit reader: mesh paths are known .binvox files and must
                # not hit the dispatcher's whole-path substring format test
                # (a path containing 'xyz' would silently misparse)
                clouds = files.load_point_clouds(
                    [e[1] for e in entries],
                    scalings=[e[2] for e in entries],
                    reader=files.read_binvox,
                )
                names = [e[0] for e in entries]
        if not clouds:  # geometry-less robot still has valid FK
            clouds, names = [np.zeros((0, 3), np.float32)], [self.root]
        self.clouds = MetaPointCloud.from_clouds(clouds, names)
        self._transformed = self.clouds

    # -- FK ---------------------------------------------------------------
    def link_poses(self, joint_values: Optional[JointValueMap] = None) -> Dict[str, np.ndarray]:
        """Pose of every link via a host tree walk (numpy; tiny)."""
        jv = dict(self.joint_values)
        if joint_values:
            jv.update(joint_values)
        poses: Dict[str, np.ndarray] = {self.root: np.eye(4, dtype=np.float32)}
        remaining = list(self.joints)
        while remaining:
            progressed = False
            for j in list(remaining):
                if j.parent in poses:
                    origin = transforms.from_rpy(j.origin_rpy, j.origin_xyz, xp=np)
                    if j.jtype in ("revolute", "continuous"):
                        motion = transforms.compose(
                            transforms.axis_angle(j.axis, np.float32(jv.get(j.name, 0.0)), xp=np), None, xp=np
                        )
                    elif j.jtype == "prismatic":
                        motion = transforms.from_translation(j.axis * np.float32(jv.get(j.name, 0.0)), xp=np)
                    else:
                        motion = np.eye(4, dtype=np.float32)
                    poses[j.child] = poses[j.parent] @ origin @ motion
                    remaining.remove(j)
                    progressed = True
            if not progressed:
                raise ValueError(f"URDF joint tree is disconnected: {[j.name for j in remaining]}")
        return poses

    def link_cloud_matrices(self, joint_values: Optional[JointValueMap] = None) -> np.ndarray:
        """[num_clouds, 4, 4]: pose * visual origin per cloud-bearing link."""
        poses = self.link_poses(joint_values)
        mats = []
        for name in self.clouds.names:
            link = self.links[name]
            vis = transforms.from_rpy(link.visual_origin_rpy, link.visual_origin_xyz, xp=np)
            mats.append(poses[name] @ vis)
        return np.stack(mats, axis=0)

    # -- RobotInterface -----------------------------------------------------
    def set_configuration(self, joint_values: JointValueMap) -> None:
        for k, v in joint_values.items():
            if k in self.joint_values:
                self.joint_values[k] = v
        self._transformed = self.clouds.transformed_per_cloud(self.link_cloud_matrices())

    def get_configuration(self) -> JointValueMap:
        return dict(self.joint_values)

    def get_joint_names(self) -> List[str]:
        return [j.name for j in self.actuated]

    def get_transformed_clouds(self) -> MetaPointCloud:
        return self._transformed

    def get_lower_joint_limits(self) -> JointValueMap:
        return dict(self._lower)

    def get_upper_joint_limits(self) -> JointValueMap:
        return dict(self._upper)

    def update_point_cloud(self, link_name: str, cloud) -> None:
        """updatePointcloud: replace a link's cloud, or attach geometry to a
        link that had none (the reference's resize path)."""
        if link_name not in self.clouds.names:
            if link_name not in self.links:
                raise KeyError(f"unknown link '{link_name}'")
            clouds = [np.asarray(self.clouds.get_cloud(i)) for i in range(self.clouds.num_clouds)]
            names = list(self.clouds.names)
            # drop the geometry-less placeholder if it is empty
            if len(names) == 1 and clouds[0].shape[0] == 0:
                clouds, names = [], []
            clouds.append(np.asarray(cloud, np.float32).reshape(-1, 3))
            names.append(link_name)
            self.clouds = MetaPointCloud.from_clouds(clouds, names)
        else:
            idx = self.clouds.cloud_index(link_name)
            self.clouds = self.clouds.updated_cloud(idx, cloud)
        self._transformed = self.clouds.transformed_per_cloud(self.link_cloud_matrices())
