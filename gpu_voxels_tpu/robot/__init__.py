from .dh import DHJointType, DHParameters, KinematicChain
from .robot import RobotInterface, interpolate_linear
from .urdf import UrdfRobot

__all__ = [
    "DHJointType",
    "DHParameters",
    "KinematicChain",
    "RobotInterface",
    "UrdfRobot",
    "interpolate_linear",
]
