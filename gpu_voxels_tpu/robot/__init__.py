from .dh import DHJointType, DHParameters, KinematicChain
from .fitter import deconflict_slot, fit_orderings, fit_schedule
from .robot import RobotInterface, interpolate_linear
from .trajectory import Trajectory, load_trajectories
from .urdf import UrdfRobot

__all__ = [
    "Trajectory",
    "load_trajectories",
    "DHJointType",
    "DHParameters",
    "KinematicChain",
    "RobotInterface",
    "UrdfRobot",
    "interpolate_linear",
    "fit_orderings",
    "fit_schedule",
    "deconflict_slot",
]
