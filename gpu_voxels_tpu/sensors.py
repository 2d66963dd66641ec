"""Sensor abstractions: depth-camera model + data sources.

Equivalents of octree/Sensor.{h,cu}, octree/SensorModel.h and the optional
helpers/Kinect grabber. Real device drivers are out of scope on a TPU host;
`SyntheticDepthSource` and `ReplayDepthSource` implement the same callback
contract the Kinect grabber fills (a host buffer of the latest frame).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .constants import SENSOR_MODEL_FREE, SENSOR_MODEL_OCCUPIED
from .geometry import transforms
from .ops.raycast import depth_image_to_point_cloud


@dataclass
class SensorModel:
    """Probabilistic update magnitudes (octree/SensorModel.h:41-131)."""

    initial_probability: int = SENSOR_MODEL_OCCUPIED
    update_probability: int = SENSOR_MODEL_FREE


@dataclass
class Sensor:
    """Sensor pose + intrinsics + invalid-measure handling (Sensor.h:40-110)."""

    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    orientation_rpy: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    data_width: int = 640
    data_height: int = 480
    fx: float = 525.0
    fy: float = 525.0
    cx: float = 319.5
    cy: float = 239.5
    invalid_value: float = 0.0
    model: SensorModel = field(default_factory=SensorModel)

    def pose(self) -> np.ndarray:
        return transforms.from_rpy(self.orientation_rpy, self.position, xp=np)

    def process_depth_image(self, depth):
        """Depth image -> world-frame points (kernel_preprocess*DepthImage +
        pose transform). NaN rows mark invalid measurements."""
        import jax.numpy as jnp

        pts = depth_image_to_point_cloud(
            depth, self.fx, self.fy, self.cx, self.cy, self.invalid_value
        )
        return transforms.transform_points(jnp.asarray(self.pose()), pts)


class DepthSource:
    """Kinect-grabber contract: poll the latest frame (helpers/Kinect.h)."""

    def get_frame(self) -> Optional[np.ndarray]:
        raise NotImplementedError


class SyntheticDepthSource(DepthSource):
    """Procedural frames (moving wall + noise) for demos and tests."""

    def __init__(self, sensor: Sensor, seed: int = 0):
        self.sensor = sensor
        self.rng = np.random.default_rng(seed)
        self.t = 0

    def get_frame(self) -> np.ndarray:
        h, w = self.sensor.data_height, self.sensor.data_width
        depth = np.full((h, w), 4.0 + np.sin(self.t / 5.0), np.float32)
        depth += self.rng.normal(0, 0.01, (h, w)).astype(np.float32)
        self.t += 1
        return depth


class ReplayDepthSource(DepthSource):
    """Replays recorded frames (an .npy stack) in a loop."""

    def __init__(self, frames: np.ndarray):
        self.frames = np.asarray(frames, np.float32)
        self.i = 0

    def get_frame(self) -> np.ndarray:
        f = self.frames[self.i % len(self.frames)]
        self.i += 1
        return f
