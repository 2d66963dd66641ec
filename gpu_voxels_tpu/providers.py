"""Provider abstraction (reference: octree/test/Provider.h:46-107).

The reference's benchmark/live apps drive maps through a common contract:
init / visualize / collide / waitForNewData / newSensorData / setCollideWith,
with NTreeProvider / VoxelMapProvider / OctomapProvider implementations.
Here one generic implementation wraps any map kind; sensor data arrives from
a DepthSource (sensors module) instead of a live Kinect.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

from .sensors import DepthSource, Sensor
from .vis.provider import VisProvider


class Provider:
    """init/visualize/collide/waitForNewData/newSensorData contract."""

    def __init__(self, name: str, carve_pool: int = 1):
        """carve_pool=1 fuses depth frames with the exact per-pixel carve
        (reference semantics); carve_pool=8 selects the Pallas pooled
        conservative carve — the 75 Hz live-sensor configuration
        (docs/PERFORMANCE.md)."""
        self.name = name
        self.map = None
        self.carve_pool = int(carve_pool)
        self.collide_with_provider: Optional["Provider"] = None
        self._vis = VisProvider(name)
        self._last_data_time = 0.0

    def init(self, initial_map) -> None:
        self.map = initial_map

    def set_collide_with(self, other: "Provider") -> None:
        self.collide_with_provider = other

    def collide(self) -> int:
        if self.collide_with_provider is None or self.collide_with_provider.map is None:
            return 0
        return int(self.map.collide_with(self.collide_with_provider.map))

    def new_sensor_data(self, depth: np.ndarray, sensor: Sensor) -> None:
        if hasattr(self.map, "insert_depth_image"):
            self.map = self.map.insert_depth_image(depth, sensor, carve_pool=self.carve_pool)
        else:
            pts = np.asarray(sensor.process_depth_image(depth))
            pts = pts[np.isfinite(pts).all(axis=1)]
            self.map = self.map.insert_point_cloud(pts)
        self._last_data_time = time.monotonic()

    def wait_for_new_data(self, source: DepthSource, sensor: Sensor, timeout_s: float = 1.0) -> bool:
        frame = source.get_frame()
        if frame is None:
            return False
        self.new_sensor_data(frame, sensor)
        return True

    def visualize(self, force_repaint: bool = True) -> bool:
        return self._vis.visualize(self.map, force_repaint)
