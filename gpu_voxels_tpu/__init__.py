"""gpu_voxels_tpu — a TPU-native voxel-world collision engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CUDA
GPU-Voxels library (reference: Changliu52/gpu-voxels): volumetric maps
(probabilistic, 256-bit deterministic, distance, counting; dense, sparse-list
and hierarchical), point-cloud/robot insertion, collision detection, swept
volumes, sensor fusion, Euclidean distance transforms, and a high-level scene
facade — all formulated as fused, jittable array programs that keep the whole
sense -> insert -> collide loop on-device.
"""
from .constants import (
    BIT_VECTOR_LENGTH,
    MAX_PROBABILITY,
    MIN_PROBABILITY,
    UNKNOWN_PROBABILITY,
    BitVoxelMeaning,
    MapType,
    float_to_probability,
)

__version__ = "0.1.0"

__all__ = [
    "BIT_VECTOR_LENGTH",
    "BitVoxelMeaning",
    "MapType",
    "MAX_PROBABILITY",
    "MIN_PROBABILITY",
    "UNKNOWN_PROBABILITY",
    "float_to_probability",
    "__version__",
]
