from . import files, generation, pointcloud, transforms
from .pointcloud import MetaPointCloud, PointCloud

__all__ = [
    "MetaPointCloud",
    "PointCloud",
    "files",
    "generation",
    "pointcloud",
    "transforms",
]
