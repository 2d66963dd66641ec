from .extract import extract_cubes, occupied_coords
from .provider import VisProvider

__all__ = ["VisProvider", "extract_cubes", "occupied_coords"]
