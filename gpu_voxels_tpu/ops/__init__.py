from . import collide, insert

__all__ = ["collide", "insert"]
