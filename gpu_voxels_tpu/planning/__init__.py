from .validity import GvlValidityChecker, MotionValidator

__all__ = ["GvlValidityChecker", "MotionValidator"]
