from . import config, io, logging, perfmon

__all__ = ["config", "io", "logging", "perfmon"]
