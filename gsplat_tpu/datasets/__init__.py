from .colmap import Dataset, Parser
from . import colmap_io, normalize, traj

__all__ = ["Dataset", "Parser", "colmap_io", "normalize", "traj"]
