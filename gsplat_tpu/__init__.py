"""gsplat_tpu: TPU-native 3D Gaussian Splatting in JAX/XLA/Pallas.

A from-scratch reimplementation of the capabilities of gsplat / gsplat-triton
(differentiable tile-based Gaussian rasterization, densification strategies,
training harness, distributed rendering) designed for TPU: static shapes,
Pallas kernels, shard_map parallelism. See SURVEY.md at the repo root.
"""

from ._helper import load_test_data
from .ops import (
    fully_fused_projection,
    isect_tiles,
    quat_scale_to_covar_preci,
    rasterize_to_pixels_ref,
    spherical_harmonics,
)
from .rendering import rasterization
from .relocation import compute_relocation, make_binoms
from .strategy import DefaultStrategy, MCMCStrategy, Strategy

__version__ = "0.1.0"

__all__ = [
    "rasterization",
    "fully_fused_projection",
    "isect_tiles",
    "quat_scale_to_covar_preci",
    "rasterize_to_pixels_ref",
    "spherical_harmonics",
    "load_test_data",
    "compute_relocation",
    "make_binoms",
    "Strategy",
    "DefaultStrategy",
    "MCMCStrategy",
    "__version__",
]
