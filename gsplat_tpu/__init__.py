"""gsplat_tpu: TPU-native 3D Gaussian Splatting in JAX/XLA/Pallas.

A from-scratch reimplementation of the capabilities of gsplat / gsplat-triton
(differentiable tile-based Gaussian rasterization, densification strategies,
training harness, distributed rendering) designed for TPU: static shapes,
Pallas kernels, shard_map parallelism. See SURVEY.md at the repo root.
"""

from ._helper import load_test_data
from .version import __version__
from .compression import PngCompression
from .ops import (
    accumulate,
    accumulate_2dgs,
    fully_fused_projection,
    fully_fused_projection_packed,
    isect_tiles,
    quat_scale_to_covar_preci,
    rasterize_to_pixels,
    rasterize_to_pixels_2dgs,
    rasterize_to_pixels_ref,
    spherical_harmonics,
)
from .ops.isect import isect_offset_encode
from .ops.projection import fully_fused_projection_soa, proj, world_to_cam
from .ops.projection_2dgs import (
    fully_fused_projection_2dgs,
    fully_fused_projection_2dgs_packed,
)

# drop-in alias: the reference exports this op under a misspelled name
# (gsplat/__init__.py "full_fused_projection_2dgs"); keep both so code
# written against the reference imports unchanged.
full_fused_projection_2dgs = fully_fused_projection_2dgs
from .ops.rasterize_ref import rasterize_to_indices_in_range
from .ops.rasterize_2dgs_ref import (
    rasterize_to_indices_in_range_2dgs,
    rasterize_to_pixels_2dgs_ref,
)
from .optimizers import SelectiveAdam
from .rendering import rasterization, rasterization_2dgs
from .relocation import compute_relocation, make_binoms
from .strategy import DefaultStrategy, MCMCStrategy, Strategy


__all__ = [
    "accumulate",
    "accumulate_2dgs",
    "rasterization",
    "rasterization_2dgs",
    "PngCompression",
    "SelectiveAdam",
    "proj",
    "world_to_cam",
    "isect_offset_encode",
    "fully_fused_projection_soa",
    "fully_fused_projection_2dgs",
    "full_fused_projection_2dgs",
    "rasterize_to_indices_in_range",
    "rasterize_to_indices_in_range_2dgs",
    "rasterize_to_pixels_2dgs_ref",
    "fully_fused_projection",
    "fully_fused_projection_packed",
    "fully_fused_projection_2dgs_packed",
    "isect_tiles",
    "quat_scale_to_covar_preci",
    "rasterize_to_pixels",
    "rasterize_to_pixels_2dgs",
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
