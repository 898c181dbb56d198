from .accumulate import accumulate, accumulate_2dgs
from .isect import Isect, isect_tiles, suggest_capacity
from .projection import (
    fisheye_proj,
    fully_fused_projection,
    fully_fused_projection_packed,
    ortho_proj,
    persp_proj,
    quat_scale_to_covar_preci,
    quat_to_rotmat,
    world_to_cam,
)
from .projection_2dgs import (
    fully_fused_projection_2dgs,
    fully_fused_projection_2dgs_packed,
)
from .rasterize import rasterize_to_pixels, rasterize_to_pixels_2dgs
from .rasterize_ref import rasterize_to_pixels_ref
from .sh import eval_sh_bases, spherical_harmonics

__all__ = [
    "accumulate",
    "accumulate_2dgs",
    "Isect",
    "isect_tiles",
    "suggest_capacity",
    "fully_fused_projection",
    "fully_fused_projection_packed",
    "fully_fused_projection_2dgs",
    "fully_fused_projection_2dgs_packed",
    "quat_scale_to_covar_preci",
    "quat_to_rotmat",
    "world_to_cam",
    "persp_proj",
    "ortho_proj",
    "fisheye_proj",
    "rasterize_to_pixels",
    "rasterize_to_pixels_2dgs",
    "rasterize_to_pixels_ref",
    "spherical_harmonics",
    "eval_sh_bases",
]
