"""COO alpha compositing (`accumulate` / `accumulate_2dgs`).

Parity: gsplat/cuda/_torch_impl.py:432-521 and _torch_impl_2dgs.py:78-169 —
the reference's "playground" compositors that alpha-blend an explicit
(gaussian_ids, pixel_ids, camera_ids) intersection list via nerfacc's packed
per-ray transmittance. They pair with `rasterize_to_indices_in_range`: dump
the contributing pairs, then re-composite them under plain autodiff to
prototype new blending math without touching the fused kernels.

TPU redesign notes:
  - The id lists here are STATIC-length (JAX shapes); padded slots are
    disabled through the optional ``valid`` mask (or by pointing them at an
    out-of-range camera id, which segment_sum drops). nerfacc's dynamic
    [M] packing is the torch idiom for the same data.
  - nerfacc computes the per-ray exclusive transmittance with a global
    log-space cumsum, which needs f64 to survive long streams (see
    tests/ref_raster_torch.py). Here it is a SEGMENTED multiplicative scan
    (`associative_scan` over a (reset-flag, product) monoid): no global
    accumulation, so f32 stays exact to ~1e-7 regardless of stream length.
    Rays must be contiguous runs, depth-ordered within each run — the same
    packing contract nerfacc requires.
  - O(M) gathers make this a test/prototyping utility, not a training
    path — exactly like the reference's version ("much slower than our
    fully fused rasterization").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .rasterize_ref import ALPHA_MAX


def _segmented_weights(
    alphas: jax.Array,  # [M] in [0, ALPHA_MAX], 0 at disabled slots
    rays: jax.Array,  # [M] i32 ray index; contiguous runs
) -> jax.Array:
    """Per-sample weight a_i * prod_{j<i, same ray} (1 - a_j)."""
    one_m = 1.0 - alphas
    first = jnp.concatenate(
        [jnp.ones((1,), bool), rays[1:] != rays[:-1]]
    )

    # segmented product monoid: x∘y = (fx|fy, fy ? vy : vx*vy)
    def combine(x, y):
        fx, vx = x
        fy, vy = y
        return fx | fy, jnp.where(fy, vy, vx * vy)

    _, incl = jax.lax.associative_scan(combine, (first, one_m))
    # exclusive within the segment: shift right, 1 at segment starts
    excl = jnp.where(
        first, 1.0, jnp.concatenate([jnp.ones((1,), incl.dtype), incl[:-1]])
    )
    return alphas * excl


def accumulate(
    means2d: jax.Array,  # [C, N, 2]
    conics: jax.Array,  # [C, N, 3]
    opacities: jax.Array,  # [C, N]
    colors: jax.Array,  # [C, N, D]
    gaussian_ids: jax.Array,  # [M] i32
    pixel_ids: jax.Array,  # [M] i32 (row-major within an image)
    camera_ids: jax.Array,  # [M] i32
    image_width: int,
    image_height: int,
    valid: Optional[jax.Array] = None,  # [M] bool; False = padded slot
) -> Tuple[jax.Array, jax.Array]:
    """Composite an explicit intersection list (3DGS sigma).

    Returns (renders [C, H, W, D], alphas [C, H, W, 1]). Entries must be
    grouped by (camera, pixel) ray and depth-ordered within each group —
    the order `rasterize_to_indices_in_range` emits.
    """
    C = means2d.shape[0]
    D = colors.shape[-1]
    px = (pixel_ids % image_width).astype(jnp.float32) + 0.5
    py = (pixel_ids // image_width).astype(jnp.float32) + 0.5
    mu = means2d[camera_ids, gaussian_ids]  # [M, 2]
    con = conics[camera_ids, gaussian_ids]  # [M, 3]
    op = opacities[camera_ids, gaussian_ids]  # [M]
    dx = px - mu[:, 0]
    dy = py - mu[:, 1]
    sigma = 0.5 * (con[:, 0] * dx * dx + con[:, 2] * dy * dy) + con[:, 1] * dx * dy
    alphas = jnp.minimum(op * jnp.exp(-sigma), ALPHA_MAX)
    if valid is not None:
        alphas = jnp.where(valid, alphas, 0.0)

    rays = camera_ids * (image_height * image_width) + pixel_ids
    w = _segmented_weights(alphas, rays)
    total = C * image_height * image_width
    renders = jax.ops.segment_sum(
        w[:, None] * colors[camera_ids, gaussian_ids], rays, num_segments=total
    ).reshape(C, image_height, image_width, D)
    accum_alpha = jax.ops.segment_sum(w, rays, num_segments=total).reshape(
        C, image_height, image_width, 1
    )
    return renders, accum_alpha


def accumulate_2dgs(
    means2d: jax.Array,  # [C, N, 2]
    ray_transforms: jax.Array,  # [C, N, 3, 3]
    opacities: jax.Array,  # [C, N]
    colors: jax.Array,  # [C, N, D]
    normals: jax.Array,  # [C, N, 3]
    gaussian_ids: jax.Array,  # [M] i32
    pixel_ids: jax.Array,  # [M] i32
    camera_ids: jax.Array,  # [M] i32
    image_width: int,
    image_height: int,
    valid: Optional[jax.Array] = None,  # [M] bool
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Composite an explicit intersection list (2DGS ray-splat sigma).

    Returns (renders [C, H, W, D], alphas [C, H, W, 1],
    normals [C, H, W, 3]). Sigma is the splat-plane intersection weight
    min'd with the 2D low-pass filter, exactly _torch_impl_2dgs.py:131-143.
    """
    C = means2d.shape[0]
    D = colors.shape[-1]
    px = (pixel_ids % image_width).astype(jnp.float32) + 0.5
    py = (pixel_ids // image_width).astype(jnp.float32) + 0.5
    mu = means2d[camera_ids, gaussian_ids]  # [M, 2]
    M3 = ray_transforms[camera_ids, gaussian_ids]  # [M, 3, 3]
    op = opacities[camera_ids, gaussian_ids]

    h_u = -M3[:, 0, :] + M3[:, 2, :] * px[:, None]  # [M, 3]
    h_v = -M3[:, 1, :] + M3[:, 2, :] * py[:, None]
    cross = jnp.cross(h_u, h_v)
    zsafe = jnp.where(cross[:, 2] == 0.0, 1.0, cross[:, 2])
    us = cross[:, 0] / zsafe
    vs = cross[:, 1] / zsafe
    sigma_3d = us * us + vs * vs
    dx = mu[:, 0] - px
    dy = mu[:, 1] - py
    sigma_2d = 2.0 * (dx * dx + dy * dy)
    sigma = 0.5 * jnp.minimum(sigma_3d, sigma_2d)
    alphas = jnp.minimum(op * jnp.exp(-sigma), ALPHA_MAX)
    alphas = jnp.where(cross[:, 2] == 0.0, 0.0, alphas)
    if valid is not None:
        alphas = jnp.where(valid, alphas, 0.0)

    rays = camera_ids * (image_height * image_width) + pixel_ids
    w = _segmented_weights(alphas, rays)
    total = C * image_height * image_width
    renders = jax.ops.segment_sum(
        w[:, None] * colors[camera_ids, gaussian_ids], rays, num_segments=total
    ).reshape(C, image_height, image_width, D)
    accum_alpha = jax.ops.segment_sum(w, rays, num_segments=total).reshape(
        C, image_height, image_width, 1
    )
    renders_normal = jax.ops.segment_sum(
        w[:, None] * normals[camera_ids, gaussian_ids], rays, num_segments=total
    ).reshape(C, image_height, image_width, 3)
    return renders, accum_alpha, renders_normal
