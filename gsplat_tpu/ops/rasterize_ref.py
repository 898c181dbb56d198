"""Reference (oracle) rasterizer: pure jnp, differentiable, O(N * pixels).

This is the TPU build's analogue of the reference's pure-torch oracle
(gsplat/cuda/_torch_impl.py:522-617): a semantics-exact, autodiff-friendly
implementation of tile-based alpha compositing used as ground truth for the
Pallas kernels (values and VJPs) and as a CPU-runnable fallback for small
scenes. It is vectorized over all (pixel, gaussian) pairs, so use it only for
tests / toy problems.

Exact per-pixel semantics (parity with
gsplat/triton_impl/rasterize_to_pixels_fwd.py:60-200):
  - process Gaussians in (depth, emit-order) sorted order
  - alpha   = clip(opacity * exp(-sigma), max=0.999)
  - invalid if alpha < 1/255, sigma < 0, radii <= 0, or the pixel's tile is
    outside the Gaussian's tile rectangle (tile culling is observable: at the
    rect boundary alpha can still exceed 1/255)
  - a Gaussian is accepted iff valid and the *inclusive* transmittance
    prod_{valid j<=i}(1-alpha_j) stays > 1e-4; the first violation
    terminates the pixel
  - render = sum accepted T_excl * alpha * color + T_final * background
  - alpha clamped at 0.999 contributes no gradient through the alpha path
    (rasterize_to_pixels_bwd.py:186-190), which jnp.clip reproduces.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
TRANSMITTANCE_EPS = 1e-4


def rasterize_to_pixels_ref(
    means2d: jax.Array,  # [C, N, 2]
    conics: jax.Array,  # [C, N, 3]
    colors: jax.Array,  # [C, N, D]
    opacities: jax.Array,  # [C, N]
    radii: jax.Array,  # [C, N] int32
    depths: jax.Array,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int = 16,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
) -> Tuple[jax.Array, jax.Array]:
    """Alpha-composite Gaussians to pixels (oracle path).

    Returns (render_colors [C, H, W, D], render_alphas [C, H, W, 1]).
    """
    C, N, _ = means2d.shape
    D = colors.shape[-1]
    tile_width = -(-image_width // tile_size)
    tile_height = -(-image_height // tile_size)

    # Sort by depth (f32 bit order), stable => emit order ties resolved by index,
    # matching the stable lax.sort over (tile, depth) keys in the tiled path.
    depth_bits = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(depths), jnp.int32
    )
    order = jnp.argsort(depth_bits, axis=-1, stable=True)  # [C, N]

    def take(x):
        return jnp.take_along_axis(
            x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1
        )

    means2d = take(means2d)
    conics = take(conics)
    colors = take(colors)
    opacities = take(opacities[..., None])[..., 0]
    radii = take(radii[..., None])[..., 0]

    # Tile rectangle per (cam, gaussian), identical to isect_tiles.
    tile_means = jax.lax.stop_gradient(means2d) / tile_size
    tile_r = (radii / tile_size)[..., None]
    tmin = jnp.floor(tile_means - tile_r).astype(jnp.int32)
    tmax = jnp.ceil(tile_means + tile_r).astype(jnp.int32)

    # Pixel coordinates (+0.5 center convention).
    py, px = jnp.mgrid[0:image_height, 0:image_width]
    px = px.reshape(-1).astype(jnp.float32) + 0.5
    py = py.reshape(-1).astype(jnp.float32) + 0.5
    ptx = (px - 0.5).astype(jnp.int32) // tile_size  # [P]
    pty = (py - 0.5).astype(jnp.int32) // tile_size

    dx = px[None, :, None] - means2d[:, None, :, 0]  # [C, P, N]
    dy = py[None, :, None] - means2d[:, None, :, 1]
    a = conics[:, None, :, 0]
    bq = conics[:, None, :, 1]
    c = conics[:, None, :, 2]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + bq * dx * dy
    alpha = jnp.clip(opacities[:, None, :] * jnp.exp(-sigma), None, ALPHA_MAX)

    in_rect = (
        (ptx[None, :, None] >= tmin[:, None, :, 0])
        & (ptx[None, :, None] < tmax[:, None, :, 0])
        & (pty[None, :, None] >= tmin[:, None, :, 1])
        & (pty[None, :, None] < tmax[:, None, :, 1])
    )
    valid = (
        (alpha >= ALPHA_MIN)
        & (sigma >= 0.0)
        & (radii[:, None, :] > 0)
        & in_rect
    )

    # multiplicative transmittance chain — the reference CUDA kernels'
    # own semantics (progressive T *= (1-alpha)), and what the Pallas
    # kernels compute; a log-space chain flips accept decisions at the
    # T ~ eps boundary by fp rounding, which is observable at ~1e-4
    one_m = jnp.where(valid, 1.0 - alpha, 1.0)
    T_incl = jnp.cumprod(one_m, axis=-1)  # [C, P, N]
    accept = valid & (T_incl > TRANSMITTANCE_EPS)
    T_excl = jnp.concatenate(
        [jnp.ones_like(T_incl[..., :1]), T_incl[..., :-1]], axis=-1
    )

    vis = jnp.where(accept, T_excl * alpha, 0.0)
    # HIGHEST: on TPU the default einsum precision is bf16, far below the
    # f32 accuracy this oracle must provide as ground truth.
    render = jnp.einsum(
        "cpn,cnd->cpd", vis, colors, precision=jax.lax.Precision.HIGHEST
    )
    final_T = jnp.prod(jnp.where(accept, one_m, 1.0), axis=-1)  # [C, P]
    render_alphas = 1.0 - final_T

    if backgrounds is not None:
        render = render + (1.0 - render_alphas)[..., None] * backgrounds[:, None, :]

    return (
        render.reshape(C, image_height, image_width, D),
        render_alphas.reshape(C, image_height, image_width, 1),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def rasterize_to_pixels_ref_absgrad(
    means2d,  # [C, N, 2]
    conics,  # [C, N, 3]
    colors,  # [C, N, D]
    opacities,  # [C, N]
    radii,  # [C, N] int32
    depths,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int,
    backgrounds,  # [C, D] (pass zeros rather than None)
    abs_carrier,  # [C, N, 2] zeros; cotangent = per-tile absgrad
):
    """Oracle rasterize whose extra ``abs_carrier`` input has the reference's
    absgrad statistic as its gradient: sum over tiles of |per-tile d mu2d|
    (gsplat/triton_impl/rasterize_to_pixels_bwd.py:282-292 accumulates
    |gradient| per tile inside the kernel, so a Gaussian spanning several
    tiles gets the sum of absolute per-tile contributions, not the absolute
    value of their sum). Forward output is independent of ``abs_carrier``.

    The backward replays one masked-cotangent VJP per tile — O(T x forward),
    oracle/test use only.
    """
    return rasterize_to_pixels_ref(
        means2d, conics, colors, opacities, radii, depths,
        image_width, image_height, tile_size, backgrounds,
    )


def _ref_absgrad_fwd(
    means2d, conics, colors, opacities, radii, depths, W, H, ts,
    backgrounds, abs_carrier,
):
    out = rasterize_to_pixels_ref(
        means2d, conics, colors, opacities, radii, depths, W, H, ts,
        backgrounds,
    )
    return out, (means2d, conics, colors, opacities, radii, depths, backgrounds)


def _ref_absgrad_bwd(W, H, ts, res, cts):
    means2d, conics, colors, opacities, radii, depths, backgrounds = res
    tile_width = -(-W // ts)
    tile_height = -(-H // ts)

    def f(m2, co, cl, op, bg):
        return rasterize_to_pixels_ref(
            m2, co, cl, op, radii, depths, W, H, ts, bg
        )

    _, vjp = jax.vjp(f, means2d, conics, colors, opacities, backgrounds)
    g_m2, g_co, g_cl, g_op, g_bg = vjp(cts)

    _, vjp_m = jax.vjp(lambda m2: f(m2, conics, colors, opacities, backgrounds), means2d)
    py, px = jnp.mgrid[0:H, 0:W]
    tid = (py // ts) * tile_width + (px // ts)  # [H, W]
    v_render, v_alpha = cts

    def per_tile(t):
        m = (tid == t)[None, :, :, None].astype(v_render.dtype)
        (g,) = vjp_m((v_render * m, v_alpha * m))
        return jnp.abs(g)

    absg = jax.lax.map(per_tile, jnp.arange(tile_width * tile_height))
    v_absc = jnp.sum(absg, axis=0)  # [C, N, 2]

    import numpy as _np

    zi = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return (
        g_m2, g_co, g_cl, g_op, zi(radii), jnp.zeros_like(depths), g_bg,
        v_absc,
    )


rasterize_to_pixels_ref_absgrad.defvjp(_ref_absgrad_fwd, _ref_absgrad_bwd)


def rasterize_to_indices_in_range(
    range_start: int,
    range_end: int,
    transmittances: jax.Array,  # [C, H, W] current per-pixel transmittance
    means2d: jax.Array,  # [C, N, 2]
    conics: jax.Array,  # [C, N, 3]
    opacities: jax.Array,  # [C, N]
    radii: jax.Array,  # [C, N]
    depths: jax.Array,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int = 16,
):
    """Which (pixel, gaussian) pairs contribute within a depth-rank range.

    Parity: gsplat/cuda/_wrapper.rasterize_to_indices_in_range
    (csrc/RasterizeToIndices3DGS.cu), which returns dynamically-sized
    (gs_ids, pixel_ids, camera_ids) COO lists for the iterative
    torch-autograd pipeline. Dynamic shapes don't exist on TPU, so this
    returns the dense boolean contribution mask [C, H*W, range] plus the
    per-pair alpha — callers iterate fixed-size depth-rank windows instead
    of dynamic batches (same information, static shapes).

    Returns (contrib [C, H*W, R] bool, alpha [C, H*W, R], sel [C, R],
    new_transmittances [C, H*W]). Chain windows by passing
    ``new_transmittances`` as the next window's ``transmittances``: it
    advances the fused kernel's *termination* stream (accumulated over all
    valid pairs, accepted or not), so iterating every window reproduces
    rasterize_to_pixels_ref exactly — chaining the accepted-only
    transmittance instead would resurrect pixels the fused render
    terminated (the reference's dynamic pipeline has that same edge case).
    """
    C, N, _ = means2d.shape
    depth_bits = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(depths), jnp.int32
    )
    order = jnp.argsort(depth_bits, axis=-1, stable=True)
    sel = order[:, range_start:range_end]  # [C, R]

    def take(x):
        return jnp.take_along_axis(
            x, sel.reshape(sel.shape + (1,) * (x.ndim - 2)), axis=1
        )

    means2d = take(means2d)
    conics = take(conics)
    opacities = take(opacities[..., None])[..., 0]
    radii = take(radii[..., None])[..., 0]

    py, px = jnp.mgrid[0:image_height, 0:image_width]
    px = px.reshape(-1).astype(jnp.float32) + 0.5
    py = py.reshape(-1).astype(jnp.float32) + 0.5
    ptx = (px - 0.5).astype(jnp.int32) // tile_size
    pty = (py - 0.5).astype(jnp.int32) // tile_size

    tile_means = jax.lax.stop_gradient(means2d) / tile_size
    tile_r = (radii / tile_size)[..., None]
    tmin = jnp.floor(tile_means - tile_r).astype(jnp.int32)
    tmax = jnp.ceil(tile_means + tile_r).astype(jnp.int32)

    dx = px[None, :, None] - means2d[:, None, :, 0]
    dy = py[None, :, None] - means2d[:, None, :, 1]
    a, b, c = (conics[:, None, :, i] for i in range(3))
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    alpha = jnp.clip(opacities[:, None, :] * jnp.exp(-sigma), None, ALPHA_MAX)
    in_rect = (
        (ptx[None, :, None] >= tmin[:, None, :, 0])
        & (ptx[None, :, None] < tmax[:, None, :, 0])
        & (pty[None, :, None] >= tmin[:, None, :, 1])
        & (pty[None, :, None] < tmax[:, None, :, 1])
    )
    valid = (
        (alpha >= ALPHA_MIN) & (sigma >= 0.0) & (radii[:, None, :] > 0) & in_rect
    )
    T0 = transmittances.reshape(C, -1)[..., None]
    one_m = jnp.where(valid, 1.0 - alpha, 1.0)
    T_incl = T0 * jnp.cumprod(one_m, axis=-1)
    contrib = valid & (T_incl > TRANSMITTANCE_EPS)
    new_T = T0[..., 0] * jnp.prod(one_m, axis=-1)
    return contrib, alpha, sel, new_T
