"""2DGS (surfel) oracle rasterizer: pure jnp, differentiable, O(N * pixels).

Parity: gsplat/cuda/csrc/RasterizeToPixels2DGSFwd.cu (sigma math :340-361,
distortion :389-399, median :402-405) and the autodiff oracle
gsplat/cuda/_torch_impl_2dgs.py:78-169. Same acceptance/termination
semantics as the 3DGS oracle (alpha in [1/255, 0.999], inclusive
transmittance > 1e-4).

Extra outputs beyond 3DGS:
  - render_normals: alpha-composited per-Gaussian normals [C, H, W, 3]
  - render_distort: Mip-NeRF-360-style L1 depth distortion per pixel
    (streaming pairwise form: 2 * sum_i w_i (m_i * W_{<i} - WM_{<i}))
  - render_median: depth of the last Gaussian with transmittance > 0.5
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .rasterize_ref import ALPHA_MAX, ALPHA_MIN, TRANSMITTANCE_EPS


def rasterize_to_pixels_2dgs_ref(
    means2d: jax.Array,  # [C, N, 2]
    ray_transforms: jax.Array,  # [C, N, 3, 3]
    colors: jax.Array,  # [C, N, D] (last channel = depth if distort/median)
    normals: jax.Array,  # [C, N, 3]
    opacities: jax.Array,  # [C, N]
    radii: jax.Array,  # [C, N] int32
    depths: jax.Array,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int = 16,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (render_colors [C,H,W,D], alphas [C,H,W,1], render_normals
    [C,H,W,3], render_distort [C,H,W,1], render_median [C,H,W,1])."""
    C, N, _ = means2d.shape
    D = colors.shape[-1]

    depth_bits = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(depths), jnp.int32
    )
    order = jnp.argsort(depth_bits, axis=-1, stable=True)  # [C, N]

    def take(x):
        return jnp.take_along_axis(
            x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1
        )

    means2d = take(means2d)
    M = take(ray_transforms.reshape(C, N, 9)).reshape(C, N, 3, 3)
    colors = take(colors)
    normals = take(normals)
    opacities = take(opacities[..., None])[..., 0]
    radii = take(radii[..., None])[..., 0]

    # tile-rect culling, identical to isect_tiles
    tile_means = jax.lax.stop_gradient(means2d) / tile_size
    tile_r = (radii / tile_size)[..., None]
    tmin = jnp.floor(tile_means - tile_r).astype(jnp.int32)
    tmax = jnp.ceil(tile_means + tile_r).astype(jnp.int32)

    py, px = jnp.mgrid[0:image_height, 0:image_width]
    px = px.reshape(-1).astype(jnp.float32) + 0.5  # [P]
    py = py.reshape(-1).astype(jnp.float32) + 0.5
    ptx = (px - 0.5).astype(jnp.int32) // tile_size
    pty = (py - 0.5).astype(jnp.int32) // tile_size

    # sigma: h_u x h_v ray-plane intersection (Fwd.cu:340-358)
    # h_u = -M[0] + px * M[2]; h_v = -M[1] + py * M[2]
    Mx = M[:, None, :, 0, :]  # [C, 1, N, 3]
    My = M[:, None, :, 1, :]
    Mz = M[:, None, :, 2, :]
    pxb = px[None, :, None, None]
    pyb = py[None, :, None, None]
    h_u = -Mx + Mz * pxb  # [C, P, N, 3]
    h_v = -My + Mz * pyb
    cr = jnp.cross(h_u, h_v)
    crz = jnp.where(jnp.abs(cr[..., 2]) < 1e-12, 1e-12, cr[..., 2])
    us = cr[..., 0] / crz
    vs = cr[..., 1] / crz
    sigma_3d = us * us + vs * vs  # [C, P, N]
    dx = px[None, :, None] - means2d[:, None, :, 0]
    dy = py[None, :, None] - means2d[:, None, :, 1]
    sigma_2d = 2.0 * (dx * dx + dy * dy)
    sigma = 0.5 * jnp.minimum(sigma_3d, sigma_2d)

    alpha = jnp.clip(
        opacities[:, None, :] * jnp.exp(-sigma), None, ALPHA_MAX
    )

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

    # multiplicative chain (see rasterize_ref.py: reference semantics)
    one_m = jnp.where(valid, 1.0 - alpha, 1.0)
    T_incl = jnp.cumprod(one_m, axis=-1)
    accept = valid & (T_incl > TRANSMITTANCE_EPS)
    T_excl = jnp.concatenate(
        [jnp.ones_like(T_incl[..., :1]), T_incl[..., :-1]], axis=-1
    )  # transmittance before each gaussian
    vis = jnp.where(accept, T_excl * alpha, 0.0)  # [C, P, N]

    hp = jax.lax.Precision.HIGHEST
    render = jnp.einsum("cpn,cnd->cpd", vis, colors, precision=hp)
    render_normals = jnp.einsum("cpn,cnd->cpd", vis, normals, precision=hp)
    final_T = jnp.prod(jnp.where(accept, one_m, 1.0), axis=-1)
    render_alphas = 1.0 - final_T

    # distortion (streaming pairwise, depth = last color channel)
    m = colors[..., -1]  # [C, N]
    wm = vis * m[:, None, :]
    W_excl = jnp.cumsum(vis, axis=-1) - vis  # sum_{j<i} w_j
    WM_excl = jnp.cumsum(wm, axis=-1) - wm
    distort = jnp.sum(
        2.0 * (wm * W_excl - vis * WM_excl), axis=-1, keepdims=True
    )  # [C, P, 1]

    # median: depth of the LAST accepted gaussian with T_before > 0.5
    med_mask = accept & (T_excl > 0.5)
    idx = jnp.arange(N)[None, None, :]
    last_med = jnp.max(jnp.where(med_mask, idx, -1), axis=-1)  # [C, P]
    has = last_med >= 0
    m_at = jnp.take_along_axis(
        jnp.broadcast_to(m[:, None, :], med_mask.shape),
        jnp.clip(last_med, 0, N - 1)[..., None],
        axis=-1,
    )[..., 0]
    median = jnp.where(has, m_at, 0.0)[..., None]

    if backgrounds is not None:
        render = render + (1.0 - render_alphas)[..., None] * backgrounds[:, None, :]

    H, W = image_height, image_width
    return (
        render.reshape(C, H, W, D),
        render_alphas.reshape(C, H, W, 1),
        render_normals.reshape(C, H, W, 3),
        distort.reshape(C, H, W, 1),
        median.reshape(C, H, W, 1),
    )


def rasterize_to_indices_in_range_2dgs(
    range_start: int,
    range_end: int,
    transmittances: jax.Array,  # [C, H, W]
    means2d: jax.Array,  # [C, N, 2]
    ray_transforms: jax.Array,  # [C, N, 3, 3]
    opacities: jax.Array,  # [C, N]
    radii: jax.Array,  # [C, N]
    depths: jax.Array,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int = 16,
):
    """2DGS variant of rasterize_to_indices_in_range (parity:
    gsplat/cuda/_wrapper.rasterize_to_indices_in_range_2dgs,
    csrc/RasterizeToIndices2DGS.cu). Static-shape: returns the dense
    contribution mask [C, H*W, range] and per-pair alpha instead of dynamic
    COO lists, plus ``new_transmittances`` [C, H*W] — the fused kernel's
    termination stream to pass into the next window (see the 3DGS variant's
    docstring, ops/rasterize_ref.py)."""
    C, N, _ = means2d.shape
    depth_bits = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(depths), jnp.int32
    )
    order = jnp.argsort(depth_bits, axis=-1, stable=True)
    sel = order[:, range_start:range_end]

    def take(x):
        return jnp.take_along_axis(
            x, sel.reshape(sel.shape + (1,) * (x.ndim - 2)), axis=1
        )

    means2d = take(means2d)
    M = take(ray_transforms.reshape(C, N, 9)).reshape(
        C, sel.shape[1], 3, 3
    )
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

    Mx = M[:, None, :, 0, :]
    My = M[:, None, :, 1, :]
    Mz = M[:, None, :, 2, :]
    h_u = -Mx + Mz * px[None, :, None, None]
    h_v = -My + Mz * py[None, :, None, None]
    cr = jnp.cross(h_u, h_v)
    crz = jnp.where(jnp.abs(cr[..., 2]) < 1e-12, 1e-12, cr[..., 2])
    us, vs = cr[..., 0] / crz, cr[..., 1] / crz
    sigma_3d = us * us + vs * vs
    dx = px[None, :, None] - means2d[:, None, :, 0]
    dy = py[None, :, None] - means2d[:, None, :, 1]
    sigma = 0.5 * jnp.minimum(sigma_3d, 2.0 * (dx * dx + dy * dy))
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
