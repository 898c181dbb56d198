"""Bilateral-grid exposure correction (parity: examples/lib_bilagrid.py:56-366).

Per-image learnable 3D grids of 3x4 affine color transforms, sliced by
(x, y, luminance) with trilinear interpolation — "Bilateral Guided Radiance
Field Processing" (SIGGRAPH 2024) as used by the reference trainer for
per-view exposure compensation, plus the total-variation regularizer and the
`color_correct` eval-time affine fit.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

RGB2GRAY = jnp.asarray([0.299, 0.587, 0.114])


def init_bilateral_grid(
    n_images: int, grid_x: int = 16, grid_y: int = 16, grid_w: int = 8
) -> Dict[str, jax.Array]:
    """Identity-affine grids [n, W, Y, X, 12]."""
    ident = np.zeros((12,), np.float32)
    ident[0], ident[5], ident[10] = 1.0, 1.0, 1.0  # rows of [I | 0]
    grids = np.tile(ident, (n_images, grid_w, grid_y, grid_x, 1))
    return {"grids": jnp.asarray(grids)}


def _trilerp(grid: jax.Array, u, v, w):
    """Sample grid [W, Y, X, 12] at continuous (u=x, v=y, w=gray) in [0,1]."""
    W, Y, X, _ = grid.shape
    gx = u * (X - 1)
    gy = v * (Y - 1)
    gz = w * (W - 1)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, X - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, Y - 1)
    z0 = jnp.clip(jnp.floor(gz).astype(jnp.int32), 0, W - 1)
    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    z1 = jnp.minimum(z0 + 1, W - 1)
    fx = gx - x0
    fy = gy - y0
    fz = gz - z0

    def g(z, y, x):
        return grid[z, y, x]  # [..., 12]

    c00 = g(z0, y0, x0) * (1 - fx[..., None]) + g(z0, y0, x1) * fx[..., None]
    c01 = g(z0, y1, x0) * (1 - fx[..., None]) + g(z0, y1, x1) * fx[..., None]
    c10 = g(z1, y0, x0) * (1 - fx[..., None]) + g(z1, y0, x1) * fx[..., None]
    c11 = g(z1, y1, x0) * (1 - fx[..., None]) + g(z1, y1, x1) * fx[..., None]
    c0 = c00 * (1 - fy[..., None]) + c01 * fy[..., None]
    c1 = c10 * (1 - fy[..., None]) + c11 * fy[..., None]
    return c0 * (1 - fz[..., None]) + c1 * fz[..., None]


def slice_grid(
    params: Dict[str, jax.Array],
    image_ids: jax.Array,  # [B]
    rgb: jax.Array,  # [B, H, W, 3]
) -> jax.Array:
    """Apply each image's bilateral grid to its rendered RGB."""
    grids = params["grids"][image_ids]  # [B, W, Y, X, 12]
    B, H, Wd = rgb.shape[:3]
    u = (jnp.arange(Wd) + 0.5) / Wd
    v = (jnp.arange(H) + 0.5) / H
    uu = jnp.broadcast_to(u[None, None, :], (B, H, Wd))
    vv = jnp.broadcast_to(v[None, :, None], (B, H, Wd))
    gray = jnp.clip(jnp.einsum("bhwc,c->bhw", rgb, RGB2GRAY), 0.0, 1.0)
    affine = jax.vmap(_trilerp)(grids, uu, vv, gray)  # [B, H, W, 12]
    A = affine.reshape(B, H, Wd, 3, 4)
    return jnp.einsum("bhwij,bhwj->bhwi", A[..., :3], rgb) + A[..., 3]


def total_variation_loss(grids: jax.Array) -> jax.Array:
    """TV regularizer over the grid dims (lib_bilagrid.py total_variation_loss)."""
    d = 0.0
    for axis in (1, 2, 3):
        diff = jnp.diff(grids, axis=axis)
        d = d + jnp.mean(diff**2)
    return d


def color_correct(
    img: jax.Array, ref: jax.Array, num_iters: int = 5, eps: float = 0.5 / 255
) -> jax.Array:
    """Per-image least-squares affine color fit of `img` to `ref` for eval
    (lib_bilagrid.py color_correct)."""
    shape = img.shape
    x = img.reshape(-1, 3)
    y = ref.reshape(-1, 3)
    ones = jnp.ones((x.shape[0], 1), x.dtype)
    A = jnp.concatenate([x, ones], axis=1)  # [P, 4]
    # ridge-regularized normal equations
    AtA = A.T @ A + 1e-4 * jnp.eye(4)
    AtY = A.T @ y
    M = jnp.linalg.solve(AtA, AtY)  # [4, 3]
    out = A @ M
    return jnp.clip(out.reshape(shape), 0.0, 1.0)
