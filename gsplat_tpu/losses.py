"""Training losses and image metrics, pure jnp.

The reference trainer uses fused_ssim (CUDA) + torchmetrics PSNR/SSIM/LPIPS
(examples/simple_trainer.py:429-442,642-646). Here SSIM is the standard
11x11 Gaussian-window formulation implemented as depthwise convolutions —
XLA maps these straight onto the TPU convolution units; no custom kernel is
warranted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(img: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise 2D filter. img [B, H, W, C], window [k, k]."""
    C = img.shape[-1]
    k = window.shape[0]
    w = jnp.broadcast_to(window[:, :, None, None], (k, k, 1, C))
    return jax.lax.conv_general_dilated(
        img,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        # f32: at TPU-default bf16 conv precision the variance terms
        # (E[x^2] - mu^2) cancel catastrophically on smooth renders and
        # SSIM leaves [-1, 1]
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    img0: jax.Array,  # [B, H, W, C] in [0, 1]
    img1: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
) -> jax.Array:
    """Mean SSIM over the batch (standard Gaussian-window formulation)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    window = jnp.asarray(_gaussian_window(window_size, sigma))

    mu0 = _filter2d(img0, window)
    mu1 = _filter2d(img1, window)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = _filter2d(img0 * img0, window) - mu00
    s11 = _filter2d(img1 * img1, window) - mu11
    s01 = _filter2d(img0 * img1, window) - mu01

    ssim_map = ((2 * mu01 + c1) * (2 * s01 + c2)) / (
        (mu00 + mu11 + c1) * (s00 + s11 + c2)
    )
    return jnp.mean(ssim_map)


def psnr(img0: jax.Array, img1: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((img0 - img1) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.clip(mse, 1e-12, None))


def l1(img0: jax.Array, img1: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(img0 - img1))


def train_loss(
    render: jax.Array,
    target: jax.Array,
    ssim_lambda: float = 0.2,
) -> jax.Array:
    """(1-l) * L1 + l * (1 - SSIM) (examples/simple_trainer.py:642-646)."""
    return l1(render, target) * (1.0 - ssim_lambda) + ssim_lambda * (
        1.0 - ssim(render, target)
    )
