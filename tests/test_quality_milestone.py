"""Pinned quality milestones (VERDICT r3 weak item 3).

The trainer smoke tests check mechanics on noise images; nothing there
asserts a PSNR *floor*, so a silent quality regression in the kernels,
projection, or optimizer glue would pass CI. This test pins one: fitting
Gaussians to a structured target (the reference's image_fitting task,
examples/image_fitting.py:42-47) must reach a known PSNR in a fixed step
budget. The floor is set ~3dB under the measured value so only real
regressions trip it, not seed jitter.

On-hardware 30k milestones live in PERF.md (quality table) and are
re-checked by scripts/run_quality_r4.sh; this is the CI-fast proxy.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gsplat_tpu import rasterization


def _target(H, W):
    img = np.zeros((H, W, 3), np.float32)
    img[..., 0] = np.linspace(0, 1, W)[None, :]
    img[..., 1] = np.linspace(0, 1, H)[:, None]
    img[..., 2] = 1.0
    img[H // 4 : 3 * H // 4, W // 4 : 3 * W // 4] = 1.0
    return img


# measured 2026-08-19/20 (CPU, seed 42): oracle 24.60, tiled 26.95,
# binned 26.95; floors sit ~1dB below measured per backend (VERDICT r4
# weak item 5: a 3-6dB regression must not pass CI)
FLOORS = {"oracle": 23.6, "tiled": 25.9, "binned": 25.9}


@pytest.mark.parametrize("backend", ["oracle", "tiled", "binned"])
def test_image_fit_psnr_floor(backend):
    H = W = 64
    N = 256
    steps = 300
    target = jnp.asarray(_target(H, W))

    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    fov_x = math.pi / 2
    fx = 0.5 * W / math.tan(0.5 * fov_x)
    Ks = jnp.asarray([[[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]]], jnp.float32)
    viewmats = jnp.eye(4)[None].at[0, 2, 3].set(8.0).astype(jnp.float32)

    bd = 2.0
    params = {
        "means": (jax.random.uniform(k1, (N, 3)) - 0.5) * bd,
        "scales": jnp.log(jax.random.uniform(k2, (N, 3)) * 0.5 + 0.05),
        "quats": jax.random.normal(k3, (N, 4)),
        "opacities": jax.random.normal(k4, (N,)) * 0.1 + 1.0,
        "colors": jax.random.uniform(k5, (N, 3)),
    }
    cap = 65536 if backend in ("tiled", "binned") else None

    def loss_fn(p):
        render, _, _ = rasterization(
            p["means"], p["quats"] / jnp.linalg.norm(
                p["quats"], axis=-1, keepdims=True
            ),
            jnp.exp(p["scales"]), jax.nn.sigmoid(p["opacities"]),
            jax.nn.sigmoid(p["colors"]), viewmats, Ks, W, H,
            backend=backend, isect_capacity=cap,
        )
        return jnp.mean((render[0] - target) ** 2)

    tx = optax.adam(0.05)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    loss = None
    for _ in range(steps):
        loss, params, opt_state = step(params, opt_state)
    psnr = -10 * math.log10(float(loss))
    floor = FLOORS[backend]
    assert psnr > floor, (
        f"quality regression ({backend}): PSNR {psnr:.2f} < floor {floor} "
        f"after {steps} steps"
    )
