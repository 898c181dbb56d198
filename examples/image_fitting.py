"""Fit N random Gaussians to a single image with Adam + MSE.

Parity: /root/reference/examples/image_fitting.py:16-189 (identity viewmat at
z=8, 90-degree fov, uniform random means in NDC, sigmoid color activation).
Runs on TPU (binned Pallas backend) or CPU (oracle backend) automatically.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gsplat_tpu import rasterization


def make_target(height: int, width: int, path: str | None) -> np.ndarray:
    if path:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        return img
    # default: RGB gradient + white center square (reference :42-47)
    img = np.zeros((height, width, 3), np.float32)
    img[..., 0] = np.linspace(0, 1, width)[None, :]
    img[..., 1] = np.linspace(0, 1, height)[:, None]
    img[..., 2] = 1.0
    img[height // 4 : 3 * height // 4, width // 4 : 3 * width // 4] = 1.0
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--num-points", type=int, default=2000)
    ap.add_argument("--max-steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--backend", default="", choices=["", "oracle", "binned", "tiled"])
    ap.add_argument("--img-path", type=str, default=None)
    ap.add_argument("--save-path", type=str, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    H, W, N = args.height, args.width, args.num_points
    target = jnp.asarray(make_target(H, W, args.img_path))
    H, W = target.shape[:2]

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    fov_x = math.pi / 2.0
    focal = 0.5 * W / math.tan(0.5 * fov_x)
    viewmats = jnp.eye(4)[None].at[:, 2, 3].set(8.0)
    Ks = jnp.asarray([[[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]]], jnp.float32)

    bd = 2.0
    params = {
        "means": bd * (jax.random.uniform(k1, (N, 3)) - 0.5),
        "scales": jnp.log(jax.random.uniform(k2, (N, 3)) + 0.3),
        "quats": jax.random.normal(k3, (N, 4)),
        "opacities": jnp.ones((N,)),  # logits -> sigmoid ~0.73
        "colors": jax.random.uniform(k4, (N, 3)),
    }

    on_tpu = jax.default_backend() == "tpu"
    backend = args.backend or ("binned" if on_tpu else "oracle")
    isect_capacity = 4 * N * 16 if backend != "oracle" else None

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params):
        render, _, _ = rasterization(
            params["means"],
            params["quats"],
            jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opacities"]),
            jax.nn.sigmoid(params["colors"]),
            viewmats,
            Ks,
            W,
            H,
            backend=backend,
            isect_capacity=isect_capacity,
        )
        return jnp.mean((render[0] - target) ** 2), render[0]

    @jax.jit
    def step(params, opt_state):
        (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, img

    t0 = time.time()
    img = None
    for it in range(args.max_steps):
        params, opt_state, loss, img = step(params, opt_state)
        if it % 100 == 0 or it == args.max_steps - 1:
            print(f"step {it}: mse={float(loss):.6f}")
    jax.block_until_ready(img)
    dt = time.time() - t0
    psnr = -10 * math.log10(float(loss))
    print(f"done: {args.max_steps} steps in {dt:.1f}s "
          f"({args.max_steps / dt:.1f} steps/s), final PSNR {psnr:.2f}")

    if args.save_path:
        from PIL import Image

        Image.fromarray(
            (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        ).save(args.save_path)
        print("saved", args.save_path)


if __name__ == "__main__":
    main()
