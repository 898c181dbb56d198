"""FPS / memory benchmark harness (parity: /root/reference/profiling/main.py).

Measures forward and forward+backward throughput of `rasterization` across
resolutions and scene sizes on the garden fixture, reporting a table like the
reference's (profiling/main.py:290-320) plus device memory stats.

Usage:
    python profiling/main.py --scene-grid 5 --resolutions 1080p
    python profiling/main.py --backend oracle --resolutions 360p
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

RESOLUTIONS = {
    "360p": (640, 360),
    "720p": (1280, 720),
    "1080p": (1920, 1080),
    "4k": (3840, 2160),
}


def device_mem_gb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1e9
    except Exception:
        return float("nan")


def bench_case(args, width, height, scene_grid):
    from gsplat_tpu import load_test_data, rasterization
    from gsplat_tpu.ops.isect import isect_tiles, suggest_capacity
    from gsplat_tpu.ops.projection import fully_fused_projection_soa

    means, quats, scales, opacities, colors, viewmats, Ks, w0, h0 = (
        load_test_data(scene_grid=scene_grid)
    )
    sc = width / w0
    Ks = Ks.copy()
    Ks[:, :2, :] *= sc
    C = args.batch
    viewmats = np.tile(viewmats[:1], (C, 1, 1))
    Ks = np.tile(Ks[:1], (C, 1, 1))
    ins = tuple(
        jnp.asarray(x)
        for x in (means, quats, scales, opacities, colors, viewmats, Ks)
    )

    backend = args.backend
    if backend == "auto":
        backend = "binned" if jax.default_backend() == "tpu" else "oracle"
    isect_capacity = None
    if backend in ("tiled", "binned"):
        soa = jax.jit(
            lambda m, q, s: fully_fused_projection_soa(
                m, q, s, ins[5], ins[6], width, height
            )
        )(ins[0], ins[1], ins[2])
        ts = 32
        tw, th = -(-width // ts), -(-height // ts)
        if backend == "binned":
            from gsplat_tpu.ops.binning import bin_gaussians

            Cn, Nn = soa["mean_x"].shape
            probe = bin_gaussians(
                soa["mean_x"], soa["mean_y"], soa["conic_a"],
                soa["conic_b"], soa["conic_c"],
                jnp.broadcast_to(ins[3][None], (Cn, Nn)),
                jnp.broadcast_to(ins[4][None], (Cn, Nn, 3)),
                soa["radii"], soa["depth"], ts, tw, th,
                capacity=512, cull=True,
            )
            isect_capacity = int(probe.slab_required) + 1024
        else:
            probe = isect_tiles(
                (soa["mean_x"], soa["mean_y"]), soa["radii"], soa["depth"],
                ts, tw, th, capacity=8,
            )
            isect_capacity = suggest_capacity(int(probe.n_isects))

    def render(means, quats, scales, opacities, colors, viewmats, Ks):
        out, alphas, _ = rasterization(
            means, quats, scales, opacities, colors, viewmats, Ks,
            width, height, backend=backend, isect_capacity=isect_capacity,
            tile_size=32 if backend == "tiled" else 16,
        )
        return out, alphas

    def loss(*a):
        out, alphas = render(*a)
        return jnp.sum(out) + jnp.sum(alphas)

    fwd = jax.jit(render)
    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    def measure(fn, iters):
        # vary an input every call: the remote-execution layer memoizes
        # identical dispatches
        o = fn(ins[0], *ins[1:])
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(iters):
            o = fn(ins[0] + np.float32(i + 1) * 1e-7, *ins[1:])
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters

    if args.trace:
        # XLA op-level trace, TensorBoard-loadable (reference profiling
        # relies on nsys/torch.profiler; jax.profiler is the TPU-native
        # equivalent). Some remote-execution setups can't host the
        # profiler - degrade gracefully.
        try:
            with jax.profiler.trace(args.trace):
                measure(bwd, 2)
            print(f"trace written to {args.trace}", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"profiler trace unavailable: {e}", file=sys.stderr)

    t_fwd = measure(fwd, args.iters)
    t_bwd = measure(bwd, args.iters)
    mem = device_mem_gb()
    return {
        "resolution": f"{width}x{height}",
        "scene_grid": scene_grid,
        "n_gaussians": ins[0].shape[0],
        "batch": C,
        "backend": backend,
        "mem_gb": round(mem, 2),
        "fps_fwd": round(1.0 / t_fwd, 1),
        "fps_fwd_bwd": round(1.0 / t_bwd, 1),
        "pixels_per_s": round(C * width * height / t_bwd),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolutions", nargs="*", default=["1080p"],
                    choices=list(RESOLUTIONS))
    ap.add_argument("--scene-grid", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trace", default="",
                    help="write a jax.profiler trace to this dir")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "tiled", "binned", "oracle"])
    args = ap.parse_args()

    rows = []
    for res in args.resolutions:
        w, h = RESOLUTIONS[res]
        row = bench_case(args, w, h, args.scene_grid)
        rows.append(row)
        print(row, flush=True)

    keys = list(rows[0].keys())
    print("\n" + "\t".join(keys))
    for r in rows:
        print("\t".join(str(r[k]) for k in keys))


if __name__ == "__main__":
    main()
