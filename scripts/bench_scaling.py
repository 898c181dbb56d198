"""Multi-chip scaling benchmark for distributed rendering.

Measures fwd+bwd throughput of `rasterization_distributed` against the mesh
size (1, 2, 4, ... devices), holding per-device work constant (weak scaling:
N Gaussians and C cameras grow with the mesh), and reports parallel
efficiency — the BASELINE.md north star is >= 80% at N >= 2 hosts.

Defaults to the BINNED backend — the flagship engine — under shard_map
(interpret-mode Pallas on the CPU mesh, native on TPU), so the efficiency
number measures the production pipeline, not the oracle stand-in
(--backend tiled/oracle for comparison). On this single-chip image the
CPU mesh provides the only multi-device shape; on a real slice, run as-is:

    python scripts/bench_scaling.py --width 1920 --height 1080 --n-per-dev 500000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--n-per-dev", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force an 8-device CPU mesh (harness self-test)")
    ap.add_argument("--backend", default="binned",
                    choices=["binned", "tiled", "oracle"],
                    help="rasterizer backend under the mesh (default: the "
                         "flagship binned engine)")
    ap.add_argument("--c1-strips", action="store_true",
                    help="strong-scale ONE camera (the official bench "
                         "config shape: batch_size=1) across the mesh via "
                         "tile-row strips; reports per-strip load balance "
                         "and exchange bytes")
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gsplat_tpu.distributed import rasterization_distributed

    devices = jax.devices()
    on_tpu = jax.default_backend() == "tpu"
    W, H = args.width, args.height
    rng = np.random.default_rng(0)

    sizes = []
    n = 1
    while n <= len(devices):
        sizes.append(n)
        n *= 2

    results = []
    for nd in sizes:
        mesh = Mesh(np.array(devices[:nd]), ("gauss",))
        if args.c1_strips:
            # STRONG scaling: one fixed camera/scene split into nd strips
            # (the official bench workload is batch_size=1 — the layout the
            # reference cannot distribute at all, rendering.py:305-306)
            N = args.n_per_dev * max(sizes)
            C = 1
        else:
            N = args.n_per_dev * nd
            C = nd
        means = rng.standard_normal((N, 3)).astype(np.float32)
        quats = rng.standard_normal((N, 4)).astype(np.float32)
        scales = (rng.random((N, 3)) * 0.05 + 0.01).astype(np.float32)
        opac = rng.random((N,)).astype(np.float32)
        colors = rng.random((N, 3)).astype(np.float32)
        viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        viewmats[:, 2, 3] = 4.0
        for c in range(C):
            viewmats[c, 0, 3] = 0.2 * c
        Ks = np.tile(
            np.array(
                [[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                np.float32,
            ),
            (C, 1, 1),
        )
        shard = NamedSharding(mesh, P("gauss"))
        ins = [
            jax.device_put(jnp.asarray(x), shard)
            for x in (means, quats, scales, opac, colors)
        ]
        vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)

        cap = 2 ** 21 if on_tpu else 2 ** 16

        def loss(m, q, s, o, c):
            r, a, _ = rasterization_distributed(
                m, q, s, o, c, vm, K, W, H, mesh=mesh,
                backend=args.backend,
                isect_capacity=None if args.backend == "oracle" else cap,
                tile_size=32 if on_tpu else 16,
            )
            return jnp.sum(r) + jnp.sum(a)

        step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        out = step(*ins)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = step(ins[0] + np.float32(i + 1) * 1e-7, *ins[1:])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        px_s = C * W * H / dt
        results.append({"devices": nd, "pixels_per_s": px_s, "sec_per_step": dt})
        base = results[0]["pixels_per_s"]
        if args.c1_strips:
            # strong scaling: ideal = base throughput x nd
            eff = px_s / (base * nd)
            # distribution observability (VERDICT r4 item 9): per-strip
            # entry counts (balance) + exchange volume
            _, _, meta = jax.jit(
                lambda m, q, s, o, c: rasterization_distributed(
                    m, q, s, o, c, vm, K, W, H, mesh=mesh,
                    backend=args.backend,
                    isect_capacity=None if args.backend == "oracle" else cap,
                    tile_size=32 if on_tpu else 16,
                )
            )(*ins)
            n_isects = np.asarray(meta["n_isects"]).tolist()
            print(json.dumps({
                "devices": nd, "N": N, "C": C, "layout":
                    "strip" if nd > 1 else "single",
                "pixels_per_s": round(px_s),
                "strong_scaling_efficiency": round(eff, 3),
                "per_shard_isects": n_isects,
                "a2a_bytes_per_device": int(
                    meta.get("a2a_bytes_per_device", 0)
                ) if nd > 1 else 0,
            }), flush=True)
        else:
            eff = px_s / (base * nd)
            print(json.dumps({
                "devices": nd, "N": N, "C": C,
                "pixels_per_s": round(px_s),
                "weak_scaling_efficiency": round(eff, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
