"""On-device (KF, KB, PB) kernel-config sweep — VERDICT r4 item 2.

One PROCESS, one scene, scan-steady timing (the only cross-config-comparable
methodology on the tunnel, PERF.md r4c): for each config it times
  - fwd-only (value) steady-state frame, and
  - fwd+bwd (grad) steady-state frame,
so bwd = (fwd+bwd) - fwd is a cumulative-prefix delta within the same run.
Configs are passed as ARGUMENTS to rasterize_to_pixels_binned (not env), so
every variant compiles in this one process and numbers are comparable.
Also reports grad max-rel-diff vs the default config (on-device parity for
the PB sub-block dataflow).

Round-4 context: bwd kernel = 79.1 ms vs fwd 59.2 (profile_binned). The
bwd's default KB=128 leaves NS=1 (a single compute slice per DMA — the
shape that serialized the FWD 4.4x in the r4 KF sweep); PB sub-blocking
shrinks the [P, LANES] live set so KB=256 (NS=2, real read double
buffering) fits VMEM at ts=32. KF=1024 probes the other direction (deeper
fwd ILP window) — untested in r4, which only swept KF downward.

Usage: python scripts/exp_bwd_sweep.py            (idle host!)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _time_scan_steady

print("backend:", jax.default_backend(), flush=True)


def main():
    from gsplat_tpu import load_test_data
    from gsplat_tpu.ops.binning import bin_gaussians
    from gsplat_tpu.ops.projection import fully_fused_projection
    from gsplat_tpu.ops.rasterize_binned import rasterize_to_pixels_binned

    ts = int(os.environ.get("TS", 32))
    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data(scene_grid=5))
    scale = 1920.0 / width
    Ks = Ks.copy()
    Ks[:, :2, :] *= scale
    width, height = 1920, 1080
    C = 1
    viewmats, Ks = viewmats[:C], Ks[:C]
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    N = means.shape[0]

    radii, means2d, depths, conics, _ = jax.jit(
        lambda m, q, s: fully_fused_projection(m, q, s, vm, K, width, height)
    )(jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales))
    opc = jnp.broadcast_to(jnp.asarray(opacities)[None], (C, N))
    cols = jnp.broadcast_to(jnp.asarray(colors)[None], (C, N, 3))
    tw, th = -(-width // ts), -(-height // ts)

    probe = bin_gaussians(
        means2d[..., 0], means2d[..., 1], conics[..., 0], conics[..., 1],
        conics[..., 2], opc, cols, radii, depths, ts, tw, th,
        capacity=512, cull=True)
    cap = int(probe.slab_required) + 1024
    P = ts * ts
    print(f"ts={ts} slab={cap} P={P}", flush=True)

    con = (conics[..., 0], conics[..., 1], conics[..., 2])
    mx, my = means2d[..., 0], means2d[..., 1]
    base_args = (mx, my, con, cols, opc, radii, depths)

    def make(kf, kb, pb, grad):
        def loss(m2d_x, m2d_y, con, col, op, rad, dep):
            r, a, _ = rasterize_to_pixels_binned(
                (m2d_x, m2d_y), con, col, op, rad, dep,
                width, height, ts, capacity=cap, cull=True,
                batch_size=kf, bwd_batch_size=kb, bwd_pixel_block=pb,
            )
            return jnp.sum(r) + jnp.sum(a)
        if grad:
            g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
            # flat leaves: _time_scan_steady sums the outputs and argnum 2
            # (the conic tuple) would otherwise surface as a nested tuple
            return jax.jit(lambda *a: tuple(jax.tree.leaves(g(*a))))
        return jax.jit(loss)

    # (label, KF, KB, PB); PB=None -> P (default single-block)
    configs = [
        ("default kf512 kb128 pb-", 512, 128, None),
        ("kb256 pb512", 512, 256, 512),
        ("kb256 pb256", 512, 256, 256),
        ("kb128 pb512", 512, 128, 512),
        ("kf1024", 1024, 128, None),
        ("kf1024 kb256 pb512", 1024, 256, 512),
    ]

    g_ref = None
    for label, kf, kb, pb in configs:
        try:
            gfn = make(kf, kb, pb, grad=True)
            g = gfn(*base_args)
            jax.block_until_ready(g)
        except Exception as e:
            print(f"{label}: FAILED compile/run: {str(e)[:200]}", flush=True)
            continue
        if g_ref is None:
            g_ref = g
            pmsg = "ref"
        else:
            diffs = []
            for a, b in zip(g_ref, g):
                for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                    s = max(float(jnp.abs(x).max()), 1e-6)
                    diffs.append(float(jnp.abs(x - y).max()) / s)
            pmsg = f"grad relmaxdiff {max(diffs):.2e}"
        ffn = make(kf, kb, pb, grad=False)
        t_f = _time_scan_steady(lambda *a: (ffn(*a),), base_args)
        t_fb = _time_scan_steady(gfn, base_args)
        print(
            f"{label}: fwd {t_f*1e3:.1f} ms | fwd+bwd {t_fb*1e3:.1f} ms "
            f"| bwd(delta) {(t_fb-t_f)*1e3:.1f} ms | {pmsg}",
            flush=True,
        )


if __name__ == "__main__":
    main()
