"""Micro-benchmark: per-slice cost of kernel building blocks on the v5e.

Answers the VERDICT r3 design questions for the binned rasterizer kernels:
  a. VPU sigma chain (dx/dy + quadratic) — the round-2 baseline
  b. sigma as a [P,8]@[8,K] poly matmul (MXU, HIGHEST) — small contraction
     dim: does Mosaic stream it fast enough to beat ~9 VPU ops?
  c. moment contraction [P,8]^T@[P,K] (MXU, HIGHEST) — full-depth
     contraction (the bwd gradient-reduce replacement)
  d. lane cumprod scan (7 roll+select+mul steps) — the transmittance chain
  e. full fwd-slice mix (sigma + exp + scan + accum dot) for context

Each variant runs the SAME outer loop (NB batches x NS slices) inside one
pallas_call over T grid steps, accumulating a scalar-ish [8, K] result so
nothing is dead-code eliminated. Timing: vary an input per iteration
(axon memoizes identical dispatches). Cumulative methodology is not needed
here because each variant is a single kernel (no XLA glue between stages).

Usage: python scripts/exp_mxu_kernel_shapes.py [--ts 32] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops.rasterize_tiled import _cumprod_lanes

LANES = 128


def _kernel(x_ref, out_ref, *, variant, P, K, NB, native):
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    ts = int(P**0.5)
    pxl = (pix % ts).astype(jnp.float32) + 0.5
    pyl = (pix // ts).astype(jnp.float32) + 0.5
    ones_p = jnp.ones((P, 1), jnp.float32)
    Qm = jnp.concatenate(
        [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl, ones_p,
         jnp.zeros((P, 2), jnp.float32)],
        axis=1,
    )
    NS = K // LANES

    def body(b, acc):
        eb = x_ref[...]  # [16, K] resident VMEM block
        # Loop-carried dependency so Mosaic can't hoist/DCE the batch work.
        # [1, LANES] row broadcast only over sublanes (a both-axes scalar
        # broadcast from acc[0:1, 0:1] fails to lower on Mosaic); 1e-20
        # keeps the math finite for the exp/scan variants.
        dep = acc[0:1, :] * 1e-20
        for s in range(NS):
            e = eb[:, s * LANES : (s + 1) * LANES] + dep
            gx, gy = e[0:1, :], e[1:2, :]
            ca, cb, cc = e[2:3, :], e[3:4, :], e[4:5, :]
            if variant == "vpu_sigma":
                dx = pxl - gx
                dy = pyl - gy
                sig = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
                acc = acc + jax.lax.dot_general(
                    Qm, sig, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            elif variant == "mxu_sigma":
                # coefficient rows from the entry (lane-wide)
                coef = jnp.concatenate(
                    [0.5 * ca, cb, 0.5 * cc,
                     -(ca * gx + cb * gy), -(cc * gy + cb * gx),
                     0.5 * ca * gx * gx + cb * gx * gy + 0.5 * cc * gy * gy,
                     jnp.zeros((2, LANES), jnp.float32)],
                    axis=0,
                )  # [8, K]
                sig = jax.lax.dot_general(
                    Qm, coef, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [P, LANES]
                acc = acc + jax.lax.dot_general(
                    Qm, sig, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            elif variant == "moments":
                dx = pxl - gx
                dy = pyl - gy
                v_sig = ca * dx + cb * dy  # stand-in [P, K] operand
                acc = acc + jax.lax.dot_general(
                    Qm, v_sig, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            elif variant == "vpu_reduce5":
                dx = pxl - gx
                dy = pyl - gy
                v_sig = ca * dx + cb * dy
                r0 = jnp.sum(0.5 * dx * dx * v_sig, axis=0, keepdims=True)
                r1 = jnp.sum(dx * dy * v_sig, axis=0, keepdims=True)
                r2 = jnp.sum(0.5 * dy * dy * v_sig, axis=0, keepdims=True)
                r3 = jnp.sum((ca * dx + cb * dy) * v_sig, axis=0, keepdims=True)
                r4 = jnp.sum((cb * dx + cc * dy) * v_sig, axis=0, keepdims=True)
                acc = acc + jnp.concatenate(
                    [r0, r1, r2, r3, r4, jnp.zeros((3, LANES), jnp.float32)],
                    axis=0,
                )
            elif variant == "scan":
                dx = pxl - gx
                one_m = 1.0 - jnp.minimum(jnp.abs(ca * dx), 0.99)
                Tm = _cumprod_lanes(one_m, LANES, "fwd_incl", native)
                acc = acc + jax.lax.dot_general(
                    Qm, Tm, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            elif variant == "fwd_mix":
                op = e[5:6, :]
                dx = pxl - gx
                dy = pyl - gy
                sig = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
                alpha = jnp.minimum(op * jnp.exp(-sig), 0.999)
                valid = (alpha >= 1.0 / 255.0) & (sig >= 0.0)
                one_m = jnp.where(valid, 1.0 - alpha, 1.0)
                Tm = _cumprod_lanes(one_m, LANES, "fwd_incl", native)
                w = jnp.where(valid, Tm * alpha, 0.0)
                cacc = jax.lax.dot_general(
                    e[6:14, :], w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [8, P] (the real accumulator is per-pixel)
                acc = acc + cacc[:, :LANES]
            else:
                raise ValueError(variant)
        return acc

    out_ref[...] = jax.lax.fori_loop(
        0, NB, body, jnp.zeros((8, LANES), jnp.float32)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ts", type=int, default=32)
    ap.add_argument("--nb", type=int, default=64, help="batches per tile")
    ap.add_argument("--k", type=int, default=512, help="entries per batch")
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    P = args.ts * args.ts
    K, NB, T = args.k, args.nb, args.tiles
    native = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} P={P} K={K} NB={NB} T={T}")
    slices = T * NB * (K // LANES)

    x = jnp.asarray(
        np.random.default_rng(0).random((16, K)).astype(np.float32)
    )

    for variant in (
        "vpu_sigma", "mxu_sigma", "moments", "vpu_reduce5", "scan", "fwd_mix"
    ):
        kern = functools.partial(
            _kernel, variant=variant, P=P, K=K, NB=NB, native=native
        )
        f = pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[pl.BlockSpec((16, K), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((8, LANES), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=not native,
        )
        fj = jax.jit(f)
        jax.block_until_ready(fj(x))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fj(x + np.float32(i + 1) * 1e-7)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(
            f"{variant:12s} {dt*1e3:8.2f} ms  "
            f"{dt / slices * 1e9:8.1f} ns/slice"
        )


if __name__ == "__main__":
    main()
