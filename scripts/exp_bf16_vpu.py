"""Is bf16 elementwise math faster than f32 on the v5e VPU inside Pallas?

Times a compute-saturated kernel (the fwd rasterizer's per-pair op mix:
mul/add/exp/min/compare/select chains) on [P, K] tiles in f32 vs bf16.
If bf16 is ~2x, a bf16 pair-math mode in the rasterize kernels (f32
transmittance chain) is worth building (PERF.md roadmap #3); if ~1x, the
VPU upconverts and the flag is pointless.
"""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

P, K, REPS, BLOCKS = 512, 512, 64, 64


def kernel(x_ref, o_ref, *, dtype):
    x = x_ref[...].astype(dtype)
    acc = jnp.zeros_like(x)
    one = jnp.asarray(1.0, dtype)
    half = jnp.asarray(0.5, dtype)
    for r in range(REPS):
        # fwd-kernel-ish op mix
        dx = x - half
        dy = x * half + acc * jnp.asarray(1e-3, dtype)
        sig = half * (dx * dx + dy * dy) + dx * dy * jnp.asarray(0.1, dtype)
        a = jnp.minimum(jnp.exp(-sig), jnp.asarray(0.999, dtype))
        m = (a >= jnp.asarray(1 / 255.0, dtype)) & (sig >= 0)
        acc = acc + jnp.where(m, one - a, one)
    o_ref[...] = acc.astype(jnp.float32)


def run(dtype, tag):
    f = pl.pallas_call(
        functools.partial(kernel, dtype=dtype),
        grid=(BLOCKS,),
        in_specs=[pl.BlockSpec((P, K), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((P, K), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    fj = jax.jit(f)
    x = jnp.asarray(np.random.default_rng(0).random((P, K), np.float32))
    out = fj(x); jax.block_until_ready(out)
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        out = fj(x + np.float32((i + 1) * 1e-7))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    ops = P * K * REPS * BLOCKS * 14  # ~14 arith ops per elem per rep
    print(f"{tag}: {dt*1e3:.2f} ms -> {ops/dt/1e12:.2f} Tops/s", flush=True)


run(jnp.float32, "f32 ")
run(jnp.bfloat16, "bf16")
print("DONE", flush=True)
