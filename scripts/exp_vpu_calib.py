"""Calibrate v5e VPU f32 elementwise and MXU f32-HIGHEST throughput.

Grounds the kernel op-budget estimates in PERF.md: how many effective
f32 elementwise ops/s does a Pallas kernel actually sustain, and what is
the 6-pass HIGHEST matmul rate?
"""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

B, P, K, OPS = 256, 512, 1024, 48


def vpu_kernel(x_ref, o_ref):
    x = x_ref[...]
    a = x
    b = x * 0.5
    # OPS fma-ish ops, dependency-chained in pairs to stay realistic
    for i in range(OPS // 2):
        a = a * b + 1e-6
        b = b + a * 0.25
    o_ref[...] = a + b


def mxu_kernel(x_ref, y_ref, o_ref, *, prec):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], y_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def timeit(fj, args, iters=8):
    out = fj(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fj(args[0] + np.float32((i + 1) * 1e-7), *args[1:])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


x = jnp.asarray(np.random.default_rng(0).random((P, K), np.float32))
f = jax.jit(pl.pallas_call(
    vpu_kernel,
    grid=(B,),
    in_specs=[pl.BlockSpec((P, K), lambda i: (0, 0))],
    out_specs=pl.BlockSpec((P, K), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((P, K), jnp.float32),
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
))
dt = timeit(f, (x,))
print(f"VPU f32: {P*K*OPS*B/dt/1e12:.2f} Tops/s ({dt*1e3:.1f} ms)", flush=True)

M = 512
y = jnp.asarray(np.random.default_rng(1).random((K, M), np.float32))
for prec, tag in ((jax.lax.Precision.HIGHEST, "HIGHEST"),
                  (jax.lax.Precision.DEFAULT, "DEFAULT")):
    f = jax.jit(pl.pallas_call(
        functools.partial(mxu_kernel, prec=prec),
        grid=(B,),
        in_specs=[pl.BlockSpec((P, K), lambda i: (0, 0)),
                  pl.BlockSpec((K, M), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((P, M), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    ))
    dt = timeit(f, (x, y))
    print(f"MXU f32 {tag}: {2*P*K*M*B/dt/1e12:.2f} TFLOP/s ({dt*1e3:.1f} ms)",
          flush=True)
print("DONE", flush=True)
