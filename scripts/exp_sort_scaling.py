"""Measure lax.sort cost on TPU vs n, operand count, stability.

Informs the binning engine's sort budget (PERF.md): can two payload sorts
fit a 104 ms frame, or do we need a Pallas radix partition?
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

def t(fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(args[0] + np.int32(i + 1), *args[1:])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

for n in (1_600_000, 2_500_000, 3_200_000):
    key = jnp.asarray(rng.integers(0, 2040, n).astype(np.int32))
    pay = [jnp.asarray(rng.random(n).astype(np.float32)) for _ in range(16)]
    for nops, stable in ((2, False), (2, True), (10, True), (13, True), (16, True)):
        ops = (key,) + tuple(pay[: nops - 1])
        dt = t(lambda k, *p: jax.lax.sort((k,) + p, num_keys=1, is_stable=stable)[0], *ops)
        print(f"n={n} ops={nops} stable={stable}: {dt:7.1f} ms", flush=True)
    # 2-key unstable (tile, depth) like current pipeline
    dep = jnp.asarray(rng.random(n).astype(np.float32))
    ops = (key, dep) + tuple(pay[:11])
    dt = t(lambda k, d, *p: jax.lax.sort((k, d) + p, num_keys=2, is_stable=False)[0], *ops)
    print(f"n={n} ops=13 keys=2 unstable: {dt:7.1f} ms", flush=True)
print("DONE", flush=True)
