"""Measure lax.sort cost on TPU vs n, operand count, stability.

Informs the binning engine's sort budget (PERF.md): can two payload sorts
fit a 104 ms frame, or do we need a Pallas radix partition?

Memoization defense: pre-stage ITERS genuinely distinct key arrays on
device and cycle through them (adding a scalar on device proved
insufficient — the remote layer still served cached results).
"""
import time
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
ITERS = 4

for n in (1_600_000, 2_500_000, 3_200_000):
    keys = [
        jax.device_put(rng.integers(0, 2040, n).astype(np.int32))
        for _ in range(ITERS + 1)
    ]
    deps = [
        jax.device_put(rng.random(n).astype(np.float32))
        for _ in range(ITERS + 1)
    ]
    pay = [jnp.asarray(rng.random(n).astype(np.float32)) for _ in range(15)]
    jax.block_until_ready([keys, deps, pay])

    def run(tag, fn):
        out = fn(keys[-1], deps[-1])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = fn(keys[i], deps[i])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"n={n} {tag}: {dt:7.1f} ms", flush=True)

    for nops, stable in ((2, False), (2, True), (10, True), (13, True), (16, True)):
        f = jax.jit(
            lambda k, d, _p=tuple(pay[: nops - 1]), _s=stable: jax.lax.sort(
                (k,) + _p, num_keys=1, is_stable=_s
            )[0]
        )
        run(f"ops={nops} stable={stable}", f)
    f = jax.jit(
        lambda k, d, _p=tuple(pay[:11]): jax.lax.sort(
            (k, d) + _p, num_keys=2, is_stable=False
        )[0]
    )
    run("ops=13 keys=2 unstable", f)
print("DONE", flush=True)
