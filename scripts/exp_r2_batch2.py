"""Round-2 experiments, batch 2: sublane gather, segmented scan, small glue."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp_r2_primitives import timeit  # noqa: E402

print("backend:", jax.default_backend(), flush=True)


# -------- g1: in-kernel SUBLANE gather speed: out[s, l] = tab[idx[s, l], l]
def g1():
    S, L, NB = 2048, 128, 512  # per block: gather [S,L] rows from [S,L] table

    def kern(tab_ref, idx_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(tab_ref[0], idx_ref[0], axis=0)

    tab = jnp.ones((NB, S, L), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, S, (NB, S, L)), jnp.int32
    )

    def run(tab, idx):
        return pl.pallas_call(
            kern, grid=(NB,),
            in_specs=[pl.BlockSpec((1, S, L), lambda b: (b, 0, 0)),
                      pl.BlockSpec((1, S, L), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, S, L), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, S, L), jnp.float32),
        )(tab, idx)

    try:
        f = jax.jit(run)
        ms = timeit(f, tab, idx, label="g1 sublane-gather")
        n = NB * S * L
        print(f"   -> {ms*1e6/n:.3f} ns/elem ({n} gathered elems)", flush=True)
    except Exception as ex:
        print("g1 FAIL:", str(ex).replace(chr(10), " | ")[:400], flush=True)


# -------- g2: XLA segmented-scan passes over [10, 3.3M] (roll+where+add x22)
def g2():
    R, n = 10, 3_300_000
    x = jnp.ones((R, n), jnp.float32)
    gid = jnp.asarray(np.sort(np.random.default_rng(0).integers(0, 2_800_000, n)), jnp.int32)

    def seg(x, gid):
        s = x
        for k in range(22):
            sh = 1 << k
            same = jnp.roll(gid, sh) == gid
            same = same.at[:sh].set(False)
            s = s + jnp.where(same[None, :], jnp.roll(s, sh, axis=1), 0.0)
        return s

    f = jax.jit(seg)
    timeit(f, x, gid, iters=3, label="g2 seg-scan 22 passes [10,3.3M]")


# -------- g3: glue costs: stack 10 rows, cumsum 2.8M, searchsorted small
def g3():
    n = 3_300_000
    rows = [jnp.ones((n,), jnp.float32) for _ in range(10)]

    def stk(r0, *rest):
        return jnp.stack((r0,) + rest, axis=0)

    timeit(jax.jit(stk), rows[0], *rows[1:], label="g3 stack 10x3.3M")

    m = jnp.ones((2_800_000,), jnp.float32)

    def cs(m):
        c = jnp.cumsum(m.astype(jnp.int32))
        return c

    timeit(jax.jit(cs), m, iters=5, label="g3 cumsum 2.8M")


# -------- g4: one-hot matmul gather (from batch 1's e4)
def g4():
    from exp_r2_primitives import e4
    e4()


# -------- g5: bf16 vs f32 (batch 1's e5)
def g5():
    from exp_r2_primitives import e5
    e5()


# -------- g6: XLA repeat cost (current emit) at 3.3M for comparison
def g6():
    n_src, cap = 2_800_000, 3_300_000
    tpg = jnp.asarray(
        np.random.default_rng(0).integers(0, 3, n_src), jnp.int32
    )

    def emit(tpgf):
        tpg = tpgf.astype(jnp.int32)
        src = jnp.repeat(
            jnp.arange(n_src, dtype=jnp.int32), tpg, total_repeat_length=cap
        )
        return src

    timeit(jax.jit(emit), tpg.astype(jnp.float32), iters=4, label="g6 repeat 3.3M")


for name in sys.argv[1:] or ["g1", "g2", "g3", "g4", "g5", "g6"]:
    print(f"=== {name} ===", flush=True)
    try:
        globals()[name]()
    except Exception as ex:
        print(f"{name} crashed: {str(ex)[:500]}", flush=True)
print("DONE", flush=True)
