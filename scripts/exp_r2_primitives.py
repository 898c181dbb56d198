"""Round-2 primitive experiments on the real TPU.

Timing rule (axon): the remote layer memoizes (executable, inputs); varying
a small scalar is NOT enough — a LARGE input must change every iteration
(bench.py pattern). Per-iter times printed to spot memo hits.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)


def _force(out):
    """block_until_ready is not a reliable barrier on the axon remote layer;
    fetching bytes to host is. Pull one element of every output leaf."""
    for leaf in jax.tree.leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, big, *args, iters=5, label=""):
    """fn(big_varied, *args). `big` is f32/int32 array varied per iter."""
    # 0.01 is representable at the magnitudes used here (keys up to ~8k),
    # so the input buffer genuinely changes every iteration (memo-buster).
    vary = lambda i: big + big.dtype.type(0.01 * (i + 1))
    out = fn(vary(0), *args)
    _force(out)
    ts = []
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        out = fn(vary(i), *args)
        _force(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label}: med {med:.1f} ms  (iters: {' '.join(f'{t:.1f}' for t in ts)})", flush=True)
    return med


def vary_int(x, i):
    return x


# ---------------------------------------------------------------- E1: in-kernel gather
def e1():
    F, W = 8, 512

    variants = {}

    def k_taa(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=1)

    variants["take_along_axis ax1"] = (k_taa, (F, W), (F, W))

    def k_taa0(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...] % F, axis=0)

    variants["take_along_axis ax0"] = (k_taa0, (F, W), (F, W))

    rng = np.random.default_rng(0)
    for name, (kern, tshape, ishape) in variants.items():
        tab = jnp.arange(tshape[0] * tshape[1], dtype=jnp.float32).reshape(tshape)
        idx = jnp.asarray(rng.integers(0, tshape[1], ishape), jnp.int32)
        try:
            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(ishape, jnp.float32)
            )(tab, idx)
            jax.block_until_ready(out)
            print(f"E1 {name}: COMPILES", flush=True)
        except Exception as ex:
            msg = str(ex).replace("\n", " | ")[:600]
            print(f"E1 {name}: FAIL: {msg}", flush=True)

    # speed if lane variant works: [F2,K] gathered from VMEM window [F2,W2]
    F2, W2, K, NB = 16, 8192, 2048, 256

    def kern2(tab_ref, idx_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(tab_ref[...], idx_ref[0], axis=1)

    tab2 = jnp.ones((F2, W2), jnp.float32)
    idx2 = np.random.default_rng(1).integers(0, W2, (NB, F2, K)).astype(np.int32)

    def run(tab2, idx2):
        return pl.pallas_call(
            kern2, grid=(NB,),
            in_specs=[pl.BlockSpec((F2, W2), lambda b: (0, 0)),
                      pl.BlockSpec((1, F2, K), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, F2, K), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, F2, K), jnp.float32),
        )(tab2, idx2)

    try:
        f = jax.jit(run)
        ms = timeit(f, tab2, jnp.asarray(idx2), label="E1b gather-speed")
        n_idx = NB * F2 * K
        print(f"E1b -> {ms*1e6/n_idx:.3f} ns/idx over {n_idx} idx", flush=True)
    except Exception as ex:
        print("E1b FAIL:", str(ex).replace(chr(10), ' | ')[:400], flush=True)


# ---------------------------------------------------------------- E2: XLA gather/scatter sorted
def e2():
    M, CAP, F = 2_800_000, 3_400_000, 16
    tab = jnp.ones((F, M), jnp.float32)
    rng = np.random.default_rng(0)
    ids_r = jnp.asarray(rng.integers(0, M, (CAP,)), jnp.int32)
    ids_s = jnp.sort(ids_r)
    vals = jnp.ones((F, CAP), jnp.float32)

    def gat(tab, ids, sorted_):
        return jax.lax.gather(
            tab, ids[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(0,), collapsed_slice_dims=(1,), start_index_map=(1,)),
            slice_sizes=(F, 1), indices_are_sorted=sorted_)

    for name, ids, s in [("rand", ids_r, False), ("sorted", ids_s, True)]:
        f = jax.jit(lambda tab, ids, s=s: gat(tab, ids, s))
        ms = timeit(f, tab, ids, label=f"E2 gather {name}")
        print(f"   -> {ms*1e6/CAP:.1f} ns/idx", flush=True)

    def scat(vals, ids, sorted_):
        z = jnp.zeros((F, M), jnp.float32)
        return z.at[:, ids].add(vals, indices_are_sorted=sorted_, unique_indices=False)

    for name, ids, s in [("rand", ids_r, False), ("sorted", ids_s, True)]:
        f = jax.jit(lambda vals, ids, s=s: scat(vals, ids, s))
        ms = timeit(f, vals, ids, label=f"E2 scatter-add {name}")
        print(f"   -> {ms*1e6/CAP:.1f} ns/idx", flush=True)


# ---------------------------------------------------------------- E3: sort payload scaling
def e3():
    rng = np.random.default_rng(0)
    for n in (3_400_000, 6_800_000):
        k1 = jnp.asarray(rng.integers(0, 8160, (n,)), jnp.float32)
        k2 = jnp.asarray(rng.integers(0, 1 << 30, (n,)), jnp.int32)
        for rows in (1, 8, 10, 17):
            pay = [jnp.ones((n,), jnp.float32) for _ in range(rows)]

            def srt(k1f, k2, *pay):
                ops = (k1f.astype(jnp.int32), k2) + pay
                return jax.lax.sort(ops, num_keys=2)[2]

            f = jax.jit(srt)
            timeit(f, k1, k2, *pay, iters=4, label=f"E3 sort n={n} 2k+{rows}p")


# ---------------------------------------------------------------- E4: one-hot matmul gather
def e4():
    F, G, S, NB = 16, 1024, 2048, 512

    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[0]
        idx = idx_ref[0]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (G, S), 0) == idx).astype(jnp.float32)
        out_ref[0] = jax.lax.dot_general(
            tab, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    tab = jnp.ones((NB, F, G), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, G, (NB, 1, S)), jnp.int32)

    def run(tab, idx):
        return pl.pallas_call(
            kern, grid=(NB,),
            in_specs=[pl.BlockSpec((1, F, G), lambda b: (b, 0, 0)),
                      pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, F, S), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, F, S), jnp.float32),
        )(tab, idx)

    try:
        f = jax.jit(run)
        ms = timeit(f, tab, idx, label="E4 one-hot gather")
        print(f"   -> {ms*1e6/(NB*S):.1f} ns/out-col (G={G})", flush=True)
    except Exception as ex:
        print("E4 FAIL:", str(ex).replace(chr(10), ' | ')[:400], flush=True)


# ---------------------------------------------------------------- E5: bf16 vs f32 inner math
def e5():
    P, K, NB = 256, 128, 2048

    def mk(dtype):
        def kern(e_ref, out_ref):
            e = e_ref[0].astype(dtype)
            px = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(dtype)
            acc = jnp.zeros((P, K), dtype)
            for r in range(6):
                gx, ca = e[0:1], e[1:2]
                dx = px - gx
                sig = 0.5 * ca * dx * dx + dx * gx
                acc = acc + ca * jnp.exp(-sig)
            out_ref[0] = jnp.sum(acc.astype(jnp.float32), axis=0, keepdims=True)
        return kern

    e = jnp.ones((NB, 8, K), jnp.float32)
    for dtype in (jnp.float32, jnp.bfloat16):
        def run(e, dtype=dtype):
            return pl.pallas_call(
                mk(dtype), grid=(NB,),
                in_specs=[pl.BlockSpec((1, 8, K), lambda b: (b, 0, 0))],
                out_specs=pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((NB, 1, K), jnp.float32),
            )(e)
        try:
            f = jax.jit(run)
            ms = timeit(f, e, label=f"E5 {dtype.__name__}")
            flops = NB * 6 * P * K * 7
            print(f"   -> ~{flops/ms*1e-9:.2f} TFLOP/s incl exp", flush=True)
        except Exception as ex:
            print(f"E5 {dtype.__name__} FAIL:", str(ex).replace(chr(10), ' | ')[:300], flush=True)


# ---------------------------------------------------------------- e0: harness sanity
def e0():
    """Known-cost workload: 8 chained 4096x4096 f32 matmuls ~= 8*137 GFLOP
    at ~20-40 TF/s f32 -> tens of ms. If this reads ~0.1 ms the harness is
    still broken."""
    x = jnp.ones((4096, 4096), jnp.float32)

    def f(x):
        for _ in range(8):
            x = x @ x * 1e-4
        return x

    timeit(jax.jit(f), x, label="e0 sanity 8x4096^3 matmul")


if __name__ == "__main__":
    for name in sys.argv[1:] or ["e0", "e2", "e3", "e4", "e5", "e1"]:
        print(f"=== {name} ===", flush=True)
        try:
            globals()[name]()
        except Exception as ex:
            print(f"{name} crashed: {str(ex)[:500]}", flush=True)
    print("DONE", flush=True)
