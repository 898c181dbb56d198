"""Per-stage timing of the binned pipeline on the real TPU (grid5 1080p).

Stages timed in isolation (each jitted separately, inputs varied per iter
to defeat the remote-execution memoization — see PERF.md):
  prep      XLA attr pack + slab bookkeeping inside bin_gaussians (no emit)
  emit      the Pallas emit kernel (inside bin_gaussians, minus sort)
  sort      the 12-operand payload sort
  bin_all   full bin_gaussians
  fwd_k     forward Pallas kernel on a fixed binned stream
  fwd_all   full forward (bin + kernel)
  bwd_k     backward Pallas kernel alone
  gsort     the gid sort (GR operands at capA2)
  reduce    the one-hot matmul reduce
  full      fwd+bwd end-to-end (same as check_binned_tpu bench)
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from gsplat_tpu import load_test_data
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops import binning as B
from gsplat_tpu.ops import rasterize_binned as RB

ts = int(os.environ.get("TS", 32))
means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
    load_test_data(scene_grid=5))
scale = 1920.0 / width
Ks = Ks.copy(); Ks[:, :2, :] *= scale
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

mx, my = means2d[..., 0], means2d[..., 1]
ca, cb, cc = conics[..., 0], conics[..., 1], conics[..., 2]

probe = B.bin_gaussians(mx, my, ca, cb, cc, opc, cols, radii, depths,
                        ts, tw, th, capacity=512, cull=True)
cap = int(probe.slab_required) + 1024
print(f"ts={ts} slab_required={int(probe.slab_required)} cap={cap}", flush=True)

ITERS = 6

def timeit(name, fn, *args, vary=0):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        a = list(args)
        a[vary] = a[vary] + np.float32((i + 1) * 1e-7)
        out = fn_j(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:10s} {dt:8.1f} ms", flush=True)
    return out, dt


# --- full bin_gaussians ---
bin_fn = functools.partial(
    B.bin_gaussians, tile_size=ts, tile_width=tw, tile_height=th,
    capacity=cap, cull=True)
binned, _ = timeit("bin_all", lambda x: bin_fn(
    x, my, ca, cb, cc, opc, cols, radii, depths), mx)

# --- sort alone (12 operands at capA) ---
capA = binned.entries.shape[1]
NFr = binned.entries.shape[0]
tk = jnp.argsort(jnp.sin(jnp.arange(capA, dtype=jnp.float32))).astype(jnp.int32)
dk = jnp.arange(capA, dtype=jnp.int32)[::-1]
gidk = jnp.arange(capA, dtype=jnp.int32)
payload = tuple(binned.entries[r] for r in range(NFr))

def sort_fn(t0):
    ops = (t0, dk, gidk) + payload
    return jax.lax.sort(ops, num_keys=3, is_stable=False)[0]

_ = timeit("sort12", sort_fn, tk)

# --- forward kernel alone ---
D = 3
Dp = RB._round_up(D, 8)
F = RB._round_up(6 + Dp, 8)
Kb = 128
T = C * th * tw
P = ts * ts
GR = RB._round_up(1 + 6 + D, 8)
cfg = (C, N, T, th, tw, ts, P, D, Dp, F, Kb, RB._round_up(cap, 512), GR,
       False, False, True)
entries_full = jnp.concatenate([
    binned.entries,
    jnp.zeros((F - NFr - 1, capA), jnp.float32),
    binned.gids.astype(jnp.float32),
], axis=0)

fwd_out, _ = timeit("fwd_k", lambda e: RB._fwd_call(cfg, e, binned.offs, binned.cnts),
                    entries_full)
accum, logT, last = fwd_out

# --- backward kernel alone ---
cnts = binned.cnts
acnt = ((cnts + Kb - 1) // Kb + 1) * Kb
aoff = (jnp.cumsum(acnt) - acnt).astype(jnp.int32)
capA2 = RB._round_up(capA + 2 * Kb * T, 128)
v_accum = jnp.ones((T, Dp, P), jnp.float32)
v_logT = jnp.ones((T, 1, P), jnp.float32)

vgr, _ = timeit("bwd_k", lambda e: RB._bwd_call(
    cfg, e, binned.offs, cnts, aoff, capA2, logT, last, v_accum, v_logT),
    entries_full)

# --- gid sort (GR operands at capA2) ---
def gsort_fn(v0):
    ops = (vgr[0].astype(jnp.int32) + (v0[:1] * 0).astype(jnp.int32),) + tuple(
        vgr[1:GR])
    s = jax.lax.sort(ops, num_keys=1, is_stable=False)
    return jnp.stack((s[0].astype(jnp.float32),) + s[1:], axis=0)

vg_s, _ = timeit("gsort", gsort_fn, vgr[1])

# --- reduce ---
_ = timeit("reduce", lambda v: RB._reduce_call(
    v[0].astype(jnp.int32), v, M=C * N, GR=GR, interpret=False), vg_s)

# --- full fwd+bwd ---
wr = jnp.ones((C, height, width, 3), jnp.float32)

def loss(m2d_x):
    r, a, _ = RB.rasterize_to_pixels_binned(
        (m2d_x, my), (ca, cb, cc), cols, opc, radii, depths,
        width, height, ts, capacity=cap, cull=True)
    return jnp.sum(r * wr) + jnp.sum(a)

_ = timeit("full", jax.grad(loss), mx)
print("DONE", flush=True)
