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
        if jnp.issubdtype(a[vary].dtype, jnp.integer):
            a[vary] = a[vary] + np.int32(0)  # re-upload defeats memoization
            a[vary] = jnp.where(
                jnp.arange(a[vary].shape[-1]) == i, a[vary] + 1, a[vary]
            )
        else:
            a[vary] = a[vary] + np.float32((i + 1) * 1e-7)
        out = fn_j(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:10s} {dt:8.1f} ms", flush=True)
    return out, dt


# Measurement rules (hard-won):
#  - every timed fn takes its arrays as EXPLICIT ARGS (closure-captured
#    device arrays bake into the executable as constants)
#  - every timed fn returns SCALARS only (multi-MB outputs pay tunnel
#    transfer under the remote execution layer)
#  - vary one input per iteration (dispatch memoization)

def tsum(x):
    return sum(jnp.sum(l) for l in jax.tree.leaves(x))


T = C * th * tw

# --- bin_gaussians + substages ---
bin_kw = dict(tile_size=ts, tile_width=tw, tile_height=th,
              capacity=cap, cull=True)
binned = jax.jit(functools.partial(B.bin_gaussians, **bin_kw))(
    mx, my, ca, cb, cc, opc, cols, radii, depths)
jax.block_until_ready(binned)

timeit("bin_all", lambda x, *r: tsum(
    B.bin_gaussians(x, *r, **bin_kw)[:2]),
    mx, my, ca, cb, cc, opc, cols, radii, depths)

emitted, slab_req = jax.jit(functools.partial(B.emit_entries, **bin_kw))(
    mx, my, ca, cb, cc, opc, cols, radii, depths)
jax.block_until_ready(emitted)

timeit("emit", lambda x, *r: tsum(
    B.emit_entries(x, *r, **bin_kw)[0][:3]),
    mx, my, ca, cb, cc, opc, cols, radii, depths)

timeit("sortoffs", lambda *ops: tsum(B.sort_entries(ops, T)[:2]), *emitted)

# --- forward kernel alone ---
D = 3
Dp = RB._round_up(D, 8)
F = RB._round_up(6 + Dp, 8)
Kf, Kb = 512, 256
P = ts * ts
GR = RB._round_up(1 + 6 + D, 8)
capA = binned.entries.shape[1]
NFr = binned.entries.shape[0]
cfg = (C, N, T, th, tw, ts, P, D, Dp, F, Kf, Kb, RB._round_up(cap, 512), GR,
       False, False, True)
entries_full = jnp.concatenate([
    binned.entries,
    jnp.zeros((F - NFr - 1, capA), jnp.float32),
    binned.gids.astype(jnp.float32),
], axis=0)

timeit("fwd_k", lambda e, o, c: tsum(RB._fwd_call(cfg, e, o, c)[:2]),
       entries_full, binned.offs, binned.cnts)
accum, logT, last = jax.jit(
    lambda e, o, c: RB._fwd_call(cfg, e, o, c)
)(entries_full, binned.offs, binned.cnts)
jax.block_until_ready((accum, logT, last))

# --- backward kernel alone ---
cnts = binned.cnts
acnt = ((cnts + Kb - 1) // Kb + 1) * Kb
aoff = (jnp.cumsum(acnt) - acnt).astype(jnp.int32)
capA2 = RB._round_up(capA + 2 * Kb * T, 128)
v_accum = jnp.ones((T, Dp, P), jnp.float32)
v_logT = jnp.ones((T, 1, P), jnp.float32)

bwd_args = (entries_full, binned.offs, cnts, aoff, logT, last, v_accum, v_logT)
timeit("bwd_k", lambda e, o, c, a, lt, la, va, vl: tsum(
    RB._bwd_call(cfg, e, o, c, a, capA2, lt, la, va, vl)), *bwd_args)
vgr = jax.jit(lambda e, o, c, a, lt, la, va, vl: RB._bwd_call(
    cfg, e, o, c, a, capA2, lt, la, va, vl))(*bwd_args)
jax.block_until_ready(vgr)

# --- gid sort (used operands at capA2) ---
U = 7 + D

def gsort(v):
    ops = (v[0].astype(jnp.int32),) + tuple(v[1:U])
    s_ = jax.lax.sort(ops, num_keys=1, is_stable=False)
    return jnp.concatenate(
        [jnp.stack((s_[0].astype(jnp.float32),) + s_[1:], axis=0),
         jnp.zeros((GR - U, capA2), jnp.float32)], axis=0)

timeit("gsort", lambda v: tsum(gsort(v)), vgr)
vg_s = jax.jit(gsort)(vgr)
jax.block_until_ready(vg_s)

# --- reduce ---
timeit("reduce", lambda v: tsum(RB._reduce_call(
    v[0].astype(jnp.int32), v, M=C * N, GR=GR, interpret=False)), vg_s)

# --- full fwd+bwd ---
def loss(m2d_x, m2d_y, c3, col, op, rad, dep):
    r, a, _ = RB.rasterize_to_pixels_binned(
        (m2d_x, m2d_y), c3, col, op, rad, dep,
        width, height, ts, capacity=cap, cull=True)
    return jnp.sum(r) + jnp.sum(a)

timeit(
    "full",
    lambda x, *rest: tsum(jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, *rest)),
    mx, my, (ca, cb, cc), cols, opc, radii, depths,
)
print("DONE", flush=True)
