"""Per-stage timing of the binned pipeline on the real TPU (grid5 1080p).

Times CUMULATIVE PREFIXES of the production pipeline (emit -> bin ->
fwd kernel -> bwd kernel -> gid sort -> full grad), every prefix taking
the identical [C, N] SoA args and returning scalars; successive deltas
are the stage costs. See the measurement-rules comment below for why
isolated stage timings lie through the remote-execution tunnel.
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


# Measurement rules (hard-won, see PERF.md):
#  - isolated per-stage timing through the axon tunnel is UNRELIABLE
#    (arg upload/layout effects gave a "sort" that cost 12 ms in one
#    harness and 400 ms in another). Time CUMULATIVE PREFIXES of the
#    production pipeline instead — identical [C,N] SoA args for every
#    prefix, scalar outputs — and difference successive rows.
#  - closure-captured device arrays bake into executables as constants
#  - multi-MB outputs pay tunnel transfer; return scalars
#  - vary one input per iteration (dispatch memoization)

T = C * th * tw
D = 3
Dp = RB._round_up(D, 8)
F = RB._round_up(6 + Dp, 8)
GR = RB._round_up(1 + 6 + D, 8)
capA = RB._round_up(cap, 512)
Kf = int(os.environ.get("GSPLAT_KF", 512))
Kb = int(os.environ.get("GSPLAT_KB", 128))
P = ts * ts
Pb = int(os.environ.get("GSPLAT_BWD_PB", P))
# (..., interpret, absgrad, cull, skip_saturated, sigma_mxu, slice_skip) —
# keep in sync with rasterize_to_pixels_binned's cfg tuple (production
# defaults: saturation skip on, MXU sigma off, slice skip off)
cfg = (C, N, T, th, tw, ts, P, D, Dp, F, Kf, Kb, Pb, capA, GR,
       False, False, True, True, False, False)


def tsum(x):
    return sum(jnp.sum(l) for l in jax.tree.leaves(x))


bin_kw = dict(tile_size=ts, tile_width=tw, tile_height=th,
              capacity=cap, cull=True)
ARGS = (mx, my, ca, cb, cc, opc, cols, radii, depths)


def p_emit(x, *r):
    ops, slab = B.emit_entries(x, *r, **bin_kw)
    return tsum(ops[:3]) + slab


def p_bin(x, *r):
    b = B.bin_gaussians(x, *r, **bin_kw)
    return tsum((b.entries[0], b.offs, b.n_isects))


def _entries_of(b):
    return jnp.concatenate([
        b.entries,
        jnp.zeros((F - b.entries.shape[0] - 1, capA), jnp.float32),
        b.gids.astype(jnp.float32),
    ], axis=0)


def p_fwd(x, *r):
    b = B.bin_gaussians(x, *r, **bin_kw)
    accum, logT, last = RB._fwd_call(cfg, _entries_of(b), b.offs, b.cnts)
    return tsum((accum, logT)) + jnp.sum(last)


def p_fwd_bwdk(x, *r):
    b = B.bin_gaussians(x, *r, **bin_kw)
    entries = _entries_of(b)
    accum, logT, last = RB._fwd_call(cfg, entries, b.offs, b.cnts)
    acnt = ((b.cnts + Kb - 1) // Kb + 1) * Kb
    aoff = (jnp.cumsum(acnt) - acnt).astype(jnp.int32)
    capA2 = RB._round_up(capA + 2 * Kb * T, 128)
    v_accum = jnp.cos(accum)
    v_logT = jnp.sin(logT)
    vgr = RB._bwd_call(cfg, entries, b.offs, b.cnts, aoff, capA2, logT,
                       last, v_accum, v_logT)
    return tsum(vgr[:2])


def p_fwd_bwdk_gsort(x, *r):
    b = B.bin_gaussians(x, *r, **bin_kw)
    entries = _entries_of(b)
    accum, logT, last = RB._fwd_call(cfg, entries, b.offs, b.cnts)
    acnt = ((b.cnts + Kb - 1) // Kb + 1) * Kb
    aoff = (jnp.cumsum(acnt) - acnt).astype(jnp.int32)
    capA2 = RB._round_up(capA + 2 * Kb * T, 128)
    vgr = RB._bwd_call(cfg, entries, b.offs, b.cnts, aoff, capA2, logT,
                       last, jnp.cos(accum), jnp.sin(logT))
    U = 7 + D
    ops = (vgr[0].astype(jnp.int32),) + tuple(vgr[1:U])
    s_ = jax.lax.sort(ops, num_keys=1, is_stable=False)
    return tsum(s_[:2])


def p_full(x, *r):
    def loss(x, y, c3, col, op):
        rr, a, _ = RB.rasterize_to_pixels_binned(
            (x, y), c3, col, op, r[6], r[7],
            width, height, ts, capacity=cap, cull=True)
        return jnp.sum(rr) + jnp.sum(a)
    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        x, r[0], (r[1], r[2], r[3]), r[5], r[4])
    return tsum(g)


prev = 0.0
for name, fn in (
    ("emit", p_emit), ("bin", p_bin), ("fwd", p_fwd),
    ("fwd+bwdk", p_fwd_bwdk), ("+gsort", p_fwd_bwdk_gsort),
    ("full", p_full),
):
    _, dt = timeit(f"cum_{name}", fn, *ARGS)
    print(f"    delta {name}: {dt - prev:8.1f} ms", flush=True)
    prev = dt
print("DONE", flush=True)
