"""Locate the binned fwd kernel's real bound on hardware.

Runs the production binned stream through four kernels of increasing
work, same DMA pattern (grid over tiles, K=512 double-buffered reads):
  L0  DMA only (one add per batch)
  L1  + sigma/alpha elementwise math (no scan, no matmul)
  L2  + cumprod scan + weights
  L3  + color matmul (the full fwd kernel's work)
plus the VPU/MXU calibration. If L0 ~ L3, the kernel is DMA/loop-bound
and VPU op-shaving is pointless; if L1->L3 dominate, it is compute-bound
and the op model holds.
"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

from gsplat_tpu import load_test_data
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops import binning as B
from gsplat_tpu.ops import rasterize_binned as RB
from gsplat_tpu.ops.rasterize_tiled import _cumprod_lanes

ts = 32
LANES = 128
means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
    load_test_data(scene_grid=5))
scale = 1920.0 / width
Ks = Ks.copy(); Ks[:, :2, :] *= scale
width, height = 1920, 1080
C = 1
vm, K3 = jnp.asarray(viewmats[:C]), jnp.asarray(Ks[:C])
N = means.shape[0]
radii, means2d, depths, conics, _ = jax.jit(
    lambda m, q, s: fully_fused_projection(m, q, s, vm, K3, width, height)
)(jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales))
opc = jnp.broadcast_to(jnp.asarray(opacities)[None], (C, N))
cols = jnp.broadcast_to(jnp.asarray(colors)[None], (C, N, 3))
tw, th = -(-width // ts), -(-height // ts)
mx, my = means2d[..., 0], means2d[..., 1]
ca, cb, cc = conics[..., 0], conics[..., 1], conics[..., 2]

probe = B.bin_gaussians(mx, my, ca, cb, cc, opc, cols, radii, depths,
                        ts, tw, th, capacity=512, cull=True)
cap = int(probe.slab_required) + 1024
binned = jax.jit(functools.partial(
    B.bin_gaussians, tile_size=ts, tile_width=tw, tile_height=th,
    capacity=cap, cull=True))(mx, my, ca, cb, cc, opc, cols, radii, depths)
jax.block_until_ready(binned)
capA = binned.entries.shape[1]
NFr = binned.entries.shape[0]
D, Dp = 3, 8
F = 16
Kb = 512
NS = Kb // LANES
P = ts * ts
T = C * th * tw
entries = jnp.concatenate([
    binned.entries, jnp.zeros((F - NFr, capA), jnp.float32)], axis=0)
print(f"capA={capA} T={T}", flush=True)


def make_kernel(level):
    def kern(offs_ref, cnts_ref, e_hbm, out_ref, ebuf, esem):
        t = pl.program_id(0)
        off = offs_ref[t]
        n = cnts_ref[t]
        astart = (off // Kb) * Kb
        nb = pl.cdiv(off + n - astart, Kb)
        rem = t % (th * tw)
        ty, tx = rem // tw, rem % tw
        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = (tx * ts + pix % ts).astype(jnp.float32) + 0.5
        py = (ty * ts + pix // ts).astype(jnp.float32) + 0.5
        kidx = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        @pl.when(nb > 0)
        def _():
            RB._ecopy(e_hbm, ebuf, esem, astart, 0, Kb).start()

        def body(b, acc):
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < nb)
            def _():
                RB._ecopy(e_hbm, ebuf, esem, astart + (b + 1) * Kb,
                          1 - slot, Kb).start()

            RB._ecopy(e_hbm, ebuf, esem, astart + b * Kb, slot, Kb).wait()
            eb = ebuf[slot]
            if level == 0:
                return acc + jnp.sum(eb) * 1e-9
            for s_ in range(NS):
                e = eb[:, s_ * LANES : (s_ + 1) * LANES]
                gx, gy = e[0:1], e[1:2]
                ca_, cb_, cc_ = e[2:3], e[3:4], e[4:5]
                op_ = e[5:6]
                dx = px - gx
                dy = py - gy
                sig = 0.5 * (ca_ * dx * dx + cc_ * dy * dy) + cb_ * dx * dy
                alpha = jnp.minimum(op_ * jnp.exp(-sig), 0.999)
                gidx = astart + b * Kb + s_ * LANES + kidx
                colmask = (gidx >= off) & (gidx < off + n)
                valid = colmask & (alpha >= 1 / 255.0) & (sig >= 0.0)
                if level == 1:
                    acc += jnp.sum(jnp.where(valid, alpha, 0.0)) * 1e-9
                    continue
                one_m = jnp.where(valid, 1.0 - alpha, 1.0)
                Tm = _cumprod_lanes(one_m, LANES, "fwd_incl", True)
                roll = pltpu.roll
                Tm_excl = jnp.where(kidx >= 1, roll(Tm, 1, 1), 1.0)
                w = jnp.where(valid & (Tm_excl * one_m > 1e-4),
                              Tm_excl * alpha, 0.0)
                if level == 2:
                    acc += jnp.sum(w) * 1e-9
                    continue
                acc += jax.lax.dot_general(
                    e[6 : 6 + Dp, :LANES] * 1.0, w,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            return acc

        out_ref[0] = jax.lax.fori_loop(
            0, nb, body, jnp.zeros((Dp, P), jnp.float32))

    return kern


def run(level):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, Dp, P), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, F, Kb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        make_kernel(level),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, Dp, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    fj = jax.jit(lambda e, o, c: jnp.sum(f(o, c, e)))
    out = fj(entries, binned.offs, binned.cnts)
    jax.block_until_ready(out)
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        out = fj(entries + np.float32((i + 1) * 1e-7), binned.offs, binned.cnts)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"L{level}: {dt:7.1f} ms", flush=True)


for lv in (0, 1, 2, 3):
    run(lv)
print("DONE", flush=True)
