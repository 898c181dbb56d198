"""Split the ~61 ms of official-bench frame time OUTSIDE the raster
pipeline (268 ms bench vs 206.7 ms cumulative raster profile, round 4).

Times three jitted grad steps at the bench config (grid5 1080p ts=32):
  full:    bench.py's loss (raw params -> projection -> binned raster)
  raster:  binned raster only, grads w.r.t. pre-projected SoA rows
  proj:    projection only, grads w.r.t. raw means/quats/scales

full - raster ~= projection fwd+VJP + the [N,3]/[C,N,3] layout glue.
Measurement rules: vary an input per iter; scalars out (PERF.md).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from gsplat_tpu import load_test_data, rasterization
from gsplat_tpu.ops.projection import fully_fused_projection, fully_fused_projection_soa
from gsplat_tpu.ops.binning import bin_gaussians
from gsplat_tpu.ops.rasterize_binned import rasterize_to_pixels_binned

ts = 32
means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
    load_test_data(scene_grid=5))
scale = 1920.0 / width
Ks = Ks.copy(); Ks[:, :2, :] *= scale
width, height = 1920, 1080
C = 1
viewmats, Ks = viewmats[:C], Ks[:C]
vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
N = means.shape[0]
args = tuple(jnp.asarray(x) for x in (means, quats, scales, opacities, colors))

radii, means2d, depths, conics, _ = jax.jit(
    lambda m, q, s: fully_fused_projection(m, q, s, vm, K, width, height)
)(*args[:3])
tw, th = -(-width // ts), -(-height // ts)
opc = jnp.broadcast_to(args[3][None], (C, N))
cols = jnp.broadcast_to(args[4][None], (C, N, 3))
probe = bin_gaussians(
    means2d[..., 0], means2d[..., 1], conics[..., 0], conics[..., 1],
    conics[..., 2], opc, cols, radii, depths, ts, tw, th, capacity=512,
    cull=True)
cap = int(probe.slab_required) + 1024
print(f"cap={cap}", flush=True)


def timeit(name, step, a0, rest, iters=8):
    out = step(a0, *rest)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(a0 + np.float32((i + 1) * 1e-7), *rest)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:10s} {dt:8.1f} ms", flush=True)
    return dt


# 1) full bench step (bench.py equivalent)
def loss_full(means, quats, scales, opacities, colors):
    render, alphas, _ = rasterization(
        means, quats, scales, opacities, colors, vm, K, width, height,
        backend="binned", isect_capacity=cap, tile_size=ts)
    return jnp.sum(render) + jnp.sum(alphas)

step_full = jax.jit(jax.grad(loss_full, argnums=(0, 1, 2, 3, 4)))
t_full = timeit("full", step_full, args[0], args[1:])

# 2) raster-only step over pre-projected SoA rows. ALL big arrays ride as
# args (radii/depths too — a closed-over device array is a baked constant
# that re-stages through the tunnel per dispatch, CLAUDE.md rule), and the
# colors arrive pre-materialized as [C, N, 3] with grad taken w.r.t. that
# array directly — same producer/cotangent shapes as the full bench step.
mx, my = means2d[..., 0], means2d[..., 1]
ca, cb, cc = conics[..., 0], conics[..., 1], conics[..., 2]
cols_m = jnp.asarray(np.asarray(cols))  # materialized [C, N, 3] input

def loss_raster(mx, my, ca, cb, cc, op, cols3, radii, depths):
    r, a, _ = rasterize_to_pixels_binned(
        (mx, my), (ca, cb, cc), cols3, op, radii, depths,
        width, height, ts, capacity=cap, cull=True)
    return jnp.sum(r) + jnp.sum(a)

step_raster = jax.jit(jax.grad(loss_raster, argnums=tuple(range(7))))
t_raster = timeit(
    "raster", step_raster, mx, (my, ca, cb, cc, opc, cols_m, radii, depths))

# 2b) same but the colors are stacked from three [C, N] rows INSIDE the
# jitted fn — isolates the cost of one [C, N, 3] materialization + its
# split-VJP cotangent at bench scale (the 57x-padding rule, on-device).
crows = tuple(cols[..., d] for d in range(3))

def loss_raster_stack(mx, my, ca, cb, cc, op, c0, c1, c2, radii, depths):
    cols3 = jnp.stack([c0, c1, c2], axis=-1)
    r, a, _ = rasterize_to_pixels_binned(
        (mx, my), (ca, cb, cc), cols3, op, radii, depths,
        width, height, ts, capacity=cap, cull=True)
    return jnp.sum(r) + jnp.sum(a)

step_rstack = jax.jit(jax.grad(loss_raster_stack, argnums=tuple(range(9))))
t_rstack = timeit(
    "rasterstk", step_rstack, mx, (my, ca, cb, cc, opc) + crows + (radii, depths))

# 3) projection-only step (raw [N,3]/[N,4] params -> SoA outputs)
def loss_proj(means, quats, scales):
    soa = fully_fused_projection_soa(means, quats, scales, vm, K, width, height)
    return (soa["mean_x"].sum() + soa["mean_y"].sum() + soa["depth"].sum()
            + soa["conic_a"].sum() + soa["conic_b"].sum() + soa["conic_c"].sum())

step_proj = jax.jit(jax.grad(loss_proj, argnums=(0, 1, 2)))
t_proj = timeit("proj", step_proj, args[0], args[1:3])

print(f"overhead full-raster: {t_full - t_raster:.1f} ms "
      f"(proj-only accounts for {t_proj:.1f} ms; "
      f"in-jit [C,N,3] stack costs {t_rstack - t_raster:.1f} ms)", flush=True)


# 4) full step with every parameter crossing the jit boundary as SoA rows
# ([N] components assembled in-jit): isolates the boundary-layout cost of
# [N,3]/[N,4]-shaped inputs + grad cotangents in the official bench step.
mrows = tuple(args[0][:, d] for d in range(3))
qrows = tuple(args[1][:, d] for d in range(4))
srows = tuple(args[2][:, d] for d in range(3))
colrows = tuple(args[4][:, d] for d in range(3))

def loss_full_soa(m0, m1, m2, q0, q1, q2, q3, s0, s1, s2, op, c0, c1, c2):
    means = jnp.stack([m0, m1, m2], axis=-1)
    quats = jnp.stack([q0, q1, q2, q3], axis=-1)
    scales = jnp.stack([s0, s1, s2], axis=-1)
    colors = jnp.stack([c0, c1, c2], axis=-1)
    render, alphas, _ = rasterization(
        means, quats, scales, op, colors, vm, K, width, height,
        backend="binned", isect_capacity=cap, tile_size=ts)
    return jnp.sum(render) + jnp.sum(alphas)

step_soa = jax.jit(jax.grad(loss_full_soa, argnums=tuple(range(14))))
t_soa = timeit("full_soa", step_soa, mrows[0],
               mrows[1:] + qrows + srows + (args[3],) + colrows)
print(f"SoA-boundary full step: {t_soa:.1f} ms vs AoS full {t_full:.1f} ms",
      flush=True)
