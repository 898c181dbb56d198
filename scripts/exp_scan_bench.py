"""Steady-state vs per-dispatch frame time: quantify the tunnel/dispatch
overhead in the official bench number.

bench.py dispatches one jitted fwd+bwd step per frame, so every frame pays
the host->tunnel->device dispatch path. The reference's profile numbers
(docs/source/tests/profile.rst) come from on-device iteration timing with
no per-frame host round-trip. This experiment measures both on the same
config (grid5 1080p ts=32 binned):

  dispatch:  bench.py's loop — one step() call per frame, input varied
             per call (PERF.md measurement rules)
  scan:      ONE dispatch running lax.scan over SCAN_N frames, the input
             varied per scan step (means + i*1e-7) so every frame computes
             genuinely different work — the remote layer cannot memoize,
             and each iteration renders + differentiates a full frame

dispatch - scan = per-dispatch overhead (host sync, tunnel round-trip,
arg staging). If this is a large fraction of the 268 ms frame, the chip's
true steady-state throughput is the scan number.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from gsplat_tpu import load_test_data, rasterization
from bench import _probe_capacity

SCAN_N = 8
ts = 32
means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
    load_test_data(scene_grid=5))
scale = 1920.0 / width
Ks = Ks.copy(); Ks[:, :2, :] *= scale
width, height = 1920, 1080
C = 1
viewmats, Ks = viewmats[:C], Ks[:C]
args = tuple(jnp.asarray(x)
             for x in (means, quats, scales, opacities, colors, viewmats, Ks))
cap, slab = _probe_capacity(args[:5], args[5], args[6], width, height, ts)
print(f"capacity={cap}", flush=True)


def loss_fn(means, quats, scales, opacities, colors, viewmats, Ks):
    render, alphas, _ = rasterization(
        means, quats, scales, opacities, colors, viewmats, Ks,
        width, height, backend="binned", isect_capacity=cap, tile_size=ts)
    return jnp.sum(render) + jnp.sum(alphas)

grad = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))

# --- per-dispatch (bench.py methodology) ---
step = jax.jit(grad)
out = step(*args)
jax.block_until_ready(out)
iters = 10
t0 = time.perf_counter()
for i in range(iters):
    out = step(args[0] + np.float32(i + 1) * 1e-7, *args[1:])
jax.block_until_ready(out)
dt_dispatch = (time.perf_counter() - t0) / iters * 1e3
print(f"dispatch: {dt_dispatch:8.1f} ms/frame "
      f"({C*width*height/dt_dispatch*1e3:.3e} px/s)", flush=True)


# --- steady-state: SCAN_N frames inside one dispatch ---
@jax.jit
def scan_steps(means, quats, scales, opacities, colors, viewmats, Ks, base):
    def body(carry, i):
        g = grad(means + (base + i.astype(jnp.float32)) * 1e-7,
                 quats, scales, opacities, colors, viewmats, Ks)
        # fold the grads into a scalar carry so the loop keeps only O(1)
        # live state per iteration (full grad pytrees out of a scan would
        # hold SCAN_N copies)
        return carry + sum(jnp.sum(x) for x in g), 0
    out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(SCAN_N))
    return out

out = scan_steps(*args, jnp.float32(0))
jax.block_until_ready(out)
reps = 3
t0 = time.perf_counter()
for r in range(reps):
    out = scan_steps(*args, jnp.float32((r + 1) * SCAN_N))
jax.block_until_ready(out)
dt_scan = (time.perf_counter() - t0) / (reps * SCAN_N) * 1e3
print(f"scan:     {dt_scan:8.1f} ms/frame "
      f"({C*width*height/dt_scan*1e3:.3e} px/s)", flush=True)
print(f"per-dispatch overhead: {dt_dispatch - dt_scan:.1f} ms", flush=True)
