"""Benchmark: rasterization fwd+bwd throughput on the garden fixture.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference's kernel profile (1080p render, scene_grid 5,
batch 1 — docs/source/tests/profile.rst:36-58). Baseline: reference CUDA
backend reaches 171.8 fwd / 97.1 bwd FPS on a TITAN RTX -> combined
1/(1/171.8 + 1/97.1) = 62.0 FPS = 1.286e8 pixels/s fwd+bwd.

Methodology (r4c): the official metric is the STEADY-STATE frame time —
lax.scan runs the full fwd+bwd frame back-to-back inside one dispatch with
the input perturbed per step, the same on-device iteration timing the
reference's profile uses (CUDA events, no per-frame host round-trip). The
per-dispatch time (one jitted step per frame) is reported on stderr; on
this image it additionally pays ~55 ms/frame of host->tunnel->device
dispatch overhead that is an artifact of the remote-chip environment, not
of the compute (PERF.md r4c overhead split).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_PIXELS_PER_S = 1.286e8


def _probe_capacity(params, vm, Ks, width, height, tile_size):
    """Out-of-jit slab-budget probe: project once, count the exact entry
    demand via the binning engine's slab_required signal, add headroom.
    One recipe for the C=1 official metric and the C=4 side report so the
    two numbers always measure the same capacity policy."""
    from gsplat_tpu.ops.binning import bin_gaussians
    from gsplat_tpu.ops.projection import fully_fused_projection

    radii, means2d, depths, conics, _ = jax.jit(
        lambda m, q, s: fully_fused_projection(m, q, s, vm, Ks, width, height)
    )(params[0], params[1], params[2])
    tw, th = -(-width // tile_size), -(-height // tile_size)
    C_, N_ = vm.shape[0], params[0].shape[0]
    opc = jnp.broadcast_to(params[3][None], (C_, N_))
    colp = jnp.broadcast_to(params[4][None], (C_, N_, 3))
    probe = bin_gaussians(
        means2d[..., 0], means2d[..., 1], conics[..., 0],
        conics[..., 1], conics[..., 2], opc, colp, radii, depths,
        tile_size, tw, th, capacity=512, cull=True,
    )
    return int(probe.slab_required) + 1024, int(probe.slab_required)


def _time_grad_step(step, step_args, iters):
    """Compile + time. Varies one input per iteration: the remote execution
    layer memoizes identical (executable, args) dispatches, which would fake
    the timing (PERF.md measurement rules)."""
    out = step(*step_args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(step_args[0] + np.float32(i + 1) * 1e-7, *step_args[1:])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _time_scan_steady(grad_fn, grad_args, scan_n=10, reps=3):
    """Steady-state frame time: ONE dispatch runs `scan_n` full fwd+bwd
    frames under lax.scan, the first input perturbed per scan step so every
    frame computes genuinely (no memoization, no loop-invariant hoisting of
    the render pipeline). This matches the reference's methodology — its
    171.8/97.1 FPS profile numbers are on-device iteration timings with no
    per-frame host round-trip (docs/source/tests/profile.rst) — where the
    per-dispatch loop above additionally pays the host->tunnel->device
    dispatch path (~55 ms/frame measured on this image, PERF.md r4c)."""

    @jax.jit
    def scan_steps(base, *rest):
        def body(carry, i):
            g = grad_fn(rest[0] + (base + i.astype(jnp.float32)) * 1e-7,
                        *rest[1:])
            # scalar carry: full grad pytrees out of a scan would stack
            # scan_n copies of every gradient
            return carry + sum(jnp.sum(x) for x in g), 0

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(scan_n))
        return out

    out = scan_steps(jnp.float32(0), *grad_args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(reps):
        out = scan_steps(jnp.float32((r + 1) * scan_n), *grad_args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * scan_n)


def main():
    from gsplat_tpu import load_test_data, rasterization

    try:
        from gsplat_tpu.ops.rasterize_binned import rasterize_to_pixels_binned  # noqa

        backend = "binned"
        scene_grid = 5
    except Exception:
        backend = "oracle"
        scene_grid = 1

    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data(scene_grid=scene_grid)
    )

    if backend == "binned":
        # 1080p, garden replicated 5x5 (parity with profile.rst config)
        scale = 1920.0 / width
        Ks = Ks.copy()
        Ks[:, :2, :] *= scale
        width, height = 1920, 1080
        C = 1
    else:
        n = 4096
        means, quats, scales, opacities, colors = (
            means[:n], quats[:n], scales[:n], opacities[:n], colors[:n],
        )
        C = 1

    viewmats = viewmats[:C]
    Ks = Ks[:C]
    args = tuple(
        jnp.asarray(x)
        for x in (means, quats, scales, opacities, colors, viewmats, Ks)
    )

    # tile_size 32: v5e sweet spot — halves the intersection list vs 16
    # (less binning glue) and still fits the kernel's live set in 16MB VMEM
    # (48/64 exceed it); see PERF.md.
    tile_size = 32
    isect_capacity = None
    if backend == "binned":
        isect_capacity, slab = _probe_capacity(
            args[:5], args[5], args[6], width, height, tile_size
        )
        print(f"n_gaussians={args[0].shape[0]} slab_required={slab} "
              f"capacity={isect_capacity}", file=sys.stderr)

    soa_boundary = os.environ.get("GSPLAT_BENCH_SOA") == "1"
    if soa_boundary:
        # Parameters cross the jit boundary as SoA rows ([N] components,
        # the framework's native layout) and the [N,3]/[N,4] views the
        # public API takes are assembled IN-jit — included in the measured
        # time. A/B vs the default [N,3]-boundary step isolates the
        # boundary-layout cost of [.., 3]-shaped inputs + grad cotangents
        # (exp_overhead.py stage 4; PERF.md r4c).
        def loss_soa(m0, m1, m2, q0, q1, q2, q3, s0, s1, s2, op, c0, c1, c2,
                     viewmats, Ks):
            means = jnp.stack([m0, m1, m2], axis=-1)
            quats = jnp.stack([q0, q1, q2, q3], axis=-1)
            scales = jnp.stack([s0, s1, s2], axis=-1)
            colors = jnp.stack([c0, c1, c2], axis=-1)
            render, alphas, _ = rasterization(
                means, quats, scales, op, colors, viewmats, Ks,
                width, height, backend=backend,
                isect_capacity=isect_capacity, tile_size=tile_size,
            )
            return jnp.sum(render) + jnp.sum(alphas)

        rows = (
            tuple(args[0][:, d] for d in range(3))
            + tuple(args[1][:, d] for d in range(4))
            + tuple(args[2][:, d] for d in range(3))
            + (args[3],)
            + tuple(args[4][:, d] for d in range(3))
        )
        grad_fn = jax.grad(loss_soa, argnums=tuple(range(14)))
        dt = _time_scan_steady(grad_fn, rows + args[5:7])
        dt_dispatch = _time_grad_step(jax.jit(grad_fn), rows + args[5:7], 10)
    else:
        def loss_fn(means, quats, scales, opacities, colors, viewmats, Ks):
            render, alphas, _ = rasterization(
                means, quats, scales, opacities, colors, viewmats, Ks,
                width, height, backend=backend,
                isect_capacity=isect_capacity, tile_size=tile_size,
            )
            return jnp.sum(render) + jnp.sum(alphas)

        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))
        # official metric: steady-state frame time (reference-comparable);
        # per-dispatch time reported alongside on stderr
        dt = _time_scan_steady(grad_fn, args)
        dt_dispatch = _time_grad_step(jax.jit(grad_fn), args, iters=10)
    print(
        f"steady-state {dt*1e3:.1f} ms/frame; per-dispatch "
        f"{dt_dispatch*1e3:.1f} ms/frame (tunnel overhead "
        f"{(dt_dispatch-dt)*1e3:.1f} ms)",
        file=sys.stderr,
    )

    pixels_per_s = C * width * height / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"garden {width}x{height} grid{scene_grid} "
                    f"rasterization fwd+bwd steady-state ({backend}"
                    f"{', soa-boundary' if soa_boundary else ''})"
                ),
                "value": pixels_per_s,
                "unit": "pixels/s",
                "vs_baseline": pixels_per_s / BASELINE_PIXELS_PER_S,
            }
        )
    )

    if backend == "binned":
        # Side report (stderr, official metric stays C=1 for baseline
        # comparability): the batched C=4 number — the reference also
        # publishes batch-4 profiles (docs/source/tests/profile.rst:62-75)
        # and camera batching amortizes the per-dispatch glue (PERF.md).
        try:
            _bench_batched(args, width, height, tile_size, 4)
        except Exception as e:  # never let the side report break the metric
            print(f"C=4 side bench failed: {e!r}", file=sys.stderr)


def _bench_batched(args, width, height, tile_size, C):
    """C-camera batch under BOTH slab policies (VERDICT r4 item 6 A/B):
    the shared slab (every camera pads to the batch's total entry count)
    vs the per-camera slab partition (GSPLAT_PER_CAM — lax.map over
    cameras, capacity = max single-camera slab)."""
    from gsplat_tpu import rasterization

    vm = np.tile(np.asarray(args[5][:1]), (C, 1, 1))
    for c in range(1, C):  # distinct nearby views, like a training batch
        vm[c, 0, 3] += 0.05 * c
        vm[c, 1, 3] -= 0.03 * c
    vm = jnp.asarray(vm)
    Ks = jnp.tile(jnp.asarray(args[6][:1]), (C, 1, 1))

    cap, _ = _probe_capacity(args[:5], vm, Ks, width, height, tile_size)
    # per-camera policy: capacity is the PER-CAMERA budget -> max over
    # single-camera probes (same recipe, C=1 slices)
    cap_pc = max(
        _probe_capacity(
            args[:5], vm[c : c + 1], Ks[c : c + 1], width, height, tile_size
        )[0]
        for c in range(C)
    )

    def make(capacity):
        def loss_fn(means, quats, scales, opacities, colors, vm, Ks):
            render, alphas, _ = rasterization(
                means, quats, scales, opacities, colors, vm, Ks,
                width, height, backend="binned", isect_capacity=capacity,
                tile_size=tile_size,
            )
            return jnp.sum(render) + jnp.sum(alphas)

        return jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))

    for label, capacity, env in (
        ("shared-slab", cap, None),
        ("per-camera-slab", cap_pc, "1"),
    ):
        prev = os.environ.pop("GSPLAT_PER_CAM", None)
        if env is not None:
            os.environ["GSPLAT_PER_CAM"] = env  # read at trace time
        try:
            grad_fn = make(capacity)
            dt = _time_scan_steady(
                grad_fn, args[:5] + (vm, Ks), scan_n=5, reps=2
            )
            print(
                f"side report C={C} {label}: "
                f"{C * width * height / dt:.3e} pixels/s fwd+bwd "
                f"steady-state ({dt*1e3:.1f} ms/step, capacity={capacity})",
                file=sys.stderr,
            )
        finally:
            if env is not None:
                os.environ.pop("GSPLAT_PER_CAM", None)
            if prev is not None:
                os.environ["GSPLAT_PER_CAM"] = prev


if __name__ == "__main__":
    main()
