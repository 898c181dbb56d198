"""On-device parity + perf for the binned 2DGS pipeline.

Usage: python scripts/check_2dgs_binned_tpu.py [parity] [bench]
  parity: small scene, binned vs oracle values + grads on real TPU
  bench:  garden-fixture surfel scene 1080p fwd+bwd, binned vs tiled (ts=16)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)


def _scene(N=300, C=2, W=64, H=48):
    rng = np.random.default_rng(0)
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.3 + 0.05).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((C, N, 3)).astype(np.float32)
    vm = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    vm[:, 2, 3] = 4.0
    if C > 1:
        vm[1, 0, 3] = 0.3
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1))
    return means, quats, scales, opac, colors, vm, Ks


def parity():
    from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
    from gsplat_tpu.ops.rasterize_2dgs_binned import (
        rasterize_to_pixels_2dgs_binned)
    from gsplat_tpu.ops.rasterize_2dgs_ref import rasterize_to_pixels_2dgs_ref

    W, H, ts = 64, 48, int(os.environ.get("TS", 16))
    pb = int(os.environ.get("GSPLAT_PB", 256))
    assert (ts * ts) % min(ts * ts, pb) == 0, (
        f"TS={ts} gives {ts*ts} pixels/tile, not divisible into "
        f"GSPLAT_PB={pb} sub-blocks (the binned backward asserts "
        "P % min(P, PB) == 0); use a multiple-of-16 TS or set GSPLAT_PB "
        f"to a divisor of {ts*ts}"
    )
    if ts > 16:
        W, H = 2 * ts, int(1.5 * ts)  # keep the scene a couple tiles wide
    means, quats, scales, opac, colors, vm, Ks = _scene(W=W, H=H)
    C, N = colors.shape[:2]
    radii, means2d, depths, ray_Ms, normals = fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(vm), jnp.asarray(Ks), W, H)
    opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
    depth_col = jnp.concatenate(
        [jnp.asarray(colors), depths[..., None]], axis=-1)

    ref = rasterize_to_pixels_2dgs_ref(
        means2d, ray_Ms, depth_col, normals, opc, radii, depths, W, H, ts)
    out = jax.jit(lambda M: rasterize_to_pixels_2dgs_binned(
        means2d, M, depth_col, normals, opc, radii, depths, W, H, ts,
        capacity=16384))(ray_Ms)
    ok = True
    for i, nm in enumerate(("colors", "alphas", "normals", "distort", "median")):
        d = float(jnp.abs(out[i] - ref[i]).max())
        print(f"{nm}: maxdiff {d:.3e}", flush=True)
        ok = ok and d < 2e-4

    def loss_b(M, col, op):
        o = rasterize_to_pixels_2dgs_binned(
            means2d, M, col, normals, op, radii, depths, W, H, ts,
            capacity=16384)
        return sum(jnp.sum(x) for x in o[:4])

    def loss_r(M, col, op):
        o = rasterize_to_pixels_2dgs_ref(
            means2d, M, col, normals, op, radii, depths, W, H, ts)
        return sum(jnp.sum(x) for x in o[:4])

    gb = jax.jit(jax.grad(loss_b, argnums=(0, 1, 2)))(ray_Ms, depth_col, opc)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(ray_Ms, depth_col, opc)
    for nm, a, b in zip(("ray_Ms", "colors", "opac"), gb, gr):
        d = float(jnp.abs(a - b).max())
        s = float(jnp.abs(b).max())
        print(f"grad {nm}: maxdiff {d:.3e} (scale {s:.3e})", flush=True)
        ok = ok and d <= 2e-3 * max(s, 1.0)
    print("PARITY", "OK" if ok else "FAIL", flush=True)


def bench():
    from gsplat_tpu import load_test_data
    from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
    from gsplat_tpu.ops.rasterize_2dgs_binned import (
        rasterize_to_pixels_2dgs_binned)
    from gsplat_tpu.ops.rasterize_2dgs_tiled import (
        rasterize_to_pixels_2dgs_tiled)
    from gsplat_tpu.ops.isect import isect_tiles, suggest_capacity

    ts = int(os.environ.get("TS", 16))
    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data(scene_grid=5))
    scale = 1920.0 / width
    Ks = Ks.copy(); Ks[:, :2, :] *= scale
    width, height = 1920, 1080
    C = 1
    vm, K3 = jnp.asarray(viewmats[:C]), jnp.asarray(Ks[:C])
    N = means.shape[0]
    radii, means2d, depths, ray_Ms, normals = jax.jit(
        lambda m, q, s: fully_fused_projection_2dgs(
            m, q, s, vm, K3, width, height)
    )(jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales))
    opc = jnp.broadcast_to(jnp.asarray(opacities)[None], (C, N))
    depth_col = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(colors)[None], (C, N, 3)),
         depths[..., None]], axis=-1)
    tw, th = -(-width // ts), -(-height // ts)

    probe = rasterize_to_pixels_2dgs_binned(
        means2d, ray_Ms, depth_col, normals, opc, radii, depths,
        width, height, ts, capacity=512)
    cap_b = int(probe[5]["slab_required"]) + 1024
    isect_probe = isect_tiles(means2d, radii, depths, ts, tw, th, capacity=8)
    cap_t = suggest_capacity(int(isect_probe.n_isects), slack=1.05)
    print(f"ts={ts} slab_required={cap_b - 1024} "
          f"n_isects={int(isect_probe.n_isects)}", flush=True)

    def make_step(kind):
        def loss(M, col, op, rad, dep):
            if kind == "binned":
                o = rasterize_to_pixels_2dgs_binned(
                    means2d, M, col, normals, op, rad, dep,
                    width, height, ts, capacity=cap_b)
            else:
                isect = isect_tiles(means2d, rad, dep, ts, tw, th,
                                    capacity=cap_t)
                o = rasterize_to_pixels_2dgs_tiled(
                    means2d, M, col, normals, op, width, height, ts, isect)
            return sum(jnp.sum(x) for x in o[:4])

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    for kind in ("binned", "tiled"):
        step = make_step(kind)
        out = step(ray_Ms, depth_col, opc, radii, depths)
        jax.block_until_ready(out)
        iters = 6
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(ray_Ms + np.float32((i + 1) * 1e-7), depth_col, opc,
                       radii, depths)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        px = C * width * height / dt
        print(f"{kind}: {dt*1e3:.1f} ms/frame fwd+bwd -> {px:.3e} px/s",
              flush=True)


for mode in sys.argv[1:] or ["parity"]:
    globals()[mode]()
print("DONE", flush=True)
