"""Pallas 2DGS rasterizer vs the 2DGS oracle: values + VJPs (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.isect import isect_tiles
from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
from gsplat_tpu.ops.rasterize_2dgs_ref import rasterize_to_pixels_2dgs_ref
from gsplat_tpu.ops.rasterize_2dgs_tiled import rasterize_to_pixels_2dgs_tiled


@pytest.fixture
def scene(rng):
    N, C, W, H, ts = 200, 2, 64, 48, 16
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.2 + 0.02).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((C, N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    viewmats[1, 0, 3] = 0.4
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
    )
    opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
    cols = jnp.concatenate([jnp.asarray(colors), depths[..., None]], axis=-1)
    tw, th = -(-W // ts), -(-H // ts)
    isect = isect_tiles(means2d, radii, depths, ts, tw, th, capacity=8192)
    return dict(
        means2d=means2d, M=M, normals=normals, colors=cols, opac=opc,
        radii=radii, depths=depths, W=W, H=H, ts=ts, isect=isect,
    )


def _mostly_close(x, y, atol, frac=0.995, max_abs=6e-3):
    """allclose for nearly all elements. The 2DGS sigma goes through a
    cancellation-prone cross product, so a handful of pixels flip a
    borderline alpha >= 1/255 acceptance between any two float orderings
    (oracle vs kernel); those measure-zero flips bound the residual."""
    x, y = np.asarray(x), np.asarray(y)
    d = np.abs(x - y)
    assert (d <= atol).mean() >= frac, f"only {(d <= atol).mean():.4f} close"
    assert d.max() <= max_abs, f"max diff {d.max()}"


def test_2dgs_tiled_matches_oracle(scene, rng):
    bg = jnp.asarray(rng.random((2, 4)).astype(np.float32))
    r0, a0, n0, d0, m0 = rasterize_to_pixels_2dgs_ref(
        scene["means2d"], scene["M"], scene["colors"], scene["normals"],
        scene["opac"], scene["radii"], scene["depths"],
        scene["W"], scene["H"], scene["ts"], bg,
    )
    r1, a1, n1, d1, m1 = rasterize_to_pixels_2dgs_tiled(
        scene["means2d"], scene["M"], scene["colors"], scene["normals"],
        scene["opac"], scene["W"], scene["H"], scene["ts"], scene["isect"], bg,
    )
    _mostly_close(r0, r1, atol=2e-4)
    _mostly_close(a0, a1, atol=1e-4)
    _mostly_close(n0, n1, atol=1e-4)
    _mostly_close(d0, d1, atol=5e-4, max_abs=5e-2)
    _mostly_close(m0, m1, atol=1e-5, max_abs=5.0)  # median: selection output


def test_2dgs_tiled_vjp_matches_oracle(scene, rng):
    W, H, ts = scene["W"], scene["H"], scene["ts"]
    wr = jnp.asarray(rng.standard_normal((2, H, W, 4)).astype(np.float32))
    wa = jnp.asarray(rng.standard_normal((2, H, W, 1)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal((2, H, W, 3)).astype(np.float32))
    wd = jnp.asarray(rng.standard_normal((2, H, W, 1)).astype(np.float32))

    def loss_ref(m2d, M, col, nrm, op):
        r, a, n, d, _ = rasterize_to_pixels_2dgs_ref(
            m2d, M, col, nrm, op, scene["radii"], scene["depths"], W, H, ts
        )
        return (
            jnp.sum(r * wr) + jnp.sum(a * wa) + jnp.sum(n * wn) + jnp.sum(d * wd)
        )

    def loss_til(m2d, M, col, nrm, op):
        r, a, n, d, _ = rasterize_to_pixels_2dgs_tiled(
            m2d, M, col, nrm, op, W, H, ts, scene["isect"]
        )
        return (
            jnp.sum(r * wr) + jnp.sum(a * wa) + jnp.sum(n * wn) + jnp.sum(d * wd)
        )

    args = (scene["means2d"], scene["M"], scene["colors"], scene["normals"],
            scene["opac"])
    g0 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g1 = jax.grad(loss_til, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means2d", "ray_transforms", "colors", "normals", "opacities"]
    for nm, x, y in zip(names, g0, g1):
        s = max(float(jnp.abs(x).max()), 1.0)
        _mostly_close(x, y, atol=2e-3 * s, frac=0.995, max_abs=0.05 * s)


@pytest.mark.parametrize("ts", [16, 32])
def test_2dgs_binned_matches_oracle(rng, ts):
    """Binned-engine 2DGS (emit -> payload sort -> kernels -> gid reduce)
    against the oracle: all five outputs + grads. ts=32 exercises the bwd
    kernel's pixel sub-blocking (NH = P/PB = 4) that keeps the ts=32 live
    set inside the v5e 16MB VMEM."""
    from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
    from gsplat_tpu.ops.rasterize_2dgs_binned import (
        rasterize_to_pixels_2dgs_binned,
    )
    from gsplat_tpu.ops.rasterize_2dgs_ref import rasterize_to_pixels_2dgs_ref

    N, C, W, H = 300, 2, 64, 48
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.3 + 0.05).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((C, N, 3)).astype(np.float32)
    vm = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    vm[:, 2, 3] = 4.0
    vm[1, 0, 3] = 0.3
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    radii, means2d, depths, ray_Ms, normals = fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(vm), jnp.asarray(Ks), W, H,
    )
    opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
    depth_col = jnp.concatenate(
        [jnp.asarray(colors), depths[..., None]], axis=-1
    )
    bg = jnp.asarray(rng.random((C, 4)).astype(np.float32))

    ref = rasterize_to_pixels_2dgs_ref(
        means2d, ray_Ms, depth_col, normals, opc, radii, depths, W, H, ts, bg
    )
    out = rasterize_to_pixels_2dgs_binned(
        means2d, ray_Ms, depth_col, normals, opc, radii, depths, W, H, ts,
        capacity=16384, backgrounds=bg,
    )
    # count-based gates: binned-vs-oracle entry ordering flips a handful of
    # borderline alpha >= 1/255 inclusions (2/24576 at 8e-4 measured at
    # ts=32); each flip is bounded by the entry's local contribution
    for i, nm in enumerate(("colors", "alphas", "normals", "distort", "median")):
        d = np.abs(np.asarray(out[i]) - np.asarray(ref[i]))
        assert d.max() < 1e-2, f"{nm} max {d.max():.2e}"
        assert (d > 2e-4).mean() < 1e-3, f"{nm} flips {(d > 2e-4).mean():.2%}"
    assert int(out[5]["n_isects"]) > 0

    def loss_b(M, col, op):
        o = rasterize_to_pixels_2dgs_binned(
            means2d, M, col, normals, op, radii, depths, W, H, ts,
            capacity=16384)
        return sum(jnp.sum(x) for x in o[:4])

    def loss_r(M, col, op):
        o = rasterize_to_pixels_2dgs_ref(
            means2d, M, col, normals, op, radii, depths, W, H, ts)
        return sum(jnp.sum(x) for x in o[:4])

    gb = jax.grad(loss_b, argnums=(0, 1, 2))(ray_Ms, depth_col, opc)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(ray_Ms, depth_col, opc)
    for nm, a, b in zip(("ray_Ms", "colors", "opac"), gb, gr):
        s = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3 * s, rtol=1e-3,
            err_msg=f"grad {nm}",
        )


def test_2dgs_binned_coef_matches_exact(rng):
    """Coefficient-form sigma (GSPLAT_2DGS_COEF) vs the exact binned path.

    The affine cross-product form and the backward's MXU moment
    contractions reassociate f32 math (tile-center anchoring bounds the
    cancellation; see the note above _coef_rows), so outputs agree to
    ~1e-4 and grads to ~1e-3 relative rather than bitwise."""
    from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
    from gsplat_tpu.ops.rasterize_2dgs_binned import (
        rasterize_to_pixels_2dgs_binned,
    )

    N, C, W, H, ts = 300, 2, 64, 48, 16
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.3 + 0.05).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((C, N, 3)).astype(np.float32)
    vm = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    vm[:, 2, 3] = 4.0
    vm[1, 0, 3] = 0.3
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    radii, means2d, depths, ray_Ms, normals = fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(vm), jnp.asarray(Ks), W, H,
    )
    opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
    depth_col = jnp.concatenate(
        [jnp.asarray(colors), depths[..., None]], axis=-1
    )
    bg = jnp.asarray(rng.random((C, 4)).astype(np.float32))

    common = (means2d, ray_Ms, depth_col, normals, opc, radii, depths, W, H, ts)
    o0 = rasterize_to_pixels_2dgs_binned(
        *common, capacity=16384, backgrounds=bg, coef_sigma=False
    )
    o1 = rasterize_to_pixels_2dgs_binned(
        *common, capacity=16384, backgrounds=bg, coef_sigma=True
    )
    for i, nm in enumerate(("colors", "alphas", "normals", "distort", "median")):
        d = np.abs(np.asarray(o1[i]) - np.asarray(o0[i]))
        # median is a selection output: a borderline T>0.5 flip swaps depths
        assert (d > 2e-4).mean() < 1e-3, f"{nm} flips {(d > 2e-4).mean():.2%}"
        if nm != "median":
            assert d.max() < 2e-3, f"{nm} max {d.max():.2e}"

    def loss(coef, M, col, op):
        o = rasterize_to_pixels_2dgs_binned(
            means2d, M, col, normals, op, radii, depths, W, H, ts,
            capacity=16384, coef_sigma=coef,
        )
        return sum(jnp.sum(x) for x in o[:4])

    g0 = jax.grad(lambda M, c, o: loss(False, M, c, o), argnums=(0, 1, 2))(
        ray_Ms, depth_col, opc
    )
    g1 = jax.grad(lambda M, c, o: loss(True, M, c, o), argnums=(0, 1, 2))(
        ray_Ms, depth_col, opc
    )
    for nm, a, b in zip(("ray_Ms", "colors", "opac"), g1, g0):
        s = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3 * s, rtol=2e-3,
            err_msg=f"grad {nm}",
        )


def test_2dgs_binned_via_rasterization(rng):
    """rasterization_2dgs(backend='binned') end-to-end with carrier grads."""
    from gsplat_tpu.rendering import rasterization_2dgs

    N, C, W, H = 200, 1, 48, 32
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.2 + 0.02).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    vm = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    vm[:, 2, 3] = 4.0
    Ks = np.tile(
        np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors),
        jnp.asarray(vm), jnp.asarray(Ks), W, H,
    )
    outs_o = rasterization_2dgs(*args, backend="oracle")
    outs_b = rasterization_2dgs(*args, backend="binned", isect_capacity=8192)
    # RGB+ED divides the depth channel by alpha, amplifying fp noise
    np.testing.assert_allclose(
        np.asarray(outs_b[0]), np.asarray(outs_o[0]), atol=5e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs_b[1]), np.asarray(outs_o[1]), atol=2e-4, rtol=1e-4
    )
    assert "slab_required" in outs_b[6]

    def loss(carrier, backend, cap):
        o = rasterization_2dgs(
            *args, backend=backend, isect_capacity=cap,
            densify_carrier=carrier,
        )
        return jnp.sum(o[0]) + jnp.sum(o[1])

    z = jnp.zeros((C, N, 2))
    g_o = jax.grad(lambda c: loss(c, "oracle", None))(z)
    g_b = jax.grad(lambda c: loss(c, "binned", 8192))(z)
    s = max(float(jnp.abs(g_o).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(g_b), np.asarray(g_o), atol=1e-3 * s, rtol=1e-3
    )
