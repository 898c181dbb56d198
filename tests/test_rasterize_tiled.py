"""Tiled Pallas rasterizer vs the jnp oracle: values and VJPs.

Mirrors the reference's kernel-vs-oracle strategy
(/root/reference/triton_tests/test_ras2pix.py, tests/test_basic.py:444-546)
but runs the Pallas kernels in interpret mode on the CPU mesh, so CI needs no
TPU. `scripts/check_tiled_tpu.py` runs the same parity on real hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.isect import isect_tiles
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gsplat_tpu.ops.rasterize_tiled import rasterize_to_pixels_tiled


def _scene(rng, N=250, C=2, W=64, H=48, D=3):
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.3 + 0.05).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((C, N, D)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    if C > 1:
        viewmats[1, 0, 3] = 0.3
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    radii, means2d, depths, conics, _ = fully_fused_projection(
        jnp.asarray(means),
        jnp.asarray(quats),
        jnp.asarray(scales),
        jnp.asarray(viewmats),
        jnp.asarray(Ks),
        W,
        H,
    )
    opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
    return radii, means2d, depths, conics, jnp.asarray(colors), opc


@pytest.mark.parametrize("D", [3, 8])
@pytest.mark.parametrize("use_bg", [False, True])
def test_tiled_matches_oracle(rng, D, use_bg):
    C, W, H, ts = 2, 64, 48, 16
    radii, means2d, depths, conics, colors, opac = _scene(rng, C=C, W=W, H=H, D=D)
    bg = jnp.asarray(rng.random((C, D)).astype(np.float32)) if use_bg else None
    tw, th = -(-W // ts), -(-H // ts)
    isect = isect_tiles(means2d, radii, depths, ts, tw, th, capacity=8192)
    assert int(isect.n_isects) > 0

    r0, a0 = rasterize_to_pixels_ref(
        means2d, conics, colors, opac, radii, depths, W, H, ts, bg
    )
    r1, a1 = rasterize_to_pixels_tiled(
        means2d, conics, colors, opac, W, H, ts, isect, backgrounds=bg
    )
    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)


def test_tiled_vjp_matches_oracle(rng):
    C, W, H, ts, D = 2, 64, 48, 16, 3
    radii, means2d, depths, conics, colors, opac = _scene(rng, C=C, W=W, H=H, D=D)
    bg = jnp.asarray(rng.random((C, D)).astype(np.float32))
    tw, th = -(-W // ts), -(-H // ts)
    isect = isect_tiles(means2d, radii, depths, ts, tw, th, capacity=8192)

    wr = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))
    wa = jnp.asarray(rng.standard_normal((C, H, W, 1)).astype(np.float32))

    def loss_of(f):
        def L(m2d, con, col, op):
            r, a = f(m2d, con, col, op)
            return jnp.sum(r * wr) + jnp.sum(a * wa)

        return jax.grad(L, argnums=(0, 1, 2, 3))

    g_ref = loss_of(
        lambda m, c, col, o: rasterize_to_pixels_ref(
            m, c, col, o, radii, depths, W, H, ts, bg
        )
    )(means2d, conics, colors, opac)
    g_til = loss_of(
        lambda m, c, col, o: rasterize_to_pixels_tiled(
            m, c, col, o, W, H, ts, isect, backgrounds=bg
        )
    )(means2d, conics, colors, opac)

    names = ["means2d", "conics", "colors", "opacities"]
    for name, x, y in zip(names, g_ref, g_til):
        scale = max(float(jnp.abs(x).max()), 1.0)
        np.testing.assert_allclose(
            x, y, atol=1e-3 * scale, rtol=1e-3, err_msg=f"grad {name}"
        )


def test_tiled_empty_scene(rng):
    """All Gaussians culled -> background only, zero grads, no NaNs."""
    C, W, H, ts, D = 1, 32, 32, 16, 3
    N = 16
    means2d = jnp.zeros((C, N, 2))
    conics = jnp.tile(jnp.asarray([1.0, 0.0, 1.0]), (C, N, 1))
    colors = jnp.ones((C, N, D))
    opac = jnp.ones((C, N)) * 0.5
    radii = jnp.zeros((C, N), jnp.int32)  # everything culled
    depths = jnp.ones((C, N))
    tw, th = 2, 2
    isect = isect_tiles(means2d, radii, depths, ts, tw, th, capacity=256)
    bg = jnp.ones((C, D)) * 0.25

    def L(m2d):
        r, a = rasterize_to_pixels_tiled(
            m2d, conics, colors, opac, W, H, ts, isect, backgrounds=bg
        )
        return jnp.sum(r) + jnp.sum(a), (r, a)

    (val, (r, a)), g = jax.value_and_grad(L, has_aux=True)(means2d)
    np.testing.assert_allclose(r, 0.25, atol=1e-6)
    np.testing.assert_allclose(a, 0.0, atol=1e-6)
    np.testing.assert_allclose(g, 0.0, atol=1e-6)


def test_tiled_channel_chunking_and_modes(rng):
    """High channel count through the chunking path + depth render modes +
    antialiased, tiled vs oracle (reference tests rasterize at 3/32/128
    channels — tests/test_basic.py:444)."""
    from gsplat_tpu import rasterization

    N, C, W, H = 150, 1, 48, 32
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.3 + 0.05).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    Ks = np.tile(
        np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    base = [jnp.asarray(x) for x in (means, quats, scales, opac)]
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)

    # 40 channels -> two chunks of 32/8
    feats = jnp.asarray(rng.random((N, 40)).astype(np.float32))
    r0, a0, _ = rasterization(*base, feats, vm, K, W, H, backend="oracle")
    r1, a1, _ = rasterization(
        *base, feats, vm, K, W, H, backend="tiled", isect_capacity=4096
    )
    assert r1.shape == (C, H, W, 40)
    np.testing.assert_allclose(r0, r1, atol=2e-4, rtol=1e-3)

    # RGB+ED with background, antialiased
    cols = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    bg = jnp.asarray(rng.random((C, 3)).astype(np.float32))
    for mode in ["RGB+D", "RGB+ED", "D", "ED"]:
        r0, a0, _ = rasterization(
            *base, cols, vm, K, W, H, render_mode=mode,
            rasterize_mode="antialiased", backgrounds=bg, backend="oracle",
        )
        r1, a1, _ = rasterization(
            *base, cols, vm, K, W, H, render_mode=mode,
            rasterize_mode="antialiased", backgrounds=bg,
            backend="tiled", isect_capacity=4096,
        )
        np.testing.assert_allclose(r0, r1, atol=2e-4, rtol=1e-3, err_msg=mode)


def test_absgrad_per_tile_semantics(rng):
    """absgrad = sum over tiles of |per-tile d mu2d| (reference
    rasterize_to_pixels_bwd.py:282-292), for both backends, and differs
    from |sum over tiles| for multi-tile Gaussians."""
    from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref_absgrad

    C, W, H, ts = 1, 64, 48, 16
    radii, means2d, depths, conics, colors, opac = _scene(
        rng, N=120, C=C, W=W, H=H
    )
    tw, th = -(-W // ts), -(-H // ts)
    isect = isect_tiles(means2d, radii, depths, ts, tw, th, capacity=8192)
    bg = jnp.zeros((C, 3), jnp.float32)
    wr = jnp.asarray(rng.standard_normal((C, H, W, 3)).astype(np.float32))
    wa = jnp.asarray(rng.standard_normal((C, H, W, 1)).astype(np.float32))

    def loss_oracle(carrier):
        r, a = rasterize_to_pixels_ref_absgrad(
            means2d, conics, colors, opac, radii, depths, W, H, ts, bg,
            carrier,
        )
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    def loss_tiled(carrier):
        r, a = rasterize_to_pixels_tiled(
            means2d, conics, colors, opac, W, H, ts, isect, backgrounds=bg,
            abs_carrier=(carrier[..., 0], carrier[..., 1]),
        )
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    def loss_plain(m2d):
        r, a = rasterize_to_pixels_ref(
            m2d, conics, colors, opac, radii, depths, W, H, ts, bg
        )
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    zc = jnp.zeros_like(means2d)
    g_oracle = jax.grad(loss_oracle)(zc)
    g_tiled = jax.grad(loss_tiled)(zc)
    g_sum = jax.grad(loss_plain)(means2d)

    assert np.all(np.asarray(g_oracle) >= 0)
    np.testing.assert_allclose(
        np.asarray(g_tiled), np.asarray(g_oracle), rtol=1e-4, atol=1e-5
    )
    # per-tile abs >= |sum|, strictly greater for some multi-tile Gaussian
    assert np.all(
        np.asarray(g_oracle) - np.abs(np.asarray(g_sum)) >= -1e-5
    )
    assert float(jnp.max(g_oracle - jnp.abs(g_sum))) > 1e-4

    # the rendered forward and the true param gradients are unchanged
    r1, _ = rasterize_to_pixels_tiled(
        means2d, conics, colors, opac, W, H, ts, isect, backgrounds=bg,
        abs_carrier=(zc[..., 0], zc[..., 1]),
    )
    r0, _ = rasterize_to_pixels_tiled(
        means2d, conics, colors, opac, W, H, ts, isect, backgrounds=bg,
    )
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-6)

    def loss_means_tiled(m2d, use_abs):
        r, a = rasterize_to_pixels_tiled(
            m2d, conics, colors, opac, W, H, ts, isect, backgrounds=bg,
            abs_carrier=(zc[..., 0], zc[..., 1]) if use_abs else None,
        )
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    gm1 = jax.grad(lambda m: loss_means_tiled(m, True))(means2d)
    gm0 = jax.grad(lambda m: loss_means_tiled(m, False))(means2d)
    np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm0), atol=1e-6)
