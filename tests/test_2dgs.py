"""2DGS projection + rasterization tests.

Parity model: /root/reference/tests/test_2dgs.py (projection :47, rasterize
with normals/distort/median :234). The projection is checked against a
direct matrix-math evaluation of the oracle formulas
(gsplat/cuda/_torch_impl_2dgs.py:9-76) written independently here with
jnp einsums; the rasterizer is checked for compositing invariants and
differentiability.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.projection import quat_to_rotmat
from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
from gsplat_tpu.rendering import rasterization_2dgs


def _scene(rng, N=200, C=2, W=64, H=48):
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.2 + 0.02).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    if C > 1:
        viewmats[1, 0, 3] = 0.4
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    return (means, quats, scales, opac, colors, viewmats, Ks, W, H)


def _proj_2dgs_matrix_oracle(means, quats, scales, viewmats, Ks):
    """Direct matrix-form evaluation (the reference oracle's einsum math)."""
    R_cw = viewmats[:, :3, :3]
    t_cw = viewmats[:, :3, 3]
    means_c = jnp.einsum("cij,nj->cni", R_cw, means) + t_cw[:, None, :]
    R = quat_to_rotmat(quats)  # [N, 3, 3]
    RS = R * scales[:, None, :]
    RS_cl = jnp.einsum("cij,njk->cnik", R_cw, RS)
    normals = RS_cl[..., 2]
    cos = -jnp.einsum("cni,cni->cn", normals, means_c)[..., None]
    normals = normals * jnp.where(cos > 0, 1.0, -1.0)
    T_cl = jnp.concatenate([RS_cl[..., :2], means_c[..., None]], axis=-1)
    T_sl = jnp.einsum("cij,cnjk->cnik", Ks, T_cl)
    M = jnp.swapaxes(T_sl, -1, -2)
    test = jnp.asarray([1.0, 1.0, -1.0]).reshape(1, 1, 3)
    d = (M[..., 2] * M[..., 2] * test).sum(axis=-1, keepdims=True)
    f = (test / jnp.where(jnp.abs(d) > 1e-6, d, 1.0))[..., None]
    means2d = (M[..., :2] * M[..., 2:3] * f).sum(axis=-2)
    extents = jnp.sqrt(
        jnp.clip(means2d**2 - (M[..., :2] ** 2 * f).sum(axis=-2), 0, None)
    )
    return means_c, M, normals, means2d, extents


def test_projection_2dgs_matches_matrix_math(rng):
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng)
    means, quats, scales = map(jnp.asarray, (means, quats, scales))
    viewmats, Ks = jnp.asarray(viewmats), jnp.asarray(Ks)

    radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
        means, quats, scales, viewmats, Ks, W, H
    )
    means_c, M_ref, normals_ref, means2d_ref, extents_ref = (
        _proj_2dgs_matrix_oracle(means, quats, scales, viewmats, Ks)
    )
    np.testing.assert_allclose(depths, means_c[..., 2], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(M, M_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(normals, normals_ref, rtol=1e-4, atol=1e-4)
    sel = np.asarray(radii > 0)
    np.testing.assert_allclose(
        np.asarray(means2d)[sel], np.asarray(means2d_ref)[sel],
        rtol=1e-3, atol=1e-3,
    )
    # radius matches ceil(3 * max extent) where valid
    r_ref = np.ceil(3.0 * np.asarray(extents_ref).max(axis=-1))
    np.testing.assert_allclose(np.asarray(radii)[sel], r_ref[sel], atol=1.0)


def test_rasterization_2dgs_end_to_end(rng):
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng, C=1)
    out = rasterization_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
        render_mode="RGB+ED", distloss=True,
    )
    render, alphas, normals, normals_depth, distort, median, meta = out
    assert render.shape == (1, H, W, 4)
    render = render[..., :3]
    assert alphas.shape == (1, H, W, 1)
    assert normals.shape == (1, H, W, 3)
    assert normals_depth.shape == (1, H, W, 3)
    assert distort.shape == (1, H, W, 1)
    assert median.shape == (1, H, W, 1)
    assert np.all(np.isfinite(np.asarray(render)))
    a = np.asarray(alphas)
    assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-6
    assert a.max() > 0.05  # something rendered
    # median depth lies in the depth range of visible gaussians where opaque
    d = np.asarray(meta["depths"])
    sel = np.asarray(meta["radii"]) > 0
    md = np.asarray(median)[a[..., 0] > 0.5]
    if md.size:
        assert md.min() >= d[sel].min() - 1e-3
        assert md.max() <= d[sel].max() + 1e-3


def test_rasterization_2dgs_grads(rng):
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=100, C=1, W=32, H=32
    )
    args = [jnp.asarray(x) for x in (means, quats, scales, opac, colors)]
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)

    def loss(means, quats, scales, opac, colors):
        render, alphas, normals, nfd, distort, median, _ = rasterization_2dgs(
            means, quats, scales, opac, colors, vm, K, W, H, distloss=True
        )
        return (
            jnp.sum(render) + jnp.sum(alphas) + jnp.sum(normals)
            + jnp.sum(distort)
        )

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(grads[0]).max()) > 0  # means get gradients
    assert float(jnp.abs(grads[4]).max()) > 0  # colors get gradients


def test_rasterization_2dgs_render_modes(rng):
    """Render-mode channel semantics match gsplat/rendering.py:1249-1302:
    D/ED are depth-only [C,H,W,1], RGB is 3-channel with no
    normals_from_depth, depth_mode switches expected/median depth."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=100, C=1, W=32, H=32
    )
    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
    )

    render, _, _, nfd, distort, _, _ = rasterization_2dgs(
        *args, render_mode="RGB"
    )
    assert render.shape == (1, H, W, 3)
    assert nfd is None
    # distloss defaults to False -> distortion is zeros (kernel-skip parity)
    assert float(jnp.abs(distort).max()) == 0.0

    for mode in ("D", "ED"):
        render, _, _, nfd, _, _, _ = rasterization_2dgs(
            *args, render_mode=mode
        )
        assert render.shape == (1, H, W, 1), mode
        assert nfd is None

    out_e = rasterization_2dgs(*args, render_mode="RGB+ED", depth_mode="expected")
    out_m = rasterization_2dgs(*args, render_mode="RGB+ED", depth_mode="median")
    assert out_e[3].shape == (1, H, W, 3)
    assert out_m[3].shape == (1, H, W, 3)
    # expected vs median depth differ somewhere -> different normals
    assert float(jnp.abs(out_e[3] - out_m[3]).max()) > 0
