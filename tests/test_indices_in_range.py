"""rasterize_to_indices_in_range(_2dgs): iterative-compositing parity.

The reference's iterative pipeline (gsplat/cuda/_torch_impl.py:432-520,
`_rasterize_to_pixels`) renders by repeatedly calling
rasterize_to_indices_in_range with the running transmittance and
compositing the returned (pixel, gaussian) pairs; accumulating over all
ranges must reproduce the fused rasterizer's output. The TPU build replaces
the dynamic COO lists with static-shape depth-rank windows + dense
contribution masks (see ops/rasterize_ref.py:212 docstring), so the parity
property here is the same one: chaining windows reproduces the oracle
render bit-for-tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
from gsplat_tpu.ops.rasterize_ref import (
    rasterize_to_indices_in_range,
    rasterize_to_pixels_ref,
)
from gsplat_tpu.ops.rasterize_2dgs_ref import (
    rasterize_to_indices_in_range_2dgs,
    rasterize_to_pixels_2dgs_ref,
)


@pytest.fixture
def scene(rng):
    N, C, W, H = 200, 2, 64, 48
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.25 + 0.05).astype(np.float32)
    opac = (rng.random((N,)) * 0.8 + 0.1).astype(np.float32)
    colors = rng.random((C, N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    viewmats[1, 0, 3] = 0.4
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    return means, quats, scales, opac, colors, viewmats, Ks, W, H


def _iterate(indices_fn, compose_colors, N, C, W, H, n_windows=5):
    """Chain depth-rank windows exactly like the reference's iterative
    pipeline chains batches: composite each window's accepted pairs with
    the running transmittance, then roll T forward."""
    T = jnp.ones((C, H, W), jnp.float32)
    alpha_acc = jnp.zeros((C, H * W), jnp.float32)
    render = jnp.zeros((C, H * W, 3), jnp.float32)
    bounds = np.linspace(0, N, n_windows + 1).astype(int)
    for s, e in zip(bounds[:-1], bounds[1:]):
        contrib, alpha, sel, new_T = indices_fn(int(s), int(e), T)
        lg = jnp.where(contrib, jnp.log1p(-jnp.where(contrib, alpha, 0.0)), 0.0)
        T0 = T.reshape(C, -1)[..., None]
        t_excl = T0 * jnp.exp(jnp.cumsum(lg, axis=-1) - lg)
        w = jnp.where(contrib, alpha * t_excl, 0.0)  # [C, HW, R]
        render = render + compose_colors(w, sel)
        alpha_acc = alpha_acc + jnp.sum(w, axis=-1)
        # chain the returned termination stream — NOT the accepted-only
        # transmittance (which would resurrect terminated pixels)
        T = new_T.reshape(C, H, W)
    return render.reshape(C, H, W, 3), alpha_acc.reshape(C, H, W)[..., None]


def test_indices_in_range_3dgs_iterative_parity(scene):
    means, quats, scales, opac, colors, viewmats, Ks, W, H = scene
    N, C = means.shape[0], viewmats.shape[0]
    radii, means2d, depths, conics, _ = fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
    )
    opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
    cols = jnp.asarray(colors)

    full_render, full_alpha = rasterize_to_pixels_ref(
        means2d, conics, cols, opc, radii, depths, W, H, tile_size=16
    )

    def indices_fn(s, e, T):
        return rasterize_to_indices_in_range(
            s, e, T, means2d, conics, opc, radii, depths, W, H, tile_size=16
        )

    def compose(w, sel):
        cols_sel = jnp.take_along_axis(cols, sel[..., None], axis=1)
        return jnp.einsum("cpr,crd->cpd", w, cols_sel)

    render, alphas = _iterate(indices_fn, compose, N, C, W, H)
    np.testing.assert_allclose(
        np.asarray(render), np.asarray(full_render), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(alphas), np.asarray(full_alpha), atol=2e-4, rtol=1e-4
    )
    # windows genuinely split the work: the first window alone is NOT the
    # full image (guards against the chaining being vacuous)
    contrib0, _, _, _ = indices_fn(0, N // 5, jnp.ones((C, H, W), jnp.float32))
    contrib_all, _, _, _ = indices_fn(0, N, jnp.ones((C, H, W), jnp.float32))
    assert int(jnp.sum(contrib0)) < int(jnp.sum(contrib_all))


def test_indices_in_range_2dgs_iterative_parity(scene):
    means, quats, scales, opac, colors, viewmats, Ks, W, H = scene
    N, C = means.shape[0], viewmats.shape[0]
    radii, means2d, depths, ray_Ms, normals = fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
    )
    opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
    cols = jnp.asarray(colors)

    full = rasterize_to_pixels_2dgs_ref(
        means2d, ray_Ms, cols, normals, opc, radii, depths, W, H,
        tile_size=16,
    )
    full_render, full_alpha = full[0], full[1]

    def indices_fn(s, e, T):
        return rasterize_to_indices_in_range_2dgs(
            s, e, T, means2d, ray_Ms, opc, radii, depths, W, H, tile_size=16
        )

    def compose(w, sel):
        cols_sel = jnp.take_along_axis(cols, sel[..., None], axis=1)
        return jnp.einsum("cpr,crd->cpd", w, cols_sel)

    render, alphas = _iterate(indices_fn, compose, N, C, W, H)
    np.testing.assert_allclose(
        np.asarray(render), np.asarray(full_render), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(alphas), np.asarray(full_alpha), atol=2e-4, rtol=1e-4
    )
