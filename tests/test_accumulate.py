"""`accumulate` / `accumulate_2dgs` parity vs the reference's own torch
implementations (run unmodified with the nerfacc stub) — values and grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from gsplat_tpu import load_test_data
from gsplat_tpu.ops.accumulate import accumulate, accumulate_2dgs
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
from gsplat_tpu.ops.rasterize_ref import (
    rasterize_to_indices_in_range,
    rasterize_to_pixels_ref,
)
from gsplat_tpu.ops.rasterize_2dgs_ref import (
    rasterize_to_indices_in_range_2dgs,
)

from ref_raster_torch import load_ref_rasterizer, load_ref_rasterizer_2dgs

W, H = 96, 64
N = 300


@pytest.fixture(scope="module")
def scene():
    means, quats, scales, opacities, colors, viewmats, Ks, w0, h0 = (
        load_test_data()
    )
    sx, sy = W / w0, H / h0
    Ks = Ks.copy()
    Ks[:, 0] *= sx
    Ks[:, 1] *= sy
    return dict(
        means=jnp.asarray(means[:N]),
        quats=jnp.asarray(quats[:N]),
        scales=jnp.asarray(scales[:N] * 2.0),
        opacities=jnp.asarray(opacities[:N]),
        colors=jnp.asarray(colors[:N]),
        viewmats=jnp.asarray(viewmats),
        Ks=jnp.asarray(Ks),
    )


def _coo_from_mask(contrib, sel):
    """Dense [C, P, R] mask + [C, R] selection -> reference COO id lists
    (grouped by (camera, pixel), depth-ordered within each group)."""
    gs, pix, cam = [], [], []
    C = contrib.shape[0]
    for c in range(C):
        p_idx, r_idx = np.nonzero(np.asarray(contrib[c]))
        gs.append(np.asarray(sel)[c][r_idx])
        pix.append(p_idx)
        cam.append(np.full_like(p_idx, c))
    return (
        np.concatenate(gs).astype(np.int32),
        np.concatenate(pix).astype(np.int32),
        np.concatenate(cam).astype(np.int32),
    )


def test_accumulate_matches_reference(scene):
    ref = load_ref_rasterizer()
    radii, means2d, depths, conics, _ = fully_fused_projection(
        scene["means"], scene["quats"], scene["scales"],
        scene["viewmats"], scene["Ks"], W, H,
    )
    C = radii.shape[0]
    opac = jnp.broadcast_to(scene["opacities"][None], radii.shape)
    colors = jnp.broadcast_to(scene["colors"][None], (C, N, 3))

    contrib, _, sel, _ = rasterize_to_indices_in_range(
        0, N, jnp.ones((C, H, W)), means2d, conics, opac, radii, depths,
        W, H,
    )
    g_ids, p_ids, c_ids = _coo_from_mask(contrib, sel)
    assert g_ids.size > 1000  # the scene must actually hit pixels

    renders, alphas = accumulate(
        means2d, conics, opac, colors,
        jnp.asarray(g_ids), jnp.asarray(p_ids), jnp.asarray(c_ids), W, H,
    )

    t = lambda x: torch.from_numpy(np.asarray(x))  # noqa: E731
    m_t = t(means2d).requires_grad_(True)
    renders_t, alphas_t = ref.accumulate(
        m_t, t(conics), t(opac), t(colors),
        t(g_ids).long(), t(p_ids).long(), t(c_ids).long(), W, H,
    )
    np.testing.assert_allclose(
        np.asarray(renders), renders_t.detach().numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(alphas), alphas_t.detach().numpy(), atol=1e-5
    )

    # compositing ALL contributing pairs == the fused render (no background)
    render_ref, alpha_ref = rasterize_to_pixels_ref(
        means2d, conics, colors, opac, radii, depths, W, H
    )
    np.testing.assert_allclose(
        np.asarray(renders), np.asarray(render_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(alphas), np.asarray(alpha_ref), atol=1e-4
    )

    # gradients through the COO compositor
    def loss(m2d):
        r, a = accumulate(
            m2d, conics, opac, colors,
            jnp.asarray(g_ids), jnp.asarray(p_ids), jnp.asarray(c_ids), W, H,
        )
        return r.sum() + 0.5 * a.sum()

    g_jax = jax.grad(loss)(means2d)
    (renders_t.sum() + 0.5 * alphas_t.sum()).backward()
    np.testing.assert_allclose(
        np.asarray(g_jax), m_t.grad.numpy(), atol=2e-4
    )


def test_accumulate_valid_mask_padding(scene):
    """Padded slots (valid=False) contribute nothing — the static-shape
    idiom for the reference's dynamic [M] lists."""
    radii, means2d, depths, conics, _ = fully_fused_projection(
        scene["means"], scene["quats"], scene["scales"],
        scene["viewmats"], scene["Ks"], W, H,
    )
    C = radii.shape[0]
    opac = jnp.broadcast_to(scene["opacities"][None], radii.shape)
    colors = jnp.broadcast_to(scene["colors"][None], (C, N, 3))
    contrib, _, sel, _ = rasterize_to_indices_in_range(
        0, N, jnp.ones((C, H, W)), means2d, conics, opac, radii, depths,
        W, H,
    )
    g_ids, p_ids, c_ids = _coo_from_mask(contrib, sel)
    r0, a0 = accumulate(
        means2d, conics, opac, colors,
        jnp.asarray(g_ids), jnp.asarray(p_ids), jnp.asarray(c_ids), W, H,
    )
    # pad with garbage slots pointing at real ids but valid=False
    pad = 257
    g_p = jnp.concatenate([jnp.asarray(g_ids), jnp.zeros(pad, jnp.int32)])
    p_p = jnp.concatenate([jnp.asarray(p_ids), jnp.zeros(pad, jnp.int32)])
    c_p = jnp.concatenate([jnp.asarray(c_ids), jnp.zeros(pad, jnp.int32)])
    valid = jnp.concatenate(
        [jnp.ones(len(g_ids), bool), jnp.zeros(pad, bool)]
    )
    r1, a1 = accumulate(
        means2d, conics, opac, colors, g_p, p_p, c_p, W, H, valid=valid
    )
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-6)


def test_accumulate_2dgs_matches_reference(scene):
    ref2 = load_ref_rasterizer_2dgs()
    radii, means2d, depths, ray_transforms, normals = (
        fully_fused_projection_2dgs(
            scene["means"], scene["quats"], scene["scales"],
            scene["viewmats"], scene["Ks"], W, H,
        )
    )
    C = radii.shape[0]
    opac = jnp.broadcast_to(scene["opacities"][None], radii.shape)
    colors = jnp.broadcast_to(scene["colors"][None], (C, N, 3))

    contrib, _, sel, _ = rasterize_to_indices_in_range_2dgs(
        0, N, jnp.ones((C, H, W)), means2d, ray_transforms, opac, radii,
        depths, W, H,
    )
    g_ids, p_ids, c_ids = _coo_from_mask(contrib, sel)
    assert g_ids.size > 1000

    renders, alphas, rnormals = accumulate_2dgs(
        means2d, ray_transforms, opac, colors, normals,
        jnp.asarray(g_ids), jnp.asarray(p_ids), jnp.asarray(c_ids), W, H,
    )

    t = lambda x: torch.from_numpy(np.asarray(x))  # noqa: E731
    rt_t = t(ray_transforms).requires_grad_(True)
    renders_t, alphas_t, normals_t = ref2.accumulate_2dgs(
        t(means2d), rt_t, t(opac), t(colors), t(normals),
        t(g_ids).long(), t(p_ids).long(), t(c_ids).long(), W, H,
    )
    np.testing.assert_allclose(
        np.asarray(renders), renders_t.detach().numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(alphas), alphas_t.detach().numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rnormals), normals_t.detach().numpy(), atol=1e-5
    )

    def loss(rt):
        r, a, n = accumulate_2dgs(
            means2d, rt, opac, colors, normals,
            jnp.asarray(g_ids), jnp.asarray(p_ids), jnp.asarray(c_ids), W, H,
        )
        return r.sum() + 0.5 * a.sum() + 0.25 * n.sum()

    g_jax = jax.grad(loss)(ray_transforms)
    (
        renders_t.sum() + 0.5 * alphas_t.sum() + 0.25 * normals_t.sum()
    ).backward()
    # ray-transform grads span orders of magnitude (1/z^2 terms): scale
    # the tolerance by the grad magnitude like the kernel parity tests
    s = max(float(np.abs(rt_t.grad.numpy()).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(g_jax), rt_t.grad.numpy(), atol=1e-3 * s, rtol=1e-3
    )
