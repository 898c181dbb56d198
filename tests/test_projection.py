"""Projection math parity vs the reference torch oracle (values + grads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from gsplat_tpu import load_test_data
from gsplat_tpu.ops import projection as P

from ref_oracle import load_ref_oracle


@pytest.fixture(scope="module")
def garden():
    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data()
    )
    n = 2000
    return dict(
        means=means[:n],
        quats=quats[:n],
        scales=scales[:n],
        opacities=opacities[:n],
        viewmats=viewmats,
        Ks=Ks,
        width=width,
        height=height,
    )


@pytest.fixture(scope="module")
def ref():
    return load_ref_oracle()


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_quat_to_rotmat(garden, ref):
    ours = np.asarray(P.quat_to_rotmat(jnp.asarray(garden["quats"])))
    theirs = ref._quat_to_rotmat(t(garden["quats"])).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_quat_scale_to_covar_preci(garden, ref):
    for triu in (False, True):
        covar, preci = P.quat_scale_to_covar_preci(
            jnp.asarray(garden["quats"]), jnp.asarray(garden["scales"]), triu=triu
        )
        covar_ref, preci_ref = ref._quat_scale_to_covar_preci(
            t(garden["quats"]), t(garden["scales"]), triu=triu
        )
        np.testing.assert_allclose(np.asarray(covar), covar_ref.numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(preci), preci_ref.numpy(), rtol=2e-2, atol=1e-2
        )


def test_world_to_cam(garden, ref):
    covars, _ = P.quat_scale_to_covar_preci(
        jnp.asarray(garden["quats"]), jnp.asarray(garden["scales"]),
        compute_preci=False,
    )
    mc, cc = P.world_to_cam(
        jnp.asarray(garden["means"]), covars, jnp.asarray(garden["viewmats"])
    )
    mc_ref, cc_ref = ref._world_to_cam(
        t(garden["means"]), t(np.asarray(covars)), t(garden["viewmats"])
    )
    np.testing.assert_allclose(np.asarray(mc), mc_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cc), cc_ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("camera_model", ["pinhole", "ortho", "fisheye"])
def test_proj(garden, ref, camera_model):
    covars, _ = P.quat_scale_to_covar_preci(
        jnp.asarray(garden["quats"]), jnp.asarray(garden["scales"]),
        compute_preci=False,
    )
    mc, cc = P.world_to_cam(
        jnp.asarray(garden["means"]), covars, jnp.asarray(garden["viewmats"])
    )
    fn = {"pinhole": P.persp_proj, "ortho": P.ortho_proj, "fisheye": P.fisheye_proj}[
        camera_model
    ]
    fn_ref = {
        "pinhole": ref._persp_proj,
        "ortho": ref._ortho_proj,
        "fisheye": ref._fisheye_proj,
    }[camera_model]
    m2d, c2d = fn(mc, cc, jnp.asarray(garden["Ks"]), garden["width"], garden["height"])
    m2d_ref, c2d_ref = fn_ref(
        t(np.asarray(mc)), t(np.asarray(cc)), t(garden["Ks"]),
        garden["width"], garden["height"],
    )
    np.testing.assert_allclose(np.asarray(m2d), m2d_ref.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c2d), c2d_ref.numpy(), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("calc_compensations", [False, True])
@pytest.mark.parametrize("camera_model", ["pinhole", "ortho", "fisheye"])
def test_fully_fused_projection(garden, ref, camera_model, calc_compensations):
    radii, means2d, depths, conics, comp = P.fully_fused_projection(
        jnp.asarray(garden["means"]),
        jnp.asarray(garden["quats"]),
        jnp.asarray(garden["scales"]),
        jnp.asarray(garden["viewmats"]),
        jnp.asarray(garden["Ks"]),
        garden["width"],
        garden["height"],
        calc_compensations=calc_compensations,
        camera_model=camera_model,
    )
    covars_ref, _ = ref._quat_scale_to_covar_preci(
        t(garden["quats"]), t(garden["scales"]), compute_preci=False
    )
    radii_ref, means2d_ref, depths_ref, conics_ref, comp_ref = (
        ref._fully_fused_projection(
            t(garden["means"]),
            covars_ref,
            t(garden["viewmats"]),
            t(garden["Ks"]),
            garden["width"],
            garden["height"],
            calc_compensations=calc_compensations,
            camera_model=camera_model,
        )
    )
    radii_np = np.asarray(radii)
    valid = (radii_np > 0) & (radii_ref.numpy() > 0)
    # radii agree except at numerical boundary of the ceil
    assert (radii_np == radii_ref.numpy()).mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(means2d)[valid], means2d_ref.numpy()[valid], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(depths)[valid], depths_ref.numpy()[valid], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(conics)[valid], conics_ref.numpy()[valid], rtol=1e-3, atol=1e-3
    )
    if calc_compensations:
        np.testing.assert_allclose(
            np.asarray(comp)[valid], comp_ref.numpy()[valid], rtol=1e-4, atol=1e-4
        )


def test_fully_fused_projection_grads(garden, ref):
    """Gradients of a scalar loss over projection outputs: jax.grad vs torch."""
    n = 500
    means = garden["means"][:n]
    quats = garden["quats"][:n]
    scales = garden["scales"][:n]
    viewmats, Ks = garden["viewmats"], garden["Ks"]
    W, H = garden["width"], garden["height"]

    def loss_jax(means, quats, scales):
        radii, means2d, depths, conics, _ = P.fully_fused_projection(
            means, quats, scales, jnp.asarray(viewmats), jnp.asarray(Ks), W, H
        )
        m = (radii > 0).astype(means2d.dtype)
        return (
            jnp.sum(means2d * m[..., None])
            + jnp.sum(depths * m)
            + jnp.sum(conics * m[..., None]) * 1e-3
        )

    g_means, g_quats, g_scales = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales)
    )

    means_t = t(means).requires_grad_(True)
    quats_t = t(quats).requires_grad_(True)
    scales_t = t(scales).requires_grad_(True)
    covars_t, _ = ref._quat_scale_to_covar_preci(
        quats_t, scales_t, compute_preci=False
    )
    radii_r, means2d_r, depths_r, conics_r, _ = ref._fully_fused_projection(
        means_t, covars_t, t(viewmats), t(Ks), W, H
    )
    m = (radii_r > 0).float()
    loss_t = (
        (means2d_r * m[..., None]).sum()
        + (depths_r * m).sum()
        + (conics_r * m[..., None]).sum() * 1e-3
    )
    loss_t.backward()

    # projection is per-gaussian independent: compare grads only where the
    # integer radii cull agrees in both frameworks (boundary ceil can differ)
    radii_jax, *_ = P.fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
    )
    agree = ((np.asarray(radii_jax) > 0) == (radii_r.numpy() > 0)).all(axis=0)

    np.testing.assert_allclose(
        np.asarray(g_means)[agree], means_t.grad.numpy()[agree], rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(g_quats)[agree], quats_t.grad.numpy()[agree], rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(g_scales)[agree], scales_t.grad.numpy()[agree], rtol=1e-2, atol=5e-2
    )
