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


@pytest.mark.parametrize("calc_compensations", [False, True])
def test_packed_projection_matches_dense(garden, calc_compensations):
    """Packed COO output == dense output compacted by the radii mask
    (reference contract: gsplat/cuda/_wrapper.py:272-280)."""
    args = (
        jnp.asarray(garden["means"]), jnp.asarray(garden["quats"]),
        jnp.asarray(garden["scales"]), jnp.asarray(garden["viewmats"]),
        jnp.asarray(garden["Ks"]), garden["width"], garden["height"],
    )
    radii_d, means2d_d, depths_d, conics_d, comp_d = P.fully_fused_projection(
        *args, calc_compensations=calc_compensations
    )
    C, N = radii_d.shape
    cap = C * N  # ample capacity
    cam, gid, radii_p, means2d_p, depths_p, conics_p, comp_p, nnz = (
        P.fully_fused_projection_packed(
            *args, capacity=cap, calc_compensations=calc_compensations
        )
    )
    valid = np.asarray(radii_d) > 0
    n = int(np.asarray(nnz))
    assert n == valid.sum()
    cam, gid = np.asarray(cam), np.asarray(gid)
    # padding slots are sentinel-marked
    assert (cam[n:] == -1).all() and (gid[n:] == -1).all()
    assert (np.asarray(radii_p)[n:] == 0).all()
    # camera-major ordering, like the reference's two-pass compaction
    flat_ids = cam[:n] * N + gid[:n]
    assert (np.diff(flat_ids) > 0).all()
    # packed rows == dense rows at (cam, gid)
    np.testing.assert_array_equal(
        np.asarray(radii_p)[:n], np.asarray(radii_d)[cam[:n], gid[:n]]
    )
    np.testing.assert_allclose(
        np.asarray(means2d_p)[:n], np.asarray(means2d_d)[cam[:n], gid[:n]], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(depths_p)[:n], np.asarray(depths_d)[cam[:n], gid[:n]], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(conics_p)[:n], np.asarray(conics_d)[cam[:n], gid[:n]], rtol=1e-6
    )
    if calc_compensations:
        np.testing.assert_allclose(
            np.asarray(comp_p)[:n], np.asarray(comp_d)[cam[:n], gid[:n]], rtol=1e-6
        )
    else:
        assert comp_p is None


def test_packed_projection_truncation_and_grads(garden):
    """Small capacity truncates (keeping the first flat-order entries) and
    the packed path differentiates like the dense masked path."""
    args = (
        jnp.asarray(garden["means"]), jnp.asarray(garden["quats"]),
        jnp.asarray(garden["scales"]), jnp.asarray(garden["viewmats"]),
        jnp.asarray(garden["Ks"]), garden["width"], garden["height"],
    )
    _, _, _, _, _, _, _, nnz = P.fully_fused_projection_packed(
        *args, capacity=8
    )
    cap_small = int(np.asarray(nnz)) // 2
    cam_s, gid_s, radii_s, *_ = P.fully_fused_projection_packed(
        *args, capacity=cap_small
    )
    assert (np.asarray(radii_s) > 0).all()  # every slot filled when truncated

    cap = int(np.asarray(nnz)) + 7  # some padding slots

    def loss_packed(means, quats, scales):
        _, _, radii_p, means2d_p, depths_p, conics_p, _, _ = (
            P.fully_fused_projection_packed(
                means, quats, scales, args[3], args[4], args[5], args[6],
                capacity=cap,
            )
        )
        m = (radii_p > 0).astype(jnp.float32)
        return (
            (means2d_p * m[:, None]).sum()
            + (depths_p * m).sum()
            + (conics_p * m[:, None]).sum() * 1e-3
        )

    def loss_dense(means, quats, scales):
        radii_d, means2d_d, depths_d, conics_d, _ = P.fully_fused_projection(
            means, quats, scales, args[3], args[4], args[5], args[6]
        )
        m = (radii_d > 0).astype(jnp.float32)
        return (
            (means2d_d * m[..., None]).sum()
            + (depths_d * m).sum()
            + (conics_d * m[..., None]).sum() * 1e-3
        )

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(*args[:3])
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(*args[:3])
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_packed_projection_2dgs_matches_dense(garden):
    """Packed 2DGS COO output == dense surfel output compacted by the radii
    mask (reference contract: gsplat/cuda/_wrapper.py:1306-1318,
    csrc/Projection2DGSPacked.cu)."""
    from gsplat_tpu.ops.projection_2dgs import (
        fully_fused_projection_2dgs,
        fully_fused_projection_2dgs_packed,
    )

    args = (
        jnp.asarray(garden["means"]), jnp.asarray(garden["quats"]),
        jnp.asarray(garden["scales"]), jnp.asarray(garden["viewmats"]),
        jnp.asarray(garden["Ks"]), garden["width"], garden["height"],
    )
    radii_d, means2d_d, depths_d, M_d, normals_d = (
        fully_fused_projection_2dgs(*args)
    )
    C, N = radii_d.shape
    cam, gid, radii_p, means2d_p, depths_p, M_p, normals_p, nnz = (
        fully_fused_projection_2dgs_packed(*args, capacity=C * N)
    )
    valid = np.asarray(radii_d) > 0
    n = int(np.asarray(nnz))
    assert n == valid.sum()
    cam, gid = np.asarray(cam), np.asarray(gid)
    assert (cam[n:] == -1).all() and (gid[n:] == -1).all()
    assert (np.asarray(radii_p)[n:] == 0).all()
    # camera-major ordering like the reference's compaction
    flat_ids = cam[:n] * N + gid[:n]
    assert (np.diff(flat_ids) > 0).all()
    np.testing.assert_array_equal(
        np.asarray(radii_p)[:n], np.asarray(radii_d)[cam[:n], gid[:n]]
    )
    np.testing.assert_allclose(
        np.asarray(means2d_p)[:n], np.asarray(means2d_d)[cam[:n], gid[:n]],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(depths_p)[:n], np.asarray(depths_d)[cam[:n], gid[:n]],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(M_p)[:n], np.asarray(M_d)[cam[:n], gid[:n]], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(normals_p)[:n], np.asarray(normals_d)[cam[:n], gid[:n]],
        rtol=1e-6,
    )


def test_packed_projection_2dgs_truncation_and_grads(garden):
    """Small capacity truncates; the packed 2DGS path differentiates like
    the dense masked path (sort transpose = inverse permutation)."""
    from gsplat_tpu.ops.projection_2dgs import (
        fully_fused_projection_2dgs,
        fully_fused_projection_2dgs_packed,
    )

    args = (
        jnp.asarray(garden["means"]), jnp.asarray(garden["quats"]),
        jnp.asarray(garden["scales"]), jnp.asarray(garden["viewmats"]),
        jnp.asarray(garden["Ks"]), garden["width"], garden["height"],
    )
    *_, nnz = fully_fused_projection_2dgs_packed(*args, capacity=8)
    cap_small = int(np.asarray(nnz)) // 2
    _, _, radii_s, *_ = fully_fused_projection_2dgs_packed(
        *args, capacity=cap_small
    )
    assert (np.asarray(radii_s) > 0).all()

    cap = int(np.asarray(nnz)) + 7

    def loss_packed(means, quats, scales):
        _, _, radii_p, means2d_p, depths_p, M_p, normals_p, _ = (
            fully_fused_projection_2dgs_packed(
                means, quats, scales, args[3], args[4], args[5], args[6],
                capacity=cap,
            )
        )
        m = (radii_p > 0).astype(jnp.float32)
        return (
            (means2d_p * m[:, None]).sum()
            + (depths_p * m).sum()
            + (M_p * m[:, None, None]).sum() * 1e-3
            + (normals_p * m[:, None]).sum()
        )

    def loss_dense(means, quats, scales):
        radii_d, means2d_d, depths_d, M_d, normals_d = (
            fully_fused_projection_2dgs(
                means, quats, scales, args[3], args[4], args[5], args[6]
            )
        )
        m = (radii_d > 0).astype(jnp.float32)
        return (
            (means2d_d * m[..., None]).sum()
            + (depths_d * m).sum()
            + (M_d * m[..., None, None]).sum() * 1e-3
            + (normals_d * m[..., None]).sum()
        )

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(*args[:3])
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(*args[:3])
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
