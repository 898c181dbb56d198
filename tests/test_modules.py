"""Auxiliary modules: pose deltas, appearance MLP, bilateral grid, utils."""

import numpy as np

import jax
import jax.numpy as jnp

from gsplat_tpu.bilagrid import (
    color_correct,
    init_bilateral_grid,
    slice_grid,
    total_variation_loss,
)
from gsplat_tpu.modules import (
    apply_appearance_opt,
    apply_camera_opt,
    init_appearance_opt,
    init_camera_opt,
    rotation_6d_to_matrix,
)
from gsplat_tpu.utils import (
    depth_to_normal,
    inverse_log_transform,
    log_transform,
    save_ply,
)


def test_camera_opt_identity_and_grad(rng):
    params = init_camera_opt(4)
    c2w = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)))
    ids = jnp.asarray([0, 3])
    out = apply_camera_opt(params, c2w, ids)
    np.testing.assert_allclose(out, c2w, atol=1e-6)  # zero deltas = identity

    def loss(p):
        return jnp.sum(apply_camera_opt(p, c2w, ids) ** 2)

    g = jax.grad(loss)(params)
    assert np.all(np.isfinite(np.asarray(g["embeds"])))


def test_rotation_6d_orthonormal(rng):
    d6 = jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32))
    R = rotation_6d_to_matrix(d6)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_appearance_opt_shapes_and_grads(rng):
    key = jax.random.PRNGKey(0)
    params = init_appearance_opt(5, feature_dim=8, key=key, sh_degree=2)
    feats = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    out = apply_appearance_opt(params, feats, jnp.asarray([0, 4]), dirs, 1)
    assert out.shape == (2, 32, 3)

    g = jax.grad(
        lambda p: jnp.sum(
            apply_appearance_opt(p, feats, jnp.asarray([0, 4]), dirs, 1) ** 2
        )
    )(params)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))


def test_bilateral_grid_identity_and_tv(rng):
    params = init_bilateral_grid(3)
    rgb = jnp.asarray(rng.random((2, 24, 32, 3)).astype(np.float32))
    out = slice_grid(params, jnp.asarray([0, 2]), rgb)
    np.testing.assert_allclose(out, rgb, atol=1e-5)  # identity affine grids
    assert float(total_variation_loss(params["grids"])) == 0.0


def test_color_correct_fits_affine(rng):
    img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    ref = jnp.clip(img * 0.8 + 0.1, 0, 1)
    out = color_correct(img, ref)
    assert float(jnp.abs(out - ref).mean()) < 0.02


def test_log_transform_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((100,)).astype(np.float32) * 10)
    np.testing.assert_allclose(
        inverse_log_transform(log_transform(x)), x, rtol=1e-5, atol=1e-5
    )


def test_save_ply_filters_and_writes(tmp_path, rng):
    n = 50
    splats = {
        "means": rng.standard_normal((n, 3)).astype(np.float32),
        "scales": rng.standard_normal((n, 3)).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": rng.standard_normal((n,)).astype(np.float32),
        "sh0": rng.standard_normal((n, 1, 3)).astype(np.float32),
        "shN": rng.standard_normal((n, 15, 3)).astype(np.float32),
    }
    splats["means"][3, 0] = np.nan  # should be dropped
    live = np.ones(n, bool)
    live[:5] = [True, False, True, True, True]
    path = str(tmp_path / "s.ply")
    count = save_ply(splats, path, live=jnp.asarray(live))
    assert count == n - 2  # one dead slot + one NaN row
    head = open(path, "rb").read(200)
    assert head.startswith(b"ply\nformat binary_little_endian")


def test_depth_to_normal_flat_plane():
    H, W = 16, 16
    depth = jnp.ones((1, H, W, 1)) * 2.0
    c2w = jnp.eye(4)[None]
    K = jnp.asarray([[[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]]])
    n = depth_to_normal(depth, c2w, K)
    inner = np.asarray(n)[0, 2:-2, 2:-2]
    # constant z-depth plane -> normals along -z (cross of +x,+y tangents)
    assert np.all(np.abs(inner[..., 2]) > 0.99)
