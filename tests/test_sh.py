"""Spherical harmonics parity vs the reference torch oracle (values + grads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from gsplat_tpu.ops.sh import spherical_harmonics

from ref_oracle import load_ref_oracle


@pytest.fixture(scope="module")
def ref():
    return load_ref_oracle()


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
def test_sh_values_and_grads(ref, degree, rng):
    N, K = 1000, 25
    dirs = rng.standard_normal((N, 3)).astype(np.float32)
    coeffs = rng.standard_normal((N, K, 3)).astype(np.float32)

    ours = spherical_harmonics(degree, jnp.asarray(dirs), jnp.asarray(coeffs))
    dirs_t = torch.from_numpy(dirs).requires_grad_(True)
    coeffs_t = torch.from_numpy(coeffs).requires_grad_(True)
    theirs = ref._spherical_harmonics(degree, dirs_t, coeffs_t)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), rtol=1e-4, atol=1e-4
    )

    def loss(d, c):
        return jnp.sum(spherical_harmonics(degree, d, c) ** 2)

    g_dirs, g_coeffs = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(dirs), jnp.asarray(coeffs)
    )
    (theirs**2).sum().backward()
    # degree 0 uses no direction -> torch reports None grad, ours is zeros
    g_dirs_ref = (
        dirs_t.grad.numpy() if dirs_t.grad is not None else np.zeros_like(dirs)
    )
    np.testing.assert_allclose(np.asarray(g_dirs), g_dirs_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(g_coeffs), coeffs_t.grad.numpy(), rtol=1e-3, atol=1e-3
    )
