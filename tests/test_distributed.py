"""Distributed rendering on a virtual 8-device CPU mesh.

The reference only tests its collectives by spawning one process per
physical GPU (tests/_test_distributed.py, not collected by default) and has
no simulated multi-node harness (SURVEY.md §4.4). Here the full distributed
rasterization protocol — Gaussian-sharded projection, all-to-all payload
exchange, camera-sharded rasterization — runs on the 8-device CPU mesh and
is checked against the single-device oracle, values AND gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsplat_tpu import rasterization
from gsplat_tpu.distributed import rasterization_distributed


def _scene(rng, N=256, C=8, W=48, H=32):
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.25 + 0.05).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    for c in range(C):
        viewmats[c, 0, 3] = 0.1 * c
    Ks = np.tile(
        np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    return means, quats, scales, opac, colors, viewmats, Ks, W, H


@pytest.fixture
def mesh():
    devices = np.array(jax.devices()[:8])
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(devices, ("gauss",))


def test_distributed_matches_single_device(rng, mesh):
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng)
    args = tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, colors)
    )
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    bg = jnp.asarray(rng.random((viewmats.shape[0], 3)).astype(np.float32))

    r0, a0, m0 = rasterization(*args, vm, K, W, H, backgrounds=bg)

    shardings = [NamedSharding(mesh, P("gauss"))] * 5
    sharded = tuple(jax.device_put(a, s) for a, s in zip(args, shardings))
    r1, a1, m1 = jax.jit(
        lambda *a: rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, backgrounds=bg
        )
    )(*sharded)

    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)
    # per-Gaussian visibility comes back from the owner shards and matches
    # the single-device radii exactly (SelectiveAdam / strategy stats
    # depend on it)
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )


def test_distributed_gradients_match(rng, mesh):
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    wr = jnp.asarray(
        rng.standard_normal((viewmats.shape[0], H, W, 3)).astype(np.float32)
    )

    def loss_single(*a):
        r, al, _ = rasterization(*a, vm, K, W, H)
        return jnp.sum(r * wr) + jnp.sum(al)

    def loss_dist(*a):
        r, al, _ = rasterization_distributed(*a, vm, K, W, H, mesh=mesh)
        return jnp.sum(r * wr) + jnp.sum(al)

    g0 = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    g1 = jax.jit(jax.grad(loss_dist, argnums=(0, 1, 2, 3, 4)))(*sharded)

    names = ["means", "quats", "scales", "opacities", "colors"]
    for n, x, y in zip(names, g0, g1):
        s = max(float(jnp.abs(x).max()), 1.0)
        np.testing.assert_allclose(
            x, y, atol=2e-4 * s, rtol=2e-4, err_msg=f"grad {n}"
        )


def test_distributed_sh_colors(rng, mesh):
    means, quats, scales, opac, _, viewmats, Ks, W, H = _scene(rng, N=128)
    shs = rng.standard_normal((128, 9, 3)).astype(np.float32) * 0.3
    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(shs),
    )
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    r0, a0, _ = rasterization(*args, vm, K, W, H, sh_degree=2)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, _ = jax.jit(
        lambda *a: rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, sh_degree=2
        )
    )(*sharded)
    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)


def test_distributed_packed_matches_dense(rng, mesh):
    """Packed fixed-capacity exchange == dense exchange == single device
    (values, grads, truncation signal) when pack_capacity is sufficient."""
    from gsplat_tpu.distributed import rasterization_distributed_packed

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng)
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    bg = jnp.asarray(rng.random((viewmats.shape[0], 3)).astype(np.float32))

    r0, a0, m0 = rasterization(*args, vm, K, W, H, backgrounds=bg)

    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, m1 = jax.jit(
        lambda *a: rasterization_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=32, backgrounds=bg
        )
    )(*sharded)
    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )
    # the truncation signal reports the max per-(camera, shard) visible
    # count; with 256/8 = 32 slots it must be <= capacity here
    assert int(m1["pack_required"]) <= 32
    # sanity: visibility is genuinely sparse so packing is exercised
    assert int(m1["pack_required"]) < 32 or int(
        jnp.sum(jnp.asarray(m0["radii"]) > 0)
    ) < 8 * 256


def test_distributed_packed_gradients_match(rng, mesh):
    from gsplat_tpu.distributed import rasterization_distributed_packed

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    wr = jnp.asarray(
        rng.standard_normal((viewmats.shape[0], H, W, 3)).astype(np.float32)
    )

    def loss_single(*a):
        r, al, _ = rasterization(*a, vm, K, W, H)
        return jnp.sum(r * wr) + jnp.sum(al)

    def loss_packed(*a):
        r, al, _ = rasterization_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=16
        )
        return jnp.sum(r * wr) + jnp.sum(al)

    g0 = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    g1 = jax.jit(jax.grad(loss_packed, argnums=(0, 1, 2, 3, 4)))(*sharded)
    names = ["means", "quats", "scales", "opacities", "colors"]
    for n, x, y in zip(names, g0, g1):
        s = max(float(jnp.abs(x).max()), 1.0)
        np.testing.assert_allclose(
            x, y, atol=2e-4 * s, rtol=2e-4, err_msg=f"grad {n}"
        )


def test_distributed_packed_truncation_signal(rng, mesh):
    """Over-tight pack_capacity truncates and pack_required reports the
    true requirement (> capacity) for the out-of-jit growth loop."""
    from gsplat_tpu.distributed import rasterization_distributed_packed

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng)
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    _, _, m = jax.jit(
        lambda *a: rasterization_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=4
        )
    )(*sharded)
    assert int(m["pack_required"]) > 4
