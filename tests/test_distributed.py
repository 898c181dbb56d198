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


# every rasterizer backend must run under the mesh (the reference's
# distributed protocol is backend-agnostic, gsplat/rendering.py:413-494);
# tiled/binned run their Pallas kernels in interpret mode per-shard
BACKENDS = ["oracle", "tiled", "binned"]


def _cap(backend):
    return None if backend == "oracle" else 32768


@pytest.mark.parametrize("backend", BACKENDS)
def test_distributed_matches_single_device(rng, mesh, backend):
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
            *a, vm, K, W, H, mesh=mesh, backgrounds=bg,
            backend=backend, isect_capacity=_cap(backend),
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
    if backend == "binned":
        # the per-shard slab budget signal must be live for the trainer's
        # capacity-growth loop
        assert int(m1["slab_required"]) > 0


@pytest.mark.parametrize("backend", BACKENDS)
def test_distributed_gradients_match(rng, mesh, backend):
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
        r, al, _ = rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh,
            backend=backend, isect_capacity=_cap(backend),
        )
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


def test_distributed_depth_and_absgrad(rng, mesh):
    """render_mode="RGB+ED" (depth_loss path) and the absgrad carrier both
    ride the exchange; compare against the single-device rasterization."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    C = viewmats.shape[0]
    N = means.shape[0]
    carrier = jnp.zeros((C, N, 2), jnp.float32)
    wr = jnp.asarray(
        rng.standard_normal((C, H, W, 4)).astype(np.float32)
    )

    def loss_single(carrier, *a):
        r, al, _ = rasterization(
            *a, vm, K, W, H, render_mode="RGB+ED",
            means2d_carrier=carrier, absgrad=True,
        )
        return jnp.sum(r * wr) + jnp.sum(al)

    def loss_dist(carrier, *a):
        r, al, _ = rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, render_mode="RGB+ED",
            means2d_carrier=carrier, absgrad=True,
        )
        return jnp.sum(r * wr) + jnp.sum(al)

    (l0, g0) = jax.value_and_grad(loss_single)(carrier, *args)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    carrier_s = jax.device_put(
        carrier, NamedSharding(mesh, P(None, "gauss", None))
    )
    (l1, g1) = jax.jit(jax.value_and_grad(loss_dist))(carrier_s, *sharded)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    # the absgrad statistic (per-tile |d mu2d| accumulation) must match;
    # scale-relative atol: the depth channel's near-cancelling tile sums
    # amplify f32 reassociation noise (fusion differs across the shard_map
    # boundary), same comparison style as the other gradient tests
    s = max(float(jnp.abs(g0).max()), 1.0)
    np.testing.assert_allclose(g0, g1, atol=2e-4 * s, rtol=2e-4)


def test_distributed_2dgs_matches_single_device(rng, mesh):
    """2DGS surfel rows through the exchange: images, normals, median and
    gradients vs the single-device rasterization_2dgs oracle."""
    from gsplat_tpu.distributed import rasterization_2dgs_distributed
    from gsplat_tpu.rendering import rasterization_2dgs

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)

    r0, a0, n0, nfd0, d0, md0, m0 = rasterization_2dgs(
        *args, vm, K, W, H, render_mode="RGB+ED", distloss=True,
    )
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, n1, nfd1, d1, md1, m1 = jax.jit(
        lambda *a: rasterization_2dgs_distributed(
            *a, vm, K, W, H, mesh=mesh, render_mode="RGB+ED", distloss=True,
        )
    )(*sharded)
    # atol 1e-4: the depth channel rides at scale ~4, and fusion differs
    # across the shard_map boundary (f32 reassociation noise)
    np.testing.assert_allclose(r0, r1, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(n0, n1, atol=1e-4, rtol=1e-5)
    # depth->normal finite differences amplify the depth channel's f32
    # reassociation noise ~5x — loosest gate of the set
    np.testing.assert_allclose(nfd0, nfd1, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(d0, d1, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(md0, md1, atol=1e-4, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )

    wr = jnp.asarray(rng.standard_normal((8, H, W, 4)).astype(np.float32))

    def loss_single(*a):
        r, al, nrm, _, dist, _, _ = rasterization_2dgs(
            *a, vm, K, W, H, render_mode="RGB+ED", distloss=True,
        )
        return jnp.sum(r * wr) + jnp.sum(al) + jnp.sum(nrm) + jnp.sum(dist)

    def loss_dist(*a):
        r, al, nrm, _, dist, _, _ = rasterization_2dgs_distributed(
            *a, vm, K, W, H, mesh=mesh, render_mode="RGB+ED", distloss=True,
        )
        return jnp.sum(r * wr) + jnp.sum(al) + jnp.sum(nrm) + jnp.sum(dist)

    g0 = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    g1 = jax.jit(jax.grad(loss_dist, argnums=(0, 1, 2, 3, 4)))(*sharded)
    names = ["means", "quats", "scales", "opacities", "colors"]
    for n, x, y in zip(names, g0, g1):
        s = max(float(jnp.abs(x).max()), 1.0)
        np.testing.assert_allclose(
            x, y, atol=2e-4 * s, rtol=2e-4, err_msg=f"grad {n}"
        )


def test_distributed_2dgs_binned_backend(rng, mesh):
    """The 2DGS binned engine per-shard (interpret mode) vs the
    single-device 2DGS oracle."""
    from gsplat_tpu.distributed import rasterization_2dgs_distributed
    from gsplat_tpu.rendering import rasterization_2dgs

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=64, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    # apples-to-apples: single-device BINNED vs distributed BINNED (the
    # oracle differs from the binned engine by alpha/transmittance
    # threshold flips on borderline entries — that cross-backend gap is
    # gated by the golden tests, not here)
    r0, a0, n0, _, _, md0, _ = rasterization_2dgs(
        *args, vm, K, W, H, render_mode="RGB+ED",
        backend="binned", isect_capacity=131072,
    )
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, n1, _, _, md1, m1 = jax.jit(
        lambda *a: rasterization_2dgs_distributed(
            *a, vm, K, W, H, mesh=mesh, render_mode="RGB+ED",
            backend="binned", isect_capacity=16384,
        )
    )(*sharded)
    # count-based gates (golden-test style): the per-shard projection's
    # fusion differs from the single-device one by ulps, which flips
    # borderline alpha >= 1/255 / T <= 1e-4 decisions on a handful of
    # (pixel, entry) pairs; each flip moves a pixel by <= the local
    # contribution. Measured on this fixture: 18/32768 elements > 1e-4,
    # max 3.2e-4.
    for got, want, name, tol in (
        (r1, r0, "render", 2e-3), (a1, a0, "alphas", 1e-3),
        (n1, n0, "normals", 2e-3), (md1, md0, "median", 5e-3),
    ):
        d = np.abs(np.asarray(got) - np.asarray(want))
        assert d.max() < tol, f"{name} max {d.max():.2e}"
        assert (d > 1e-4).mean() < 2e-3, f"{name} flips {(d > 1e-4).mean():.2%}"
    assert int(m1["slab_required"]) > 0


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


def _sparse_visibility_scene(rng, n_local_visible=6, N=128, C=8, W=32, H=32):
    """Scene where each contiguous 16-gaussian shard block has only
    ``n_local_visible`` gaussians inside the frustum (the rest sit behind
    the cameras at z=-10 -> radii 0). With pack_capacity between
    n_local_visible and n_local the packed exchange performs a REAL
    compaction — dropping invalid slots, not just permuting — which is the
    path a slot_ok off-by-one or wrong radii zeroing would corrupt."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=N, C=C, W=W, H=H
    )
    n_local = N // 8
    hidden = (np.arange(N) % n_local) >= n_local_visible
    means[hidden, 2] = -10.0  # behind every camera (cam z offset is +4)
    return means, quats, scales, opac, colors, viewmats, Ks, W, H


def test_distributed_packed_real_compaction_values_and_grads(rng, mesh):
    """pack_capacity=8 < n_local=16 with <=6 visible per (camera, shard):
    the sort+slice genuinely truncates dead slots yet the render and grads
    must still match the single-device dense path exactly (review finding:
    the other packed tests use cap == n_local, a pure permutation)."""
    from gsplat_tpu.distributed import rasterization_distributed_packed

    means, quats, scales, opac, colors, viewmats, Ks, W, H = (
        _sparse_visibility_scene(rng)
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    bg = jnp.asarray(rng.random((viewmats.shape[0], 3)).astype(np.float32))

    r0, a0, m0 = rasterization(*args, vm, K, W, H, backgrounds=bg)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, m1 = jax.jit(
        lambda *a: rasterization_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=8, backgrounds=bg
        )
    )(*sharded)
    # capacity 8 is sufficient for the visible set but below n_local: the
    # packed buffers are genuinely truncated relative to the dense exchange
    assert 1 <= int(m1["pack_required"]) <= 8
    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )

    wr = jnp.asarray(
        rng.standard_normal((viewmats.shape[0], H, W, 3)).astype(np.float32)
    )

    def loss_single(*a):
        r, al, _ = rasterization(*a, vm, K, W, H)
        return jnp.sum(r * wr) + jnp.sum(al)

    def loss_packed(*a):
        r, al, _ = rasterization_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=8
        )
        return jnp.sum(r * wr) + jnp.sum(al)

    g0 = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    g1 = jax.jit(jax.grad(loss_packed, argnums=(0, 1, 2, 3, 4)))(*sharded)
    for n, x, y in zip(["means", "quats", "scales", "opac", "colors"], g0, g1):
        s = max(float(jnp.abs(x).max()), 1.0)
        np.testing.assert_allclose(
            x, y, atol=2e-4 * s, rtol=2e-4, err_msg=f"grad {n}"
        )


def test_distributed_2dgs_packed_real_compaction(rng, mesh):
    """Same real-compaction coverage for the 2DGS packed surfel exchange.

    The control is the DENSE distributed path: it runs the identical
    per-shard projection/exchange/raster math, so dropping only radii==0
    surfels must be (near-)exact — unlike single-device, which differs by
    f32 reassociation flips that the ED/distort channels amplify at
    near-empty pixels."""
    from gsplat_tpu.distributed import (
        rasterization_2dgs_distributed,
        rasterization_2dgs_distributed_packed,
    )

    means, quats, scales, opac, colors, viewmats, Ks, W, H = (
        _sparse_visibility_scene(rng)
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)

    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r0, a0, n0, _, d0, md0, m0 = jax.jit(
        lambda *a: rasterization_2dgs_distributed(
            *a, vm, K, W, H, mesh=mesh, render_mode="RGB+ED", distloss=True,
        )
    )(*sharded)
    r1, a1, n1, _, d1, md1, m1 = jax.jit(
        lambda *a: rasterization_2dgs_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=8,
            render_mode="RGB+ED", distloss=True,
        )
    )(*sharded)
    assert 1 <= int(m1["pack_required"]) <= 8
    np.testing.assert_allclose(r0, r1, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(a0, a1, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(n0, n1, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(d0, d1, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(md0, md1, atol=2e-6, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )


def test_distributed_multi_camera_per_device(rng, mesh):
    """C=16 cameras on the 8-device mesh (2 per shard): the exchange's
    camera-split all_to_all and per-shard rasterization handle any
    C % n_shards == 0 layout, not just one-camera-per-device (VERDICT r2
    weak item 5)."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=16, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    r0, a0, m0 = rasterization(
        *args, vm, K, W, H, backend="binned", isect_capacity=131072
    )
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, m1 = jax.jit(
        lambda *a: rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, backend="binned",
            isect_capacity=32768,
        )
    )(*sharded)
    d = np.abs(np.asarray(r1) - np.asarray(r0))
    assert d.max() < 2e-3, d.max()
    assert (d > 1e-4).mean() < 2e-3
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )


def test_distributed_antialiased(rng, mesh):
    """rasterize_mode="antialiased" (opacity compensation) matches the
    single-device path through the exchange."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    r0, a0, _ = rasterization(*args, vm, K, W, H, rasterize_mode="antialiased")
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, _ = jax.jit(
        lambda *a: rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, rasterize_mode="antialiased",
        )
    )(*sharded)
    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)


def test_distributed_depth_mode_with_backgrounds(rng, mesh):
    """Regression: depth render modes append a channel to colors; the
    backgrounds must gain the matching zero depth channel inside the
    distributed paths exactly like rendering.py does (pre-fix this was a
    shape mismatch at trace time)."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng)
    args = tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, colors)
    )
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    bg = jnp.asarray(rng.random((viewmats.shape[0], 3)).astype(np.float32))

    shardings = [NamedSharding(mesh, P("gauss"))] * 5
    sharded = tuple(jax.device_put(a, s) for a, s in zip(args, shardings))
    for mode in ("RGB+D", "D"):
        r0, a0, _ = rasterization(
            *args, vm, K, W, H, backgrounds=bg, render_mode=mode
        )
        r1, a1, _ = jax.jit(
            lambda *a, mode=mode: rasterization_distributed(
                *a, vm, K, W, H, mesh=mesh, backgrounds=bg,
                render_mode=mode, backend="oracle",
            )
        )(*sharded)
        np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5, err_msg=mode)
        np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5, err_msg=mode)


def test_rasterization_distributed_kwarg_dispatch(rng, mesh):
    """The reference-parity surface: rasterization(distributed=True, mesh=...)
    and packed=True route to the shard_map exchanges (gsplat/rendering.py:
    300-310, 416-459) and match the single-device render; the inert
    single-device packed/sparse_grad kwargs are accepted."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng)
    args = tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, colors)
    )
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    bg = jnp.asarray(rng.random((viewmats.shape[0], 3)).astype(np.float32))

    r0, a0, _ = rasterization(
        *args, vm, K, W, H, backgrounds=bg, packed=True, sparse_grad=True
    )

    shardings = [NamedSharding(mesh, P("gauss"))] * 5
    sharded = tuple(jax.device_put(a, s) for a, s in zip(args, shardings))
    r1, a1, m1 = jax.jit(
        lambda *a: rasterization(
            *a, vm, K, W, H, backgrounds=bg, distributed=True, mesh=mesh
        )
    )(*sharded)
    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)

    r2, a2, m2 = jax.jit(
        lambda *a: rasterization(
            *a, vm, K, W, H, backgrounds=bg, distributed=True, mesh=mesh,
            packed=True, pack_capacity=means.shape[0],
        )
    )(*sharded)
    np.testing.assert_allclose(r0, r2, atol=2e-5, rtol=1e-5)
    assert "pack_required" in m2


def test_rasterization_2dgs_distributed_kwarg_dispatch(rng, mesh):
    """rasterization_2dgs(distributed=True, mesh=...) returns the same
    7-tuple as the single-device call."""
    from gsplat_tpu.rendering import rasterization_2dgs

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=8, W=32, H=24
    )
    args = tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, colors)
    )
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)

    out0 = rasterization_2dgs(
        *args, vm, K, W, H, packed=True, sparse_grad=True
    )
    shardings = [NamedSharding(mesh, P("gauss"))] * 5
    sharded = tuple(jax.device_put(a, s) for a, s in zip(args, shardings))
    out1 = jax.jit(
        lambda *a: rasterization_2dgs(
            *a, vm, K, W, H, distributed=True, mesh=mesh
        )[:6]
    )(*sharded)
    for i, nm in enumerate(
        ("colors", "alphas", "normals", "normals_from_depth", "distort",
         "median")
    ):
        if out0[i] is None:  # normals_from_depth needs a depth render mode
            assert out1[i] is None, nm
            continue
        np.testing.assert_allclose(
            np.asarray(out1[i]), np.asarray(out0[i]),
            atol=5e-5, rtol=1e-4, err_msg=nm,
        )


def test_distributed_2dgs_packed_matches_dense(rng, mesh):
    """Packed fixed-capacity 2DGS surfel exchange == single-device
    rasterization_2dgs (values + truncation signal) when pack_capacity is
    sufficient — completes the reference's backend-agnostic packed protocol
    for 2DGS (gsplat/rendering.py:416-459, csrc/Projection2DGSPacked.cu)."""
    from gsplat_tpu.distributed import rasterization_2dgs_distributed_packed
    from gsplat_tpu.rendering import rasterization_2dgs

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    bg = jnp.asarray(rng.random((8, 3)).astype(np.float32))

    r0, a0, n0, nfd0, d0, md0, m0 = rasterization_2dgs(
        *args, vm, K, W, H, render_mode="RGB+ED", distloss=True,
        backgrounds=bg,
    )
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, n1, nfd1, d1, md1, m1 = jax.jit(
        lambda *a: rasterization_2dgs_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=16,
            render_mode="RGB+ED", distloss=True, backgrounds=bg,
        )
    )(*sharded)
    np.testing.assert_allclose(r0, r1, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(n0, n1, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(nfd0, nfd1, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(d0, d1, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(md0, md1, atol=1e-4, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )
    assert int(m1["pack_required"]) <= 16


def test_distributed_2dgs_packed_gradients_match(rng, mesh):
    from gsplat_tpu.distributed import rasterization_2dgs_distributed_packed
    from gsplat_tpu.rendering import rasterization_2dgs

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    wr = jnp.asarray(rng.standard_normal((8, H, W, 4)).astype(np.float32))

    def loss_single(*a):
        r, al, nrm, _, dist, _, _ = rasterization_2dgs(
            *a, vm, K, W, H, render_mode="RGB+ED", distloss=True,
        )
        return jnp.sum(r * wr) + jnp.sum(al) + jnp.sum(nrm) + jnp.sum(dist)

    def loss_packed(*a):
        r, al, nrm, _, dist, _, _ = rasterization_2dgs_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=16,
            render_mode="RGB+ED", distloss=True,
        )
        return jnp.sum(r * wr) + jnp.sum(al) + jnp.sum(nrm) + jnp.sum(dist)

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


def test_distributed_2dgs_packed_truncation_signal(rng, mesh):
    from gsplat_tpu.distributed import rasterization_2dgs_distributed_packed

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(rng)
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    _, _, _, _, _, _, m = jax.jit(
        lambda *a: rasterization_2dgs_distributed_packed(
            *a, vm, K, W, H, mesh=mesh, pack_capacity=4
        )
    )(*sharded)
    assert int(m["pack_required"]) > 4


def test_rasterization_2dgs_packed_kwarg_dispatch(rng, mesh):
    """The public rasterization_2dgs(..., packed=True, distributed=True)
    entry point routes to the packed surfel exchange (reference kwargs:
    gsplat/rendering.py:1030-1031)."""
    from gsplat_tpu.rendering import rasterization_2dgs

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=64, C=8, W=32, H=32
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    # compare against the dense distributed dispatch: both run the same
    # per-shard projection+rasterization, so with ample pack_capacity the
    # packed route must agree bit-for-bit (single-device differs by
    # shard_map f32 reassociation flips on borderline alpha cutoffs —
    # covered by test_distributed_2dgs_packed_matches_dense's tolerances)
    r0, a0, *_ = jax.jit(
        lambda *a: rasterization_2dgs(*a, vm, K, W, H, distributed=True, mesh=mesh)
    )(*sharded)
    r1, a1, *_rest = jax.jit(
        lambda *a: rasterization_2dgs(
            *a, vm, K, W, H, packed=True, distributed=True, mesh=mesh,
            pack_capacity=16,
        )
    )(*sharded)
    np.testing.assert_allclose(r0, r1, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(a0, a1, atol=2e-6, rtol=1e-6)


# ---------------------------------------------------------------------------
# Tile-row-strip layout: C < n_shards (VERDICT r4 item 1 / SURVEY §7
# "tile rows within a camera")
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("backend", BACKENDS)
def test_distributed_strips_c1_matches_single_device(rng, mesh, backend):
    """batch_size=1 — the headline training/bench config — runs on all 8
    shards as 8 tile-row strips and matches the single-device render."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=256, C=1, W=48, H=64
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    bg = jnp.asarray(rng.random((1, 3)).astype(np.float32))

    r0, a0, m0 = rasterization(*args, vm, K, W, H, backgrounds=bg, tile_size=8)

    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, m1 = jax.jit(
        lambda *a: rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, backgrounds=bg, tile_size=8,
            backend=backend, isect_capacity=_cap(backend),
        )
    )(*sharded)

    assert m1["n_strips"] == 8  # strip layout engaged
    assert r1.shape == r0.shape and a1.shape == a0.shape
    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )
    # per-strip intersection counts are the load-balance observability
    assert m1["n_isects"].shape == (8,)
    assert m1["a2a_bytes_per_device"] > 0


def test_distributed_strips_c2_multi_strip(rng, mesh):
    """C=2 on 8 shards = 4 strips per camera; strip boundaries must not
    show (Gaussians spanning strips composite identically)."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=256, C=2, W=32, H=64
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)

    r0, a0, _ = rasterization(*args, vm, K, W, H, tile_size=8)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, m1 = jax.jit(
        lambda *a: rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, tile_size=8,
            backend="binned", isect_capacity=32768,
        )
    )(*sharded)
    assert m1["n_strips"] == 4
    np.testing.assert_allclose(r0, r1, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("backend", ["oracle", "binned"])
def test_distributed_strips_gradients_match(rng, mesh, backend):
    """Gradients through the strip layout: the replicated exchange's
    transpose must sum the per-strip contributions per Gaussian."""
    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=1, W=32, H=64
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    wr = jnp.asarray(rng.standard_normal((1, H, W, 3)).astype(np.float32))

    def loss_single(*a):
        r, al, _ = rasterization(*a, vm, K, W, H, tile_size=8)
        return jnp.sum(r * wr) + jnp.sum(al)

    def loss_dist(*a):
        r, al, _ = rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, tile_size=8,
            backend=backend, isect_capacity=_cap(backend),
        )
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


def test_distributed_strips_depth_absgrad_sh(rng, mesh):
    """Strips with the full feature stack: SH colors, RGB+ED depth mode,
    absgrad carrier, backgrounds."""
    means, quats, scales, opac, _, viewmats, Ks, W, H = _scene(
        rng, N=128, C=1, W=32, H=64
    )
    sh = rng.standard_normal((128, 4, 3)).astype(np.float32) * 0.2
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, sh))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)
    bg = jnp.asarray(rng.random((1, 3)).astype(np.float32))
    carrier = jnp.zeros((1, 128, 2), jnp.float32)
    wr = jnp.asarray(rng.standard_normal((1, H, W, 4)).astype(np.float32))

    def loss_single(carrier, *a):
        r, al, _ = rasterization(
            *a, vm, K, W, H, sh_degree=1, render_mode="RGB+ED",
            backgrounds=bg, means2d_carrier=carrier, absgrad=True,
            tile_size=8,
        )
        return jnp.sum(r * wr) + jnp.sum(al)

    def loss_dist(carrier, *a):
        r, al, _ = rasterization_distributed(
            *a, vm, K, W, H, mesh=mesh, sh_degree=1, render_mode="RGB+ED",
            backgrounds=bg, means2d_carrier=carrier, absgrad=True,
            tile_size=8, backend="binned", isect_capacity=32768,
        )
        return jnp.sum(r * wr) + jnp.sum(al)

    (l0, g0) = jax.value_and_grad(loss_single)(carrier, *args)
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    carrier_s = jax.device_put(
        carrier, NamedSharding(mesh, P(None, "gauss", None))
    )
    (l1, g1) = jax.jit(jax.value_and_grad(loss_dist))(carrier_s, *sharded)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    s = max(float(jnp.abs(g0).max()), 1.0)
    np.testing.assert_allclose(g0, g1, atol=2e-4 * s, rtol=2e-4)


def test_distributed_strips_balanced_on_uniform_scene(rng, mesh):
    """On a y-uniform scene the per-strip n_isects must be roughly even —
    the meta signal a strip balancer would consume."""
    N = 512
    # span the full frustum: at z=4 with f=40 the 64px image covers +-3.2
    # world units, so +-3.5 guarantees every strip sees splats
    means = (rng.random((N, 3)).astype(np.float32) - 0.5) * np.array(
        [7.0, 7.0, 0.2], np.float32
    )
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
    scales = np.full((N, 3), 0.02, np.float32)
    opac = np.full((N,), 0.8, np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    viewmats[:, 2, 3] = 4.0
    W = H = 64
    Ks = np.array(
        [[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]], np.float32
    )
    args = tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, colors)
    )
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    _, _, m = jax.jit(
        lambda *a: rasterization_distributed(
            *a, jnp.asarray(viewmats), jnp.asarray(Ks), W, H, mesh=mesh,
            tile_size=8, backend="binned", isect_capacity=65536,
        )
    )(*sharded)
    n = np.asarray(m["n_isects"], np.float64)
    assert n.sum() > 0
    # uniform scene => no strip should dominate (allow 2.5x of mean)
    assert n.max() <= 2.5 * n.mean() + 64, n


def test_distributed_2dgs_strips_c1(rng, mesh):
    """2DGS strip layout (C=1 on 8 shards): the ray-transform reframe
    (M[1] -= y_off*M[2]) must reproduce the single-device surfel render —
    images, normals, distortion, median AND gradients."""
    from gsplat_tpu.distributed import rasterization_2dgs_distributed
    from gsplat_tpu.rendering import rasterization_2dgs

    means, quats, scales, opac, colors, viewmats, Ks, W, H = _scene(
        rng, N=128, C=1, W=32, H=64
    )
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
    vm, K = jnp.asarray(viewmats), jnp.asarray(Ks)

    r0, a0, n0, nfd0, d0, md0, m0 = rasterization_2dgs(
        *args, vm, K, W, H, render_mode="RGB+ED", distloss=True, tile_size=8,
    )
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("gauss"))) for a in args
    )
    r1, a1, n1, nfd1, d1, md1, m1 = jax.jit(
        lambda *a: rasterization_2dgs_distributed(
            *a, vm, K, W, H, mesh=mesh, render_mode="RGB+ED",
            distloss=True, tile_size=8,
        )
    )(*sharded)
    assert m1["n_strips"] == 8
    # tolerances: the strip reframe folds y_off into the ray transform
    # (M[1] - y_off*M[2]), which changes f32 rounding inside the ray-plane
    # intersection; measured noise is ~2e-4 near surfel edges. The median
    # depth tracks a T>0.5 threshold, so isolated pixels may flip — gate
    # on the 99.9th percentile instead of the max there.
    np.testing.assert_allclose(r0, r1, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(a0, a1, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(n0, n1, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(nfd0, nfd1, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(d0, d1, atol=5e-4, rtol=1e-4)
    md_diff = np.abs(np.asarray(md0) - np.asarray(md1))
    assert float(np.quantile(md_diff, 0.999)) < 5e-4, md_diff.max()
    np.testing.assert_array_equal(
        np.asarray(m1["radii"]), np.asarray(m0["radii"])
    )

    wr = jnp.asarray(rng.standard_normal((1, H, W, 4)).astype(np.float32))

    def loss_single(*a):
        r, al, nrm, _, dist, _, _ = rasterization_2dgs(
            *a, vm, K, W, H, render_mode="RGB+ED", distloss=True, tile_size=8,
        )
        return jnp.sum(r * wr) + jnp.sum(al) + jnp.sum(nrm) + jnp.sum(dist)

    def loss_dist(*a):
        r, al, nrm, _, dist, _, _ = rasterization_2dgs_distributed(
            *a, vm, K, W, H, mesh=mesh, render_mode="RGB+ED",
            distloss=True, tile_size=8,
        )
        return jnp.sum(r * wr) + jnp.sum(al) + jnp.sum(nrm) + jnp.sum(dist)

    g0 = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    g1 = jax.jit(jax.grad(loss_dist, argnums=(0, 1, 2, 3, 4)))(*sharded)
    names = ["means", "quats", "scales", "opacities", "colors"]
    # 5e-3 rtol: the ray-transform reframe's ~4e-4 intersection noise
    # amplifies through the surfel quat/scale jacobians (measured 0.38%
    # relative on <1% of elements); structural reframe errors would be O(1)
    for n, x, y in zip(names, g0, g1):
        s = max(float(jnp.abs(x).max()), 1.0)
        np.testing.assert_allclose(
            x, y, atol=1e-3 * s, rtol=5e-3, err_msg=f"grad {n}"
        )
