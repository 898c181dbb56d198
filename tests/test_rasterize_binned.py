"""Binned-pipeline rasterizer (Pallas emit + payload sort + kernels) vs oracle.

Values and VJPs, with and without tight culling, plus the binning engine's
intersection bookkeeping vs ops/isect.py. Runs in interpret mode on the CPU
mesh; scripts/check_tiled_tpu.py covers real hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.binning import bin_gaussians
from gsplat_tpu.ops.isect import isect_tiles
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gsplat_tpu.ops.rasterize_binned import rasterize_to_pixels_binned


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
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
    )
    opc = jnp.broadcast_to(jnp.asarray(opac)[None], (C, N))
    return radii, means2d, depths, conics, jnp.asarray(colors), opc


def test_binning_matches_isect_tiles(rng):
    """Same (tile, count) structure and per-tile gid sets as ops/isect.py."""
    C, W, H, ts = 2, 64, 48, 16
    radii, means2d, depths, conics, colors, opac = _scene(rng, C=C, W=W, H=H)
    tw, th = -(-W // ts), -(-H // ts)
    ref = isect_tiles(means2d, radii, depths, ts, tw, th, capacity=8192)

    binned = bin_gaussians(
        means2d[..., 0], means2d[..., 1],
        conics[..., 0], conics[..., 1], conics[..., 2],
        opac, colors, radii, depths, ts, tw, th,
        capacity=8192, cull=False,
    )
    assert int(binned.n_isects) == int(ref.n_isects)
    counts_ref = np.asarray(ref.ends - ref.offsets).reshape(-1)
    np.testing.assert_array_equal(np.asarray(binned.cnts), counts_ref)
    # per-tile entry sets: same gids in the same depth order
    gids = np.asarray(binned.gids)[0]
    fids = np.asarray(ref.flatten_ids)
    offs_b, offs_r = np.asarray(binned.offs), np.asarray(ref.offsets).reshape(-1)
    for t in range(counts_ref.shape[0]):
        n = counts_ref[t]
        if n:
            np.testing.assert_array_equal(
                gids[offs_b[t]:offs_b[t] + n], fids[offs_r[t]:offs_r[t] + n]
            )
    # the sorted feature stream matches a gather by gid
    ent = np.asarray(binned.entries)
    mx = np.asarray(means2d[..., 0]).reshape(-1)
    n_total = int(binned.n_isects)
    np.testing.assert_allclose(ent[0, :n_total], mx[gids[:n_total]], rtol=0)


def test_binning_truncation_feedback(rng):
    """Too-small capacity truncates whole blocks but reports slab_required."""
    C, W, H, ts = 1, 64, 48, 16
    radii, means2d, depths, conics, colors, opac = _scene(rng, C=C, W=W, H=H)
    tw, th = -(-W // ts), -(-H // ts)
    full = bin_gaussians(
        means2d[..., 0], means2d[..., 1],
        conics[..., 0], conics[..., 1], conics[..., 2],
        opac, colors, radii, depths, ts, tw, th, capacity=65536, cull=False,
    )
    need = int(full.slab_required)
    assert need >= int(full.n_isects)
    small = bin_gaussians(
        means2d[..., 0], means2d[..., 1],
        conics[..., 0], conics[..., 1], conics[..., 2],
        opac, colors, radii, depths, ts, tw, th,
        capacity=max(512, need // 2), cull=False,
    )
    assert int(small.slab_required) == need
    assert int(small.n_isects) < int(full.n_isects)


@pytest.mark.parametrize("cull", [False, True])
@pytest.mark.parametrize("use_bg", [False, True])
def test_binned_matches_oracle(rng, cull, use_bg):
    C, W, H, ts, D = 2, 64, 48, 16, 3
    radii, means2d, depths, conics, colors, opac = _scene(rng, C=C, W=W, H=H, D=D)
    bg = jnp.asarray(rng.random((C, D)).astype(np.float32)) if use_bg else None

    r0, a0 = rasterize_to_pixels_ref(
        means2d, conics, colors, opac, radii, depths, W, H, ts, bg
    )
    r1, a1, aux = rasterize_to_pixels_binned(
        means2d, conics, colors, opac, radii, depths, W, H, ts,
        capacity=8192, backgrounds=bg, cull=cull,
    )
    assert int(aux["n_isects"]) > 0
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=1e-5, atol=1e-5)
    if cull:
        # tight culling must strictly shrink the list on this scene
        _, _, aux0 = rasterize_to_pixels_binned(
            means2d, conics, colors, opac, radii, depths, W, H, ts,
            capacity=8192, backgrounds=bg, cull=False,
        )
        assert int(aux["n_isects"]) < int(aux0["n_isects"])


def test_binned_sigma_mxu_matches_oracle(rng):
    """MXU-contraction sigma variant (GSPLAT_SIGMA_MXU) vs the oracle.

    The expanded [P,8]@[8,LANES] polynomial carries ~1e-3 absolute rounding
    in sigma (documented in _fwd_kernel), so the tolerance is looser than
    the exact path's 1e-5.
    """
    C, W, H, ts, D = 2, 64, 48, 16, 3
    radii, means2d, depths, conics, colors, opac = _scene(rng, C=C, W=W, H=H, D=D)
    bg = jnp.asarray(rng.random((C, D)).astype(np.float32))

    r0, a0 = rasterize_to_pixels_ref(
        means2d, conics, colors, opac, radii, depths, W, H, ts, bg
    )
    r1, a1, _ = rasterize_to_pixels_binned(
        means2d, conics, colors, opac, radii, depths, W, H, ts,
        capacity=8192, backgrounds=bg, sigma_mxu=True,
    )
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=2e-3, atol=2e-3)

    # grads stay consistent too (bwd recomputes sigma exactly; only the fwd
    # residuals logT/last differ at the mxu rounding level)
    def loss(fn, mx, col):
        r, a, *rest = fn(mx)
        return jnp.sum(r * col) + 0.5 * jnp.sum(a)

    col = jnp.asarray(rng.standard_normal(r0.shape).astype(np.float32))
    g0 = jax.grad(
        lambda m: loss(
            lambda mm: rasterize_to_pixels_ref(
                mm, conics, colors, opac, radii, depths, W, H, ts, bg,
            ), m, col,
        )
    )(means2d)
    g1 = jax.grad(
        lambda m: loss(
            lambda mm: rasterize_to_pixels_binned(
                (mm[..., 0], mm[..., 1]), conics, colors, opac, radii,
                depths, W, H, ts, capacity=8192, backgrounds=bg,
                sigma_mxu=True,
            ), m, col,
        )
    )(means2d)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("cull", [False, True])
def test_binned_vjp_matches_oracle(rng, cull):
    C, W, H, ts, D = 1, 48, 32, 16, 3
    radii, means2d, depths, conics, colors, opac = _scene(
        rng, N=150, C=C, W=W, H=H, D=D
    )
    bg = jnp.asarray(rng.random((C, D)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))
    wa = jnp.asarray(rng.standard_normal((C, H, W, 1)).astype(np.float32))

    def loss_ref(m2d, con, col, op):
        r, a = rasterize_to_pixels_ref(
            m2d, con, col, op, radii, depths, W, H, ts, bg
        )
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    def loss_bin(m2d, con, col, op):
        r, a, _ = rasterize_to_pixels_binned(
            m2d, con, col, op, radii, depths, W, H, ts,
            capacity=8192, backgrounds=bg, cull=cull,
        )
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    g0 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
    g1 = jax.grad(loss_bin, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
    for a, b, name in zip(g0, g1, ("means2d", "conics", "colors", "opac")):
        # scale-relative atol: the bwd kernel's quadratic reductions come
        # from an MXU moment contraction (M = Q^T v_sig, then lane-wide
        # reconstruction) whose cancellation differs from the oracle's
        # direct per-entry sums by up to ~5e-4 relative on near-cancelling
        # conic gradients — far below training-relevant noise
        s = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4 * s,
            err_msg=name,
        )


def test_binned_absgrad_matches_oracle(rng):
    from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref_absgrad

    C, W, H, ts, D = 1, 48, 32, 16, 3
    radii, means2d, depths, conics, colors, opac = _scene(
        rng, N=120, C=C, W=W, H=H, D=D
    )
    bg = jnp.zeros((C, D), jnp.float32)
    wr = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))
    wa = jnp.asarray(rng.standard_normal((C, H, W, 1)).astype(np.float32))
    zc = jnp.zeros_like(means2d)

    def loss_oracle(carrier):
        r, a = rasterize_to_pixels_ref_absgrad(
            means2d, conics, colors, opac, radii, depths, W, H, ts, bg, carrier
        )
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    def loss_bin(carrier):
        r, a, _ = rasterize_to_pixels_binned(
            means2d, conics, colors, opac, radii, depths, W, H, ts,
            capacity=8192, backgrounds=bg,
            abs_carrier=(carrier[..., 0], carrier[..., 1]),
        )
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    g0 = jax.grad(loss_oracle)(zc)
    g1 = jax.grad(loss_bin)(zc)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=1e-4, atol=1e-5
    )


def test_rasterization_binned_backend(rng):
    """Public API: backend='binned' matches backend='oracle' incl. depth
    modes and the capacity meta."""
    from gsplat_tpu.rendering import rasterization

    N, C, W, H = 150, 2, 48, 32
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.25 + 0.05).astype(np.float32)
    opac = rng.random((N,)).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    vm = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    vm[:, 2, 3] = 4.0
    vm[1, 0, 3] = 0.3
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    args = tuple(
        jnp.asarray(x) for x in (means, quats, scales, opac, colors, vm, Ks)
    )
    for mode in ("RGB", "RGB+ED"):
        r0, a0, m0 = rasterization(
            *args, W, H, render_mode=mode, backend="oracle", tile_size=16
        )
        r1, a1, m1 = rasterization(
            *args, W, H, render_mode=mode, backend="binned", tile_size=16,
            isect_capacity=8192,
        )
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r0), rtol=1e-4, atol=1e-4, err_msg=mode
        )
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a0), rtol=1e-5, atol=1e-5
        )
    assert int(m1["n_isects"]) > 0
    assert int(m1["slab_required"]) >= int(m1["n_isects"])


def test_full_slab_boundary_reads(rng):
    """Regression: with the LANES-aligned stream base, a tile whose range
    ends flush against the end of the slab makes the kernel's last DMA
    extend past the un-padded capacity (interpret mode clamps the slice ->
    silently WRONG entries; OOB HBM reads on hardware). cull=False keeps
    every emitted entry live, so capacity == slab_required puts the final
    tile's range end exactly at capA; the entries slab must be padded by
    max(KF, KB) - LANES columns for the boundary reads to stay in bounds."""
    radii, means2d, depths, conics, colors, opac = _scene(rng, N=400)
    W, H, ts = 64, 48, 16
    _, _, aux = rasterize_to_pixels_binned(
        means2d, conics, colors, opac, radii, depths, W, H, ts,
        capacity=65536, cull=False,
    )
    need = int(aux["slab_required"])  # emit budget incl. per-block padding
    n_live = int(aux["n_isects"])  # sorted live entries (ranges end here)
    assert need > 512  # the stream crosses at least one K window
    # the overrun needs the live stream end within K - LANES of the
    # 512-rounded capacity; this scene must provide that or the test is
    # vacuous (capA == round_up(need, 512) at cap=need)
    capA = -(-need // 512) * 512
    assert capA - n_live < 384, (
        f"adjust the scene: slack {capA - n_live} can't overrun"
    )
    ref, ref_a = rasterize_to_pixels_ref(
        means2d, conics, colors, opac, radii, depths, W, H, ts
    )
    for cap in (need,):
        out, alphas, aux2 = rasterize_to_pixels_binned(
            means2d, conics, colors, opac, radii, depths, W, H, ts,
            capacity=cap, cull=False,
        )
        assert int(aux2["n_isects"]) == n_live, cap
        assert np.isfinite(np.asarray(out)).all(), cap
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, err_msg=f"cap={cap}"
        )
        np.testing.assert_allclose(
            np.asarray(alphas), np.asarray(ref_a), atol=2e-5,
            err_msg=f"cap={cap}",
        )


@pytest.mark.parametrize("dense", [False, True], ids=["sparse", "multibatch"])
def test_binned_slice_skip_matches_exact(rng, dense):
    """slice_skip=True (runtime skip of fully-dead trailing lane slices,
    GSPLAT_SLICE_SKIP) must be bit-identical to the default path, values
    AND gradients — the skipped slices hold only colmask-invalid lanes and
    the skip path replays the default path's per-batch summation order.
    ``dense`` packs >512 entries into single tiles so multiple KF batches
    run per tile (the case where a per-slice accum order would diverge)."""
    C, W, H, ts, D = 2, 64, 48, 16, 3
    radii, means2d, depths, conics, colors, opac = _scene(rng, C=C, W=W, H=H, D=D)
    if dense:
        # cluster all gaussians onto one tile: per-tile entry counts far
        # exceed KF=512, forcing the multi-batch accumulation path
        means2d = jnp.stack(
            [jnp.clip(means2d[..., 0] % 14 + 1, 1, 15),
             jnp.clip(means2d[..., 1] % 14 + 1, 1, 15)], axis=-1
        )
    bg = jnp.asarray(rng.random((C, D)).astype(np.float32))

    def run(ss):
        return rasterize_to_pixels_binned(
            means2d, conics, colors, opac, radii, depths, W, H, ts,
            capacity=8192, backgrounds=bg, slice_skip=ss,
        )

    r0, a0, _ = run(False)
    r1, a1, _ = run(True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))

    wr = jnp.asarray(rng.standard_normal(r0.shape).astype(np.float32))

    def loss(ss, m2d, con, col, op):
        r, a, _ = rasterize_to_pixels_binned(
            m2d, con, col, op, radii, depths, W, H, ts,
            capacity=8192, backgrounds=bg, slice_skip=ss,
        )
        return jnp.sum(r * wr) + jnp.sum(a)

    g0 = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3))(
        means2d, conics, colors, opac
    )
    g1 = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3))(
        means2d, conics, colors, opac
    )
    for x, y in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_binned_per_camera_matches_shared(rng):
    """per_camera=True (per-camera slab partition, lax.map) must be
    numerically identical to the shared-slab path — values AND grads —
    with the same per-camera capacity."""
    C, W, H, ts, D = 3, 48, 32, 16, 3
    radii, means2d, depths, conics, colors, opac = _scene(
        rng, N=150, C=C, W=W, H=H, D=D
    )
    bg = jnp.asarray(rng.random((C, D)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))

    def loss(per_cam, m2d, con, col, op):
        r, a, aux = rasterize_to_pixels_binned(
            m2d, con, col, op, radii, depths, W, H, ts,
            capacity=8192, backgrounds=bg, per_camera=per_cam,
        )
        return jnp.sum(r * wr) + jnp.sum(a), (r, a, aux)

    (l0, (r0, a0, x0)), g0 = jax.value_and_grad(
        lambda *a: loss(False, *a), argnums=(0, 1, 2, 3), has_aux=True
    )(means2d, conics, colors, opac)
    (l1, (r1, a1, x1)), g1 = jax.value_and_grad(
        lambda *a: loss(True, *a), argnums=(0, 1, 2, 3), has_aux=True
    )(means2d, conics, colors, opac)

    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-6)
    for a, b, name in zip(g0, g1, ("means2d", "conics", "colors", "opac")):
        s = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5 * s,
            err_msg=name,
        )
    # per-camera aux is the max across cameras: must cover every camera
    # but be no larger than the shared slab's total
    assert int(x1["slab_required"]) <= int(x0["slab_required"])
    assert int(x1["n_isects"]) <= int(x0["n_isects"])


@pytest.mark.parametrize("pb", [64, 128])
def test_binned_bwd_pixel_block_matches_default(rng, pb):
    """bwd pixel sub-blocking (PB < P): gradients must match the
    single-block path (only MXU reduction order differs across blocks)."""
    C, W, H, ts, D = 1, 48, 32, 16, 3  # P = 256
    radii, means2d, depths, conics, colors, opac = _scene(
        rng, N=150, C=C, W=W, H=H, D=D
    )
    wr = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))

    def loss(pblk, m2d, con, col, op):
        r, a, _ = rasterize_to_pixels_binned(
            m2d, con, col, op, radii, depths, W, H, ts,
            capacity=8192, bwd_pixel_block=pblk, bwd_batch_size=256,
        )
        return jnp.sum(r * wr) + jnp.sum(a)

    g0 = jax.grad(lambda *a: loss(None, *a), argnums=(0, 1, 2, 3))(
        means2d, conics, colors, opac
    )
    g1 = jax.grad(lambda *a: loss(pb, *a), argnums=(0, 1, 2, 3))(
        means2d, conics, colors, opac
    )
    for a, b, name in zip(g0, g1, ("means2d", "conics", "colors", "opac")):
        s = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5 * s,
            err_msg=name,
        )
