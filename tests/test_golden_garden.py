"""Garden-fixture golden parity vs the REFERENCE's torch compositing oracle.

This is the acceptance test VERDICT item 5 asks for: the same projected
Gaussians (our projection + binning, both independently parity-tested
against the reference torch oracle in test_projection/test_isect) are
composited by

  (a) the reference's own `_torch_impl._rasterize_to_pixels` batched loop
      (run unmodified via tests/ref_raster_torch.py stubs), and
  (b) every backend of this repo (oracle / tiled / binned),

and images AND input gradients must agree. The fixture is the real garden
point cloud (assets npz), cropped + camera-downscaled so the O(N*pixels)
paths stay CPU-tractable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu import load_test_data
from gsplat_tpu.ops.isect import isect_tiles
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref
from gsplat_tpu.ops.rasterize_tiled import rasterize_to_pixels_tiled
from gsplat_tpu.ops.rasterize_binned import rasterize_to_pixels_binned

from ref_raster_torch import load_ref_rasterizer

TS = 16


@pytest.fixture(scope="module")
def garden():
    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data()
    )
    # subsample Gaussians + downscale cameras to keep CPU paths tractable
    stride = max(1, means.shape[0] // 9000)
    means, quats, scales = means[::stride], quats[::stride], scales[::stride]
    opacities, colors = opacities[::stride], colors[::stride]
    factor = 4
    W, H = width // factor, height // factor
    Ks = Ks.copy()
    Ks[:, :2, :] /= factor
    C = 2
    viewmats, Ks = viewmats[:C], Ks[:C]

    radii, means2d, depths, conics, _ = fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
    )
    N = means.shape[0]
    opc = jnp.broadcast_to(jnp.asarray(opacities)[None], (C, N))
    cols = jnp.broadcast_to(jnp.asarray(colors)[None], (C, N, 3))
    tw, th = -(-W // TS), -(-H // TS)
    isect = isect_tiles(means2d, radii, depths, TS, tw, th, capacity=1 << 18)
    assert int(isect.n_isects) < (1 << 18)
    return dict(
        radii=radii, means2d=means2d, depths=depths, conics=conics,
        opc=opc, cols=cols, isect=isect, W=W, H=H, C=C, N=N, tw=tw, th=th,
    )


@pytest.fixture(scope="module")
def golden(garden):
    """Reference torch oracle image + grads on the garden fixture."""
    import torch

    ref = load_ref_rasterizer()
    g = garden
    m2d = torch.tensor(np.asarray(g["means2d"]), requires_grad=True)
    con = torch.tensor(np.asarray(g["conics"]), requires_grad=True)
    col = torch.tensor(np.asarray(g["cols"]), requires_grad=True)
    opa = torch.tensor(np.asarray(g["opc"]), requires_grad=True)
    bg = torch.full((g["C"], 3), 0.2)
    offsets = torch.tensor(
        np.asarray(g["isect"].offsets), dtype=torch.int32
    )
    n = int(g["isect"].n_isects)
    fids = torch.tensor(np.asarray(g["isect"].flatten_ids[:n]), dtype=torch.int32)
    render, alphas = ref._rasterize_to_pixels(
        m2d, con, col, opa, g["W"], g["H"], TS, offsets, fids,
        backgrounds=bg,
    )
    rng = np.random.default_rng(0)
    wr = torch.tensor(rng.standard_normal(render.shape).astype(np.float32))
    wa = torch.tensor(rng.standard_normal(alphas.shape).astype(np.float32))
    loss = (render * wr).sum() + (alphas * wa).sum()
    loss.backward()
    return dict(
        render=render.detach().numpy(), alphas=alphas.detach().numpy(),
        wr=wr.numpy(), wa=wa.numpy(),
        g_means2d=m2d.grad.numpy(), g_conics=con.grad.numpy(),
        g_colors=col.grad.numpy(), g_opac=opa.grad.numpy(),
    )


def _run_backend(garden, backend):
    g = garden
    bg = jnp.full((g["C"], 3), 0.2, jnp.float32)

    def fn(m2d, con, col, opa):
        if backend == "oracle":
            r, a = rasterize_to_pixels_ref(
                m2d, con, col, opa, g["radii"], g["depths"], g["W"], g["H"],
                TS, bg,
            )
        elif backend == "tiled":
            r, a = rasterize_to_pixels_tiled(
                m2d, con, col, opa, g["W"], g["H"], TS, g["isect"],
                backgrounds=bg,
            )
        else:
            r, a, _ = rasterize_to_pixels_binned(
                m2d, con, col, opa, g["radii"], g["depths"], g["W"], g["H"],
                TS, capacity=1 << 18, backgrounds=bg,
            )
        return r, a

    return fn


@pytest.mark.parametrize("backend", ["oracle", "tiled", "binned"])
def test_garden_golden_image_and_grads(garden, golden, backend):
    g = garden
    fn = _run_backend(garden, backend)
    render, alphas = fn(g["means2d"], g["conics"], g["cols"], g["opc"])
    # Tolerance note: torch and XLA round `opac * exp(-sigma)` differently,
    # so entries sitting exactly on the alpha = 1/255 inclusion threshold
    # can flip, changing a pixel by up to ~2/255. Measured on this fixture
    # (and invariant to the reference loop's batch_per_iter): image diffs
    # <= 3e-3, alpha diffs <= 6e-3 on ~1.7% of pixels of one camera.
    np.testing.assert_allclose(
        np.asarray(render), golden["render"], rtol=1e-4, atol=4e-3,
        err_msg=f"{backend} image",
    )
    np.testing.assert_allclose(
        np.asarray(alphas), golden["alphas"], rtol=1e-4, atol=8e-3,
    )
    d = np.abs(np.asarray(render) - golden["render"]).max(axis=-1)
    assert (d > 3e-3).mean() < 1e-3, "more than 0.1% of pixels off"

    wr = jnp.asarray(golden["wr"])
    wa = jnp.asarray(golden["wa"])

    def loss(m2d, con, col, opa):
        r, a = fn(m2d, con, col, opa)
        return jnp.sum(r * wr) + jnp.sum(a * wa)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        g["means2d"], g["conics"], g["cols"], g["opc"]
    )
    for got, want, name in zip(
        grads,
        (golden["g_means2d"], golden["g_conics"], golden["g_colors"],
         golden["g_opac"]),
        ("means2d", "conics", "colors", "opacities"),
    ):
        # same threshold-flip tolerance as the image comparison: entries
        # that flip across alpha=1/255 get whole different gradients, so
        # the criterion is count-based
        scale = max(np.abs(want).max(), 1e-3)
        got = np.asarray(got)
        bad = np.abs(got - want) > (5e-3 * np.abs(want) + 1e-3 * scale)
        assert bad.mean() < 5e-3, (
            f"{backend} grad {name}: {bad.mean():.2%} elements off "
            f"(maxdiff {np.abs(got - want).max():.3e}, scale {scale:.3e})"
        )
