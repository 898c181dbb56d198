"""Garden-fixture 2DGS golden parity vs the REFERENCE's torch oracle.

The 2DGS analogue of test_golden_garden.py (VERDICT r2 item 4): the
reference's own `_torch_impl_2dgs._rasterize_to_pixels_2dgs` batched
compositing loop runs unmodified (via tests/ref_raster_torch.py stubs) on
the garden fixture, and every 2DGS backend of this repo (oracle / tiled /
binned) must reproduce its images (colors, alphas, accumulated normals)
AND input gradients. The projection is additionally compared against the
reference's `_fully_fused_projection_2dgs` oracle directly
(/root/reference/gsplat/cuda/_torch_impl_2dgs.py:9-76).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu import load_test_data
from gsplat_tpu.ops.isect import isect_tiles
from gsplat_tpu.ops.projection_2dgs import fully_fused_projection_2dgs
from gsplat_tpu.ops.rasterize_2dgs_ref import rasterize_to_pixels_2dgs_ref
from gsplat_tpu.ops.rasterize_2dgs_tiled import rasterize_to_pixels_2dgs_tiled
from gsplat_tpu.ops.rasterize_2dgs_binned import rasterize_to_pixels_2dgs_binned

from ref_raster_torch import load_ref_rasterizer_2dgs

TS = 16


@pytest.fixture(scope="module")
def garden2():
    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data()
    )
    # subsample + downscale to keep the O(N*pixels) torch loop tractable
    stride = max(1, means.shape[0] // 6000)
    means, quats, scales = means[::stride], quats[::stride], scales[::stride]
    opacities, colors = opacities[::stride], colors[::stride]
    factor = 4
    W, H = width // factor, height // factor
    Ks = Ks.copy()
    Ks[:, :2, :] /= factor
    C = 2
    viewmats, Ks = viewmats[:C], Ks[:C]

    radii, means2d, depths, rt, normals = fully_fused_projection_2dgs(
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
        inputs=(means, quats, scales, viewmats, Ks),
        radii=radii, means2d=means2d, depths=depths, rt=rt, normals=normals,
        opc=opc, cols=cols, isect=isect, W=W, H=H, C=C, N=N, tw=tw, th=th,
    )


def test_projection_2dgs_vs_reference_oracle(garden2):
    """Our SoA surfel projection vs the reference's torch oracle, run
    unmodified on the garden inputs."""
    import torch

    ref = load_ref_rasterizer_2dgs()
    g = garden2
    means, quats, scales, viewmats, Ks = g["inputs"]
    W, H = g["W"], g["H"]
    r_radii, r_m2d, r_depths, r_M, r_normals = ref._fully_fused_projection_2dgs(
        torch.tensor(means), torch.tensor(quats), torch.tensor(scales),
        torch.tensor(viewmats), torch.tensor(Ks), W, H,
    )
    r_radii = r_radii.numpy()
    ours_radii = np.asarray(g["radii"])
    # Radii agree except boundary-spec differences on degenerate surfels
    # (~0.2% on this fixture): the torch oracle lets a negative sqrt
    # argument go NaN -> radius 0 (_torch_impl_2dgs.py:59-66) where the
    # CUDA kernel floors the squared extent at 1e-4 -> radius >= 1
    # (Projection2DGSFused.cu:219-220); our clip(.., 0) sits between the
    # two. These entries have near-zero screen extent either way.
    assert (ours_radii != r_radii).mean() < 5e-3
    live = (ours_radii > 0) & (r_radii > 0)
    for name, ours, want in (
        ("means2d", g["means2d"], r_m2d.numpy()),
        ("depths", g["depths"], r_depths.numpy()),
        ("ray_transforms", g["rt"], r_M.numpy()),
        ("normals", g["normals"], r_normals.numpy()),
    ):
        ours = np.asarray(ours)[live]
        want = want[live]
        scale = np.abs(want).max()
        np.testing.assert_allclose(
            ours, want, atol=1e-4 * scale, rtol=1e-4, err_msg=name
        )


@pytest.fixture(scope="module")
def golden2(garden2):
    """Reference torch 2DGS oracle images + grads on the garden fixture."""
    import torch

    ref = load_ref_rasterizer_2dgs()
    g = garden2
    m2d = torch.tensor(np.asarray(g["means2d"]), requires_grad=True)
    rt = torch.tensor(np.asarray(g["rt"]), requires_grad=True)
    col = torch.tensor(np.asarray(g["cols"]), requires_grad=True)
    nrm = torch.tensor(np.asarray(g["normals"]), requires_grad=True)
    opa = torch.tensor(np.asarray(g["opc"]), requires_grad=True)
    bg = torch.full((g["C"], 3), 0.2)
    offsets = torch.tensor(
        np.asarray(g["isect"].offsets), dtype=torch.int32
    )
    n = int(g["isect"].n_isects)
    fids = torch.tensor(np.asarray(g["isect"].flatten_ids[:n]), dtype=torch.int32)
    render, alphas, normals = ref._rasterize_to_pixels_2dgs(
        m2d, rt, col, nrm, opa, g["W"], g["H"], TS, offsets, fids,
        backgrounds=bg,
    )
    rng = np.random.default_rng(0)
    wr = torch.tensor(rng.standard_normal(render.shape).astype(np.float32))
    wa = torch.tensor(rng.standard_normal(alphas.shape).astype(np.float32))
    wn = torch.tensor(rng.standard_normal(normals.shape).astype(np.float32))
    loss = (render * wr).sum() + (alphas * wa).sum() + (normals * wn).sum()
    loss.backward()
    return dict(
        render=render.detach().numpy(), alphas=alphas.detach().numpy(),
        normals=normals.detach().numpy(),
        wr=wr.numpy(), wa=wa.numpy(), wn=wn.numpy(),
        g_means2d=m2d.grad.numpy(), g_rt=rt.grad.numpy(),
        g_colors=col.grad.numpy(), g_normals=nrm.grad.numpy(),
        g_opac=opa.grad.numpy(),
    )


def _run_backend_2dgs(garden2, backend):
    g = garden2
    bg = jnp.full((g["C"], 3), 0.2, jnp.float32)

    def fn(m2d, rt, col, nrm, opa):
        if backend == "oracle":
            r, a, n, _, _ = rasterize_to_pixels_2dgs_ref(
                m2d, rt, col, nrm, opa, g["radii"], g["depths"],
                g["W"], g["H"], TS, bg,
            )
        elif backend == "tiled":
            r, a, n, _, _ = rasterize_to_pixels_2dgs_tiled(
                m2d, rt, col, nrm, opa, g["W"], g["H"], TS, g["isect"], bg,
            )
        else:
            r, a, n, _, _, _ = rasterize_to_pixels_2dgs_binned(
                m2d, rt, col, nrm, opa, g["radii"], g["depths"],
                g["W"], g["H"], TS, capacity=1 << 18, backgrounds=bg,
            )
        return r, a, n

    return fn


@pytest.mark.parametrize("backend", ["oracle", "tiled", "binned"])
def test_garden_2dgs_golden_image_and_grads(garden2, golden2, backend):
    g = garden2
    fn = _run_backend_2dgs(garden2, backend)
    render, alphas, normals = fn(
        g["means2d"], g["rt"], g["cols"], g["normals"], g["opc"]
    )
    # Threshold-flip tolerance, same rationale as the 3DGS golden test:
    # entries sitting exactly on the alpha = 1/255 inclusion or T = 1e-4
    # termination boundary can flip between torch and XLA rounding (the
    # 2DGS sigma's cross-product ratio rounds differently per backend),
    # changing an isolated pixel by up to the local transmittance (~1e-2).
    # Measured on this fixture: <= 1-2 flipped pixels per backend. The
    # criterion is therefore count-based with a hard outlier cap.
    dr = np.abs(np.asarray(render) - golden2["render"])
    assert dr.max() < 5e-2, f"{backend} image max diff {dr.max():.3e}"
    assert (dr > 4e-3).mean() < 1e-3, (
        f"{backend} image: {(dr > 4e-3).mean():.2%} elements off"
    )
    da = np.abs(np.asarray(alphas) - golden2["alphas"])
    assert da.max() < 5e-2, f"{backend} alphas max diff {da.max():.3e}"
    assert (da > 1e-3).mean() < 5e-3, (
        f"{backend} alphas: {(da > 1e-3).mean():.2%} pixels off"
    )
    assert np.median(da) < 1e-5
    nscale = max(np.abs(golden2["normals"]).max(), 1.0)
    dn = np.abs(np.asarray(normals) - golden2["normals"])
    assert dn.max() < 5e-2 * nscale, f"{backend} normals max {dn.max():.3e}"
    assert (dn > 4e-3 * nscale).mean() < 1e-3, f"{backend} normals off"

    wr = jnp.asarray(golden2["wr"])
    wa = jnp.asarray(golden2["wa"])
    wn = jnp.asarray(golden2["wn"])

    def loss(m2d, rt, col, nrm, opa):
        r, a, n = fn(m2d, rt, col, nrm, opa)
        return jnp.sum(r * wr) + jnp.sum(a * wa) + jnp.sum(n * wn)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        g["means2d"], g["rt"], g["cols"], g["normals"], g["opc"]
    )
    for got, want, name in zip(
        grads,
        (golden2["g_means2d"], golden2["g_rt"], golden2["g_colors"],
         golden2["g_normals"], golden2["g_opac"]),
        ("means2d", "ray_transforms", "colors", "normals", "opacities"),
    ):
        scale = max(np.abs(want).max(), 1e-3)
        got = np.asarray(got)
        bad = np.abs(got - want) > (5e-3 * np.abs(want) + 1e-3 * scale)
        assert bad.mean() < 5e-3, (
            f"{backend} grad {name}: {bad.mean():.2%} elements off "
            f"(maxdiff {np.abs(got - want).max():.3e}, scale {scale:.3e})"
        )
