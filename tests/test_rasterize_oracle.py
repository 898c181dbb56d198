"""Oracle rasterizer correctness vs an independent sequential numpy renderer,
plus end-to-end rasterization() smoke/gradient checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu import rasterization
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu.ops.rasterize_ref import rasterize_to_pixels_ref


def sequential_rasterize(
    means2d, conics, colors, opacities, radii, depths, W, H, tile_size, bg=None
):
    """Straight-line per-pixel reference: sorted front-to-back alpha blending
    with the documented accept rules. Deliberately naive."""
    C, N, D = colors.shape
    out = np.zeros((C, H, W, D), np.float64)
    out_a = np.zeros((C, H, W), np.float64)
    for c in range(C):
        order = np.argsort(depths[c], kind="stable")
        for yi in range(H):
            for xi in range(W):
                T = 1.0
                done = False
                px, py = xi + 0.5, yi + 0.5
                tx, ty = xi // tile_size, yi // tile_size
                for n in order:
                    if done or radii[c, n] <= 0:
                        continue
                    r = radii[c, n] / tile_size
                    mx, my = means2d[c, n] / tile_size
                    if not (
                        np.floor(mx - r) <= tx < np.ceil(mx + r)
                        and np.floor(my - r) <= ty < np.ceil(my + r)
                    ):
                        continue
                    dx, dy = px - means2d[c, n, 0], py - means2d[c, n, 1]
                    a_, b_, c_ = conics[c, n]
                    sigma = 0.5 * (a_ * dx * dx + c_ * dy * dy) + b_ * dx * dy
                    alpha = min(0.999, opacities[c, n] * np.exp(-sigma))
                    if sigma < 0 or alpha < 1.0 / 255.0:
                        continue
                    if T * (1 - alpha) <= 1e-4:
                        done = True
                        continue
                    out[c, yi, xi] += T * alpha * colors[c, n]
                    T *= 1 - alpha
                out_a[c, yi, xi] = 1.0 - T
                if bg is not None:
                    out[c, yi, xi] += T * bg[c]
    return out, out_a[..., None]


@pytest.fixture(scope="module")
def scene(request):
    rng = np.random.default_rng(3)
    C, N, W, H = 2, 60, 32, 24
    means2d = rng.uniform(-4, 36, (C, N, 2)).astype(np.float32)
    # random SPD 2x2 -> conic
    L = rng.uniform(0.5, 4.0, (C, N, 2, 2)).astype(np.float32)
    cov = L @ np.swapaxes(L, -1, -2) + np.eye(2, dtype=np.float32) * 0.3
    det = cov[..., 0, 0] * cov[..., 1, 1] - cov[..., 0, 1] * cov[..., 1, 0]
    conics = np.stack(
        [cov[..., 1, 1] / det, -cov[..., 0, 1] / det, cov[..., 0, 0] / det], axis=-1
    ).astype(np.float32)
    b = (cov[..., 0, 0] + cov[..., 1, 1]) / 2
    v1 = b + np.sqrt(np.clip(b * b - det, 0.01, None))
    radii = np.ceil(3 * np.sqrt(v1)).astype(np.int32)
    colors = rng.random((C, N, 3)).astype(np.float32)
    opacities = rng.uniform(0.3, 1.0, (C, N)).astype(np.float32)
    depths = rng.uniform(0.1, 10.0, (C, N)).astype(np.float32)
    bg = rng.random((C, 3)).astype(np.float32)
    return dict(
        means2d=means2d, conics=conics, radii=radii, colors=colors,
        opacities=opacities, depths=depths, bg=bg, W=W, H=H,
    )


@pytest.mark.parametrize("with_bg", [False, True])
def test_oracle_vs_sequential(scene, with_bg):
    bg = scene["bg"] if with_bg else None
    ours_c, ours_a = rasterize_to_pixels_ref(
        jnp.asarray(scene["means2d"]),
        jnp.asarray(scene["conics"]),
        jnp.asarray(scene["colors"]),
        jnp.asarray(scene["opacities"]),
        jnp.asarray(scene["radii"]),
        jnp.asarray(scene["depths"]),
        scene["W"],
        scene["H"],
        tile_size=16,
        backgrounds=jnp.asarray(bg) if bg is not None else None,
    )
    ref_c, ref_a = sequential_rasterize(
        scene["means2d"], scene["conics"], scene["colors"], scene["opacities"],
        scene["radii"], scene["depths"], scene["W"], scene["H"], 16, bg,
    )
    np.testing.assert_allclose(np.asarray(ours_c), ref_c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_a), ref_a, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("render_mode", ["RGB", "D", "ED", "RGB+D", "RGB+ED"])
@pytest.mark.parametrize("sh_degree", [None, 2])
def test_rasterization_end_to_end(render_mode, sh_degree):
    rng = np.random.default_rng(5)
    N, C, W, H = 100, 2, 48, 32
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.2).astype(np.float32)
    opacities = rng.random((N,)).astype(np.float32)
    if sh_degree is None:
        colors = rng.random((N, 3)).astype(np.float32)
    else:
        colors = rng.standard_normal((N, 9, 3)).astype(np.float32) * 0.3
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    viewmats[1, 0, 3] = 0.3
    Ks = np.tile(
        np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )

    render, alphas, meta = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(colors),
        jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
        sh_degree=sh_degree, render_mode=render_mode,
    )
    D_expected = {"RGB": 3, "D": 1, "ED": 1, "RGB+D": 4, "RGB+ED": 4}[render_mode]
    assert render.shape == (C, H, W, D_expected)
    assert alphas.shape == (C, H, W, 1)
    assert np.isfinite(np.asarray(render)).all()
    a = np.asarray(alphas)
    assert (a >= 0).all() and (a <= 1.0 + 1e-5).all()
    assert float(a.max()) > 0.1  # something actually rendered


def test_rasterization_grads_flow():
    """Gradients flow to all leaf params and to the means2d carrier."""
    rng = np.random.default_rng(7)
    N, C, W, H = 50, 1, 32, 32
    means = rng.standard_normal((N, 3)).astype(np.float32)
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (rng.random((N, 3)) * 0.3).astype(np.float32)
    opacities = rng.random((N,)).astype(np.float32)
    colors = rng.random((N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 2, 3] = 4.0
    Ks = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )

    def loss(means, quats, scales, opacities, colors, carrier):
        render, alphas, _ = rasterization(
            means, quats, scales, opacities, colors,
            jnp.asarray(viewmats), jnp.asarray(Ks), W, H,
            means2d_carrier=carrier,
        )
        return jnp.sum(render**2) + jnp.sum(alphas)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(colors),
        jnp.zeros((C, N, 2)),
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


def test_ssim_bounded_on_smooth_images(rng):
    """Regression: at TPU-default bf16 conv precision the SSIM variance
    terms cancel on smooth renders and SSIM leaves [-1, 1]; the conv must
    run at HIGHEST precision (losses.py)."""
    import numpy as np
    import jax.numpy as jnp
    from gsplat_tpu.losses import ssim

    x = np.linspace(0, 1, 128)[None, None, :, None] * np.ones((1, 96, 1, 3))
    a = jnp.asarray(x.astype(np.float32))
    b = a + jnp.asarray(rng.normal(0, 0.01, a.shape).astype(np.float32))
    s_aa = float(ssim(a, a))
    s_ab = float(ssim(a, b))
    assert abs(s_aa - 1.0) < 1e-5
    assert -1.0 <= s_ab <= 1.0
