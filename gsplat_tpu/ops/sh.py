"""Spherical-harmonics color evaluation (degree 0-4), pure jnp.

The SH basis polynomial evaluation vectorizes perfectly on the TPU VPU and the
coefficient contraction is a tiny matmul; XLA fuses the whole thing, and
autodiff yields the same VJP the reference hand-writes (including the
projection of direction gradients onto the unit-sphere tangent, which falls out
of differentiating through the explicit normalization here).

Parity: gsplat/cuda/_torch_impl.py:620-714 (oracle) and
gsplat/triton_impl/sh_fwd.py / sh_bwd.py (kernels). Basis constants follow
"Efficient Spherical Harmonic Evaluation", Sloan, JCGT 2013.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eval_sh_bases(basis_dim: int, dirs: jax.Array) -> jax.Array:
    """Evaluate the first `basis_dim` real SH bases at unit directions.

    Args:
        basis_dim: number of bases; one of {1, 4, 9, 16, 25}.
        dirs: [..., 3] unit directions.

    Returns:
        [..., basis_dim] basis values.
    """
    out = [jnp.full(dirs.shape[:-1], 0.2820947917738781, dirs.dtype)]
    if basis_dim <= 1:
        return jnp.stack(out, axis=-1)

    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]

    fTmpA = -0.48860251190292
    out += [fTmpA * y, -fTmpA * z, fTmpA * x]
    if basis_dim <= 4:
        return jnp.stack(out, axis=-1)

    z2 = z * z
    fTmpB = -1.092548430592079 * z
    fTmpA = 0.5462742152960395
    fC1 = x * x - y * y
    fS1 = 2 * x * y
    out += [
        fTmpA * fS1,
        fTmpB * y,
        0.9461746957575601 * z2 - 0.3153915652525201,
        fTmpB * x,
        fTmpA * fC1,
    ]
    if basis_dim <= 9:
        return jnp.stack(out, axis=-1)

    fTmpC = -2.285228997322329 * z2 + 0.4570457994644658
    fTmpB = 1.445305721320277 * z
    fTmpA = -0.5900435899266435
    fC2 = x * fC1 - y * fS1
    fS2 = x * fS1 + y * fC1
    out += [
        fTmpA * fS2,
        fTmpB * fS1,
        fTmpC * y,
        z * (1.865881662950577 * z2 - 1.119528997770346),
        fTmpC * x,
        fTmpB * fC1,
        fTmpA * fC2,
    ]
    if basis_dim <= 16:
        return jnp.stack(out, axis=-1)

    fTmpD = z * (-4.683325804901025 * z2 + 2.007139630671868)
    fTmpC = 3.31161143515146 * z2 - 0.47308734787878
    fTmpB = -1.770130769779931 * z
    fTmpA = 0.6258357354491763
    fC3 = x * fC2 - y * fS2
    fS3 = x * fS2 + y * fC2
    out += [
        fTmpA * fS3,
        fTmpB * fS2,
        fTmpC * fS1,
        fTmpD * y,
        1.984313483298443 * z2 * (1.865881662950577 * z2 - 1.119528997770346)
        + -1.006230589874905 * (0.9461746957575601 * z2 - 0.3153915652525201),
        fTmpD * x,
        fTmpC * fC1,
        fTmpB * fC2,
        fTmpA * fC3,
    ]
    return jnp.stack(out, axis=-1)


def spherical_harmonics(
    degree: int,
    dirs: jax.Array,  # [..., 3]
    coeffs: jax.Array,  # [..., K, 3]
    masks: jax.Array | None = None,  # [...]
) -> jax.Array:
    """SH coefficients -> RGB color for view directions.

    `degree` activates the first (degree+1)^2 of the K available bases; the rest
    are ignored (static slice, so changing `degree` recompiles — the trainer's
    degree warmup has <=4 distinct values).

    Parity: gsplat.cuda._wrapper.spherical_harmonics / _torch_impl.py:704-714.
    """
    num_bases = (degree + 1) ** 2
    assert coeffs.shape[-1] == 3 and coeffs.shape[-2] >= num_bases
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    dirs = dirs / norm
    bases = eval_sh_bases(num_bases, dirs)  # [..., num_bases]
    colors = jnp.einsum("...k,...kc->...c", bases, coeffs[..., :num_bases, :])
    if masks is not None:
        colors = jnp.where(masks[..., None], colors, 0.0)
    return colors
