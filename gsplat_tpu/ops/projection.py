"""Gaussian projection math, TPU-native (pure jnp, fully vectorized, autodiff).

Semantics mirror the reference pipeline (see ``/root/reference``):
  - quat/scale -> 3D covariance       (gsplat/cuda/_torch_impl.py:41-68)
  - world -> camera transform          (gsplat/cuda/_torch_impl.py:225-247)
  - pinhole / ortho / fisheye EWA proj (gsplat/cuda/_torch_impl.py:71-222)
  - fused projection with blur (eps2d), conic inverse, radius + frustum cull
    (gsplat/cuda/_torch_impl.py:250-327, gsplat/triton_impl/fused_projection_fwd.py)

On TPU this is embarrassingly parallel element-wise math over [C, N]; XLA fuses
it into a handful of vector kernels, and ``jax.grad`` provides the backward pass
(the reference hand-writes VJPs only because torch kernels demand it). We keep
everything static-shape: culled Gaussians are signalled by ``radii == 0`` masks,
never by compaction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def normalize_quat(quats: jax.Array) -> jax.Array:
    """L2-normalize quaternions [..., 4] (wxyz)."""
    return quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """Quaternion (wxyz, not necessarily normalized) -> rotation matrix [..., 3, 3]."""
    quats = normalize_quat(quats)
    w, x, y, z = jnp.moveaxis(quats, -1, 0)
    R = jnp.stack(
        [
            1 - 2 * (y**2 + z**2),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x**2 + z**2),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x**2 + y**2),
        ],
        axis=-1,
    )
    return R.reshape(quats.shape[:-1] + (3, 3))


def quat_scale_to_covar_preci(
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    compute_covar: bool = True,
    compute_preci: bool = True,
    triu: bool = False,
) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
    """Covariance RSS^TR^T and/or precision from quaternion + scale.

    Parity: gsplat.cuda._wrapper.quat_scale_to_covar_preci
    (reference oracle gsplat/cuda/_torch_impl.py:41-68).
    """
    R = quat_to_rotmat(quats)

    def _outer(M):
        out = M @ jnp.swapaxes(M, -1, -2)
        if triu:
            flat = out.reshape(out.shape[:-2] + (9,))
            out = (flat[..., jnp.array([0, 1, 2, 4, 5, 8])]
                   + flat[..., jnp.array([0, 3, 6, 4, 7, 8])]) / 2.0
        return out

    covars = _outer(R * scales[..., None, :]) if compute_covar else None
    precis = _outer(R * (1.0 / scales[..., None, :])) if compute_preci else None
    return covars, precis


def world_to_cam(
    means: jax.Array,  # [N, 3]
    covars: jax.Array,  # [N, 3, 3]
    viewmats: jax.Array,  # [C, 4, 4]
) -> Tuple[jax.Array, jax.Array]:
    """World-frame Gaussians -> camera frame for each of C cameras.

    Parity: gsplat/cuda/_torch_impl.py:225-247.
    """
    R = viewmats[:, :3, :3]  # [C, 3, 3]
    t = viewmats[:, :3, 3]  # [C, 3]
    means_c = jnp.einsum("cij,nj->cni", R, means) + t[:, None, :]
    covars_c = jnp.einsum("cij,njk,clk->cnil", R, covars, R)
    return means_c, covars_c


def persp_proj(
    means: jax.Array,  # [C, N, 3] camera-frame
    covars: jax.Array,  # [C, N, 3, 3]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
) -> Tuple[jax.Array, jax.Array]:
    """Pinhole EWA projection with +-30% frustum-margin clamping of the Jacobian.

    Parity: gsplat/cuda/_torch_impl.py:71-120.
    """
    tx, ty, tz = means[..., 0], means[..., 1], means[..., 2]
    tz = jnp.where(tz == 0.0, 1e-8, tz)  # guard, culled later anyway
    tz2 = tz * tz

    fx = Ks[..., 0, 0, None]
    fy = Ks[..., 1, 1, None]
    cx = Ks[..., 0, 2, None]
    cy = Ks[..., 1, 2, None]
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy

    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy
    txc = tz * jnp.clip(tx / tz, -lim_x_neg, lim_x_pos)
    tyc = tz * jnp.clip(ty / tz, -lim_y_neg, lim_y_pos)

    O = jnp.zeros_like(tx)
    J = jnp.stack(
        [fx / tz, O, -fx * txc / tz2, O, fy / tz, -fy * tyc / tz2], axis=-1
    ).reshape(means.shape[:-1] + (2, 3))

    cov2d = jnp.einsum("...ij,...jk,...lk->...il", J, covars, J)
    means2d = jnp.einsum("cij,cnj->cni", Ks[:, :2, :3], means) / tz[..., None]
    return means2d, cov2d


def ortho_proj(
    means: jax.Array, covars: jax.Array, Ks: jax.Array, width: int, height: int
) -> Tuple[jax.Array, jax.Array]:
    """Orthographic projection. Parity: gsplat/cuda/_torch_impl.py:188-222."""
    fx = Ks[..., 0, 0, None]
    fy = Ks[..., 1, 1, None]
    O = jnp.zeros_like(jnp.broadcast_to(fx, means.shape[:-1]))
    fxb = jnp.broadcast_to(fx, means.shape[:-1])
    fyb = jnp.broadcast_to(fy, means.shape[:-1])
    J = jnp.stack([fxb, O, O, O, fyb, O], axis=-1).reshape(means.shape[:-1] + (2, 3))
    cov2d = jnp.einsum("...ij,...jk,...lk->...il", J, covars, J)
    f = jnp.stack([Ks[:, 0, 0], Ks[:, 1, 1]], axis=-1)[:, None, :]  # [C,1,2]
    c = jnp.stack([Ks[:, 0, 2], Ks[:, 1, 2]], axis=-1)[:, None, :]
    means2d = means[..., :2] * f + c
    return means2d, cov2d


def fisheye_proj(
    means: jax.Array, covars: jax.Array, Ks: jax.Array, width: int, height: int
) -> Tuple[jax.Array, jax.Array]:
    """Equidistant fisheye projection. Parity: gsplat/cuda/_torch_impl.py:123-185."""
    x, y, z = means[..., 0], means[..., 1], means[..., 2]
    fx = Ks[..., 0, 0, None]
    fy = Ks[..., 1, 1, None]
    cx = Ks[..., 0, 2, None]
    cy = Ks[..., 1, 2, None]

    eps = 0.0000001
    xy_len = jnp.sqrt(x**2 + y**2) + eps
    theta = jnp.arctan2(xy_len, z + eps)
    means2d = jnp.stack(
        [x * fx * theta / xy_len + cx, y * fy * theta / xy_len + cy], axis=-1
    )

    x2 = x * x + eps
    y2 = y * y
    xy = x * y
    x2y2 = x2 + y2
    x2y2z2_inv = 1.0 / (x2y2 + z * z)
    b = jnp.arctan2(xy_len, z) / xy_len / x2y2
    a = z * x2y2z2_inv / x2y2
    J = jnp.stack(
        [
            fx * (x2 * a + y2 * b),
            fx * xy * (a - b),
            -fx * x * x2y2z2_inv,
            fy * xy * (a - b),
            fy * (y2 * a + x2 * b),
            -fy * y * x2y2z2_inv,
        ],
        axis=-1,
    ).reshape(means.shape[:-1] + (2, 3))
    cov2d = jnp.einsum("...ij,...jk,...lk->...il", J, covars, J)
    return means2d, cov2d


_PROJ_FNS = {"pinhole": persp_proj, "ortho": ortho_proj, "fisheye": fisheye_proj}


def fully_fused_projection(
    means: jax.Array,  # [N, 3]
    quats: Optional[jax.Array],  # [N, 4] or None if covars given
    scales: Optional[jax.Array],  # [N, 3]
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
    camera_model: str = "pinhole",
    covars: Optional[jax.Array] = None,  # [N, 3, 3]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """Fused projection: quat/scale -> covar -> cam frame -> 2D EWA -> blur ->
    conic inverse -> radius + frustum cull.

    Returns (radii [C,N] int32, means2d [C,N,2], depths [C,N], conics [C,N,3],
    compensations [C,N] or None). Invalid entries have radii == 0; their other
    outputs are undefined but finite.

    Parity: gsplat/cuda/_torch_impl.py:250-327 and
    gsplat/triton_impl/fused_projection_fwd.py (same math, single fused kernel).
    Dense [C, N] layout only: TPU-native design keeps shapes static and signals
    culled entries via the radii mask (the reference's "packed" COO mode is a
    GPU memory optimization; masks give the same win under XLA without dynamic
    shapes).
    """
    if covars is None:
        covars, _ = quat_scale_to_covar_preci(
            quats, scales, compute_covar=True, compute_preci=False
        )
    means_c, covars_c = world_to_cam(means, covars, viewmats)
    means2d, covars2d = _PROJ_FNS[camera_model](means_c, covars_c, Ks, width, height)

    det_orig = (
        covars2d[..., 0, 0] * covars2d[..., 1, 1]
        - covars2d[..., 0, 1] * covars2d[..., 1, 0]
    )
    c00 = covars2d[..., 0, 0] + eps2d
    c11 = covars2d[..., 1, 1] + eps2d
    c01 = (covars2d[..., 0, 1] + covars2d[..., 1, 0]) / 2.0

    det = jnp.clip(c00 * c11 - c01 * c01, 1e-10, None)

    compensations = None
    if calc_compensations:
        compensations = jnp.sqrt(jnp.clip(det_orig / det, 0.0, None))

    conics = jnp.stack([c11 / det, -c01 / det, c00 / det], axis=-1)  # [C, N, 3]
    depths = means_c[..., 2]

    b = (c00 + c11) / 2.0
    v1 = b + jnp.sqrt(jnp.clip(b * b - det, 0.01, None))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    valid = (det > 0) & (depths > near_plane) & (depths < far_plane)
    inside = (
        (means2d[..., 0] + radius > 0)
        & (means2d[..., 0] - radius < width)
        & (means2d[..., 1] + radius > 0)
        & (means2d[..., 1] - radius < height)
    )
    if radius_clip > 0.0:
        valid = valid & (radius > radius_clip)
    radius = jnp.where(valid & inside, radius, 0.0)
    radii = jax.lax.stop_gradient(radius).astype(jnp.int32)
    return radii, means2d, depths, conics, compensations
