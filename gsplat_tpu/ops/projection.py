"""Gaussian projection math, TPU-native (pure jnp, fully vectorized, autodiff).

Semantics mirror the reference pipeline (see ``/root/reference``):
  - quat/scale -> 3D covariance       (gsplat/cuda/_torch_impl.py:41-68)
  - world -> camera transform          (gsplat/cuda/_torch_impl.py:225-247)
  - pinhole / ortho / fisheye EWA proj (gsplat/cuda/_torch_impl.py:71-222)
  - fused projection with blur (eps2d), conic inverse, radius + frustum cull
    (gsplat/cuda/_torch_impl.py:250-327, gsplat/triton_impl/fused_projection_fwd.py)

**Layout note (the TPU-critical design decision).** The hot path never
materializes [N, 3, 3] or [N, 3] tensors: XLA tiles the two minor dimensions
to (8, 128), so a [N, 3, 3] covariance buffer pads 3 -> 128 lanes — a 57x
memory blowup that OOMs at a few million Gaussians. Instead the fused path
computes in **scalar components**: every intermediate is a [C, N] (or [N])
array (N on the lane axis), and symmetric 3x3 products are expanded
componentwise — the same scalarization the reference's Triton kernels use
(gsplat/triton_impl/util_kernels.py:148-186, quat_scale_to_covar.py:8-64),
arrived at for the same SIMD reason. XLA fuses the whole chain into a few
vector kernels and jax.grad differentiates it.

Matrix-shaped wrappers (`quat_to_rotmat`, `quat_scale_to_covar_preci`,
`world_to_cam`, `persp_proj`, ...) are kept for API parity and tests; they
are fine at test scale but the fused path does not call through them.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def normalize_quat(quats: jax.Array) -> jax.Array:
    """L2-normalize quaternions [..., 4] (wxyz)."""
    return quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)


def _quat_to_rot_components(quats: jax.Array):
    """Normalized quaternion [..., 4] -> 9 rotation components, each [...]."""
    quats = normalize_quat(quats)
    w, x, y, z = jnp.moveaxis(quats, -1, 0)
    return {
        (0, 0): 1 - 2 * (y * y + z * z),
        (0, 1): 2 * (x * y - w * z),
        (0, 2): 2 * (x * z + w * y),
        (1, 0): 2 * (x * y + w * z),
        (1, 1): 1 - 2 * (x * x + z * z),
        (1, 2): 2 * (y * z - w * x),
        (2, 0): 2 * (x * z - w * y),
        (2, 1): 2 * (y * z + w * x),
        (2, 2): 1 - 2 * (x * x + y * y),
    }


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """Quaternion (wxyz, not necessarily normalized) -> rotation matrix [..., 3, 3]."""
    r = _quat_to_rot_components(quats)
    rows = [r[(i, j)] for i in range(3) for j in range(3)]
    return jnp.stack(rows, axis=-1).reshape(quats.shape[:-1] + (3, 3))


_SYM = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]


def _covar_components(quats: jax.Array, scales: jax.Array) -> Dict:
    """Sigma = R diag(s^2) R^T as 6 symmetric components, each [...]."""
    r = _quat_to_rot_components(quats)
    s2 = [scales[..., k] ** 2 for k in range(3)]
    return {
        (i, j): sum(r[(i, k)] * r[(j, k)] * s2[k] for k in range(3))
        for (i, j) in _SYM
    }


def _sym_get(c: Dict, i: int, j: int):
    return c[(i, j)] if i <= j else c[(j, i)]


def quat_scale_to_covar_preci(
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    compute_covar: bool = True,
    compute_preci: bool = True,
    triu: bool = False,
) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
    """Covariance RSS^TR^T and/or precision from quaternion + scale.

    Parity: gsplat.cuda._wrapper.quat_scale_to_covar_preci
    (reference oracle gsplat/cuda/_torch_impl.py:41-68). Matrix-shaped API
    for tests/tools; the fused projection uses the component path.
    """

    def _build(s_pow):
        r = _quat_to_rot_components(quats)
        sp = [scales[..., k] ** s_pow for k in range(3)]
        comps = {
            (i, j): sum(r[(i, k)] * r[(j, k)] * sp[k] ** 2 for k in range(3))
            for (i, j) in _SYM
        }
        if triu:
            return jnp.stack([comps[ij] for ij in _SYM], axis=-1)
        rows = [_sym_get(comps, i, j) for i in range(3) for j in range(3)]
        return jnp.stack(rows, axis=-1).reshape(quats.shape[:-1] + (3, 3))

    covars = _build(1.0) if compute_covar else None
    precis = _build(-1.0) if compute_preci else None
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


def _world_to_cam_components(mx, my, mz, cov: Dict, viewmats: jax.Array):
    """Transform means + symmetric covariance into each camera frame.

    mx/my/mz: [N]; cov: 6 components [N]; viewmats [C, 4, 4].
    Returns (mc = 3 x [C, N], cc = 6 components [C, N]).
    """
    w = {
        (i, j): viewmats[:, i, j][:, None] for i in range(3) for j in range(3)
    }  # each [C, 1]
    t = [viewmats[:, i, 3][:, None] for i in range(3)]
    m = [mx[None, :], my[None, :], mz[None, :]]
    mc = [sum(w[(i, j)] * m[j] for j in range(3)) + t[i] for i in range(3)]
    # tmp[i][k] = sum_l w_il * cov_lk ; cc_ij = sum_k tmp[i][k] * w_jk
    tmp = [
        [sum(w[(i, l)] * _sym_get(cov, l, k)[None, :] for l in range(3)) for k in range(3)]
        for i in range(3)
    ]
    cc = {
        (i, j): sum(tmp[i][k] * w[(j, k)] for k in range(3)) for (i, j) in _SYM
    }
    return mc, cc


def _persp_components(mc, cc, Ks, width, height):
    """Pinhole EWA: camera-frame (means, covar comps) -> 2D mean + 2x2 covar.

    Parity: gsplat/cuda/_torch_impl.py:71-120 (incl. the +-30% frustum-margin
    Jacobian clamp). All arrays [C, N].
    """
    tx, ty, tz = mc
    tz = jnp.where(tz == 0.0, 1e-8, tz)
    tz2 = tz * tz

    fx = Ks[:, 0, 0][:, None]
    fy = Ks[:, 1, 1][:, None]
    cx = Ks[:, 0, 2][:, None]
    cy = Ks[:, 1, 2][:, None]
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy

    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy
    txc = tz * jnp.clip(tx / tz, -lim_x_neg, lim_x_pos)
    tyc = tz * jnp.clip(ty / tz, -lim_y_neg, lim_y_pos)

    # J rows: (j00, 0, j02), (0, j11, j12)
    j00 = fx / tz
    j02 = -fx * txc / tz2
    j11 = fy / tz
    j12 = -fy * tyc / tz2

    c00, c01, c02 = cc[(0, 0)], cc[(0, 1)], cc[(0, 2)]
    c11, c12, c22 = cc[(1, 1)], cc[(1, 2)], cc[(2, 2)]
    cov00 = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    cov01 = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    cov11 = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    mean_x = fx * tx / tz + cx
    mean_y = fy * ty / tz + cy
    return mean_x, mean_y, cov00, cov01, cov11


def _ortho_components(mc, cc, Ks, width, height):
    """Orthographic. Parity: gsplat/cuda/_torch_impl.py:188-222."""
    tx, ty, _ = mc
    fx = Ks[:, 0, 0][:, None]
    fy = Ks[:, 1, 1][:, None]
    cx = Ks[:, 0, 2][:, None]
    cy = Ks[:, 1, 2][:, None]
    cov00 = fx * fx * cc[(0, 0)]
    cov01 = fx * fy * cc[(0, 1)]
    cov11 = fy * fy * cc[(1, 1)]
    return tx * fx + cx, ty * fy + cy, cov00, cov01, cov11


def _fisheye_components(mc, cc, Ks, width, height):
    """Equidistant fisheye. Parity: gsplat/cuda/_torch_impl.py:123-185."""
    x, y, z = mc
    fx = Ks[:, 0, 0][:, None]
    fy = Ks[:, 1, 1][:, None]
    cx = Ks[:, 0, 2][:, None]
    cy = Ks[:, 1, 2][:, None]

    eps = 0.0000001
    xy_len = jnp.sqrt(x * x + y * y) + eps
    theta = jnp.arctan2(xy_len, z + eps)
    mean_x = x * fx * theta / xy_len + cx
    mean_y = y * fy * theta / xy_len + cy

    x2 = x * x + eps
    y2 = y * y
    xy = x * y
    x2y2 = x2 + y2
    x2y2z2_inv = 1.0 / (x2y2 + z * z)
    b = jnp.arctan2(xy_len, z) / xy_len / x2y2
    a = z * x2y2z2_inv / x2y2
    j00 = fx * (x2 * a + y2 * b)
    j01 = fx * xy * (a - b)
    j02 = -fx * x * x2y2z2_inv
    j10 = fy * xy * (a - b)
    j11 = fy * (y2 * a + x2 * b)
    j12 = -fy * y * x2y2z2_inv

    c00, c01, c02 = cc[(0, 0)], cc[(0, 1)], cc[(0, 2)]
    c11, c12, c22 = cc[(1, 1)], cc[(1, 2)], cc[(2, 2)]

    def rowdot(a0, a1, a2, b0, b1, b2):
        # a . Sigma . b for rows a, b of J
        s0 = a0 * c00 + a1 * c01 + a2 * c02
        s1 = a0 * c01 + a1 * c11 + a2 * c12
        s2 = a0 * c02 + a1 * c12 + a2 * c22
        return s0 * b0 + s1 * b1 + s2 * b2

    cov00 = rowdot(j00, j01, j02, j00, j01, j02)
    cov01 = rowdot(j00, j01, j02, j10, j11, j12)
    cov11 = rowdot(j10, j11, j12, j10, j11, j12)
    return mean_x, mean_y, cov00, cov01, cov11


_PROJ_COMPONENT_FNS = {
    "pinhole": _persp_components,
    "ortho": _ortho_components,
    "fisheye": _fisheye_components,
}


def _matrix_proj(fn):
    def wrapped(means, covars, Ks, width, height):
        mc = [means[..., k] for k in range(3)]
        cc = {(i, j): covars[..., i, j] for (i, j) in _SYM}
        mean_x, mean_y, cov00, cov01, cov11 = fn(mc, cc, Ks, width, height)
        means2d = jnp.stack([mean_x, mean_y], axis=-1)
        cov2d = jnp.stack([cov00, cov01, cov01, cov11], axis=-1).reshape(
            means.shape[:-1] + (2, 2)
        )
        return means2d, cov2d

    return wrapped


# Matrix-shaped projection wrappers (API parity with the reference oracle).
persp_proj = _matrix_proj(_persp_components)
ortho_proj = _matrix_proj(_ortho_components)
fisheye_proj = _matrix_proj(_fisheye_components)


def fully_fused_projection_soa(
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
) -> Dict[str, jax.Array]:
    """Fused projection, SoA layout: every output is a [C, N] array.

    Returns dict with radii (int32), mean_x, mean_y, depth, conic_a, conic_b,
    conic_c, and compensation (present iff calc_compensations). Culled
    entries have radii == 0. This is the hot path — see the module docstring
    for why nothing here is [*, 3] or [*, 3, 3] shaped.
    """
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    if covars is not None:
        cov = {(i, j): covars[:, i, j] for (i, j) in _SYM}
    else:
        cov = _covar_components(quats, scales)
    mc, cc = _world_to_cam_components(mx, my, mz, cov, viewmats)
    mean_x, mean_y, cov00, cov01, cov11 = _PROJ_COMPONENT_FNS[camera_model](
        mc, cc, Ks, width, height
    )

    det_orig = cov00 * cov11 - cov01 * cov01
    b00 = cov00 + eps2d
    b11 = cov11 + eps2d
    det = jnp.clip(b00 * b11 - cov01 * cov01, 1e-10, None)

    out: Dict[str, jax.Array] = {}
    if calc_compensations:
        out["compensation"] = jnp.sqrt(jnp.clip(det_orig / det, 0.0, None))

    inv_det = 1.0 / det
    out["conic_a"] = b11 * inv_det
    out["conic_b"] = -cov01 * inv_det
    out["conic_c"] = b00 * inv_det
    depth = mc[2]
    out["depth"] = depth

    b = (b00 + b11) / 2.0
    v1 = b + jnp.sqrt(jnp.clip(b * b - det, 0.01, None))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    valid = (det > 0) & (depth > near_plane) & (depth < far_plane)
    inside = (
        (mean_x + radius > 0)
        & (mean_x - radius < width)
        & (mean_y + radius > 0)
        & (mean_y - radius < height)
    )
    if radius_clip > 0.0:
        valid = valid & (radius > radius_clip)
    radius = jnp.where(valid & inside, radius, 0.0)
    out["radii"] = jax.lax.stop_gradient(radius).astype(jnp.int32)
    out["mean_x"] = mean_x
    out["mean_y"] = mean_y
    return out


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
    """Fused projection with reference-shaped outputs.

    Returns (radii [C,N] int32, means2d [C,N,2], depths [C,N], conics [C,N,3],
    compensations [C,N] or None). Invalid entries have radii == 0.

    Parity: gsplat/cuda/_torch_impl.py:250-327 and
    gsplat/triton_impl/fused_projection_fwd.py (same math, single fused
    kernel). Dense [C, N] layout only: culled entries are signalled by the
    radii mask, never by compaction (the reference's "packed" COO mode is a
    GPU memory optimization; masks give the same win under XLA without
    dynamic shapes).
    """
    soa = fully_fused_projection_soa(
        means, quats, scales, viewmats, Ks, width, height,
        eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
        radius_clip=radius_clip, calc_compensations=calc_compensations,
        camera_model=camera_model, covars=covars,
    )
    means2d = jnp.stack([soa["mean_x"], soa["mean_y"]], axis=-1)
    conics = jnp.stack([soa["conic_a"], soa["conic_b"], soa["conic_c"]], axis=-1)
    return (
        soa["radii"],
        means2d,
        soa["depth"],
        conics,
        soa.get("compensation"),
    )


def fully_fused_projection_packed(
    means: jax.Array,  # [N, 3]
    quats: Optional[jax.Array],  # [N, 4] or None if covars given
    scales: Optional[jax.Array],  # [N, 3]
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    capacity: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
    camera_model: str = "pinhole",
    covars: Optional[jax.Array] = None,  # [N, 3, 3]
) -> Tuple[
    jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array,
    Optional[jax.Array], jax.Array,
]:
    """Packed (COO) fused projection with a static capacity.

    TPU-native analogue of the reference's ``packed=True`` mode
    (gsplat/cuda/_wrapper.py:272-280, csrc/ProjectionEWA3DGSPacked.cu):
    the reference runs a two-pass nnz compaction on GPU and returns
    dynamically-shaped [nnz] COO tensors. Dynamic shapes don't exist under
    XLA, so here the valid (camera, gaussian) pairs are compacted to the
    front of a fixed ``capacity`` buffer with one stable multi-operand
    ``lax.sort`` on the validity key (payload sorts are cheap on TPU —
    PERF.md "lax.sort is CHEAP"); slots past ``nnz`` are padding with
    ``radii == 0`` and ids ``-1``.

    Ordering matches the reference: camera-major, Gaussian-minor (the
    stable sort preserves flat [C*N] order among valid entries), so
    downstream consumers relying on sorted camera_ids (the reference's
    indptr construction) work unchanged.

    Returns ``(camera_ids [cap] i32, gaussian_ids [cap] i32,
    radii [cap] i32, means2d [cap, 2], depths [cap], conics [cap, 3],
    compensations [cap] | None, nnz [] i32)``. If ``nnz > capacity`` the
    highest-flat-index valid entries are dropped — re-run with a larger
    capacity (same growth loop as ``isect_capacity``). The float outputs
    are differentiable w.r.t. means/quats/scales/covars/viewmats (the
    sort-permutation transpose is the inverse permutation; there is no
    ``sparse_grad`` option — JAX cotangents are dense by construction).
    """
    soa = fully_fused_projection_soa(
        means, quats, scales, viewmats, Ks, width, height,
        eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
        radius_clip=radius_clip, calc_compensations=calc_compensations,
        camera_model=camera_model, covars=covars,
    )
    C, N = soa["radii"].shape
    flat = lambda x: x.reshape(C * N)  # noqa: E731
    valid = flat(soa["radii"] > 0)
    key = (~valid).astype(jnp.int32)
    cam_ids = flat(jax.lax.broadcasted_iota(jnp.int32, (C, N), 0))
    gau_ids = flat(jax.lax.broadcasted_iota(jnp.int32, (C, N), 1))
    rows = [
        flat(soa["mean_x"]), flat(soa["mean_y"]), flat(soa["depth"]),
        flat(soa["conic_a"]), flat(soa["conic_b"]), flat(soa["conic_c"]),
    ]
    if calc_compensations:
        rows.append(flat(soa["compensation"]))
    sorted_ops = jax.lax.sort(
        (key, cam_ids, gau_ids, flat(soa["radii"])) + tuple(rows),
        num_keys=1, is_stable=True, dimension=0,
    )
    cap = min(capacity, C * N)
    nnz = jnp.sum(valid.astype(jnp.int32))
    slot_ok = jnp.arange(cap, dtype=jnp.int32) < nnz
    cam_p = jnp.where(slot_ok, sorted_ops[1][:cap], -1)
    gau_p = jnp.where(slot_ok, sorted_ops[2][:cap], -1)
    radii_p = jnp.where(slot_ok, sorted_ops[3][:cap], 0)
    mean_x, mean_y, depth, con_a, con_b, con_c = (
        op[:cap] for op in sorted_ops[4:10]
    )
    means2d = jnp.stack([mean_x, mean_y], axis=-1)
    conics = jnp.stack([con_a, con_b, con_c], axis=-1)
    compensations = sorted_ops[10][:cap] if calc_compensations else None
    return cam_p, gau_p, radii_p, means2d, depth, conics, compensations, nnz


def proj(
    means: jax.Array,  # [C, N, 3] camera-frame
    covars: jax.Array,  # [C, N, 3, 3] camera-frame
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    camera_model: str = "pinhole",
) -> Tuple[jax.Array, jax.Array]:
    """Standalone camera-space -> 2D projection (parity:
    gsplat/cuda/_wrapper.proj, csrc/ProjectionEWASimple.cu). Returns
    (means2d [C,N,2], covars2d [C,N,2,2])."""
    fns = {"pinhole": persp_proj, "ortho": ortho_proj, "fisheye": fisheye_proj}
    return fns[camera_model](means, covars, Ks, width, height)
