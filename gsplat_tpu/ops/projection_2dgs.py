"""2DGS (surfel) projection: ray-transform matrices, normals, AABB.

Parity: gsplat/cuda/csrc/Projection2DGSFused.cu via the oracle
gsplat/cuda/_torch_impl_2dgs.py:9-76. Same SoA/componentwise design as
ops/projection.py — the per-Gaussian 3x3 ray transform M = (K [RS_c | t])^T
is carried as 9 separate [C, N] arrays so nothing [*, 3, 3]-shaped is ever
materialized (see ops/projection.py docstring for the TPU layout rationale).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import _quat_to_rot_components


def fully_fused_projection_2dgs_soa(
    means: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps: float = 1e-6,
) -> Dict[str, jax.Array]:
    """SoA fused 2DGS projection.

    Returns dict with radii (int32 [C,N]), mean_x, mean_y, depth,
    m00..m22 (the ray transform M, row-major), normal_x/y/z — all [C, N].
    """
    r = _quat_to_rot_components(quats)  # 9 x [N]
    s = [scales[:, k] for k in range(3)]
    # RS_wl[i][k] = R[i,k] * s_k (only columns 0,1 needed + col 2 direction)
    rs = {(i, k): r[(i, k)] * s[k] for i in range(3) for k in range(3)}
    m = [means[:, i] for i in range(3)]

    w = {(i, j): viewmats[:, i, j][:, None] for i in range(3) for j in range(3)}
    t = [viewmats[:, i, 3][:, None] for i in range(3)]
    # camera-frame means [C, N]
    mc = [sum(w[(i, j)] * m[j][None, :] for j in range(3)) + t[i] for i in range(3)]
    # RS_cl columns 0,1: rs_c[i][k] = sum_j w_ij * rs[j][k]
    rs_c = {
        (i, k): sum(w[(i, j)] * rs[(j, k)][None, :] for j in range(3))
        for i in range(3)
        for k in range(3)
    }
    # normal = third column of RS_cl (scaled rotation column; oracle
    # _torch_impl_2dgs.py:34-41 keeps the scale factor)
    nrm = [rs_c[(i, 2)] for i in range(3)]
    cos = -(nrm[0] * mc[0] + nrm[1] * mc[1] + nrm[2] * mc[2])
    flip = jnp.where(cos > 0, 1.0, -1.0)
    nrm = [n * flip for n in nrm]

    # T_cl columns: col0 = RS_cl[:,0], col1 = RS_cl[:,1], col2 = means_c
    # T_sl = K @ T_cl;  M = T_sl^T  =>  M[row k][col i] = T_sl[i][k]
    fx = Ks[:, 0, 0][:, None]
    fy = Ks[:, 1, 1][:, None]
    cx = Ks[:, 0, 2][:, None]
    cy = Ks[:, 1, 2][:, None]

    def col(k):
        if k < 2:
            return [rs_c[(0, k)], rs_c[(1, k)], rs_c[(2, k)]]
        return mc

    M = {}
    for k in range(3):
        c0, c1, c2 = col(k)
        M[(k, 0)] = fx * c0 + cx * c2
        M[(k, 1)] = fy * c1 + cy * c2
        M[(k, 2)] = c2

    # AABB from the dual conic (oracle :50-66): test = (1, 1, -1), summed
    # over M's *rows* (M[..., 2] in the oracle slices the column index,
    # leaving the row axis)
    d = M[(0, 2)] ** 2 + M[(1, 2)] ** 2 - M[(2, 2)] ** 2
    valid = jnp.abs(d) > eps
    dsafe = jnp.where(valid, d, 1.0)
    f = [1.0 / dsafe, 1.0 / dsafe, -1.0 / dsafe]
    mean_x = sum(M[(r, 0)] * M[(r, 2)] * f[r] for r in range(3))
    mean_y = sum(M[(r, 1)] * M[(r, 2)] * f[r] for r in range(3))
    ext_x = jnp.sqrt(
        jnp.clip(mean_x**2 - sum(M[(r, 0)] ** 2 * f[r] for r in range(3)), 0.0, None)
    )
    ext_y = jnp.sqrt(
        jnp.clip(mean_y**2 - sum(M[(r, 1)] ** 2 * f[r] for r in range(3)), 0.0, None)
    )
    radius = jnp.ceil(3.0 * jnp.maximum(ext_x, ext_y))

    depth = mc[2]
    ok = valid & (depth > near_plane) & (depth < far_plane)
    if radius_clip > 0.0:
        ok = ok & (radius > radius_clip)
    inside = (
        (mean_x + radius > 0)
        & (mean_x - radius < width)
        & (mean_y + radius > 0)
        & (mean_y - radius < height)
    )
    radius = jnp.where(ok & inside, radius, 0.0)

    out = {
        "radii": jax.lax.stop_gradient(radius).astype(jnp.int32),
        "mean_x": mean_x,
        "mean_y": mean_y,
        "depth": depth,
        "normal_x": nrm[0],
        "normal_y": nrm[1],
        "normal_z": nrm[2],
    }
    for k in range(3):
        for i in range(3):
            out[f"m{k}{i}"] = M[(k, i)]
    return out


def fully_fused_projection_2dgs_packed(
    means: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    capacity: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
) -> Tuple[
    jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array,
    jax.Array, jax.Array,
]:
    """Packed (COO) fused 2DGS projection with a static capacity.

    TPU-native analogue of the reference's ``packed=True`` surfel mode
    (gsplat/cuda/_wrapper.py:1306-1318, csrc/Projection2DGSPacked.cu):
    the reference compacts valid (camera, gaussian) pairs with a two-pass
    nnz scan into dynamically-shaped [nnz] tensors. Dynamic shapes don't
    exist under XLA, so valid pairs are compacted to the front of a fixed
    ``capacity`` buffer with one stable multi-operand ``lax.sort`` on the
    validity key — the same compaction as the 3DGS
    :func:`~gsplat_tpu.ops.projection.fully_fused_projection_packed`,
    carrying the surfel payload rows (ray-transform M, normals) instead of
    conics. Ordering is camera-major, Gaussian-minor, matching the
    reference's COO layout.

    Returns ``(camera_ids [cap] i32, gaussian_ids [cap] i32,
    radii [cap] i32, means2d [cap, 2], depths [cap],
    ray_transforms [cap, 3, 3], normals [cap, 3], nnz [] i32)``.
    Slots past ``nnz`` are padding with ``radii == 0`` and ids ``-1``; if
    ``nnz > capacity`` the highest-flat-index valid entries are dropped —
    re-run with a larger capacity (the same out-of-jit growth loop as
    ``isect_capacity``). Float outputs are differentiable w.r.t.
    means/quats/scales/viewmats (the sort-permutation transpose is the
    inverse permutation; no ``sparse_grad`` — JAX cotangents are dense).
    """
    soa = fully_fused_projection_2dgs_soa(
        means, quats, scales, viewmats, Ks, width, height,
        near_plane=near_plane, far_plane=far_plane, radius_clip=radius_clip,
    )
    C, N = soa["radii"].shape
    flat = lambda x: x.reshape(C * N)  # noqa: E731
    valid = flat(soa["radii"] > 0)
    key = (~valid).astype(jnp.int32)
    cam_ids = flat(jax.lax.broadcasted_iota(jnp.int32, (C, N), 0))
    gau_ids = flat(jax.lax.broadcasted_iota(jnp.int32, (C, N), 1))
    M_KEYS = [f"m{k}{i}" for k in range(3) for i in range(3)]
    rows = [flat(soa["mean_x"]), flat(soa["mean_y"]), flat(soa["depth"])]
    rows += [flat(soa[k]) for k in M_KEYS]
    rows += [flat(soa[f"normal_{a}"]) for a in ("x", "y", "z")]
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
    payload = [op[:cap] for op in sorted_ops[4:]]
    means2d = jnp.stack(payload[0:2], axis=-1)
    depths = payload[2]
    ray_transforms = jnp.stack(payload[3:12], axis=-1).reshape(cap, 3, 3)
    normals = jnp.stack(payload[12:15], axis=-1)
    return cam_p, gau_p, radii_p, means2d, depths, ray_transforms, normals, nnz


def fully_fused_projection_2dgs(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    viewmats: jax.Array,
    Ks: jax.Array,
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Reference-shaped wrapper: returns (radii [C,N] i32, means2d [C,N,2],
    depths [C,N], ray_transforms M [C,N,3,3], normals [C,N,3]).

    Parity: gsplat/cuda/_wrapper.fully_fused_projection_2dgs (oracle
    _torch_impl_2dgs.py:9-76).
    """
    soa = fully_fused_projection_2dgs_soa(
        means, quats, scales, viewmats, Ks, width, height,
        near_plane=near_plane, far_plane=far_plane, radius_clip=radius_clip,
    )
    means2d = jnp.stack([soa["mean_x"], soa["mean_y"]], axis=-1)
    M = jnp.stack(
        [soa[f"m{k}{i}"] for k in range(3) for i in range(3)], axis=-1
    ).reshape(soa["depth"].shape + (3, 3))
    normals = jnp.stack(
        [soa["normal_x"], soa["normal_y"], soa["normal_z"]], axis=-1
    )
    return soa["radii"], means2d, soa["depth"], M, normals
