"""Library utilities (parity: gsplat/utils.py).

PLY export with NaN filtering (utils.py:10-98), log transforms
(utils.py:129-134), depth->points->normals finite differences
(utils.py:137-224), OpenGL projection matrix (utils.py:227-248). Pure
jnp/numpy — the PLY writer runs on host like the reference's.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def log_transform(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def inverse_log_transform(y: jax.Array) -> jax.Array:
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def depth_to_points(
    depths: jax.Array,  # [..., H, W, 1]
    camtoworlds: jax.Array,  # [..., 4, 4]
    Ks: jax.Array,  # [..., 3, 3]
    z_depth: bool = True,
) -> jax.Array:
    """Depth maps -> world-space 3D points (gsplat/utils.py:137-200)."""
    assert depths.shape[-1] == 1
    height, width = depths.shape[-3:-1]
    x, y = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32),
        jnp.arange(height, dtype=jnp.float32),
        indexing="xy",
    )
    fx = Ks[..., 0, 0][..., None, None]
    fy = Ks[..., 1, 1][..., None, None]
    cx = Ks[..., 0, 2][..., None, None]
    cy = Ks[..., 1, 2][..., None, None]
    dirs = jnp.stack(
        [(x - cx + 0.5) / fx, (y - cy + 0.5) / fy, jnp.ones_like(x + cx)], axis=-1
    )  # [..., H, W, 3]
    directions = jnp.einsum("...ij,...hwj->...hwi", camtoworlds[..., :3, :3], dirs)
    origins = camtoworlds[..., :3, -1]
    if not z_depth:
        directions = directions / jnp.linalg.norm(
            directions, axis=-1, keepdims=True
        ).clip(1e-12)
    return origins[..., None, None, :] + depths * directions


def depth_to_normal(
    depths: jax.Array,
    camtoworlds: jax.Array,
    Ks: jax.Array,
    z_depth: bool = True,
) -> jax.Array:
    """Depth maps -> finite-difference surface normals (utils.py:203-224)."""
    points = depth_to_points(depths, camtoworlds, Ks, z_depth=z_depth)
    dx = points[..., 2:, 1:-1, :] - points[..., :-2, 1:-1, :]
    dy = points[..., 1:-1, 2:, :] - points[..., 1:-1, :-2, :]
    normals = jnp.cross(dx, dy)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True).clip(1e-12)
    pad = [(0, 0)] * (normals.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    return jnp.pad(normals, pad)


def get_projection_matrix(znear, zfar, fovX, fovY) -> jnp.ndarray:
    """OpenGL-style projection matrix (gsplat/utils.py:227-248)."""
    tan_y = math.tan(fovY / 2)
    tan_x = math.tan(fovX / 2)
    top, right = tan_y * znear, tan_x * znear
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return jnp.asarray(P)


def save_ply(
    splats: Dict[str, jax.Array],
    path: str,
    live: Optional[jax.Array] = None,
) -> int:
    """Write splats to a binary PLY (gsplat/utils.py:10-98 format).

    Keys: means [N,3], scales [N,3], quats [N,4], opacities [N],
    sh0 [N,1,3], shN [N,B,3]. `live` filters padded-pool slots. Rows with
    NaN/Inf are dropped like the reference. Returns the point count written.
    """
    data = {k: np.asarray(v) for k, v in splats.items()}
    if live is not None:
        keep = np.asarray(live)
        data = {k: v[keep] for k, v in data.items()}

    means = data["means"]
    scales = data["scales"]
    quats = data["quats"]
    opacities = data["opacities"].reshape(-1)
    n = means.shape[0]
    sh0 = data.get("sh0", np.zeros((n, 1, 3), np.float32))
    shN = data.get("shN", np.zeros((n, 0, 3), np.float32))
    sh0 = sh0.transpose(0, 2, 1).reshape(n, -1)
    shN = shN.transpose(0, 2, 1).reshape(n, -1)

    cols = [means, scales, quats, opacities[:, None], sh0, shN]
    invalid = np.zeros(n, bool)
    for c in cols:
        invalid |= ~np.isfinite(c).all(axis=1)
    keep = ~invalid
    means, scales, quats, opacities = means[keep], scales[keep], quats[keep], opacities[keep]
    sh0, shN = sh0[keep], shN[keep]
    num = means.shape[0]

    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(sh0.shape[1])]
        + [f"f_rest_{i}" for i in range(shN.shape[1])]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    payload = np.concatenate(
        [
            means,
            np.zeros_like(means),
            sh0,
            shN,
            opacities[:, None],
            scales,
            quats,
        ],
        axis=1,
    ).astype("<f4")

    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {num}\n".encode())
        for p in props:
            f.write(f"property float {p}\n".encode())
        f.write(b"end_header\n")
        f.write(payload.tobytes())
    return num
