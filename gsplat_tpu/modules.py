"""Trainable auxiliary modules (parity: examples/utils.py:12-151).

CameraOptModule (SE3 pose deltas via 6D rotation embeddings) and
AppearanceOptModule (per-image embedding + SH-direction MLP color head) as
pure-functional param dicts + apply functions — the JAX replacement for the
reference's small torch.nn.Modules wrapped in DDP
(examples/simple_trainer.py:380-410; with jit+psum these replicate for free).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.sh import eval_sh_bases


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6D rotation representation (Zhou et al.) -> rotation matrix [..., 3, 3]."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


# --- Camera pose optimization -------------------------------------------


def init_camera_opt(n: int, std: float = 0.0, key=None) -> Dict[str, jax.Array]:
    """Per-image 9D pose-delta embeddings (3 translation + 6D rotation)."""
    if std > 0.0 and key is not None:
        embeds = std * jax.random.normal(key, (n, 9), jnp.float32)
    else:
        embeds = jnp.zeros((n, 9), jnp.float32)
    return {"embeds": embeds}


def apply_camera_opt(
    params: Dict[str, jax.Array],
    camtoworlds: jax.Array,  # [..., 4, 4]
    embed_ids: jax.Array,  # [...]
) -> jax.Array:
    deltas = params["embeds"][embed_ids]  # [..., 9]
    dx, drot = deltas[..., :3], deltas[..., 3:]
    identity = jnp.asarray([1.0, 0, 0, 0, 1.0, 0], jnp.float32)
    rot = rotation_6d_to_matrix(drot + identity)
    transform = jnp.zeros(deltas.shape[:-1] + (4, 4), camtoworlds.dtype)
    transform = transform.at[..., :3, :3].set(rot)
    transform = transform.at[..., :3, 3].set(dx)
    transform = transform.at[..., 3, 3].set(1.0)
    return camtoworlds @ transform


# --- Appearance optimization ---------------------------------------------


def init_appearance_opt(
    n: int,
    feature_dim: int,
    key: jax.Array,
    embed_dim: int = 16,
    sh_degree: int = 3,
    mlp_width: int = 64,
    mlp_depth: int = 2,
) -> Dict[str, jax.Array]:
    """Per-image embedding + MLP color head params (examples/utils.py:51-115)."""
    keys = jax.random.split(key, mlp_depth + 2)
    in_dim = embed_dim + feature_dim + (sh_degree + 1) ** 2
    dims = [in_dim] + [mlp_width] * mlp_depth + [3]
    # every leaf is a float array: the whole dict is differentiable; the
    # static config (embed_dim, sh_degree, depth) is recovered from shapes
    params = {"embeds": jnp.zeros((n, embed_dim), jnp.float32)}
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        lim = float(np.sqrt(1.0 / din))
        params[f"w{i}"] = jax.random.uniform(
            keys[i], (din, dout), jnp.float32, -lim, lim
        )
        params[f"b{i}"] = jnp.zeros((dout,), jnp.float32)
    return params


def apply_appearance_opt(
    params: Dict[str, jax.Array],
    features: jax.Array,  # [N, feature_dim]
    embed_ids: Optional[jax.Array],  # [C]
    dirs: jax.Array,  # [C, N, 3]
    sh_degree: int,
) -> jax.Array:
    """Returns per-(camera, gaussian) color offsets [C, N, 3]."""
    C, N = dirs.shape[:2]
    embed_dim = params["embeds"].shape[1]
    n_layers = sum(1 for k in params if k.startswith("w"))
    feature_dim = features.shape[-1]
    num_bases = params["w0"].shape[0] - embed_dim - feature_dim
    if embed_ids is None:
        embeds = jnp.zeros((C, embed_dim), jnp.float32)
    else:
        embeds = params["embeds"][embed_ids]
    embeds = jnp.broadcast_to(embeds[:, None, :], (C, N, embed_dim))
    feats = jnp.broadcast_to(features[None], (C, N, feature_dim))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    use = min((sh_degree + 1) ** 2, num_bases)
    bases = eval_sh_bases(use, dirs)  # [C, N, use]
    bases = jnp.pad(bases, ((0, 0), (0, 0), (0, num_bases - use)))
    h = (
        jnp.concatenate([embeds, feats, bases], axis=-1)
        if embed_dim > 0
        else jnp.concatenate([feats, bases], axis=-1)
    )
    for i in range(n_layers):
        h = h @ params[f"w{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h


def knn_distances(x: np.ndarray, k: int = 4) -> np.ndarray:
    """Euclidean kNN distances [N, k] (examples/utils.py:141-146)."""
    from sklearn.neighbors import NearestNeighbors

    model = NearestNeighbors(n_neighbors=k, metric="euclidean").fit(x)
    distances, _ = model.kneighbors(x)
    return distances


def rgb_to_sh(rgb):
    C0 = 0.28209479177387814
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    C0 = 0.28209479177387814
    return sh * C0 + 0.5
