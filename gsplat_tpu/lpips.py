"""LPIPS metric (Zhang et al. 2018) in pure jnp.

The reference evaluates LPIPS through torchmetrics
(examples/simple_trainer.py:432-442, net_type 'alex' with normalize=True or
'vgg' with normalize=False). No pretrained weights ship in this offline
image, so this module implements the full architecture and loads weights
from a user-provided file:

  - ``.npz`` with canonical keys ``conv{i}_w``, ``conv{i}_b``, ``lin{i}_w``
    (see :func:`convert_torch_state_dict` for producing one), or
  - a torch checkpoint (``.pt``/``.pth``) holding a
    richzhang/PerceptualSimilarity- or torchmetrics-style state dict —
    converted on the fly via torch-cpu.

When no weights are given the metric is unavailable; the trainer skips it
(the same graceful degradation the reference has when torchmetrics is
missing its download).

Architecture notes: 5 feature taps (after each ReLU stack), per-channel
unit normalization, learned 1x1 "lin" weights, spatial mean, sum over
layers, mean over batch — LPIPS semantics, matching torchmetrics'
``LearnedPerceptualImagePatchSimilarity``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# published LPIPS input scaling constants (richzhang/PerceptualSimilarity)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (out_ch, kernel, stride, pad) per conv; taps = indices after whose ReLU a
# feature is taken; pools = conv indices preceded by 3x3/2 max-pool (alex)
# or 2x2/2 max-pool (vgg)
_ALEX = dict(
    convs=[(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
           (256, 3, 1, 1), (256, 3, 1, 1)],
    pools_before=[1, 2],  # max-pool 3x3 stride 2 before convs 1 and 2
    pool_size=3,
    taps=[0, 1, 2, 3, 4],
)
_VGG = dict(
    convs=[(64, 3, 1, 1), (64, 3, 1, 1),
           (128, 3, 1, 1), (128, 3, 1, 1),
           (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1),
           (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1),
           (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1)],
    pools_before=[2, 4, 7, 10],
    pool_size=2,
    taps=[1, 3, 6, 9, 12],
)


def _net_cfg(net_type: str):
    if net_type == "alex":
        return _ALEX
    if net_type == "vgg":
        return _VGG
    raise ValueError(f"Unknown LPIPS net_type: {net_type}")


def init_random_params(net_type: str = "alex", seed: int = 0) -> Dict:
    """Random-weight parameter pytree (for tests / architecture checks)."""
    cfg = _net_cfg(net_type)
    rng = np.random.default_rng(seed)
    params: Dict = {"convs": [], "lins": []}
    cin = 3
    for i, (cout, k, s, p) in enumerate(cfg["convs"]):
        w = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.05
        b = np.zeros((cout,), np.float32)
        params["convs"].append((jnp.asarray(w), jnp.asarray(b)))
        cin = cout
    for t in cfg["taps"]:
        cout = cfg["convs"][t][0]
        w = np.abs(rng.standard_normal((1, cout, 1, 1))).astype(np.float32)
        params["lins"].append(jnp.asarray(w))
    return params


def _features(params, x, cfg):
    """x: [B, 3, H, W] already shifted/scaled. Returns tap features."""
    pool = cfg["pool_size"]
    feats = []
    h = x
    for i, (w, b) in enumerate(params["convs"]):
        if i in cfg["pools_before"]:
            h = -jax.lax.reduce_window(
                -h, jnp.inf, jax.lax.min,
                (1, 1, pool, pool), (1, 1, 2, 2), "VALID",
            )
        k, s, p = cfg["convs"][i][1], cfg["convs"][i][2], cfg["convs"][i][3]
        h = jax.lax.conv_general_dilated(
            h, w, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        h = jax.nn.relu(h)
        if i in cfg["taps"]:
            feats.append(h)
    return feats


def lpips(
    params: Dict,
    img0: jax.Array,  # [B, H, W, 3]
    img1: jax.Array,  # [B, H, W, 3]
    net_type: str = "alex",
    normalize: bool = True,
) -> jax.Array:
    """LPIPS distance, mean over the batch (torchmetrics semantics)."""
    cfg = _net_cfg(net_type)
    if normalize:  # [0, 1] -> [-1, 1]
        img0 = img0 * 2.0 - 1.0
        img1 = img1 * 2.0 - 1.0
    shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)

    def prep(x):
        x = jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
        return (x - shift) / scale

    f0 = _features(params, prep(img0), cfg)
    f1 = _features(params, prep(img1), cfg)
    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2  # [B, C, H, W]
        # learned 1x1 conv == channel-weighted sum; then spatial mean
        wd = jnp.sum(d * lin[0, :, 0, 0][None, :, None, None], axis=1)
        total = total + jnp.mean(wd, axis=(1, 2))
    return jnp.mean(total)


def convert_torch_state_dict(sd, net_type: str = "alex") -> Dict:
    """Map a richzhang / torchmetrics LPIPS state dict to our pytree.

    Accepts key styles ``net.slice{k}.{i}.weight`` (torchmetrics/richzhang)
    or ``net.features.{i}.weight`` and ``lin{k}.model.1.weight`` /
    ``lins.{k}.model.1.weight``.
    """
    cfg = _net_cfg(net_type)
    keys = {k: v for k, v in sd.items()}

    def find(*patterns):
        for k in keys:
            for p in patterns:
                if k.endswith(p):
                    return k
        return None

    params: Dict = {"convs": [], "lins": []}
    # conv weights appear in layer order in both torchvision (.features.N)
    # and slice-style dicts; collect (weight, bias) pairs in order
    conv_ws = [
        (k, keys[k]) for k in keys
        if k.endswith(".weight") and getattr(keys[k], "ndim", 0) == 4
        and "lin" not in k
    ]

    def order_key(kv):
        parts = [int(s) for s in kv[0].replace(".", " ").split() if s.isdigit()]
        return parts

    conv_ws.sort(key=order_key)
    conv_bs = {}
    for k in keys:
        if k.endswith(".bias"):
            conv_bs[k[: -len(".bias")]] = keys[k]
    if len(conv_ws) != len(cfg["convs"]):
        raise ValueError(
            f"state dict has {len(conv_ws)} convs, expected {len(cfg['convs'])}"
        )
    for k, w in conv_ws:
        b = conv_bs.get(k[: -len(".weight")])
        w = np.asarray(w, np.float32)
        b = (
            np.asarray(b, np.float32)
            if b is not None
            else np.zeros((w.shape[0],), np.float32)
        )
        params["convs"].append((jnp.asarray(w), jnp.asarray(b)))
    lin_ws = [
        (k, keys[k]) for k in keys
        if "lin" in k and k.endswith("weight")
        and getattr(keys[k], "ndim", 0) == 4
    ]
    lin_ws.sort(key=order_key)
    if len(lin_ws) != len(cfg["taps"]):
        raise ValueError(
            f"state dict has {len(lin_ws)} lin layers, expected {len(cfg['taps'])}"
        )
    for _, w in lin_ws:
        params["lins"].append(jnp.asarray(np.asarray(w, np.float32)))
    return params


def load_lpips_params(path: str, net_type: str = "alex") -> Optional[Dict]:
    """Load LPIPS weights from .npz (canonical keys) or a torch checkpoint.
    Returns None if the file doesn't exist."""
    if not path or not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        data = np.load(path)
        cfg = _net_cfg(net_type)
        params: Dict = {"convs": [], "lins": []}
        for i in range(len(cfg["convs"])):
            params["convs"].append(
                (jnp.asarray(data[f"conv{i}_w"]), jnp.asarray(data[f"conv{i}_b"]))
            )
        for i in range(len(cfg["taps"])):
            params["lins"].append(jnp.asarray(data[f"lin{i}_w"]))
        return params
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torch_state_dict(sd, net_type)
