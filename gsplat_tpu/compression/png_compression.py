"""PNG/K-means checkpoint compression (parity: gsplat/compression/png_compression.py).

Same artifact format as the reference: means as two 8-bit PNGs (low/high
bytes of 16-bit quantization after a log transform), scales/quats/opacities/
sh0 as 8-bit min-max-quantized PNGs, shN as a K-means codebook + labels,
everything else as npz; meta.json records shapes/ranges for the round trip
(png_compression.py:47-132). Square-grid crop drops the lowest-opacity
splats (:87-94). numpy + PIL only; K-means via scikit-learn instead of
torchpq; spatial sort is a Morton-order approximation of PLAS (see sort.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Callable, Dict

import numpy as np

from ..utils import inverse_log_transform, log_transform
from .sort import sort_splats


def _imwrite(path: str, arr: np.ndarray):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _imread(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def _compress_png(compress_dir, name, params, n_sidelen, **kw):
    if params.size == 0:
        return {"shape": list(params.shape), "dtype": str(params.dtype)}
    grid = params.reshape(n_sidelen, n_sidelen, -1)
    mins = grid.min(axis=(0, 1))
    maxs = grid.max(axis=(0, 1))
    norm = (grid - mins) / np.maximum(maxs - mins, 1e-12)
    img = (norm * 255).round().astype(np.uint8).squeeze()
    _imwrite(os.path.join(compress_dir, f"{name}.png"), img)
    return {
        "shape": list(params.shape),
        "dtype": str(params.dtype),
        "mins": mins.tolist(),
        "maxs": maxs.tolist(),
    }


def _decompress_png(compress_dir, name, meta):
    if not np.all(meta["shape"]):
        return np.zeros(meta["shape"], meta["dtype"])
    img = _imread(os.path.join(compress_dir, f"{name}.png")).astype(np.float32)
    norm = img / 255.0
    mins = np.asarray(meta["mins"], np.float32)
    maxs = np.asarray(meta["maxs"], np.float32)
    grid = norm.reshape(norm.shape[0], norm.shape[1], -1) * (maxs - mins) + mins
    return grid.reshape(meta["shape"]).astype(meta["dtype"])


def _compress_png_16bit(compress_dir, name, params, n_sidelen, **kw):
    if params.size == 0:
        return {"shape": list(params.shape), "dtype": str(params.dtype)}
    grid = params.reshape(n_sidelen, n_sidelen, -1)
    mins = grid.min(axis=(0, 1))
    maxs = grid.max(axis=(0, 1))
    norm = (grid - mins) / np.maximum(maxs - mins, 1e-12)
    img = (norm * (2**16 - 1)).round().astype(np.uint16)
    _imwrite(
        os.path.join(compress_dir, f"{name}_l.png"), (img & 0xFF).astype(np.uint8)
    )
    _imwrite(
        os.path.join(compress_dir, f"{name}_u.png"),
        ((img >> 8) & 0xFF).astype(np.uint8),
    )
    return {
        "shape": list(params.shape),
        "dtype": str(params.dtype),
        "mins": mins.tolist(),
        "maxs": maxs.tolist(),
    }


def _decompress_png_16bit(compress_dir, name, meta):
    if not np.all(meta["shape"]):
        return np.zeros(meta["shape"], meta["dtype"])
    img_l = _imread(os.path.join(compress_dir, f"{name}_l.png"))
    img_u = _imread(os.path.join(compress_dir, f"{name}_u.png")).astype(np.uint16)
    img = ((img_u << 8) + img_l).astype(np.float32) / (2**16 - 1)
    mins = np.asarray(meta["mins"], np.float32)
    maxs = np.asarray(meta["maxs"], np.float32)
    grid = img.reshape(img.shape[0], img.shape[1], -1) * (maxs - mins) + mins
    return grid.reshape(meta["shape"]).astype(meta["dtype"])


def _compress_kmeans(
    compress_dir, name, params, n_sidelen, n_clusters=65536, verbose=False, **kw
):
    if params.size == 0:
        return {"shape": list(params.shape), "dtype": str(params.dtype)}
    from sklearn.cluster import MiniBatchKMeans

    flat = params.reshape(params.shape[0], -1).astype(np.float32)
    k = int(min(n_clusters, flat.shape[0]))
    km = MiniBatchKMeans(
        n_clusters=k, batch_size=4096, n_init=1, max_iter=20, random_state=0
    ).fit(flat)
    centroids = km.cluster_centers_.astype(np.float16)
    labels = km.labels_.astype(np.uint32 if k > 65535 else np.uint16)
    np.savez_compressed(
        os.path.join(compress_dir, f"{name}.npz"),
        centroids=centroids,
        labels=labels,
    )
    return {
        "shape": list(params.shape),
        "dtype": str(params.dtype),
        "n_clusters": k,
    }


def _decompress_kmeans(compress_dir, name, meta):
    if not np.all(meta["shape"]):
        return np.zeros(meta["shape"], meta["dtype"])
    data = np.load(os.path.join(compress_dir, f"{name}.npz"))
    out = data["centroids"][data["labels"]].astype(meta["dtype"])
    return out.reshape(meta["shape"])


def _compress_npz(compress_dir, name, params, **kw):
    np.savez_compressed(os.path.join(compress_dir, f"{name}.npz"), arr=params)
    return {"shape": list(params.shape), "dtype": str(params.dtype)}


def _decompress_npz(compress_dir, name, meta):
    return np.load(os.path.join(compress_dir, f"{name}.npz"))["arr"].astype(
        meta["dtype"]
    )


@dataclass
class PngCompression:
    """Quantize + sort + PNG-compress splats; K-means for SH rest bands."""

    use_sort: bool = True
    # opt-in blur-guided pair-swap refinement after the serpentine sort
    # (compression/sort.py::plas_refine; measured study in
    # scripts/exp_plas_gap.py — serpentine alone is the default)
    plas: bool = False
    verbose: bool = False

    _compress_map = {
        "means": _compress_png_16bit,
        "scales": _compress_png,
        "quats": _compress_png,
        "opacities": _compress_png,
        "sh0": _compress_png,
        "shN": _compress_kmeans,
    }
    _decompress_map = {
        "means": _decompress_png_16bit,
        "scales": _decompress_png,
        "quats": _decompress_png,
        "opacities": _decompress_png,
        "sh0": _decompress_png,
        "shN": _decompress_kmeans,
    }

    def compress(self, compress_dir: str, splats: Dict[str, Any]) -> None:
        os.makedirs(compress_dir, exist_ok=True)
        splats = {k: np.asarray(v) for k, v in splats.items()}
        splats["means"] = np.asarray(log_transform(splats["means"]))
        q = splats["quats"]
        splats["quats"] = q / np.maximum(
            np.linalg.norm(q, axis=-1, keepdims=True), 1e-12
        )

        n_gs = splats["means"].shape[0]
        n_sidelen = int(n_gs**0.5)
        n_crop = n_gs - n_sidelen**2
        if n_crop != 0:
            keep = np.argsort(splats["opacities"].reshape(-1))[n_crop:]
            splats = {k: v[keep] for k, v in splats.items()}
        if self.use_sort:
            splats = sort_splats(splats, n_sidelen=n_sidelen, plas=self.plas)

        meta = {}
        for name, value in splats.items():
            fn: Callable = self._compress_map.get(name, _compress_npz)
            meta[name] = fn(
                compress_dir, name, value, n_sidelen=n_sidelen,
                verbose=self.verbose,
            )
        with open(os.path.join(compress_dir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def decompress(self, compress_dir: str) -> Dict[str, np.ndarray]:
        with open(os.path.join(compress_dir, "meta.json")) as f:
            meta = json.load(f)
        splats = {}
        for name, m in meta.items():
            fn = self._decompress_map.get(name, _decompress_npz)
            splats[name] = fn(compress_dir, name, m)
        splats["means"] = np.asarray(
            inverse_log_transform(splats["means"].astype(np.float32))
        )
        return splats
