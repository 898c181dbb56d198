"""Quantify the PNG-compression sort gap (VERDICT r2 item 9).

Measures total PNG artifact size on the garden-fixture splats for:
  - unsorted
  - morton + serpentine (round-2 baseline layout)
  - + byte-level even-odd refinement (round-2 default)
  - + blur-guided PLAS-objective refinement (round-3, compression/sort.py)
and prints bytes + % vs unsorted. Reference: PLAS proper
(gsplat/compression/sort.py:7-46, external CUDA package, unavailable here).

Usage: python scripts/exp_plas_gap.py [--ckpt path.npz]
"""

import argparse
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsplat_tpu import load_test_data
from gsplat_tpu.compression.png_compression import PngCompression
from gsplat_tpu.compression import sort as sort_mod
from gsplat_tpu.modules import rgb_to_sh


def load_splats(ckpt: str):
    if ckpt:
        blob = np.load(ckpt)
        live = blob["live"]
        splats = {
            k.split("/", 1)[1]: blob[k][live]
            for k in blob.files if k.startswith("splat/")
        }
        return {
            k: splats[k]
            for k in ("means", "scales", "quats", "opacities", "sh0", "shN")
        }
    # fixture has no shN; the K-means shN artifact is codebook-dominated
    # (order-independent modulo the small index image) so the comparison
    # runs on the PNG-coded attributes only
    means, quats, scales, opacities, colors, *_ = load_test_data()
    return dict(
        means=means,
        scales=np.log(np.clip(scales, 1e-7, None)),
        quats=quats,
        opacities=np.log(np.clip(opacities, 1e-6, 1 - 1e-6) /
                         (1 - np.clip(opacities, 1e-6, 1 - 1e-6))),
        sh0=rgb_to_sh(colors)[:, None, :].astype(np.float32),
    )


def compressed_size(splats, sort_fn):
    """Apply sort_fn to a square-cropped copy, compress, return bytes."""
    n = splats["means"].shape[0]
    s = int(n**0.5)
    crop = {k: v[: s * s] for k, v in splats.items()}
    if sort_fn is not None:
        crop = sort_fn(crop, s)
    d = tempfile.mkdtemp()
    try:
        # compress WITHOUT the internal sort (already applied here)
        comp = PngCompression(use_sort=False)
        comp.compress(d, crop)
        return sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        )
    finally:
        shutil.rmtree(d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="", help="trainer ckpt_*.npz (optional)")
    args = ap.parse_args()
    splats = load_splats(args.ckpt)
    n = splats["means"].shape[0]
    print(f"{n} splats ({int(n**0.5)}^2 grid)")

    def serpentine_perm(crop, s):
        means = crop["means"]
        lo, hi = means.min(axis=0), means.max(axis=0)
        q = ((means - lo) / np.maximum(hi - lo, 1e-12) * (2**16 - 1)).astype(
            np.uint32
        )
        order = np.argsort(sort_mod._morton3(q))
        grid_pos = np.arange(s * s).reshape(s, s)
        grid_pos[1::2] = grid_pos[1::2, ::-1].copy()
        P = np.empty((s, s), np.int64)
        P.reshape(-1)[:] = order[grid_pos.reshape(-1)]
        return P

    variants = {
        "unsorted": None,
        "serpentine": lambda c, s: {
            k: v[serpentine_perm(c, s).reshape(-1)] for k, v in c.items()
        },
        "serpentine+evenodd": lambda c, s: sort_mod.sort_splats(
            c, n_sidelen=s, plas=False
        ),
        "serpentine+plas": lambda c, s: {
            k: v[sort_mod.plas_refine(c, serpentine_perm(c, s)).reshape(-1)]
            for k, v in c.items()
        },
        "full (serp+plas+evenodd)": lambda c, s: sort_mod.sort_splats(
            c, n_sidelen=s, plas=True
        ),
    }
    base = None
    for name, fn in variants.items():
        size = compressed_size(splats, fn)
        if base is None:
            base = size
        print(f"{name:28s} {size:>12,} bytes  ({size / base * 100:6.2f}% of unsorted)")


if __name__ == "__main__":
    main()
