"""Spatial coherence sort before grid compression.

The reference uses the PLAS 2-D self-organizing sort
(gsplat/compression/sort.py:7-46, external `plas` package) to lay splats out
on a smooth 2-D grid so the PNG codec compresses better. PLAS is an
iterative GPU solver; here we use a Morton-order (Z-curve) sort of the
normalized positions — a one-pass approximation that captures most of the
spatial-coherence win with numpy only.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _morton3(x: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave 3 x `bits`-bit integer coordinates into Morton codes."""
    codes = np.zeros(x.shape[0], np.uint64)
    for b in range(bits):
        for d in range(3):
            codes |= ((x[:, d].astype(np.uint64) >> b) & 1) << np.uint64(
                3 * b + d
            )
    return codes


def sort_splats(splats: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reorder splats along a Z-curve of their (log-transformed) positions."""
    means = splats["means"]
    lo = means.min(axis=0)
    hi = means.max(axis=0)
    q = ((means - lo) / np.maximum(hi - lo, 1e-12) * (2**16 - 1)).astype(
        np.uint32
    )
    order = np.argsort(_morton3(q))
    return {k: v[order] for k, v in splats.items()}
