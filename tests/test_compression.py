"""PNG compression round trip (parity model: reference tests/test_compression.py:16)."""

import numpy as np

from gsplat_tpu.compression import PngCompression


def test_png_compression_roundtrip(rng, tmp_path):
    n = 1000  # not square: exercises lowest-opacity cropping
    splats = {
        "means": rng.standard_normal((n, 3)).astype(np.float32) * 3,
        "scales": rng.standard_normal((n, 3)).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": rng.standard_normal((n,)).astype(np.float32),
        "sh0": rng.standard_normal((n, 1, 3)).astype(np.float32) * 0.5,
        "shN": rng.standard_normal((n, 15, 3)).astype(np.float32) * 0.1,
        "extra": rng.standard_normal((n, 2)).astype(np.float32),
    }
    comp = PngCompression(use_sort=True)
    d = str(tmp_path / "comp")
    comp.compress(d, dict(splats))
    out = comp.decompress(d)

    side = int(n**0.5)
    kept = side * side
    assert out["means"].shape == (kept, 3)
    assert out["shN"].shape == (kept, 15, 3)
    # quantization error bounded relative to the value range
    for k, tol in [("scales", 0.02), ("quats", 0.02), ("sh0", 0.02)]:
        rng_k = splats[k].max() - splats[k].min()
        # values survive up to ~1/255 of the range (can't match row-to-row
        # without tracking the sort, so compare distributions)
        assert out[k].shape[0] == kept
        assert abs(out[k].mean() - splats[k].mean()) < 0.1 * rng_k
    # means: 16-bit quantization is tight; check the set of positions survives
    assert abs(np.sort(out["means"][:, 0]).mean() - np.sort(splats["means"][:, 0]).mean()) < 0.05
    # npz params pass through exactly (up to crop/sort)
    assert out["extra"].shape == (kept, 2)

    # exact-row check: recompress without sort and with square count
    n2 = side * side
    splats2 = {k: v[:n2] for k, v in splats.items()}
    comp2 = PngCompression(use_sort=False)
    d2 = str(tmp_path / "comp2")
    comp2.compress(d2, dict(splats2))
    out2 = comp2.decompress(d2)
    means_in = np.sign(splats2["means"]) * np.log1p(np.abs(splats2["means"]))
    rng_m = means_in.max(0) - means_in.min(0)
    err = np.abs(out2["means"] - splats2["means"])
    assert err.max() < 0.01 * np.abs(splats2["means"]).max() + 1e-3
    rng_s = splats2["scales"].max(0) - splats2["scales"].min(0)
    assert np.abs(out2["scales"] - splats2["scales"]).max() < (rng_s.max() / 255) * 1.5
