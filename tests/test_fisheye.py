"""Fisheye (OPENCV_FISHEYE) data path: loader remap + validity mask +
trainer smoke with camera_model="fisheye".

Parity target: the reference's fisheye support —
examples/datasets/colmap.py:281-317 (theta-polynomial remap into the ideal
equidistant frame + validity mask cropped to its bbox) and
examples/simple_trainer.py:505-506 (render_colors zeroed where ~mask).
Projection-level fisheye math is covered separately in test_projection.py
against the reference torch oracle; this file covers the dataset loader and
the end-to-end trainer wiring.
"""

import importlib.util
import os
import struct
import sys

import numpy as np
import pytest

_EX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
sys.path.insert(0, _EX)

FISH_K = (0.08, 0.015, 0.0, 0.0)  # k1..k4 theta-polynomial coefficients


def _load_trainer():
    spec = importlib.util.spec_from_file_location(
        "simple_trainer", os.path.join(_EX, "simple_trainer.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["simple_trainer"] = mod
    spec.loader.exec_module(mod)
    return mod


def _fisheye_colmap(out, rng, n_pts=300, n_cams=6, W=64, H=48):
    """Tiny OPENCV_FISHEYE COLMAP scene (model id 5, 8 params)."""
    os.makedirs(os.path.join(out, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    pts = rng.standard_normal((n_pts, 3)).astype(np.float32) * 0.5
    cols = rng.random((n_pts, 3)).astype(np.float32)
    f = 0.55 * W  # short focal => distortion reaches the frame corners

    sp = os.path.join(out, "sparse", "0")
    with open(os.path.join(sp, "cameras.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", 1))
        fo.write(struct.pack("<iiQQ", 1, 5, W, H))  # OPENCV_FISHEYE
        fo.write(struct.pack("<8d", f, f, W / 2, H / 2, *FISH_K))

    from PIL import Image

    with open(os.path.join(sp, "images.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            th = 2 * np.pi * i / n_cams
            q = np.array([1.0, 0, 0, 0])
            t = np.array([0.3 * np.cos(th), 0.3 * np.sin(th), 3.0])
            fo.write(struct.pack("<i", i + 1))
            fo.write(struct.pack("<7d", *q, *t))
            fo.write(struct.pack("<i", 1))
            name = f"v{i:02d}.png"
            fo.write(name.encode() + b"\x00")
            fo.write(struct.pack("<Q", 0))
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(out, "images", name))

    with open(os.path.join(sp, "points3D.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", n_pts))
        for j in range(n_pts):
            r, g, b = (cols[j] * 255).astype(np.uint8)
            fo.write(struct.pack(
                "<QdddBBBd", j + 1, *pts[j].astype(np.float64), r, g, b, 0.5))
            fo.write(struct.pack("<Q", 0))


def test_parser_fisheye_mask_and_remap(tmp_path, rng):
    from gsplat_tpu.datasets.colmap import Dataset, Parser

    data_dir = str(tmp_path / "scene")
    _fisheye_colmap(data_dir, rng)
    parser = Parser(data_dir, factor=1, test_every=5)

    cam_id = parser.camera_ids[0]
    w, h = parser.imsize_dict[cam_id]
    mask = parser.mask_dict[cam_id]
    assert mask is not None and mask.dtype == bool
    # mask is cropped to its own bounding box => touches every edge
    assert mask.shape == (h, w)
    assert mask[:, 0].any() and mask[:, -1].any()
    assert mask[0, :].any() and mask[-1, :].any()
    # pincushion (k>0) pushes samples outward: some corner pixels of the
    # ideal frame fall outside the capture => mask must not be all-True
    assert not mask.all()

    # principal point was shifted by the crop offset, K stays finite
    K = parser.Ks_dict[cam_id]
    assert np.all(np.isfinite(K)) and K[0, 0] > 0

    # Dataset items carry the mask and a matching remapped image
    ds = Dataset(parser, split="train")
    item = ds[0]
    assert "mask" in item and item["mask"].shape == item["image"].shape[:2]
    assert item["image"].shape == (h, w, 3)


def test_fisheye_forward_map_matches_reference_polynomial(tmp_path, rng):
    """The loader's remap grid IS the reference's theta-polynomial
    (examples/datasets/colmap.py:299-305): mapx = fx*x1*r(theta) + W//2 on
    the tan-normalized grid. Rebuild it independently and compare."""
    from gsplat_tpu.datasets.colmap import Parser

    data_dir = str(tmp_path / "scene")
    _fisheye_colmap(data_dir, rng)
    parser = Parser(data_dir, factor=1, test_every=5)
    cam_id = parser.camera_ids[0]
    mapx, mapy = parser._mapx[cam_id], parser._mapy[cam_id]

    W, H, f = 64, 48, 0.55 * 64
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64), indexing="xy")
    x1, y1 = (gx - W / 2) / f, (gy - H / 2) / f
    theta2 = x1**2 + y1**2
    k1, k2, k3, k4 = FISH_K
    r = 1 + k1 * theta2 + k2 * theta2**2 + k3 * theta2**3 + k4 * theta2**4
    np.testing.assert_allclose(mapx, (f * x1 * r + W // 2), atol=1e-3)
    np.testing.assert_allclose(mapy, (f * y1 * r + H // 2), atol=1e-3)


def test_trainer_fisheye_smoke(tmp_path, rng):
    """4 train steps with camera_model=fisheye: masked loss, finite eval."""
    mod = _load_trainer()
    data_dir = str(tmp_path / "scene")
    _fisheye_colmap(data_dir, rng)

    cfg = mod.Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=str(tmp_path / "out"),
        max_steps=4,
        eval_steps=[4],
        save_steps=[],
        refine_start_iter=2,
        refine_every=2,
        sh_degree_interval=100,
        test_every=5,
        pool_headroom=1.5,
        camera_model="fisheye",
    )
    runner = mod.Runner(cfg)
    assert runner._has_pix_masks
    runner.train()
    stats = runner.eval(4)
    assert np.isfinite(stats["psnr"])
    for v in runner.params.values():
        assert np.all(np.isfinite(np.asarray(v)))
