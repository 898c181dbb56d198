"""Native C++ COLMAP reader vs the pure-Python parser (bit-level parity).

The native reader (csrc/colmap_native.cpp via ctypes) plays the role
pycolmap plays for the reference — a compiled model parser. The Python
reader is the oracle.
"""

import os

import numpy as np
import pytest

from gsplat_tpu.datasets import colmap_io, colmap_native


@pytest.fixture(scope="module")
def sparse_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    import subprocess, sys

    out = tmp_path_factory.mktemp("scene")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "make_synth_dataset.py"),
         "--out", str(out), "--n-cams", "6", "--width", "64", "--height", "48",
         # --cpu: don't let the subprocess touch the TPU tunnel (the test
         # suite runs on the forced CPU mesh; the env var JAX_PLATFORMS is
         # ignored by the axon plugin, so the flag is the only way)
         "--cpu"],
        check=True, capture_output=True, timeout=600,
    )
    return os.path.join(str(out), "sparse", "0")


def test_native_reader_matches_python(sparse_dir):
    if not colmap_native.available():
        pytest.skip("no C++ toolchain")
    cams_n = colmap_native.read_cameras_bin(
        os.path.join(sparse_dir, "cameras.bin"))
    cams_p = colmap_io.read_cameras_bin(
        os.path.join(sparse_dir, "cameras.bin"))
    assert cams_n.keys() == cams_p.keys()
    for k in cams_p:
        a, b = cams_n[k], cams_p[k]
        assert (a.model, a.width, a.height) == (b.model, b.width, b.height)
        np.testing.assert_array_equal(a.params, b.params)

    imgs_n = colmap_native.read_images_bin(
        os.path.join(sparse_dir, "images.bin"))
    imgs_p = colmap_io.read_images_bin(
        os.path.join(sparse_dir, "images.bin"))
    assert imgs_n.keys() == imgs_p.keys()
    for k in imgs_p:
        a, b = imgs_n[k], imgs_p[k]
        assert a.name == b.name and a.camera_id == b.camera_id
        np.testing.assert_array_equal(a.qvec, b.qvec)
        np.testing.assert_array_equal(a.tvec, b.tvec)
        np.testing.assert_array_equal(a.xys, b.xys)
        np.testing.assert_array_equal(a.point3D_ids, b.point3D_ids)

    pts_n = colmap_native.read_points3d_bin(
        os.path.join(sparse_dir, "points3D.bin"))
    pts_p = colmap_io.read_points3d_bin(
        os.path.join(sparse_dir, "points3D.bin"))
    for a, b in zip(pts_n[:3], pts_p[:3]):
        np.testing.assert_array_equal(a, b)
    assert pts_n[3] == pts_p[3]
