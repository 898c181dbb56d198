"""ctypes bindings for the native COLMAP binary reader (csrc/colmap_native.cpp).

The reference relies on pycolmap (a C++ extension) for model parsing; this
is the TPU build's equivalent native data-loader component. The shared
library is compiled with g++ on first use and cached next to the source
(falls back cleanly to the pure-Python reader in colmap_io.py when no
toolchain is available — same results, just slower on multi-million-point
reconstructions).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

from .colmap_io import CAMERA_MODELS, Camera, Image

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "csrc",
    "colmap_native.cpp",
)
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SRC):
        return None
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "gsplat_tpu",
    )
    so_path = os.path.join(cache, "colmap_native.so")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(
            so_path
        ) < os.path.getmtime(_SRC):
            os.makedirs(cache, exist_ok=True)
            with tempfile.NamedTemporaryFile(
                suffix=".so", dir=cache, delete=False
            ) as tmp:
                tmp_path = tmp.name
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", tmp_path],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_path, so_path)
        lib = ctypes.CDLL(so_path)
    except Exception:
        return None

    i64, i32 = ctypes.c_int64, ctypes.c_int32
    p = ctypes.c_char_p
    f64p = np.ctypeslib.ndpointer(np.float64)
    u8p = np.ctypeslib.ndpointer(np.uint8)
    i64p = np.ctypeslib.ndpointer(np.int64)
    i32p = np.ctypeslib.ndpointer(np.int32)

    lib.cn_points3d_count.restype = i64
    lib.cn_points3d_count.argtypes = [p]
    lib.cn_points3d_read.restype = i32
    lib.cn_points3d_read.argtypes = [p, i64, i64p, f64p, u8p, f64p]
    lib.cn_images_sizes.restype = i32
    lib.cn_images_sizes.argtypes = [
        p, ctypes.POINTER(i64), ctypes.POINTER(i64)
    ]
    lib.cn_images_read.restype = i32
    lib.cn_images_read.argtypes = [
        p, i64, i64, i32p, f64p, f64p, i32p,
        np.ctypeslib.ndpointer(np.uint8), i32, i64p, f64p, i64p,
    ]
    lib.cn_cameras_count.restype = i64
    lib.cn_cameras_count.argtypes = [p]
    lib.cn_cameras_read.restype = i32
    lib.cn_cameras_read.argtypes = [p, i64, i32p, i32p, i64p, f64p, i32, i32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


def read_cameras_bin(path: str) -> Optional[Dict[int, Camera]]:
    lib = _build_and_load()
    if lib is None:
        return None
    bpath = path.encode()
    n = lib.cn_cameras_count(bpath)
    if n < 0:
        return None
    MAXP = 12
    cam_ids = np.empty(n, np.int32)
    model_ids = np.empty(n, np.int32)
    wh = np.empty(2 * n, np.int64)
    params = np.empty(n * MAXP, np.float64)
    n_params = np.empty(n, np.int32)
    if lib.cn_cameras_read(
        bpath, n, cam_ids, model_ids, wh, params, MAXP, n_params
    ):
        return None
    cams = {}
    for i in range(n):
        name, _ = CAMERA_MODELS[int(model_ids[i])]
        cams[int(cam_ids[i])] = Camera(
            int(cam_ids[i]), name, int(wh[2 * i]), int(wh[2 * i + 1]),
            params[i * MAXP : i * MAXP + int(n_params[i])].copy(),
        )
    return cams


def read_images_bin(path: str) -> Optional[Dict[int, Image]]:
    lib = _build_and_load()
    if lib is None:
        return None
    bpath = path.encode()
    n = ctypes.c_int64()
    tot = ctypes.c_int64()
    if lib.cn_images_sizes(bpath, ctypes.byref(n), ctypes.byref(tot)):
        return None
    n, tot = n.value, tot.value
    STRIDE = 512
    image_ids = np.empty(n, np.int32)
    qvecs = np.empty(4 * n, np.float64)
    tvecs = np.empty(3 * n, np.float64)
    camera_ids = np.empty(n, np.int32)
    names = np.zeros(n * STRIDE, np.uint8)
    offs = np.empty(n + 1, np.int64)
    xy = np.empty(2 * max(tot, 1), np.float64)
    ids3 = np.empty(max(tot, 1), np.int64)
    if lib.cn_images_read(
        bpath, n, tot, image_ids, qvecs, tvecs, camera_ids, names,
        STRIDE, offs, xy, ids3,
    ):
        return None
    imgs = {}
    for i in range(n):
        raw = bytes(names[i * STRIDE : (i + 1) * STRIDE])
        nm = raw.split(b"\x00", 1)[0].decode("utf-8", "replace")
        lo, hi = int(offs[i]), int(offs[i + 1])
        imgs[int(image_ids[i])] = Image(
            int(image_ids[i]),
            qvecs[4 * i : 4 * i + 4].copy(),
            tvecs[3 * i : 3 * i + 3].copy(),
            int(camera_ids[i]),
            nm,
            xy[2 * lo : 2 * hi].reshape(-1, 2).copy(),
            ids3[lo:hi].copy(),
        )
    return imgs


def read_points3d_bin(
    path: str,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, Dict[int, int]]]:
    lib = _build_and_load()
    if lib is None:
        return None
    bpath = path.encode()
    n = lib.cn_points3d_count(bpath)
    if n < 0:
        return None
    ids = np.empty(max(n, 1), np.int64)
    xyz = np.empty(3 * max(n, 1), np.float64)
    rgb = np.empty(3 * max(n, 1), np.uint8)
    err = np.empty(max(n, 1), np.float64)
    if lib.cn_points3d_read(bpath, n, ids, xyz, rgb, err):
        return None
    idmap = {int(pid): i for i, pid in enumerate(ids[:n])}
    return (
        xyz[: 3 * n].reshape(-1, 3).astype(np.float32),
        rgb[: 3 * n].reshape(-1, 3),
        err[:n].astype(np.float32),
        idmap,
    )
