"""COLMAP binary/text model reader — self-contained, numpy only.

The reference delegates COLMAP parsing to the external `pycolmap`
SceneManager (examples/datasets/colmap.py:1-30). This module implements the
COLMAP sparse-model formats directly (cameras/images/points3D, .bin and
.txt), so the TPU build has no torch/pycolmap dependency in its data layer.

Format reference: the COLMAP documentation for the sparse reconstruction
binary layout (little-endian; cameras.bin = [u64 count, {i32 id, i32 model,
u64 w, u64 h, f64 params[n]}...]; images.bin adds qvec/tvec/name/points2D;
points3D.bin adds xyz/rgb/error/track).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

# model_id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclass
class Camera:
    camera_id: int
    model: str
    width: int
    height: int
    params: np.ndarray  # model-specific

    @property
    def K(self) -> np.ndarray:
        p = self.params
        if self.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL",
                          "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE", "FOV"):
            fx = fy = p[0]
            cx, cy = p[1], p[2]
        else:
            fx, fy, cx, cy = p[0], p[1], p[2], p[3]
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)

    @property
    def dist_params(self) -> np.ndarray:
        """OpenCV-style (k1, k2, p1, p2) or fisheye (k1..k4)."""
        p = self.params
        if self.model in ("SIMPLE_PINHOLE", "PINHOLE"):
            return np.zeros(4)
        if self.model == "SIMPLE_RADIAL":
            return np.array([p[3], 0.0, 0.0, 0.0])
        if self.model == "RADIAL":
            return np.array([p[3], p[4], 0.0, 0.0])
        if self.model == "OPENCV":
            return np.array([p[4], p[5], p[6], p[7]])
        if self.model == "OPENCV_FISHEYE":
            return np.array([p[4], p[5], p[6], p[7]])
        if self.model in ("SIMPLE_RADIAL_FISHEYE",):
            return np.array([p[3], 0.0, 0.0, 0.0])
        if self.model in ("RADIAL_FISHEYE",):
            return np.array([p[3], p[4], 0.0, 0.0])
        return np.asarray(p[4:8]) if len(p) >= 8 else np.zeros(4)

    @property
    def is_fisheye(self) -> bool:
        return "FISHEYE" in self.model


@dataclass
class Image:
    image_id: int
    qvec: np.ndarray  # [4] wxyz
    tvec: np.ndarray  # [3]
    camera_id: int
    name: str
    xys: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    point3D_ids: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.int64))


def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _read(fmt, f):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_bin(path: str) -> Dict[int, Camera]:
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        for _ in range(n):
            cam_id, model_id, w, h = _read("<iiQQ", f)
            name, np_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f"<{np_params}d", f))
            cams[cam_id] = Camera(cam_id, name, int(w), int(h), params)
    return cams


def read_images_bin(path: str) -> Dict[int, Image]:
    imgs = {}
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        for _ in range(n):
            vals = _read("<idddddddi", f)
            image_id = vals[0]
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            camera_id = vals[8]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n2d,) = _read("<Q", f)
            raw = np.frombuffer(
                f.read(24 * n2d), dtype=[("xy", "<f8", 2), ("id3", "<i8")]
            )
            imgs[image_id] = Image(
                image_id, qvec, tvec, camera_id, name.decode("utf-8"),
                raw["xy"].copy(), raw["id3"].copy(),
            )
    return imgs


def read_points3d_bin(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict[int, int]]:
    """Returns (xyz [M,3] f32, rgb [M,3] u8, err [M], id->row map)."""
    xyzs: List[np.ndarray] = []
    rgbs: List[np.ndarray] = []
    errs: List[float] = []
    idmap: Dict[int, int] = {}
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        for i in range(n):
            pid, x, y, z, r, g, b, err = _read("<QdddBBBd", f)
            (track_len,) = _read("<Q", f)
            f.seek(8 * track_len, 1)
            idmap[pid] = i
            xyzs.append(np.array([x, y, z]))
            rgbs.append(np.array([r, g, b], np.uint8))
            errs.append(err)
    return (
        np.array(xyzs, np.float32).reshape(-1, 3),
        np.array(rgbs, np.uint8).reshape(-1, 3),
        np.array(errs, np.float32),
        idmap,
    )


def read_cameras_txt(path: str) -> Dict[int, Camera]:
    cams = {}
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        cam_id, model = int(parts[0]), parts[1]
        w, h = int(parts[2]), int(parts[3])
        params = np.array([float(x) for x in parts[4:]])
        cams[cam_id] = Camera(cam_id, model, w, h, params)
    return cams


def read_images_txt(path: str) -> Dict[int, Image]:
    imgs = {}
    lines = [
        l.strip()
        for l in open(path)
        if l.strip() and not l.strip().startswith("#")
    ]
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        image_id = int(parts[0])
        qvec = np.array([float(x) for x in parts[1:5]])
        tvec = np.array([float(x) for x in parts[5:8]])
        camera_id = int(parts[8])
        name = parts[9]
        obs = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.array(
            [[float(obs[j]), float(obs[j + 1])] for j in range(0, len(obs), 3)]
        ).reshape(-1, 2)
        ids = np.array([int(obs[j + 2]) for j in range(0, len(obs), 3)], np.int64)
        imgs[image_id] = Image(image_id, qvec, tvec, camera_id, name, xys, ids)
    return imgs


def read_points3d_txt(path: str):
    xyzs, rgbs, errs, idmap = [], [], [], {}
    i = 0
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        idmap[int(parts[0])] = i
        xyzs.append([float(x) for x in parts[1:4]])
        rgbs.append([int(x) for x in parts[4:7]])
        errs.append(float(parts[7]))
        i += 1
    return (
        np.array(xyzs, np.float32).reshape(-1, 3),
        np.array(rgbs, np.uint8).reshape(-1, 3),
        np.array(errs, np.float32),
        idmap,
    )


def read_model(sparse_dir: str):
    """Read a COLMAP sparse model directory (.bin preferred, .txt fallback).

    Binary models go through the native C++ reader when a toolchain is
    available (csrc/colmap_native.cpp — the role pycolmap plays for the
    reference); this pure-Python parser is the portable fallback and the
    parity oracle for it (tests/test_colmap_native.py)."""
    if os.path.exists(os.path.join(sparse_dir, "cameras.bin")):
        from . import colmap_native

        cams = colmap_native.read_cameras_bin(
            os.path.join(sparse_dir, "cameras.bin")
        )
        imgs = pts = None
        if cams is not None:
            imgs = colmap_native.read_images_bin(
                os.path.join(sparse_dir, "images.bin")
            )
            pts = colmap_native.read_points3d_bin(
                os.path.join(sparse_dir, "points3D.bin")
            )
        if cams is None or imgs is None or pts is None:
            cams = read_cameras_bin(os.path.join(sparse_dir, "cameras.bin"))
            imgs = read_images_bin(os.path.join(sparse_dir, "images.bin"))
            pts = read_points3d_bin(os.path.join(sparse_dir, "points3D.bin"))
    else:
        cams = read_cameras_txt(os.path.join(sparse_dir, "cameras.txt"))
        imgs = read_images_txt(os.path.join(sparse_dir, "images.txt"))
        pts = read_points3d_txt(os.path.join(sparse_dir, "points3D.txt"))
    return cams, imgs, pts
