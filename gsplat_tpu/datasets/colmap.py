"""COLMAP dataset: Parser + Dataset (parity: examples/datasets/colmap.py).

Differences by design:
  - Self-contained COLMAP reader (colmap_io.py) instead of pycolmap.
  - Returns numpy arrays ready for jnp.asarray; batching is a thin
    random-index loop (the reference wraps torch DataLoader).
  - Undistortion maps built with cv2 when distortion params are present
    (cv2 is available in this image); plain pinhole models skip the remap.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .colmap_io import qvec_to_rotmat, read_model
from .normalize import (
    align_principal_axes,
    similarity_from_cameras,
    transform_cameras,
    transform_points,
)


def _load_image(path: str) -> np.ndarray:
    from PIL import Image as PILImage

    with PILImage.open(path) as im:
        return np.asarray(im.convert("RGB"))


class Parser:
    """COLMAP scene parser (examples/datasets/colmap.py Parser).

    Attributes mirror the reference: image_names, image_paths, camtoworlds
    [N,4,4], camera_ids, Ks_dict, params_dict, imsize_dict, points [M,3],
    points_rgb, point_indices (per-image 3D point rows), transform,
    scene_scale.
    """

    def __init__(
        self,
        data_dir: str,
        factor: int = 1,
        normalize: bool = False,
        test_every: int = 8,
    ):
        self.data_dir = data_dir
        self.factor = factor
        self.normalize = normalize
        self.test_every = test_every

        sparse = os.path.join(data_dir, "sparse", "0")
        if not os.path.exists(sparse):
            sparse = os.path.join(data_dir, "sparse")
        cameras, images, (points, points_rgb, points_err, id2row) = read_model(sparse)

        ordered = sorted(images.values(), key=lambda im: im.name)
        self.image_names: List[str] = [im.name for im in ordered]

        image_dir = os.path.join(data_dir, f"images_{factor}" if factor > 1 else "images")
        if not os.path.exists(image_dir):
            image_dir = os.path.join(data_dir, "images")
        self.image_dir = image_dir
        self.image_paths = [os.path.join(image_dir, n) for n in self.image_names]

        w2c = []
        camera_ids = []
        point_indices: Dict[str, np.ndarray] = {}
        for im in ordered:
            R = qvec_to_rotmat(im.qvec)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = im.tvec
            w2c.append(T)
            camera_ids.append(im.camera_id)
            valid = im.point3D_ids >= 0
            rows = np.array(
                [id2row[p] for p in im.point3D_ids[valid] if p in id2row], np.int64
            )
            point_indices[im.name] = rows
        w2c = np.stack(w2c)
        camtoworlds = np.linalg.inv(w2c)

        # per-camera intrinsics (downscaled by `factor`)
        self.Ks_dict: Dict[int, np.ndarray] = {}
        self.params_dict: Dict[int, np.ndarray] = {}
        self.imsize_dict: Dict[int, tuple] = {}
        self.mask_dict: Dict[int, Optional[np.ndarray]] = {}
        self._mapx: Dict[int, np.ndarray] = {}
        self._mapy: Dict[int, np.ndarray] = {}
        for cam_id, cam in cameras.items():
            K = cam.K.copy()
            K[:2, :] /= factor
            self.Ks_dict[cam_id] = K.astype(np.float32)
            self.params_dict[cam_id] = cam.dist_params.astype(np.float32)
            self.imsize_dict[cam_id] = (cam.width // factor, cam.height // factor)
            self.mask_dict[cam_id] = None

        # undistortion maps (examples/datasets/colmap.py:139-198)
        for cam_id, cam in cameras.items():
            dist = self.params_dict[cam_id]
            if not np.any(dist != 0.0):
                continue
            import cv2

            K = self.Ks_dict[cam_id].astype(np.float64)
            w, h = self.imsize_dict[cam_id]
            if cam.is_fisheye:
                # reference semantics (examples/datasets/colmap.py:281-317):
                # theta-polynomial remap on the tan-normalized grid plus a
                # validity mask cropped to its bounding box; the mask rides
                # the Dataset items so the trainer can zero out-of-projection
                # pixels (used with camera_model="fisheye").
                fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
                gx, gy = np.meshgrid(
                    np.arange(w, dtype=np.float32),
                    np.arange(h, dtype=np.float32),
                    indexing="xy",
                )
                x1 = (gx - cx) / fx
                y1 = (gy - cy) / fy
                theta = np.sqrt(x1**2 + y1**2)
                k1, k2, k3, k4 = (list(dist) + [0.0] * 4)[:4]
                r = (
                    1.0 + k1 * theta**2 + k2 * theta**4
                    + k3 * theta**6 + k4 * theta**8
                )
                mapx = (fx * x1 * r + w // 2).astype(np.float32)
                mapy = (fy * y1 * r + h // 2).astype(np.float32)
                valid = (
                    (mapx > 0) & (mapy > 0) & (mapx < w - 1) & (mapy < h - 1)
                )
                ys, xs = np.nonzero(valid)
                y0, y1_ = ys.min(), ys.max() + 1
                x0, x1_ = xs.min(), xs.max() + 1
                self.mask_dict[cam_id] = valid[y0:y1_, x0:x1_]
                K_undist = K.copy()  # roi offset applied below (shared path)
                roi = (int(x0), int(y0), int(x1_ - x0), int(y1_ - y0))
            else:
                K_undist, roi = cv2.getOptimalNewCameraMatrix(
                    K, dist.astype(np.float64), (w, h), 0
                )
                mapx, mapy = cv2.initUndistortRectifyMap(
                    K, dist.astype(np.float64), None, K_undist, (w, h), cv2.CV_32FC1
                )
            x0, y0, ww, hh = roi
            self.Ks_dict[cam_id] = np.asarray(K_undist, np.float32)
            self.Ks_dict[cam_id][0, 2] -= x0
            self.Ks_dict[cam_id][1, 2] -= y0
            self._mapx[cam_id], self._mapy[cam_id] = mapx, mapy
            self.imsize_dict[cam_id] = (ww, hh)
            self._roi = getattr(self, "_roi", {})
            self._roi[cam_id] = roi

        if normalize:
            T1 = similarity_from_cameras(camtoworlds)
            camtoworlds = transform_cameras(T1, camtoworlds)
            points = transform_points(T1, points)
            T2 = align_principal_axes(points)
            camtoworlds = transform_cameras(T2, camtoworlds)
            points = transform_points(T2, points)
            self.transform = T2 @ T1
        else:
            self.transform = np.eye(4)

        self.camtoworlds = camtoworlds.astype(np.float32)
        self.camera_ids = camera_ids
        self.points = points.astype(np.float32)
        self.points_err = points_err
        self.points_rgb = points_rgb
        self.point_indices = point_indices

        camera_locs = camtoworlds[:, :3, 3]
        scene_center = np.mean(camera_locs, axis=0)
        dists = np.linalg.norm(camera_locs - scene_center, axis=1)
        self.scene_scale = float(np.max(dists))

    def load_image(self, index: int) -> np.ndarray:
        img = _load_image(self.image_paths[index])
        cam_id = self.camera_ids[index]
        w, h = self.imsize_dict[cam_id]
        if img.shape[1] != w or img.shape[0] != h:
            if cam_id in self._mapx:
                import cv2

                if img.shape[:2] != self._mapx[cam_id].shape[:2]:
                    img = _resize(img, self._mapx[cam_id].shape[::-1][:2])
                img = cv2.remap(img, self._mapx[cam_id], self._mapy[cam_id], 1)
                x0, y0, ww, hh = self._roi[cam_id]
                img = img[y0 : y0 + hh, x0 : x0 + ww]
            else:
                img = _resize(img, (w, h))
        elif cam_id in self._mapx:
            import cv2

            img = cv2.remap(img, self._mapx[cam_id], self._mapy[cam_id], 1)
            x0, y0, ww, hh = self._roi[cam_id]
            img = img[y0 : y0 + hh, x0 : x0 + ww]
        return img


def _resize(img: np.ndarray, wh) -> np.ndarray:
    from PIL import Image as PILImage

    return np.asarray(
        PILImage.fromarray(img).resize(wh, PILImage.Resampling.BILINEAR)
    )


class Dataset:
    """Train/val split over a Parser (examples/datasets/colmap.py Dataset)."""

    def __init__(
        self,
        parser: Parser,
        split: str = "train",
        load_depths: bool = False,
    ):
        self.parser = parser
        self.split = split
        self.load_depths = load_depths
        n = len(parser.image_names)
        idx = np.arange(n)
        if split == "train":
            self.indices = idx[idx % parser.test_every != 0]
        else:
            self.indices = idx[idx % parser.test_every == 0]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, item: int) -> Dict:
        index = int(self.indices[item])
        cam_id = self.parser.camera_ids[index]
        image = self.parser.load_image(index).astype(np.float32) / 255.0
        data = {
            "K": self.parser.Ks_dict[cam_id],
            "camtoworld": self.parser.camtoworlds[index],
            "image": image,
            "image_id": index,
        }
        mask = self.parser.mask_dict.get(cam_id)
        if mask is not None:
            data["mask"] = mask  # [H, W] bool, False = out-of-projection
        if self.load_depths:
            name = self.parser.image_names[index]
            rows = self.parser.point_indices.get(name, np.zeros((0,), np.int64))
            pts = self.parser.points[rows]
            w2c = np.linalg.inv(self.parser.camtoworlds[index])
            pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
            K = self.parser.Ks_dict[cam_id]
            uv = pc @ K.T
            uv = uv[:, :2] / np.clip(uv[:, 2:3], 1e-6, None)
            h, w = image.shape[:2]
            sel = (
                (pc[:, 2] > 0)
                & (uv[:, 0] >= 0) & (uv[:, 0] < w)
                & (uv[:, 1] >= 0) & (uv[:, 1] < h)
            )
            data["points"] = uv[sel].astype(np.float32)
            data["depths"] = pc[sel, 2].astype(np.float32)
        return data
