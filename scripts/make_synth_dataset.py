"""Build a synthetic COLMAP dataset from the garden fixture.

Renders ground-truth images of splats built from the garden point cloud with
gsplat_tpu's own renderer, then writes a genuine COLMAP sparse model
(cameras.bin / images.bin / points3D.bin) plus images/ — giving the trainer
and the COLMAP reader a real end-to-end target without network access.

Usage: python scripts/make_synth_dataset.py --out /tmp/synth_garden \
           --n-cams 16 --width 324 --height 210
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def look_at(eye, target, up=np.array([0.0, 0.0, 1.0])):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w


def rotmat_to_qvec(R):
    K = (
        np.array(
            [
                [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
                [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
                [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
                 R[0, 0] + R[1, 1] + R[2, 2]],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return -q if q[0] < 0 else q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_garden")
    ap.add_argument("--n-cams", type=int, default=16)
    ap.add_argument("--width", type=int, default=324)
    ap.add_argument("--height", type=int, default=210)
    ap.add_argument("--n-points", type=int, default=40000)
    ap.add_argument("--gt-splats", type=int, default=120000,
                    help="ground-truth splat count (subsampled from the "
                         "garden fixture). The oracle GT render is "
                         "O(gt_splats * pixels): shrink for CPU builds")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--fisheye", action="store_true",
                    help="write an OPENCV_FISHEYE scene: GT rendered with "
                         "camera_model='fisheye' (ideal equidistant) and "
                         "warped into the distorted capture frame that the "
                         "loader's theta-polynomial remap (reference "
                         "examples/datasets/colmap.py:281-317) inverts back")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the GT render is tiny; "
                         "also keeps the script usable when the TPU "
                         "tunnel is unreachable)")
    args = ap.parse_args()
    if args.cpu or os.environ.get("GSPLAT_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from gsplat_tpu import load_test_data, rasterization
    from gsplat_tpu.modules import knn_distances

    means, _, _, _, colors, _, Ks0, W0, H0 = load_test_data()
    rng = np.random.default_rng(args.seed)

    # GT splats: points with kNN-scaled isotropic gaussians, solid opacity
    sub = rng.choice(
        len(means), size=min(len(means), args.gt_splats), replace=False
    )
    pts, cols = means[sub], colors[sub]
    d = knn_distances(pts, k=4)[:, 1:].mean(axis=1)
    scales = np.tile(np.clip(d, 5e-3, 0.05)[:, None], (1, 3)).astype(np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (len(pts), 1))
    opac = np.full((len(pts),), 0.9, np.float32)

    center = pts.mean(axis=0)
    radius = 1.2 * np.percentile(np.linalg.norm(pts - center, axis=1), 90)
    W, H = args.width, args.height
    f = 0.85 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)

    c2ws = []
    for i in range(args.n_cams):
        th = 2 * np.pi * i / args.n_cams
        eye = center + radius * np.array(
            [np.cos(th), np.sin(th), 0.45 + 0.15 * np.sin(3 * th)]
        )
        c2ws.append(look_at(eye, center))
    c2ws = np.stack(c2ws)
    w2cs = np.linalg.inv(c2ws)

    os.makedirs(os.path.join(args.out, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)

    # render ground truth
    from PIL import Image

    on_tpu = jax.default_backend() == "tpu"
    cam_model = "fisheye" if args.fisheye else "pinhole"
    render_fn = jax.jit(
        lambda vm: rasterization(
            jnp.asarray(pts), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(cols),
            vm, jnp.asarray(K, jnp.float32)[None], W, H,
            backgrounds=jnp.ones((1, 3), jnp.float32),
            backend="tiled" if on_tpu else "oracle",
            isect_capacity=2**21 if on_tpu else None,
            camera_model=cam_model,
        )[0]
    )
    fisheye_k = np.array([0.06, 0.012, 0.0, 0.0])
    if args.fisheye:
        # Warp the ideal equidistant render into the OPENCV_FISHEYE capture
        # frame: capture(u,v) samples the ideal image at radius rho where
        # rho*(1 + k1 rho^2 + ... + k4 rho^8) = rho_d (Newton inversion of
        # the loader's forward map).
        import cv2

        k1, k2, k3, k4 = fisheye_k
        uu, vv = np.meshgrid(
            np.arange(W, dtype=np.float64),
            np.arange(H, dtype=np.float64), indexing="xy",
        )
        xd = (uu - W // 2) / f
        yd = (vv - H // 2) / f
        rho_d = np.sqrt(xd**2 + yd**2)
        rho = rho_d.copy()
        for _ in range(12):
            poly = rho * (
                1 + k1 * rho**2 + k2 * rho**4 + k3 * rho**6 + k4 * rho**8
            )
            dpoly = (
                1 + 3 * k1 * rho**2 + 5 * k2 * rho**4
                + 7 * k3 * rho**6 + 9 * k4 * rho**8
            )
            rho = rho - (poly - rho_d) / dpoly
        radial = np.where(rho_d > 1e-9, rho / np.clip(rho_d, 1e-9, None), 1.0)
        inv_mapx = (f * xd * radial + W / 2).astype(np.float32)
        inv_mapy = (f * yd * radial + H / 2).astype(np.float32)
    names = []
    for i in range(args.n_cams):
        img = render_fn(jnp.asarray(w2cs[i : i + 1], jnp.float32))
        arr = (np.clip(np.asarray(img[0]), 0, 1) * 255).astype(np.uint8)
        if args.fisheye:
            arr = cv2.remap(arr, inv_mapx, inv_mapy, cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REPLICATE)
        name = f"view_{i:03d}.png"
        Image.fromarray(arr).save(os.path.join(args.out, "images", name))
        names.append(name)
        print(f"rendered {name}", flush=True)

    # COLMAP binary model
    sp = os.path.join(args.out, "sparse", "0")
    with open(os.path.join(sp, "cameras.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", 1))
        if args.fisheye:
            fo.write(struct.pack("<iiQQ", 1, 5, W, H))  # OPENCV_FISHEYE
            fo.write(struct.pack("<8d", f, f, W / 2, H / 2, *fisheye_k))
        else:
            fo.write(struct.pack("<iiQQ", 1, 1, W, H))  # PINHOLE
            fo.write(struct.pack("<4d", f, f, W / 2, H / 2))

    with open(os.path.join(sp, "images.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", args.n_cams))
        for i in range(args.n_cams):
            q = rotmat_to_qvec(w2cs[i, :3, :3])
            t = w2cs[i, :3, 3]
            fo.write(struct.pack("<i", i + 1))
            fo.write(struct.pack("<7d", *q, *t))
            fo.write(struct.pack("<i", 1))
            fo.write(names[i].encode() + b"\x00")
            fo.write(struct.pack("<Q", 0))  # no 2D observations

    keep = rng.choice(len(pts), size=min(args.n_points, len(pts)), replace=False)
    with open(os.path.join(sp, "points3D.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", len(keep)))
        for j, idx in enumerate(keep):
            x, y, z = pts[idx].astype(np.float64)
            r, g, b = (cols[idx] * 255).astype(np.uint8)
            fo.write(struct.pack("<QdddBBBd", j + 1, x, y, z, r, g, b, 0.5))
            fo.write(struct.pack("<Q", 0))  # empty track

    print(f"wrote synthetic COLMAP dataset to {args.out}")


if __name__ == "__main__":
    main()
