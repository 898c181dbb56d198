"""Offline viewer: render a trained checkpoint along a camera trajectory.

Parity target: /root/reference/examples/simple_viewer.py (viser-based
interactive viewer). This build has no display server, so the viewer renders
checkpoint splats along an ellipse/interpolated trajectory into PNG frames
and an (optional) mp4 — the same artifact the reference trainer's
render_traj step produces (simple_trainer.py:934-1006).

Usage:
    python examples/simple_viewer.py --ckpt results/garden/ckpt_7000.npz \
        --data-dir data/garden --output-dir renders/ --n-frames 60
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gsplat_tpu import rasterization
from gsplat_tpu.datasets import Parser
from gsplat_tpu.datasets.traj import generate_ellipse_path_z, generate_interpolated_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="ckpt_*.npz to view; omitted = garden test fixture")
    ap.add_argument("--scene-grid", type=int, default=1,
                    help="replicate the fixture scene into an odd NxN grid "
                         "(reference simple_viewer.py:27-162 --scene_grid "
                         "scale demo; only without --ckpt)")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--data-factor", type=int, default=4)
    ap.add_argument("--output-dir", default="renders")
    ap.add_argument("--n-frames", type=int, default=60)
    ap.add_argument("--traj", default="interp", choices=["interp", "ellipse"])
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--video", action="store_true")
    args = ap.parse_args()

    fixture_cams = None
    if args.ckpt:
        ckpt = np.load(args.ckpt)
        params = {k: jnp.asarray(ckpt[k]) for k in ckpt.files if k != "live"}
        live = jnp.asarray(ckpt["live"]) if "live" in ckpt.files else None
    else:
        # garden test fixture, optionally grid-replicated to mimic a
        # large-scale scene (the reference's batched-render demo path)
        from gsplat_tpu._helper import load_test_data

        means, quats, scales, opacities, colors_rgb, viewmats, Ks_f, w_f, h_f = (
            load_test_data(scene_grid=args.scene_grid)
        )
        print(f"fixture: {means.shape[0]} Gaussians (grid {args.scene_grid})",
              flush=True)
        params = {
            "means": jnp.asarray(means),
            "quats": jnp.asarray(quats),
            # ckpt convention stores log-scales / logit-opacities; the
            # fixture values are already in linear space — invert here so
            # the shared render path below can exp/sigmoid uniformly
            "scales": jnp.log(jnp.asarray(scales)),
            "opacities": jnp.asarray(
                np.log(opacities / np.clip(1.0 - opacities, 1e-6, None))
            ),
            "sh0": jnp.asarray(colors_rgb[:, None, :]),
            "shN": jnp.zeros((means.shape[0], 0, 3), jnp.float32),
        }
        live = None
        fixture_cams = (np.linalg.inv(viewmats), Ks_f[0], w_f, h_f)

    if args.data_dir:
        parser = Parser(args.data_dir, factor=args.data_factor, normalize=True)
        c2w_all = parser.camtoworlds
        K = parser.Ks_dict[parser.camera_ids[0]]
        W, H = parser.imsize_dict[parser.camera_ids[0]]
    elif fixture_cams is not None:
        c2w_all, K, W, H = fixture_cams
        c2w_all = c2w_all.astype(np.float32)
    else:
        # orbit around the splat centroid
        pts = np.asarray(params["means"])
        if live is not None:
            pts = pts[np.asarray(live)]
        center = np.median(pts, axis=0)
        r = 2.0 * np.median(np.abs(pts - center))
        c2w_all = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
        for i, th in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False)):
            c2w_all[i, :3, 3] = center + r * np.array(
                [np.cos(th), np.sin(th), 0.3]
            )
        W = H = 512
        K = np.array(
            [[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1]], np.float32
        )
    if args.width:
        K = K.copy()
        K[0] *= args.width / W
        K[1] *= (args.height or args.width) / H
        W, H = args.width, args.height or args.width

    if args.traj == "ellipse":
        poses = generate_ellipse_path_z(c2w_all[:, :3, :], n_frames=args.n_frames)
    else:
        poses = generate_interpolated_path(
            c2w_all[:: max(len(c2w_all) // 8, 1), :3, :],
            n_interp=max(args.n_frames // 7, 1),
        )[: args.n_frames]
    c2w = np.tile(np.eye(4, dtype=np.float32), (len(poses), 1, 1))
    c2w[:, :3, :4] = poses

    os.makedirs(args.output_dir, exist_ok=True)
    from PIL import Image

    colors = jnp.concatenate([params["sh0"], params["shN"]], axis=1)
    # degree available in the checkpoint caps the requested one
    deg_avail = int(np.sqrt(colors.shape[1])) - 1
    sh_degree = min(args.sh_degree, deg_avail)
    on_tpu = jax.default_backend() == "tpu"
    isect_capacity = 2**22 if on_tpu else None
    frames = []
    for i in range(len(c2w)):
        render, _, _ = rasterization(
            params["means"],
            params["quats"],
            jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opacities"]),
            colors,
            jnp.linalg.inv(jnp.asarray(c2w[i : i + 1])),
            jnp.asarray(K)[None],
            W,
            H,
            sh_degree=sh_degree,
            masks=live,
            backend="binned" if on_tpu else "oracle",
            isect_capacity=isect_capacity,
        )
        img = (np.clip(np.asarray(render[0]), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(args.output_dir, f"frame_{i:04d}.png")
        )
        frames.append(img)
        print(f"rendered frame {i + 1}/{len(c2w)}", flush=True)

    if args.video:
        try:
            import imageio.v2 as imageio

            imageio.mimwrite(
                os.path.join(args.output_dir, "traj.mp4"), frames, fps=24
            )
            print("wrote traj.mp4")
        except Exception as e:  # ffmpeg may be absent
            print(f"video writing unavailable ({e}); PNG frames saved")


if __name__ == "__main__":
    main()
