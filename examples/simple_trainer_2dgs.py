"""2DGS (surfel) trainer with normal-consistency and distortion losses.

Parity target: /root/reference/examples/simple_trainer_2dgs.py (config
:40-170, train step :414-632). Inherits the FULL 3DGS training loop —
camera-pose optimization, appearance embeddings, bilateral grids, depth
loss, camera batching, mid-train checkpoint resume, eval — and overrides
only the render hook (surfel rasterizer) and the two geometry losses with
their warmup schedules (reference :611-632).

Usage:
    python examples/simple_trainer_2dgs.py --data-dir data/garden --data-factor 4
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gsplat_tpu.rendering import rasterization_2dgs
from gsplat_tpu.losses import psnr as psnr_fn, ssim as ssim_fn

from simple_trainer import Config, Runner, parse_config


class Runner2DGS(Runner):
    """3DGS runner with the 2DGS render path and geometry losses."""

    def __init__(self, cfg, normal_lambda=5e-2, dist_lambda=1e-2,
                 normal_start=7000, dist_start=3000):
        self.normal_lambda = normal_lambda
        self.dist_lambda = dist_lambda
        self.normal_start = normal_start
        self.dist_start = dist_start
        self._cur_step = 0
        # ts=16 measured FASTER than ts=32 for the surfel kernels on v5e
        # (1892 vs 2347 ms/frame, same session, PERF.md round-4): the
        # heavier per-pair ray-transform math scales worse with P than the
        # binning savings, unlike 3DGS where ts=32 wins 1.7x
        cfg.tile_size = min(cfg.tile_size, 16)
        super().__init__(cfg)

    # --- hooks into the inherited jitted step -----------------------------

    def _step_extra_key(self):
        return (
            self._cur_step >= self.normal_start,
            self._cur_step >= self.dist_start,
        )

    def _raster_train(
        self, params, colors, sh_deg_arg, viewmats, Ks, width, height,
        carrier, live, backend, isect_capacity, render_mode,
    ):
        cfg = self.cfg
        use_dist = self._cur_step >= self.dist_start
        (
            render, alphas, normals, normals_depth, distort, median, meta
        ) = rasterization_2dgs(
            params["means"],
            params["quats"],
            jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opacities"]),
            colors,
            viewmats,
            Ks,
            width,
            height,
            sh_degree=sh_deg_arg,
            near_plane=cfg.near_plane,
            far_plane=cfg.far_plane,
            densify_carrier=carrier,
            masks=live,
            tile_size=cfg.tile_size,
            backend=backend,
            isect_capacity=isect_capacity,
            # always render expected depth: the normal-consistency loss
            # needs it (reference :561 uses RGB+ED / RGB+D)
            render_mode="RGB+ED",
            distloss=use_dist,
        )
        depths_map = render[..., -1:]
        geom = {
            "normals": normals,
            "normals_depth": normals_depth,
            "distort": distort,
        }
        return render[..., :3], alphas, depths_map, meta, geom

    def _geom_losses(self, loss, geom, alphas):
        if self._cur_step >= self.normal_start:
            # normal consistency (reference :611-624); alpha modulation of
            # the depth-derived normals happens here like the reference
            # trainer (:618)
            normals_depth = geom["normals_depth"] * jax.lax.stop_gradient(alphas)
            n = geom["normals"] / jnp.clip(
                jnp.linalg.norm(geom["normals"], axis=-1, keepdims=True), 1e-6
            )
            ncons = 1.0 - jnp.sum(n * normals_depth, axis=-1)
            loss = loss + self.normal_lambda * jnp.mean(ncons)
        if self._cur_step >= self.dist_start:
            loss = loss + self.dist_lambda * jnp.mean(geom["distort"])
        return loss

    def _raster_train_distributed(
        self, params, colors, sh_deg_arg, viewmats, Ks, width, height,
        carrier, live, backend, isect_capacity, render_mode, mesh,
    ):
        """2DGS surfel rows through the same Gaussian-sharded exchange
        (reference trains 2DGS via the identical distributed machinery,
        gsplat/rendering.py:1018+). ``--packed`` swaps in the
        fixed-capacity visible-surfel exchange with the same
        pack_required growth loop as the 3DGS trainer."""
        from gsplat_tpu.distributed import (
            rasterization_2dgs_distributed,
            rasterization_2dgs_distributed_packed,
        )

        cfg = self.cfg
        use_dist = self._cur_step >= self.dist_start
        kwargs = dict(
            mesh=mesh,
            sh_degree=sh_deg_arg,
            near_plane=cfg.near_plane,
            far_plane=cfg.far_plane,
            tile_size=cfg.tile_size,
            backend=backend,
            isect_capacity=isect_capacity,
            masks=live,
            densify_carrier=carrier,
            render_mode="RGB+ED",
            distloss=use_dist,
        )
        if cfg.packed:
            assert sh_deg_arg is not None, (
                "--packed requires SH colors (no --app-opt)"
            )
            fn = rasterization_2dgs_distributed_packed
            kwargs["pack_capacity"] = self.pack_capacity
        else:
            fn = rasterization_2dgs_distributed
            kwargs["per_camera_colors"] = sh_deg_arg is None
        (
            render, alphas, normals, normals_depth, distort, median, meta
        ) = fn(
            params["means"],
            params["quats"],
            jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opacities"]),
            colors,
            viewmats,
            Ks,
            width,
            height,
            **kwargs,
        )
        depths_map = render[..., -1:]
        geom = {
            "normals": normals,
            "normals_depth": normals_depth,
            "distort": distort,
        }
        return render[..., :3], alphas, depths_map, meta, geom

    def render_probe(self, camtoworlds, Ks, width, height, colors):
        if self.mesh is not None:
            from gsplat_tpu.distributed import rasterization_2dgs_distributed

            out = rasterization_2dgs_distributed(
                self.params["means"],
                self.params["quats"],
                jnp.exp(self.params["scales"]),
                jax.nn.sigmoid(self.params["opacities"]),
                colors,
                jnp.linalg.inv(camtoworlds),
                Ks,
                width,
                height,
                mesh=self.mesh,
                sh_degree=self.cfg.sh_degree,
                backend="binned",
                isect_capacity=4096,
                masks=self.live,
                tile_size=self.cfg.tile_size,
            )
            return out[0], out[1], out[6]
        out = rasterization_2dgs(
            self.params["means"],
            self.params["quats"],
            jnp.exp(self.params["scales"]),
            jax.nn.sigmoid(self.params["opacities"]),
            colors,
            jnp.linalg.inv(camtoworlds),
            Ks,
            width,
            height,
            sh_degree=self.cfg.sh_degree,
            backend="binned",
            isect_capacity=4096,
            masks=self.live,
            tile_size=self.cfg.tile_size,
        )
        return out[0], out[1], out[6]

    # --- eval / viewer render --------------------------------------------

    def render(self, camtoworlds, Ks, width, height, sh_degree=None):
        colors = jnp.concatenate([self.params["sh0"], self.params["shN"]], axis=1)
        out = rasterization_2dgs(
            self.params["means"],
            self.params["quats"],
            jnp.exp(self.params["scales"]),
            jax.nn.sigmoid(self.params["opacities"]),
            colors,
            jnp.linalg.inv(camtoworlds),
            Ks,
            width,
            height,
            sh_degree=self.cfg.sh_degree if sh_degree is None else sh_degree,
            masks=self.live,
            tile_size=self.cfg.tile_size,
            backend="binned" if self._on_tpu else "oracle",
            isect_capacity=self.isect_capacity,
            render_mode="RGB+ED",
        )
        # rgb, alphas, meta — plus stash geometry outputs for eval_geometry
        self._last_render_geom = {
            "normals": out[2], "normals_from_depth": out[3],
            "distort": out[4], "median": out[5],
        }
        return out[0][..., :3], out[1], out[6]

    def eval_geometry(self, step: int):
        """Geometry eval: mean normal-consistency error and distortion over
        the val set (reference 2DGS trainer logs these alongside PSNR)."""
        ncs, dists = [], []
        for i in range(len(self.valset)):
            data = self.valset[i]
            pixels = jnp.asarray(data["image"])[None]
            H, W = pixels.shape[1:3]
            _, alphas, _ = self.render(
                jnp.asarray(data["camtoworld"])[None],
                jnp.asarray(data["K"])[None], W, H,
            )
            g = self._last_render_geom
            n = g["normals"] / jnp.clip(
                jnp.linalg.norm(g["normals"], axis=-1, keepdims=True), 1e-6
            )
            nfd = g["normals_from_depth"] * alphas
            ncs.append(float(jnp.mean(1.0 - jnp.sum(n * nfd, axis=-1))))
            dists.append(float(jnp.mean(g["distort"])))
        stats = {
            "step": step,
            "normal_consistency": float(np.mean(ncs)),
            "distortion": float(np.mean(dists)),
        }
        print("EVAL_GEOM", stats)
        return stats


def main():
    cfg = parse_config()
    runner = Runner2DGS(cfg)
    runner.train()
    runner.eval(cfg.max_steps)
    runner.eval_geometry(cfg.max_steps)


if __name__ == "__main__":
    main()
