"""2DGS (surfel) trainer with normal-consistency and distortion losses.

Parity target: /root/reference/examples/simple_trainer_2dgs.py (config
:40-170, losses :611-632). Reuses the 3DGS trainer's padded-pool machinery;
the 2DGS-specific parts are the surfel rasterizer
(gsplat_tpu.rendering.rasterization_2dgs) and the two geometry losses with
their warmup schedules.

Usage:
    python examples/simple_trainer_2dgs.py --data-dir data/garden --data-factor 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gsplat_tpu.rendering import rasterization_2dgs
from gsplat_tpu.losses import psnr as psnr_fn, ssim as ssim_fn, train_loss
from gsplat_tpu.optimizers import SelectiveAdam
from gsplat_tpu.strategy import DefaultStrategy

from simple_trainer import Config, Runner, create_splats, parse_config


class Runner2DGS(Runner):
    """3DGS runner with the 2DGS render path and geometry losses."""

    def __init__(self, cfg, normal_lambda=5e-2, dist_lambda=1e-2,
                 normal_start=7000, dist_start=3000):
        self.normal_lambda = normal_lambda
        self.dist_lambda = dist_lambda
        self.normal_start = normal_start
        self.dist_start = dist_start
        # the 2DGS backward kernel's live set exceeds the v5e 16MB VMEM at
        # tile_size 32 (ray-transform cross products); 16 fits
        cfg.tile_size = min(cfg.tile_size, 16)
        super().__init__(cfg)

    def _make_step(self, width, height, sh_degree):
        cfg = self.cfg
        optimizers = self.optimizers
        use_normal = self._cur_step >= self.normal_start
        use_dist = self._cur_step >= self.dist_start
        backend = "tiled" if self._on_tpu else "oracle"
        isect_capacity = self.isect_capacity

        def step_fn(params, opt_states, live, camtoworlds, Ks, pixels, bkgd, key):
            cap = live.shape[0]
            B = camtoworlds.shape[0]
            carrier = jnp.zeros((B, cap, 2), jnp.float32)

            def loss_fn(params, carrier):
                colors = jnp.concatenate([params["sh0"], params["shN"]], axis=1)
                (
                    render, alphas, normals, normals_depth, distort, median, meta
                ) = rasterization_2dgs(
                    params["means"],
                    params["quats"],
                    jnp.exp(params["scales"]),
                    jax.nn.sigmoid(params["opacities"]),
                    colors,
                    jnp.linalg.inv(camtoworlds),
                    Ks,
                    width,
                    height,
                    sh_degree=sh_degree,
                    near_plane=cfg.near_plane,
                    far_plane=cfg.far_plane,
                    densify_carrier=carrier,
                    masks=live,
                    tile_size=cfg.tile_size,
                    backend=backend,
                    isect_capacity=isect_capacity,
                    render_mode="RGB+ED",
                    distloss=use_dist,
                )
                loss = train_loss(render[..., :3], pixels, cfg.ssim_lambda)
                if use_normal:
                    # normal consistency (simple_trainer_2dgs.py:611-624);
                    # the alpha modulation of the depth-derived normals
                    # happens here like the reference trainer (:618)
                    normals_depth = normals_depth * jax.lax.stop_gradient(alphas)
                    n = normals / jnp.clip(
                        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-6
                    )
                    ncons = 1.0 - jnp.sum(n * normals_depth, axis=-1)
                    loss = loss + self.normal_lambda * jnp.mean(ncons)
                if use_dist:
                    loss = loss + self.dist_lambda * jnp.mean(distort)
                aux = {
                    "radii": meta["radii"],
                    "n_isects": meta.get("n_isects", jnp.int32(0)),
                }
                return loss, aux

            (loss, aux), (g_params, g_carrier) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, carrier)
            visibility = jnp.any(aux["radii"] > 0, axis=0)
            new_states = {}
            for k in params:
                upd, st = optimizers[k].update(
                    g_params[k], opt_states[k], params[k], visibility
                )
                params = {**params, k: params[k] + upd}
                new_states[k] = st
            return params, new_states, loss, aux["radii"], g_carrier, aux["n_isects"]

        return jax.jit(step_fn, donate_argnums=(0, 1))

    def train(self):
        # track the step for loss warmups; rebuild the jitted step at the
        # warmup boundaries
        self._cur_step = 0
        orig = self._make_step
        boundaries = sorted({self.normal_start, self.dist_start})

        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed)
        t_start = time.time()
        order = rng.permutation(len(self.trainset))
        cursor = 0
        shape = None
        for step in range(cfg.max_steps):
            self._cur_step = step
            if cursor >= len(order):
                order = rng.permutation(len(self.trainset))
                cursor = 0
            data = self.trainset[int(order[cursor])]
            cursor += 1
            pixels = jnp.asarray(data["image"])[None]
            camtoworlds = jnp.asarray(data["camtoworld"])[None]
            Ks = jnp.asarray(data["K"])[None]
            H, W = pixels.shape[1:3]
            sh_degree = min(step // cfg.sh_degree_interval, cfg.sh_degree)
            warm = tuple(step >= b for b in boundaries)
            if self._step_fn is None or shape != (W, H, sh_degree, warm):
                self._step_fn = self._make_step(W, H, sh_degree)
                shape = (W, H, sh_degree, warm)
            key, k_step, k_strat = jax.random.split(key, 3)
            (
                self.params, self.opt_states, loss, radii, g_carrier, n_isects
            ) = self._step_fn(
                self.params, self.opt_states, self.live,
                camtoworlds, Ks, pixels, None, k_step,
            )
            meta = {"radii": radii, "width": W, "height": H, "n_cameras": 1}
            (
                self.params, self.live, self.opt_states, self.strategy_state
            ) = self.strategy.step_post_backward(
                self.params, self.live, self.opt_states, self.strategy_state,
                step, meta, g_carrier, k_strat,
            )
            if step % 100 == 0:
                print(
                    f"step {step}: loss={float(loss):.4f} "
                    f"n_live={int(jnp.sum(self.live))} "
                    f"({time.time() - t_start:.0f}s)", flush=True,
                )
                self._maybe_grow(int(n_isects))
            if step + 1 in cfg.eval_steps:
                self.eval(step + 1)
            if step + 1 in cfg.save_steps:
                self.save(step + 1)

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
            backend="tiled" if self._on_tpu else "oracle",
            isect_capacity=self.isect_capacity,
        )
        return out[0], out[1], out[6]


def main():
    cfg = parse_config()
    runner = Runner2DGS(cfg)
    runner.train()
    runner.eval(cfg.max_steps)


if __name__ == "__main__":
    main()
