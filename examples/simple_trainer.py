"""COLMAP-scene Gaussian-splatting trainer, TPU-native.

Parity target: /root/reference/examples/simple_trainer.py (tyro Config at
:47-192, splat init :196-280, train loop :566-851, eval :853-932). Rebuilt
for TPU:

  - **Static shapes everywhere.** The Gaussian pool is padded to a capacity
    with a live mask; densification is masked scatters (gsplat_tpu.strategy).
    When the pool or the intersection buffer approaches its capacity the
    trainer grows it *between* steps (an out-of-jit recompile — a handful per
    run, amortized to nothing; the reference instead reshapes tensors every
    refine step, which XLA cannot trace).
  - **One jitted train step** covering render -> loss -> backward -> masked
    Adam updates. Screen-space gradients for densification come from the
    explicit `means2d_carrier` argument (replaces torch retain_grad).
  - Per-parameter Adam with the reference's learning rates
    (simple_trainer.py:257-277), means-lr exponential decay to 1%.

Usage:
    python examples/simple_trainer.py default --data-dir data/garden --data-factor 4
    python examples/simple_trainer.py mcmc --data-dir data/garden --strategy.cap-max 1000000
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("GSPLAT_FORCE_CPU"):
    # benchmark scripts validate the multi-chip SPMD program on a forced
    # CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N);
    # JAX_PLATFORMS=cpu is ignored under the axon plugin, this is not.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from gsplat_tpu import rasterization
from gsplat_tpu.datasets import Dataset, Parser
from gsplat_tpu.losses import psnr as psnr_fn
from gsplat_tpu.losses import ssim as ssim_fn
from gsplat_tpu.losses import train_loss
from gsplat_tpu.bilagrid import (
    init_bilateral_grid,
    slice_grid,
    total_variation_loss,
)
from gsplat_tpu.modules import (
    apply_appearance_opt,
    apply_camera_opt,
    init_appearance_opt,
    init_camera_opt,
    knn_distances,
    rgb_to_sh,
)
from gsplat_tpu.optimizers import SelectiveAdam
from gsplat_tpu.strategy import DefaultStrategy, MCMCStrategy
from gsplat_tpu.utils import save_ply


@dataclass
class Config:
    data_dir: str = "data/360_v2/garden"
    data_factor: int = 4
    result_dir: str = "results/garden"
    test_every: int = 8
    max_steps: int = 30_000
    eval_steps: List[int] = field(default_factory=lambda: [7_000, 30_000])
    save_steps: List[int] = field(default_factory=lambda: [7_000, 30_000])
    batch_size: int = 1
    init_type: str = "sfm"
    init_num_pts: int = 100_000
    init_extent: float = 3.0
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    init_opa: float = 0.1
    init_scale: float = 1.0
    ssim_lambda: float = 0.2
    near_plane: float = 0.01
    far_plane: float = 1e10
    antialiased: bool = False
    # projection camera model (reference simple_trainer.py:73): pinhole |
    # ortho | fisheye. Fisheye trains on the raw (distorted) images with
    # the parser's validity mask zeroing out-of-projection pixels.
    camera_model: str = "pinhole"
    # rasterizer backend: auto (binned on TPU, oracle elsewhere) | oracle |
    # tiled | binned — the reference's GSPLAT_BACKEND selector
    # (gsplat/rendering.py:11-29). The oracle is O(N*pixels) memory; pick
    # tiled/binned for real scene sizes off-TPU.
    backend: str = "auto"
    random_bkgd: bool = False
    white_bkgd: bool = False  # composite over white (synthetic datasets)
    # LPIPS eval (reference simple_trainer.py:429-442): path to weights
    # (.npz canonical or torch state dict); metric is skipped when empty
    # or missing (no pretrained weights ship offline)
    lpips_weights: str = ""
    lpips_net: str = "alex"  # or "vgg"
    opacity_reg: float = 0.0
    scale_reg: float = 0.0
    means_lr: float = 1.6e-4
    scales_lr: float = 5e-3
    quats_lr: float = 1e-3
    opacities_lr: float = 5e-2
    sh0_lr: float = 2.5e-3
    shN_lr: float = 2.5e-3 / 20
    strategy_name: str = "default"
    # DefaultStrategy knobs
    grow_grad2d: float = 0.0002
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    refine_every: int = 100
    reset_every: int = 3000
    absgrad: bool = False
    # MCMC knobs
    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    # auxiliary modules (reference simple_trainer.py:380-451)
    pose_opt: bool = False
    pose_opt_lr: float = 1e-5
    pose_opt_reg: float = 1e-6
    pose_noise: float = 0.0
    app_opt: bool = False
    app_opt_lr: float = 1e-3
    app_opt_reg: float = 1e-6
    app_embed_dim: int = 16
    app_feature_dim: int = 32
    use_bilateral_grid: bool = False
    bilateral_grid_lr: float = 2e-3
    bilateral_tv_lambda: float = 10.0
    depth_loss: bool = False
    depth_lambda: float = 1e-2
    # distributed training (reference: multi-GPU via gsplat/distributed.py;
    # here: Gaussian-sharded mesh + all_to_all, one camera per device)
    distributed: bool = False
    # packed exchange (reference packed=True, gsplat/rendering.py:416-459):
    # each owner shard compacts its visible Gaussians into a fixed
    # pack_capacity buffer before the all-to-all — less ICI traffic when
    # visibility is sparse; capacity grows out-of-jit via pack_required
    packed: bool = False
    resume: str = ""  # path to a ckpt_*.npz to resume training from
    # milestone artifacts (reference simple_trainer.py:703-718,934-1023)
    render_traj: bool = False  # fly-through video at eval steps
    render_traj_path: str = "interp"  # or "ellipse"
    compression: str = ""  # "png": compress + round-trip eval at save steps
    tb_every: int = 100  # TensorBoard scalar cadence (0 = disable)
    tb_save_image: bool = False  # log train-view render images to TB
    # TPU pool management
    pool_headroom: float = 2.0  # initial capacity = N0 * headroom
    pool_grow_at: float = 0.9  # grow pool when live fraction exceeds this
    isect_headroom: float = 1.5
    # capacity growths re-jit the step (~minutes each through the remote
    # tunnel); growth events PROJECT the final need from the observed
    # densification rate instead of stepping x1.5, bounding mid-run
    # recompiles to ~1 (VERDICT r4 item 5). Clamp on the projection:
    pool_grow_max: float = 8.0  # never grow more than this per event
    isect_capacity_init: int = 0  # expert pre-size (0 = probe-derived)
    steps_scaler: float = 1.0
    tile_size: int = 32  # TPU-optimal (see PERF.md); reference GPU uses 16
    seed: int = 42

    def scale_steps(self):
        if self.steps_scaler != 1.0:
            s = self.steps_scaler
            self.max_steps = int(self.max_steps * s)
            self.eval_steps = [int(v * s) for v in self.eval_steps]
            self.save_steps = [int(v * s) for v in self.save_steps]
            self.refine_start_iter = int(self.refine_start_iter * s)
            self.refine_stop_iter = int(self.refine_stop_iter * s)
            self.reset_every = int(self.reset_every * s)
            self.refine_every = int(self.refine_every * s)
            self.sh_degree_interval = int(self.sh_degree_interval * s)


def parse_config() -> Config:
    cfg = Config()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("strategy", nargs="?", default="default",
                    choices=["default", "mcmc"])
    for f_ in cfg.__dataclass_fields__.values():
        if f_.name == "strategy_name":
            continue
        flag = "--" + f_.name.replace("_", "-")
        if f_.type == "bool" or isinstance(getattr(cfg, f_.name), bool):
            ap.add_argument(flag, action="store_true",
                            default=getattr(cfg, f_.name))
        elif isinstance(getattr(cfg, f_.name), list):
            ap.add_argument(flag, type=int, nargs="*",
                            default=getattr(cfg, f_.name))
        else:
            ap.add_argument(flag, type=type(getattr(cfg, f_.name)),
                            default=getattr(cfg, f_.name))
    args = ap.parse_args()
    for k, v in vars(args).items():
        if k == "strategy":
            cfg.strategy_name = v
        else:
            setattr(cfg, k, v)
    cfg.scale_steps()
    return cfg


def _round_up(x, m):
    return (x + m - 1) // m * m


def _tree_leaves_np(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def _tree_restore(template, leaves):
    t_leaves, treedef = jax.tree.flatten(template)
    assert len(t_leaves) == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, expected {len(t_leaves)}"
    )
    return jax.tree.unflatten(
        treedef, [jnp.asarray(l) for l in leaves]
    )


def create_splats(cfg: Config, parser: Parser, cap: int, key) -> Dict[str, jnp.ndarray]:
    """Initialize splats from SfM points (simple_trainer.py:196-280) into a
    `cap`-slot padded pool."""
    if cfg.init_type == "sfm":
        points = parser.points
        rgbs = parser.points_rgb.astype(np.float32) / 255.0
    else:
        rng = np.random.default_rng(cfg.seed)
        points = cfg.init_extent * parser.scene_scale * (
            rng.random((cfg.init_num_pts, 3)).astype(np.float32) * 2 - 1
        )
        rgbs = rng.random((cfg.init_num_pts, 3)).astype(np.float32)

    n0 = points.shape[0]
    dist = knn_distances(points, k=4)[:, 1:]  # exclude self
    dist_avg = np.sqrt(np.mean(dist**2, axis=-1))
    scales = np.log(np.clip(dist_avg, 1e-7, None) * cfg.init_scale)[:, None]
    scales = np.repeat(scales, 3, axis=1)

    K = (cfg.sh_degree + 1) ** 2
    rng = np.random.default_rng(cfg.seed)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n0] = x
        return jnp.asarray(out)

    sh0 = rgb_to_sh(rgbs)[:, None, :]  # [n0, 1, 3]
    params = {
        "means": pad(points),
        "scales": pad(scales.astype(np.float32), fill=-10.0),
        "quats": pad(
            rng.standard_normal((n0, 4)).astype(np.float32), fill=1.0
        ),
        "opacities": pad(
            np.full((n0,), float(np.log(cfg.init_opa / (1 - cfg.init_opa))),
                    np.float32),
            fill=-10.0,
        ),
    }
    if cfg.app_opt:
        # appearance mode: per-gaussian base color + feature vector
        # (reference simple_trainer.py:246-254)
        rgbs_c = np.clip(rgbs, 1e-3, 1 - 1e-3)
        params["colors"] = pad(np.log(rgbs_c / (1 - rgbs_c)))
        params["features"] = jnp.asarray(
            rng.standard_normal((cap, cfg.app_feature_dim)).astype(np.float32)
        )
    else:
        params["sh0"] = pad(sh0.astype(np.float32))
        params["shN"] = jnp.zeros((cap, K - 1, 3), jnp.float32)
    live = jnp.arange(cap) < n0
    return params, live


class Runner:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        os.makedirs(cfg.result_dir, exist_ok=True)
        # dump the resolved config next to the results so every run is
        # reproducible from its artifact dir (reference simple_trainer.py
        # :516-518 dumps cfg to yaml; JSON here — stdlib only)
        with open(os.path.join(cfg.result_dir, "cfg.json"), "w") as f:
            json.dump(
                {k: v for k, v in vars(cfg).items()
                 if isinstance(v, (int, float, str, bool, list, type(None)))},
                f, indent=1, default=str,
            )
        self.parser = Parser(
            cfg.data_dir, factor=cfg.data_factor, normalize=True,
            test_every=cfg.test_every,
        )
        self.trainset = Dataset(
            self.parser, split="train", load_depths=cfg.depth_loss
        )
        self.valset = Dataset(self.parser, split="val")
        # per-pixel validity masks exist when any camera keeps a distorted
        # projection (fisheye); static for jit — presence decided once here
        self._has_pix_masks = any(
            m is not None for m in self.parser.mask_dict.values()
        )
        self.scene_scale = self.parser.scene_scale * 1.1
        print(f"scene scale: {self.scene_scale:.3f}; "
              f"{len(self.trainset)} train / {len(self.valset)} val images")

        key = jax.random.PRNGKey(cfg.seed)
        n0 = (
            self.parser.points.shape[0]
            if cfg.init_type == "sfm"
            else cfg.init_num_pts
        )
        if cfg.strategy_name == "mcmc":
            cap = _round_up(cfg.cap_max, 4096)
        else:
            cap = _round_up(int(n0 * cfg.pool_headroom), 4096)
        self.params, self.live = create_splats(cfg, self.parser, cap, key)
        print(f"initialized {n0} splats in a {cap}-slot pool")

        if cfg.strategy_name == "mcmc":
            self.strategy = MCMCStrategy(
                cap_max=cfg.cap_max,
                noise_lr=cfg.noise_lr,
                refine_start_iter=cfg.refine_start_iter,
                refine_stop_iter=int(25_000 * cfg.steps_scaler),
                refine_every=cfg.refine_every,
            )
        else:
            self.strategy = DefaultStrategy(
                grow_grad2d=cfg.grow_grad2d,
                refine_start_iter=cfg.refine_start_iter,
                refine_stop_iter=cfg.refine_stop_iter,
                refine_every=cfg.refine_every,
                reset_every=cfg.reset_every,
                absgrad=cfg.absgrad,
            )
        self.strategy_state = self.strategy.initialize_state(
            cap, scene_scale=self.scene_scale
        )

        self._build_optimizers()

        # auxiliary trainable modules (pose / appearance / bilateral grid)
        import optax

        key = jax.random.PRNGKey(cfg.seed + 1)
        self.aux_params, self.aux_txs, self.aux_states = {}, {}, {}
        n_imgs = len(self.trainset)
        if cfg.pose_opt:
            self.aux_params["pose"] = init_camera_opt(n_imgs)
            self.aux_txs["pose"] = optax.adamw(
                cfg.pose_opt_lr, weight_decay=cfg.pose_opt_reg
            )
        if cfg.app_opt:
            self.aux_params["app"] = init_appearance_opt(
                n_imgs, cfg.app_feature_dim, key,
                embed_dim=cfg.app_embed_dim, sh_degree=cfg.sh_degree,
            )
            self.aux_txs["app"] = optax.adamw(
                cfg.app_opt_lr, weight_decay=cfg.app_opt_reg
            )
        if cfg.use_bilateral_grid:
            self.aux_params["bilagrid"] = init_bilateral_grid(n_imgs)
            self.aux_txs["bilagrid"] = optax.adam(cfg.bilateral_grid_lr)
        for k in self.aux_params:
            trainable = {
                kk: vv for kk, vv in self.aux_params[k].items()
                if hasattr(vv, "dtype") and jnp.issubdtype(vv.dtype, jnp.floating)
            }
            self.aux_states[k] = self.aux_txs[k].init(trainable)

        self.pose_noise_key = jax.random.PRNGKey(cfg.seed + 2)
        self.isect_capacity = (
            _round_up(int(4e6), 4096)
            if self._backend in ("binned", "tiled")
            else None
        )
        if cfg.isect_capacity_init > 0 and self.isect_capacity is not None:
            # expert pre-size (e.g. from a previous run's final capacity):
            # skips the mid-run growth re-jits entirely
            self.isect_capacity = _round_up(cfg.isect_capacity_init, 4096)
        self._live_hist = []  # (step, n_live) growth records for projection
        # packed-exchange visible-set capacity per (camera, owner shard);
        # grown out-of-jit from meta["pack_required"] like isect_capacity
        self.pack_capacity = 4096
        self._step_fn = None  # compiled lazily; rebuilt on pool growth

        self.mesh = None
        if cfg.distributed:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            n_dev = len(jax.devices())
            assert (
                cfg.batch_size % n_dev == 0 or n_dev % cfg.batch_size == 0
            ), (
                f"batch_size ({cfg.batch_size}) and device count ({n_dev}) "
                "must divide one another: whole cameras per device when "
                "batch >= devices, tile-row strips within each camera when "
                "batch < devices (distributed.py strip layout — the "
                "reference supports only the former, rendering.py:305-306)"
            )
            assert not (cfg.packed and cfg.batch_size % n_dev != 0), (
                "--packed needs whole cameras per device (batch_size >= "
                "device count); the strip layout ships dense payloads"
            )
            # pose/appearance/bilagrid run on replicated params outside the
            # shard_map — jit psums their grads (DDP-equivalent, reference
            # simple_trainer.py:380-410). depth_loss rides the exchange via
            # render_mode="RGB+ED" (the owner shard appends its depth row).
            self.mesh = Mesh(np.array(jax.devices()), ("gauss",))
            shard = NamedSharding(self.mesh, P("gauss"))
            self.params = {
                k: jax.device_put(v, shard) for k, v in self.params.items()
            }
            self.live = jax.device_put(self.live, shard)
            self.opt_states = jax.tree.map(
                lambda x: jax.device_put(x, shard)
                if hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] == self.live.shape[0]
                else x,
                self.opt_states,
            )
            print(f"distributed: {n_dev}-device mesh, Gaussian-sharded pool")

    @property
    def _on_tpu(self):
        return jax.default_backend() == "tpu"

    @property
    def _backend(self):
        """Resolved rasterizer backend (cfg.backend or the platform auto)."""
        if self.cfg.backend != "auto":
            return self.cfg.backend
        return "binned" if self._on_tpu else "oracle"

    def _build_optimizers(self):
        cfg = self.cfg
        max_steps = cfg.max_steps
        means_lr0 = cfg.means_lr * self.scene_scale

        def means_lr(count):
            # exponential decay to 1% over max_steps (simple_trainer.py:523-528)
            return means_lr0 * 0.01 ** (count.astype(jnp.float32) / max_steps)

        lrs = {
            "means": means_lr,
            "scales": cfg.scales_lr,
            "quats": cfg.quats_lr,
            "opacities": cfg.opacities_lr,
            "sh0": cfg.sh0_lr,
            "shN": cfg.shN_lr,
            # appearance mode (reference simple_trainer.py:246-254)
            "colors": cfg.sh0_lr,
            "features": cfg.sh0_lr,
        }
        self.optimizers = {
            k: SelectiveAdam(lrs[k], eps=1e-15) for k in self.params
        }
        self.opt_states = {
            k: self.optimizers[k].init(self.params[k]) for k in self.params
        }

    # --- pool / isect capacity management (out-of-jit, recompiles) --------

    def _projected_final_live(self, step: int, n_live: int):
        """Extrapolate the live-splat count at densification stop from the
        observed per-step growth rate (log-linear fit between the first
        growth-history record and now). Returns None when there is no
        usable history. Intentionally optimistic — the caller clamps by
        pool_grow_max; overshoot costs a few % step time on dead slots,
        undershoot costs a ~minutes re-jit through the remote tunnel."""
        cfg = self.cfg
        stop = min(cfg.refine_stop_iter, cfg.max_steps)
        hist = self._live_hist
        if step is None or step >= stop or not hist:
            return None
        # recent window (last ~5 refine events): densification growth
        # decelerates over training, so a whole-history rate overshoots and
        # a recent-window rate tracks the current regime
        s0, l0 = hist[-min(len(hist), 6)]
        if l0 <= 0 or n_live <= l0 or step <= s0:
            return None
        rate = (n_live / l0) ** (1.0 / (step - s0))  # per-step factor
        return n_live * rate ** (stop - step)

    def _maybe_grow(self, n_isects: int, pack_required: int = 0,
                    step: int = None):
        cfg = self.cfg
        grew = False
        cap = self.live.shape[0]
        n_live = int(jnp.sum(self.live))
        # growth-rate history for the projection (first record = baseline)
        if (
            step is not None
            and n_live > 0
            and (not self._live_hist or n_live != self._live_hist[-1][1])
        ):
            self._live_hist.append((step, n_live))
        if (
            cfg.strategy_name != "mcmc"
            and n_live > cfg.pool_grow_at * cap
        ):
            proj = self._projected_final_live(step, n_live)
            if proj is not None:
                # 1.2x margin over the projected stop-time count, at least
                # one doubling, at most pool_grow_max per event
                target = min(
                    max(proj * 1.2 / cfg.pool_grow_at, cap * 2.0),
                    cap * cfg.pool_grow_max,
                )
            else:
                target = cap * 2.0
            new_cap = _round_up(int(target), 4096)
            grow_ratio = new_cap / cap
            print(
                f"[pool] {n_live}/{cap} live -> growing to {new_cap} "
                f"(projected stop-time live: "
                f"{int(proj) if proj else 'n/a'})"
            )

            def grow(x, fill=0.0):
                pad = jnp.full((new_cap - cap,) + x.shape[1:], fill, x.dtype)
                return jnp.concatenate([x, pad])

            self.params = {k: grow(v) for k, v in self.params.items()}
            self.live = grow(self.live)
            self.opt_states = jax.tree.map(
                lambda x: grow(x) if x.ndim >= 1 and x.shape[0] == cap else x,
                self.opt_states,
            )
            self.strategy_state = {
                k: (grow(v) if hasattr(v, "ndim") and v.ndim >= 1
                    and v.shape[0] == cap else v)
                for k, v in self.strategy_state.items()
            }
            grew = True
            # the intersection demand scales ~linearly with live splats:
            # pre-scale the slab in the SAME recompile event so the pool
            # and slab growths don't each pay a separate re-jit
            if self.isect_capacity is not None and n_isects > 0:
                need = int(
                    n_isects * grow_ratio * cfg.pool_grow_at
                    * cfg.isect_headroom
                )
                if need > self.isect_capacity:
                    self.isect_capacity = _round_up(need, 4096)
                    print(f"[isect] pre-scaled with pool growth -> "
                          f"capacity {self.isect_capacity}")
        if self.isect_capacity is not None and n_isects > 0.8 * self.isect_capacity:
            if n_isects > self.isect_capacity:
                # this step really did render/train on a truncated list
                print(
                    f"[isect] WARNING: n_isects={n_isects} exceeded capacity "
                    f"{self.isect_capacity}; this step was truncated"
                )
            # only recompile when the target actually grows: with
            # isect_headroom <= 1.25 the 0.8 threshold would otherwise
            # re-trigger (and re-jit the step) every single step.
            # Hysteresis: grow at least 2x per event so repeated small
            # overflows can't chain recompiles (each costs ~minutes on
            # the remote tunnel).
            new_cap = _round_up(
                max(int(n_isects * cfg.isect_headroom),
                    2 * self.isect_capacity),
                4096,
            )
            if new_cap > self.isect_capacity:
                self.isect_capacity = new_cap
                print(f"[isect] n_isects={n_isects} -> capacity {new_cap}")
                grew = True
        if cfg.packed and pack_required > 0.8 * self.pack_capacity:
            if pack_required > self.pack_capacity:
                print(
                    f"[pack] WARNING: pack_required={pack_required} exceeded "
                    f"capacity {self.pack_capacity}; this step was truncated"
                )
            new_cap = _round_up(int(pack_required * cfg.isect_headroom), 512)
            if new_cap > self.pack_capacity:
                self.pack_capacity = new_cap
                print(f"[pack] pack_required={pack_required} -> "
                      f"capacity {new_cap}")
                grew = True
        if grew:
            self._step_fn = None

    # --- the jitted step ---------------------------------------------------

    def _raster_train(
        self, params, colors, sh_deg_arg, viewmats, Ks, width, height,
        carrier, live, backend, isect_capacity, render_mode,
    ):
        """Render hook used inside the jitted training step.

        Returns (rgb, alphas, depths_map_or_None, meta, geom) where `geom`
        carries model-family-specific outputs consumed by `_geom_losses`.
        Overridden by the 2DGS runner."""
        cfg = self.cfg
        render, alphas, meta = rasterization(
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
            rasterize_mode="antialiased" if cfg.antialiased else "classic",
            render_mode=render_mode,
            backend=backend,
            isect_capacity=isect_capacity,
            means2d_carrier=carrier,
            masks=live,
            tile_size=cfg.tile_size,
            absgrad=cfg.absgrad,
            camera_model=cfg.camera_model,
        )
        depths_map = None
        if cfg.depth_loss:
            depths_map = render[..., -1:]
            render = render[..., :-1]
        return render, alphas, depths_map, meta, {}

    def _raster_train_distributed(
        self, params, colors, sh_deg_arg, viewmats, Ks, width, height,
        carrier, live, backend, isect_capacity, render_mode, mesh,
    ):
        """Distributed render hook: Gaussian-sharded projection + a2a
        exchange; aux modules (pose/appearance/bilagrid) run OUTSIDE the
        shard_map on replicated params — jit inserts their gradient psums,
        the SPMD equivalent of the reference's DDP wrappers
        (simple_trainer.py:380-410). True per-Gaussian radii come back
        owner-side for SelectiveAdam/strategy stats. Overridden by the
        2DGS runner."""
        cfg = self.cfg
        from gsplat_tpu.distributed import (
            rasterization_distributed, rasterization_distributed_packed,
        )

        kwargs = dict(
            mesh=mesh,
            sh_degree=sh_deg_arg,
            near_plane=cfg.near_plane,
            far_plane=cfg.far_plane,
            tile_size=cfg.tile_size,
            backend=backend,
            isect_capacity=isect_capacity,
            masks=live,
            means2d_carrier=carrier,
            render_mode=render_mode,
            absgrad=cfg.absgrad,
            camera_model=cfg.camera_model,
        )
        if cfg.packed:
            # appearance-mode per-camera colors don't ride the packed sort
            assert sh_deg_arg is not None, (
                "--packed requires SH colors (no --app-opt)"
            )
            fn = rasterization_distributed_packed
            kwargs["pack_capacity"] = self.pack_capacity
        else:
            fn = rasterization_distributed
            kwargs["per_camera_colors"] = sh_deg_arg is None
        render, alphas, meta = fn(
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
        depths_map = None
        if cfg.depth_loss:
            depths_map = render[..., -1:]
            render = render[..., :-1]
        return render, alphas, depths_map, meta, {}

    def _geom_losses(self, loss, geom, alphas):
        """Extra geometry loss terms (2DGS normal/distortion); no-op here."""
        return loss

    def _step_extra_key(self):
        """Extra static state baked into the jitted step (e.g. 2DGS loss
        warmup flags); part of the step-recompile cache key."""
        return ()

    def _make_step(self, width: int, height: int, sh_degree: int):
        cfg = self.cfg
        # the binned engine (emit -> payload sort -> Pallas kernels) is the
        # fast path on TPU for BOTH single-device and distributed training
        # (2.57x over tiled at grid5 — PERF.md); oracle off-TPU (tests).
        # --backend overrides (the reference's GSPLAT_BACKEND env,
        # gsplat/rendering.py:11-29); the oracle is O(N*pixels) memory —
        # pick tiled/binned for real scene sizes off-TPU.
        backend = self._backend
        if backend != "oracle" and self.isect_capacity is None:
            self.isect_capacity = _round_up(int(4e6), 4096)
        isect_capacity = self.isect_capacity
        optimizers = self.optimizers
        aux_txs = self.aux_txs
        render_mode = "RGB+ED" if cfg.depth_loss else "RGB"

        mesh = self.mesh

        def step_fn(
            params, opt_states, live, aux_params, aux_states,
            camtoworlds, Ks, pixels, image_ids, bkgd, pts, pt_depths,
            pix_mask, key,
        ):
            cap = live.shape[0]
            B = camtoworlds.shape[0]
            carrier = jnp.zeros((B, cap, 2), jnp.float32)

            # hook points for the 2DGS runner (which inherits the full loop
            # incl. pose/appearance/bilagrid/depth/batching/resume)
            def loss_fn(params, aux_params, carrier):
                c2w = camtoworlds
                if "pose" in aux_params:
                    c2w = apply_camera_opt(aux_params["pose"], c2w, image_ids)
                viewmats = jnp.linalg.inv(c2w)

                if cfg.app_opt:
                    dirs = (
                        params["means"][None, :, :] - c2w[:, None, :3, 3]
                    )
                    colors = apply_appearance_opt(
                        aux_params["app"], params["features"], image_ids,
                        dirs, sh_degree,
                    )
                    colors = jax.nn.sigmoid(colors + params["colors"][None])
                    sh_deg_arg = None
                else:
                    colors = jnp.concatenate(
                        [params["sh0"], params["shN"]], axis=1
                    )
                    sh_deg_arg = sh_degree

                if mesh is not None:
                    render, alphas, depths_map, meta, geom = (
                        self._raster_train_distributed(
                            params, colors, sh_deg_arg, viewmats, Ks, width,
                            height, carrier, live, backend, isect_capacity,
                            render_mode, mesh,
                        )
                    )
                else:
                    render, alphas, depths_map, meta, geom = self._raster_train(
                        params, colors, sh_deg_arg, viewmats, Ks, width, height,
                        carrier, live, backend, isect_capacity, render_mode,
                    )
                if pix_mask is not None:
                    # reference rasterize_splats: render_colors[~masks] = 0
                    # (simple_trainer.py:505-506)
                    render = render * pix_mask
                if "bilagrid" in aux_params:
                    render = slice_grid(aux_params["bilagrid"], image_ids, render)
                if bkgd is not None:
                    render = render + bkgd * (1.0 - alphas)
                loss = train_loss(render, pixels, cfg.ssim_lambda)
                loss = self._geom_losses(loss, geom, alphas)
                if cfg.depth_loss:
                    # disparity L1 at SfM projections
                    # (reference simple_trainer.py:647-668)
                    xi = jnp.clip(pts[..., 0].astype(jnp.int32), 0, width - 1)
                    yi = jnp.clip(pts[..., 1].astype(jnp.int32), 0, height - 1)
                    d_pred = depths_map[
                        jnp.arange(B)[:, None], yi, xi, 0
                    ]  # [B, P]
                    valid = pt_depths > 0
                    disp = jnp.where(valid, 1.0 / jnp.clip(d_pred, 1e-6, None), 0.0)
                    disp_gt = jnp.where(
                        valid, 1.0 / jnp.clip(pt_depths, 1e-6, None), 0.0
                    )
                    nl = jnp.clip(jnp.sum(valid), 1, None)
                    loss = loss + cfg.depth_lambda * jnp.sum(
                        jnp.abs(disp - disp_gt)
                    ) / nl * self.scene_scale
                if "bilagrid" in aux_params:
                    loss = loss + cfg.bilateral_tv_lambda * total_variation_loss(
                        aux_params["bilagrid"]["grids"]
                    )
                if cfg.opacity_reg > 0.0:
                    op = jnp.where(live, jax.nn.sigmoid(params["opacities"]), 0.0)
                    loss = loss + cfg.opacity_reg * jnp.sum(op) / jnp.sum(live)
                if cfg.scale_reg > 0.0:
                    sc = jnp.where(live[:, None], jnp.exp(params["scales"]), 0.0)
                    loss = loss + cfg.scale_reg * jnp.sum(sc) / (3 * jnp.sum(live))
                aux = {
                    "radii": meta["radii"],
                    # capacity feedback: the binned engine reports the slab
                    # budget it needs (>= n_isects); tiled reports n_isects
                    "n_isects": meta.get(
                        "slab_required", meta.get("n_isects", jnp.int32(0))
                    ),
                    # packed-exchange truncation signal (0 when not packed)
                    "pack_required": meta.get("pack_required", jnp.int32(0)),
                }
                return loss, aux

            lf = loss_fn
            (loss, aux), (g_params, g_aux, g_carrier) = jax.value_and_grad(
                lf, argnums=(0, 1, 2), has_aux=True
            )(params, aux_params, carrier)

            visibility = jnp.any(aux["radii"] > 0, axis=0)  # [cap]
            new_states = {}
            for k in params:
                upd, st = optimizers[k].update(
                    g_params[k], opt_states[k], params[k], visibility
                )
                params = {**params, k: params[k] + upd}
                new_states[k] = st

            import optax as _optax

            new_aux_states = {}
            new_aux_params = dict(aux_params)
            for k in aux_params:
                trainable = {
                    kk: vv for kk, vv in aux_params[k].items()
                    if hasattr(vv, "dtype")
                    and jnp.issubdtype(vv.dtype, jnp.floating)
                }
                g_tr = {kk: g_aux[k][kk] for kk in trainable}
                upd, st = aux_txs[k].update(g_tr, aux_states[k], trainable)
                new_aux_params[k] = {
                    **aux_params[k], **_optax.apply_updates(trainable, upd)
                }
                new_aux_states[k] = st

            return (
                params, new_states, new_aux_params, new_aux_states,
                loss, aux["radii"], g_carrier, aux["n_isects"],
                aux["pack_required"],
            )

        return jax.jit(step_fn, donate_argnums=(0, 1, 3, 4))

    # --- training loop ------------------------------------------------------

    def _probe_isect_capacity(self):
        """Right-size the intersection/slab budget from the actual scene.

        The binned engine's emit/sort/reduce stages all scale with the
        static capacity; the blanket 4M default is ~20x oversized for small
        scenes and measurably slows every step. One truncated probe render
        returns the exact requirement (meta['slab_required'] is computed
        before truncation); _maybe_grow handles growth from there."""
        cfg = self.cfg
        if cfg.isect_capacity_init > 0:
            return  # expert pre-size wins over the probe
        if not (self._on_tpu or cfg.backend in ("binned", "tiled")):
            return
        try:
            data = self.trainset[0]
            H, W = data["image"].shape[:2]
            colors = jnp.concatenate(
                [self.params["sh0"], self.params["shN"]], axis=1
            )
            # under the mesh: n_dev copies of the probe camera -> each shard
            # rasterizes one full-scene camera, so slab_required is the true
            # per-shard budget for the one-camera-per-device layout
            n_rep = len(jax.devices()) if self.mesh is not None else 1
            _, _, meta = self.render_probe(
                jnp.tile(jnp.asarray(data["camtoworld"])[None], (n_rep, 1, 1)),
                jnp.tile(jnp.asarray(data["K"])[None], (n_rep, 1, 1)),
                W, H, colors,
            )
            need = int(meta.get("slab_required", meta.get("n_isects", 0)))
            if need > 0:
                self.isect_capacity = _round_up(
                    max(int(need * cfg.isect_headroom * 1.5), 65536), 4096
                )
                print(f"[isect] probed slab_required={need} -> "
                      f"capacity {self.isect_capacity}")
        except Exception as e:  # pragma: no cover - probe is best-effort
            print(f"[isect] capacity probe failed ({e}); keeping "
                  f"{self.isect_capacity}")

    def render_probe(self, camtoworlds, Ks, width, height, colors):
        """Tiny-capacity truncated render used only for the budget probe."""
        if self.mesh is not None:
            from gsplat_tpu.distributed import rasterization_distributed

            return rasterization_distributed(
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
                backend=self._backend,
                isect_capacity=4096,
                masks=self.live,
                tile_size=self.cfg.tile_size,
                camera_model=self.cfg.camera_model,
            )
        return rasterization(
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
            backend=self._backend,
            isect_capacity=4096,
            masks=self.live,
            tile_size=self.cfg.tile_size,
            camera_model=self.cfg.camera_model,
        )

    def train(self):
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed)
        stats_path = os.path.join(cfg.result_dir, "stats.jsonl")
        t_start = time.time()

        step_img_shape = None
        start_step = 0
        if cfg.resume:
            start_step = self.load(cfg.resume)
            self._step_fn = None

        n_train = len(self.trainset)
        self._probe_isect_capacity()

        if start_step >= cfg.max_steps:
            # eval-only invocation from a final checkpoint (reference
            # `--ckpt` mode, simple_trainer.py:1055-1067): produce the
            # milestone artifacts without training; main() runs eval after
            print(f"resume step {start_step} >= max_steps — eval-only mode")
            if cfg.render_traj:
                self.render_traj(start_step)
            if cfg.compression:
                assert cfg.compression == "png", cfg.compression
                self.run_compression(start_step)
            return

        def data_index(step_i, slot):
            # deterministic per-(epoch, position): resume-stable
            flat = step_i * cfg.batch_size + slot
            epoch, pos = divmod(flat, n_train)
            perm = np.random.default_rng(cfg.seed + 7919 * epoch).permutation(
                n_train
            )
            return int(perm[pos])

        for step in range(start_step, cfg.max_steps):
            batch = [
                self.trainset[data_index(step, i)]
                for i in range(cfg.batch_size)
            ]
            data = batch[0]

            pixels = jnp.asarray(np.stack([b["image"] for b in batch]))
            camtoworlds = jnp.asarray(np.stack([b["camtoworld"] for b in batch]))
            Ks = jnp.asarray(np.stack([b["K"] for b in batch]))
            H, W = pixels.shape[1:3]
            sh_degree = min(step // cfg.sh_degree_interval, cfg.sh_degree)

            self._cur_step = step
            step_key = (W, H, sh_degree) + self._step_extra_key()
            if self._step_fn is None or step_img_shape != step_key:
                self._step_fn = self._make_step(W, H, sh_degree)
                step_img_shape = step_key

            # fold_in(step): the key stream is a pure function of (seed,
            # step) so checkpoint resume reproduces the exact trajectory
            k_base = jax.random.fold_in(key, step)
            k_step, k_strat = jax.random.split(k_base)
            if cfg.random_bkgd:
                bkgd = jax.random.uniform(k_step, (1, 1, 1, 3))
            elif cfg.white_bkgd:
                bkgd = jnp.ones((1, 1, 1, 3))
            else:
                bkgd = None
            image_ids = jnp.asarray([b["image_id"] for b in batch], jnp.int32)
            P_MAX = 4096
            B = len(batch)
            if cfg.depth_loss and "points" in data:
                pts_np = np.zeros((B, P_MAX, 2), np.float32)
                dep_np = np.zeros((B, P_MAX), np.float32)
                for bi, b in enumerate(batch):
                    n_b = min(len(b["points"]), P_MAX)
                    pts_np[bi, :n_b] = b["points"][:n_b]
                    dep_np[bi, :n_b] = b["depths"][:n_b]
                pts = jnp.asarray(pts_np)
                pt_depths = jnp.asarray(dep_np)
            else:
                pts = jnp.zeros((B, P_MAX, 2), jnp.float32)
                pt_depths = jnp.zeros((B, P_MAX), jnp.float32)
            if self._has_pix_masks:
                pm = np.ones((B, H, W, 1), np.float32)
                for bi, b_ in enumerate(batch):
                    if "mask" in b_:
                        pm[bi, ..., 0] = b_["mask"]
                pix_mask = jnp.asarray(pm)
            else:
                pix_mask = None
            (
                self.params, self.opt_states, self.aux_params,
                self.aux_states, loss, radii, g_carrier, n_isects,
                pack_required,
            ) = self._step_fn(
                self.params, self.opt_states, self.live,
                self.aux_params, self.aux_states,
                camtoworlds, Ks, pixels, image_ids, bkgd, pts, pt_depths,
                pix_mask, k_step,
            )

            # n_cameras is the actual camera-batch size: the reference
            # normalizes densification grads to pixel units *per camera*
            # and multiplies by the batch size (gsplat/strategy/default.py:
            # 225-226), so batch_size > 1 must not dilute the statistics.
            meta = {
                "radii": radii, "width": W, "height": H, "n_cameras": B,
            }
            if isinstance(self.strategy, DefaultStrategy):
                # absgrad mode: the carrier gradient is already the per-tile
                # |d mu2d| accumulation (rasterization(absgrad=True) routes
                # the carrier through the abs path inside the backward
                # kernel), matching rasterize_to_pixels_bwd.py:282-292.
                (
                    self.params, self.live, self.opt_states, self.strategy_state
                ) = self.strategy.step_post_backward(
                    self.params, self.live, self.opt_states,
                    self.strategy_state, step, meta, g_carrier, k_strat,
                )
            else:
                lr_now = (
                    cfg.means_lr * self.scene_scale
                    * 0.01 ** (step / cfg.max_steps)
                )
                (
                    self.params, self.live, self.opt_states, self.strategy_state
                ) = self.strategy.step_post_backward(
                    self.params, self.live, self.opt_states,
                    self.strategy_state, step, lr_now, k_strat,
                )

            # Overflow check EVERY step: isect_tiles silently truncates past
            # capacity, so a densification spike must trigger growth at the
            # very next step, not up to 99 steps later (n_isects is already
            # a jitted-step output, so this costs only the host sync).
            self._maybe_grow(int(n_isects), int(pack_required), step=step)

            if step % 100 == 0:
                n_live = int(jnp.sum(self.live))
                print(
                    f"step {step}: loss={float(loss):.4f} n_live={n_live} "
                    f"n_isects={int(n_isects)} "
                    f"({(time.time() - t_start):.0f}s)"
                )
                with open(stats_path, "a") as f:
                    f.write(json.dumps({
                        "step": step, "loss": float(loss), "n_live": n_live,
                        "elapsed_s": time.time() - t_start,
                    }) + "\n")
            if cfg.tb_every > 0 and step % cfg.tb_every == 0 and self._tb:
                # scalar cadence parity: reference simple_trainer.py:703-718
                tb = self._tb
                tb.add_scalar("train/loss", float(loss), step)
                tb.add_scalar("train/num_GS", int(jnp.sum(self.live)), step)
                tb.add_scalar("train/n_isects", int(n_isects), step)
                tb.add_scalar(
                    "train/mem_params_mb",
                    sum(v.nbytes for v in self.params.values()) / 2**20,
                    step,
                )
                if cfg.tb_save_image:
                    H, W = pixels.shape[1:3]
                    rgb, _, _ = self.render(camtoworlds[:1], Ks[:1], W, H)
                    canvas = np.concatenate(
                        [np.asarray(pixels[0]), np.clip(np.asarray(rgb[0]), 0, 1)],
                        axis=1,
                    )
                    tb.add_image(
                        "train/render", canvas, step, dataformats="HWC"
                    )
                tb.flush()

            if step + 1 in cfg.eval_steps:
                self.eval(step + 1)
                if cfg.render_traj:
                    self.render_traj(step + 1)
            if step + 1 in cfg.save_steps:
                self.save(step + 1)
                if cfg.compression:
                    assert cfg.compression == "png", cfg.compression
                    self.run_compression(step + 1)

        print(f"training done in {(time.time() - t_start) / 60:.1f} min")

    def render(self, camtoworlds, Ks, width, height, sh_degree=None):
        if self.cfg.app_opt:
            dirs = self.params["means"][None, :, :] - camtoworlds[:, None, :3, 3]
            colors = apply_appearance_opt(
                self.aux_params["app"], self.params["features"], None,
                dirs, self.cfg.sh_degree if sh_degree is None else sh_degree,
            )
            colors = jax.nn.sigmoid(colors + self.params["colors"][None])
            sh_degree = None
            return rasterization(
                self.params["means"],
                self.params["quats"],
                jnp.exp(self.params["scales"]),
                jax.nn.sigmoid(self.params["opacities"]),
                colors,
                jnp.linalg.inv(camtoworlds),
                Ks,
                width,
                height,
                sh_degree=None,
                backend=self._backend,
                isect_capacity=self.isect_capacity,
                masks=self.live,
                tile_size=self.cfg.tile_size,
            )
        colors = jnp.concatenate([self.params["sh0"], self.params["shN"]], axis=1)
        backend = self._backend
        return rasterization(
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
            backend=backend,
            isect_capacity=self.isect_capacity,
            masks=self.live,
            tile_size=self.cfg.tile_size,
            camera_model=self.cfg.camera_model,
        )

    @property
    def _tb(self):
        """Lazy TensorBoard writer (reference simple_trainer.py:330-333);
        None when tensorboard isn't importable or tb_every == 0."""
        if not hasattr(self, "_tb_writer"):
            self._tb_writer = None
            if self.cfg.tb_every > 0:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb_writer = SummaryWriter(
                        log_dir=os.path.join(self.cfg.result_dir, "tb")
                    )
                except ImportError:
                    pass
        return self._tb_writer

    def render_traj(self, step: int):
        """Fly-through video along a path fit to the train cameras
        (reference simple_trainer.py:934-1006). Writes
        result_dir/videos/traj_{path}_{step}.mp4."""
        from gsplat_tpu.datasets.traj import (
            generate_ellipse_path_z, generate_interpolated_path,
        )

        cfg = self.cfg
        c2w_all = self.parser.camtoworlds[:, :3, :4]
        if cfg.render_traj_path == "ellipse":
            height = float(np.mean(c2w_all[:, 2, 3]))
            path = generate_ellipse_path_z(c2w_all, height=height)
        else:
            path = generate_interpolated_path(c2w_all, 1)
        data = self.valset[0]
        K = np.asarray(data["K"])
        H, W = data["image"].shape[:2]
        frames = []
        for c2w34 in path:
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :4] = c2w34
            rgb, alphas, _ = self.render(
                jnp.asarray(c2w)[None], jnp.asarray(K)[None], W, H
            )
            if cfg.white_bkgd:
                rgb = rgb + (1.0 - alphas)
            frames.append(
                (np.clip(np.asarray(rgb[0]), 0, 1) * 255).astype(np.uint8)
            )
        vdir = os.path.join(cfg.result_dir, "videos")
        os.makedirs(vdir, exist_ok=True)
        out = os.path.join(vdir, f"traj_{cfg.render_traj_path}_{step}.mp4")
        try:
            import imageio.v2 as imageio

            imageio.mimwrite(out, frames, fps=30)
            print(f"wrote {out} ({len(frames)} frames)")
        except Exception as e:  # pragma: no cover - codec availability
            out = out.replace(".mp4", "_frames.npz")
            np.savez_compressed(out, frames=np.stack(frames))
            print(f"mp4 writer unavailable ({e}); wrote {out}")
        return out

    def run_compression(self, step: int):
        """Compress the live splats, then round-trip eval (reference
        simple_trainer.py:1008-1023 run_compression)."""
        from gsplat_tpu.compression import PngCompression

        cdir = os.path.join(self.cfg.result_dir, f"compression_{step}")
        live = np.asarray(self.live)
        splats = {
            k: np.asarray(v)[live]
            for k, v in self.params.items()
            if k in ("means", "scales", "quats", "opacities", "sh0", "shN")
        }
        comp = PngCompression()
        comp.compress(cdir, splats)
        size = sum(
            os.path.getsize(os.path.join(cdir, f)) for f in os.listdir(cdir)
        )
        restored = comp.decompress(cdir)
        # round-trip eval: swap the live pool contents, eval, restore
        saved = {k: self.params[k] for k in restored}
        n = restored["means"].shape[0]
        for k, v in restored.items():
            self.params[k] = jnp.asarray(
                np.concatenate(
                    [v, np.zeros((live.shape[0] - n,) + v.shape[1:], v.dtype)]
                )
            )
        saved_live = self.live
        self.live = jnp.arange(live.shape[0]) < n
        stats = self.eval(step)
        self.params.update(saved)
        self.live = saved_live
        report = {"step": step, "size_bytes": int(size), **stats}
        with open(os.path.join(cdir, "report.json"), "w") as f:
            json.dump(report, f)
        print("COMPRESSION", json.dumps(report))
        return report

    def eval(self, step: int):
        psnrs, ssims, lpipss = [], [], []
        lpips_params = getattr(self, "_lpips_params", None)
        if lpips_params is None and self.cfg.lpips_weights:
            from gsplat_tpu.lpips import load_lpips_params

            self._lpips_params = lpips_params = load_lpips_params(
                self.cfg.lpips_weights, self.cfg.lpips_net
            )
            if lpips_params is None:
                print(f"[eval] LPIPS weights not found: {self.cfg.lpips_weights}")
        t0 = time.time()
        for i in range(len(self.valset)):
            data = self.valset[i]
            pixels = jnp.asarray(data["image"])[None]
            H, W = pixels.shape[1:3]
            render, alphas_e, _ = self.render(
                jnp.asarray(data["camtoworld"])[None],
                jnp.asarray(data["K"])[None],
                W, H,
            )
            if self.cfg.white_bkgd:
                render = render + (1.0 - alphas_e)
            if "mask" in data:
                render = render * jnp.asarray(
                    data["mask"], jnp.float32
                )[None, :, :, None]
            render = jnp.clip(render, 0.0, 1.0)
            psnrs.append(float(psnr_fn(render, pixels)))
            ssims.append(float(ssim_fn(render, pixels)))
            if lpips_params is not None:
                from gsplat_tpu.lpips import lpips as lpips_fn

                # alex uses normalize=True ([0,1] inputs); vgg matches the
                # 3DGS-official convention (reference trainer :432-441)
                lpipss.append(float(lpips_fn(
                    lpips_params, render, pixels,
                    net_type=self.cfg.lpips_net,
                    normalize=self.cfg.lpips_net == "alex",
                )))
        dt = (time.time() - t0) / max(len(self.valset), 1)
        stats = {
            "step": step,
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "num_GS": int(jnp.sum(self.live)),
            "per_image_s": dt,
        }
        if lpipss:
            stats["lpips"] = float(np.mean(lpipss))
        print("EVAL", json.dumps(stats))
        with open(os.path.join(self.cfg.result_dir, f"val_step{step}.json"), "w") as f:
            json.dump(stats, f)
        if self._tb:
            for k in ("psnr", "ssim", "lpips", "num_GS"):
                if k in stats:
                    self._tb.add_scalar(f"val/{k}", stats[k], step)
            self._tb.flush()
        return stats

    def save(self, step: int):
        """Full training checkpoint: splats + live mask + optimizer +
        strategy + aux-module state (the reference only supports eval-time
        resume of splats — simple_trainer.py:1055-1067; mid-train resume
        needs the rest)."""
        path = os.path.join(self.cfg.result_dir, f"ckpt_{step}.npz")
        blob = {
            "step": np.asarray(step),
            "live": np.asarray(self.live),
        }
        blob.update({f"splat/{k}": np.asarray(v) for k, v in self.params.items()})
        for i, leaf in enumerate(_tree_leaves_np(self.opt_states)):
            blob[f"opt/{i:04d}"] = leaf
        for k, v in self.strategy_state.items():
            if hasattr(v, "shape"):
                blob[f"strat:{k}"] = np.asarray(v)
        for i, leaf in enumerate(_tree_leaves_np(self.aux_params)):
            blob[f"auxp/{i:04d}"] = leaf
        for i, leaf in enumerate(_tree_leaves_np(self.aux_states)):
            blob[f"auxs/{i:04d}"] = leaf
        np.savez(path, **blob)
        save_ply(
            self.params,
            os.path.join(self.cfg.result_dir, f"splats_{step}.ply"),
            live=self.live,
        )
        print("saved", path)

    def load(self, path: str) -> int:
        """Restore a full checkpoint written by :meth:`save`. The pool is
        re-padded to the checkpoint's capacity first (it may have grown).
        Returns the step to resume from."""
        ckpt = np.load(path)
        cap = ckpt["live"].shape[0]
        cur = self.live.shape[0]
        if cap != cur:
            def resize(x, fill=0.0):
                out = jnp.full((cap,) + x.shape[1:], fill, x.dtype)
                n = min(cap, x.shape[0])
                return out.at[:n].set(x[:n])

            self.params = {k: resize(v) for k, v in self.params.items()}
            self.live = resize(self.live)
            self.opt_states = jax.tree.map(
                lambda x: resize(x)
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cur
                else x,
                self.opt_states,
            )
            self.strategy_state = {
                k: (resize(v) if hasattr(v, "ndim") and v.ndim >= 1
                    and v.shape[0] == cur else v)
                for k, v in self.strategy_state.items()
            }
        self.params = {
            k: jnp.asarray(ckpt[f"splat/{k}"]) for k in self.params
        }
        self.live = jnp.asarray(ckpt["live"])
        opt_leaves = [ckpt[k] for k in sorted(ckpt.files) if k.startswith("opt/")]
        self.opt_states = _tree_restore(self.opt_states, opt_leaves)
        for k in ckpt.files:
            if k.startswith("strat:"):
                name = k.split(":", 1)[1]
                v = ckpt[k]
                self.strategy_state[name] = (
                    float(v) if v.ndim == 0 else jnp.asarray(v)
                )
        auxp = [ckpt[k] for k in sorted(ckpt.files) if k.startswith("auxp/")]
        if auxp:
            self.aux_params = _tree_restore(self.aux_params, auxp)
        auxs = [ckpt[k] for k in sorted(ckpt.files) if k.startswith("auxs/")]
        if auxs:
            self.aux_states = _tree_restore(self.aux_states, auxs)
        step = int(ckpt["step"]) if "step" in ckpt.files else 0
        print(f"resumed from {path} at step {step} (pool cap {cap})")
        return step


def main():
    cfg = parse_config()
    runner = Runner(cfg)
    runner.train()
    runner.eval(cfg.max_steps)


if __name__ == "__main__":
    main()
