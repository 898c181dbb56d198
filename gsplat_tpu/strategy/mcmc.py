"""MCMC densification strategy (parity: gsplat/strategy/mcmc.py:12-187).

"3D Gaussian Splatting as Markov Chain Monte Carlo" (arXiv 2404.09591):
every `refine_every` steps, dead (low-opacity) Gaussians teleport onto
samples of live ones and the pool grows by 5% toward `cap_max`; every step,
positions receive opacity-gated anisotropic noise. The fixed-capacity padded
pool is the *natural* representation for this strategy on TPU — `cap_max`
is simply the pool capacity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import ops
from .base import Strategy
from ..relocation import make_binoms


@dataclass
class MCMCStrategy(Strategy):
    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    refine_start_iter: int = 500
    refine_stop_iter: int = 25_000
    refine_every: int = 100
    min_opacity: float = 0.005

    def initialize_state(self, cap: int, scene_scale: float = 1.0) -> Dict[str, Any]:
        return {"binoms": make_binoms()}

    def refine(self, params, live, opt_state, state, key):
        k_rel, k_add = jax.random.split(key)
        binoms = state["binoms"]
        dead = live & (jax.nn.sigmoid(params["opacities"]) <= self.min_opacity)
        params, live, opt_state = ops.relocate(
            params, live, dead, k_rel, binoms, opt_state,
            min_opacity=self.min_opacity,
        )
        # grow 5% toward cap_max == pool capacity (mcmc.py:169-187)
        n_live = jnp.sum(live)
        cap_max = min(self.cap_max, live.shape[0])
        n_target = jnp.minimum(
            jnp.asarray(cap_max, n_live.dtype), (1.05 * n_live).astype(n_live.dtype)
        )
        n_add = jnp.maximum(n_target - n_live, 0)
        params, live, opt_state = ops.sample_add(
            params, live, n_add, k_add, binoms, opt_state,
            min_opacity=self.min_opacity,
        )
        return params, live, opt_state

    def step_post_backward(
        self,
        params: Dict[str, jax.Array],
        live: jax.Array,
        opt_state: Any,
        state: Dict[str, Any],
        step: int,
        lr: float,
        key: jax.Array,
    ):
        """Relocate + grow on schedule, then inject position noise
        (mcmc.py:103-145). `lr` is the current means learning rate."""
        k_ref, k_noise = jax.random.split(key)
        cache = self.__dict__.setdefault("_jit_cache", {})
        if (
            self.refine_start_iter < step < self.refine_stop_iter
            and step % self.refine_every == 0
        ):
            if "refine" not in cache:
                cache["refine"] = jax.jit(
                    lambda p, l, o, s_, k: self.refine(p, l, o, s_, k)
                )
            params, live, opt_state = cache["refine"](
                params, live, opt_state, state, k_ref
            )
        if "noise" not in cache:
            cache["noise"] = jax.jit(ops.inject_noise_to_position)
        params = cache["noise"](params, live, k_noise, scaler=lr * self.noise_lr)
        return params, live, opt_state, state
