"""3DGS-paper densification strategy (parity: gsplat/strategy/default.py).

Semantics follow the reference (thresholds at default.py:79-94, grow at
:263-310, prune at :312-340, opacity reset at :195-201) with static-shape
mechanics: the pool is padded to a fixed capacity and grow/prune are masked
scatters (see strategy/ops.py). Screen-space gradients arrive through the
``means2d_carrier`` gradient returned by the training step rather than
torch's retain_grad hook.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import ops
from .base import Strategy


@dataclass
class DefaultStrategy(Strategy):
    prune_opa: float = 0.005
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    grow_scale2d: float = 0.05
    prune_scale3d: float = 0.1
    prune_scale2d: float = 0.15
    refine_scale2d_stop_iter: int = 0
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    reset_every: int = 3000
    refine_every: int = 100
    pause_refine_after_reset: int = 0
    absgrad: bool = False
    revised_opacity: bool = False

    def initialize_state(self, cap: int, scene_scale: float = 1.0) -> Dict[str, Any]:
        state = {
            "grad2d": jnp.zeros((cap,), jnp.float32),
            "count": jnp.zeros((cap,), jnp.float32),
            "scene_scale": scene_scale,
        }
        if self.refine_scale2d_stop_iter > 0:
            state["radii"] = jnp.zeros((cap,), jnp.float32)
        return state

    def update_state(
        self,
        state: Dict[str, Any],
        meta: Dict[str, Any],
        v_means2d: jax.Array,  # [C, N, 2] gradient w.r.t. projected means
    ) -> Dict[str, Any]:
        """Accumulate screen-space gradient statistics (default.py:203-261).

        ``v_means2d`` is the loss gradient w.r.t. the ``means2d_carrier``
        input of :func:`gsplat_tpu.rasterization` (|grad| if absgrad mode —
        the caller passes the absolute-valued carrier gradient).
        """
        grads = v_means2d * jnp.asarray(
            [meta["width"] / 2.0, meta["height"] / 2.0], jnp.float32
        ) * meta["n_cameras"]
        sel = meta["radii"] > 0  # [C, N]
        norm = jnp.linalg.norm(grads, axis=-1)  # [C, N]
        state = dict(state)
        state["grad2d"] = state["grad2d"] + jnp.sum(jnp.where(sel, norm, 0.0), axis=0)
        state["count"] = state["count"] + jnp.sum(sel, axis=0).astype(jnp.float32)
        if "radii" in state:
            r = jnp.max(
                jnp.where(sel, meta["radii"], 0), axis=0
            ) / float(max(meta["width"], meta["height"]))
            state["radii"] = jnp.maximum(state["radii"], r)
        return state

    def refine(
        self,
        params: Dict[str, jax.Array],
        live: jax.Array,
        opt_state: Any,
        state: Dict[str, Any],
        step: int,
        key: jax.Array,
        use_scale2d: bool = None,
        prune_too_big: bool = None,
    ) -> Tuple[Dict[str, jax.Array], jax.Array, Any, Dict[str, Any]]:
        """Grow (duplicate + split) then prune (default.py:162-193).

        The two schedule-dependent branches can be passed explicitly as
        static booleans (`use_scale2d` = radii-based split/prune active,
        `prune_too_big` = world/screen-size pruning active); by default they
        derive from `step` like the reference."""
        if use_scale2d is None:
            use_scale2d = step < self.refine_scale2d_stop_iter
        if prune_too_big is None:
            prune_too_big = step > self.reset_every
        k_dup, k_split = jax.random.split(key)
        grads = state["grad2d"] / jnp.clip(state["count"], 1.0, None)
        is_grad_high = (grads > self.grow_grad2d) & live
        is_small = (
            jnp.exp(params["scales"]).max(axis=-1)
            <= self.grow_scale3d * state["scene_scale"]
        )
        is_dupli = is_grad_high & is_small
        is_split = is_grad_high & ~is_small
        if use_scale2d and "radii" in state:
            is_split = is_split | (live & (state["radii"] > self.grow_scale2d))

        params, live, opt_state, state = ops.duplicate(
            params, live, is_dupli, opt_state, state, priority=grads
        )
        params, live, opt_state, state = ops.split(
            params,
            live,
            is_split,
            k_split,
            opt_state,
            state,
            revised_opacity=self.revised_opacity,
            priority=grads,
        )

        is_prune = live & (jax.nn.sigmoid(params["opacities"]) < self.prune_opa)
        if prune_too_big:
            is_too_big = (
                jnp.exp(params["scales"]).max(axis=-1)
                > self.prune_scale3d * state["scene_scale"]
            )
            if use_scale2d and "radii" in state:
                is_too_big = is_too_big | (state["radii"] > self.prune_scale2d)
            is_prune = is_prune | (live & is_too_big)
        live = ops.remove(live, is_prune)

        state = dict(state)
        state["grad2d"] = jnp.zeros_like(state["grad2d"])
        state["count"] = jnp.zeros_like(state["count"])
        if "radii" in state:
            state["radii"] = jnp.zeros_like(state["radii"])
        return params, live, opt_state, state

    def _jitted(self, name, fn):
        cache = self.__dict__.setdefault("_jit_cache", {})
        if name not in cache:
            cache[name] = jax.jit(fn)
        return cache[name]

    def step_post_backward(
        self,
        params: Dict[str, jax.Array],
        live: jax.Array,
        opt_state: Any,
        state: Dict[str, Any],
        step: int,
        meta: Dict[str, Any],
        v_means2d: jax.Array,
        key: jax.Array,
    ):
        """Python-level driver: accumulate stats every step, refine/reset on
        schedule (default.py:152-201). `step` is a Python int, so schedule
        branches stay out of the traced graph; the traced bodies are
        jit-cached (one compile per static branch combination)."""
        # The whole body (state update, refine, opacity reset) stops at
        # refine_stop_iter, matching the reference's early return
        # (gsplat/strategy/default.py:162-163).
        if step >= self.refine_stop_iter:
            return params, live, opt_state, state

        def upd(state, radii, v_means2d):
            m = dict(meta)
            m["radii"] = radii
            return self.update_state(state, m, v_means2d)

        state = self._jitted(
            ("upd", meta["width"], meta["height"], meta["n_cameras"]), upd
        )(state, meta["radii"], v_means2d)
        if (
            self.refine_start_iter < step
            and step % self.refine_every == 0
            and step % self.reset_every >= self.pause_refine_after_reset
        ):
            flags = (
                step < self.refine_scale2d_stop_iter,
                step > self.reset_every,
            )

            def refine(params, live, opt_state, state, key):
                return self.refine(
                    params, live, opt_state, state, step, key,
                    use_scale2d=flags[0], prune_too_big=flags[1],
                )

            params, live, opt_state, state = self._jitted(
                ("refine", flags), refine
            )(params, live, opt_state, state, key)
        if step % self.reset_every == 0:
            params, op_state = self._jitted(
                ("reset",),
                lambda p, l, o: ops.reset_opa(p, l, 2.0 * self.prune_opa, o),
            )(params, live, opt_state)
            opt_state = op_state if op_state is not None else opt_state
        return params, live, opt_state, state
