"""Strategy interface (parity: gsplat/strategy/base.py:7-50).

A strategy controls densification of the Gaussian pool during training. The
TPU-native contract is functional: every hook takes and returns explicit
state ((params, live, opt_state, strategy state) pytrees) instead of mutating
torch optimizers in place, so the whole step stays jit-able with static
shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax


@dataclass
class Strategy:
    """Base densification strategy."""

    def check_sanity(self, params: Dict[str, jax.Array], live: jax.Array):
        for key in ["means", "scales", "quats", "opacities"]:
            assert key in params, f"{key} is required in params but missing."
        cap = live.shape[0]
        for k, v in params.items():
            assert v.shape[0] == cap, f"param {k} has wrong capacity"

    def initialize_state(self, cap: int, scene_scale: float = 1.0) -> Dict[str, Any]:
        raise NotImplementedError

    def step_pre_backward(self, *args, **kwargs):
        """No-op by default; the TPU pipeline captures 2D-mean gradients via
        the explicit ``means2d_carrier`` argument of ``rasterization`` instead
        of torch's retain_grad (gsplat/strategy/default.py:138-150)."""

    def step_post_backward(self, *args, **kwargs) -> Tuple:
        raise NotImplementedError
