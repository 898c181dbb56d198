"""Visibility-masked Adam (parity: gsplat/optimizers/selective_adam.py:12-87).

The reference subclasses torch.optim.Adam and calls a fused CUDA kernel
(gsplat/cuda/csrc/AdamCUDA.cu:13-47) that skips the whole update — moments
included — for Gaussians invisible in the current batch. On TPU this is one
``jnp.where`` around a standard optax-style Adam update; XLA fuses it into
the same single kernel the CUDA version hand-writes. No sparse gradients are
needed: the masked dense update has the same effect and keeps shapes static.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class SelectiveAdamState(NamedTuple):
    count: jax.Array  # [] int32 global step (for bias correction)
    mu: optax.Params
    nu: optax.Params


def selective_adam(
    learning_rate: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> "SelectiveAdam":
    return SelectiveAdam(learning_rate, b1, b2, eps)


class SelectiveAdam:
    """Adam whose update is gated per-Gaussian by a visibility mask.

    ``update(grads, state, params, visibility)`` — `visibility` is a [cap]
    bool array broadcast over each parameter's trailing dims; invisible rows
    keep their parameters *and* moments untouched (AdamCUDA.cu:24-27 skips
    them entirely). With ``visibility=None`` it is plain Adam.
    """

    def __init__(self, learning_rate, b1=0.9, b2=0.999, eps=1e-8):
        self.learning_rate = learning_rate
        self.b1, self.b2, self.eps = b1, b2, eps

    def init(self, params) -> SelectiveAdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return SelectiveAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(
        self,
        grads,
        state: SelectiveAdamState,
        params=None,
        visibility: Optional[jax.Array] = None,
    ):
        count = state.count + 1
        lr = self.learning_rate(count) if callable(self.learning_rate) else self.learning_rate
        bc1 = 1.0 - self.b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - self.b2 ** count.astype(jnp.float32)

        def vis_for(x):
            if visibility is None:
                return None
            return visibility.reshape(visibility.shape + (1,) * (x.ndim - 1))

        def upd(g, mu, nu):
            v = vis_for(g)
            new_mu = self.b1 * mu + (1 - self.b1) * g
            new_nu = self.b2 * nu + (1 - self.b2) * g * g
            step = -lr * (new_mu / bc1) / (jnp.sqrt(new_nu / bc2) + self.eps)
            if v is not None:
                new_mu = jnp.where(v, new_mu, mu)
                new_nu = jnp.where(v, new_nu, nu)
                step = jnp.where(v, step, 0.0)
            return step, new_mu, new_nu

        flat = jax.tree.map(upd, grads, state.mu, state.nu)
        updates = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
        return updates, SelectiveAdamState(count=count, mu=mu, nu=nu)
