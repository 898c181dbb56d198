"""MCMC relocation math (Eq. 9 of "3DGS as Markov Chain Monte Carlo").

TPU-native replacement for the reference CUDA kernel
(gsplat/cuda/csrc/RelocationCUDA.cu:11-44, wrapper gsplat/relocation.py:10-49):
the N<=51 double loop over (i, k) becomes one vectorized term table plus a
cumulative sum — pure jnp, fully fused by XLA, differentiation-free.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

N_MAX = 51


def make_binoms(n_max: int = N_MAX) -> jnp.ndarray:
    """Binomial coefficient lookup table [n_max, n_max] (mcmc.py:57-64)."""
    table = [[math.comb(n, k) if k <= n else 0 for k in range(n_max)] for n in range(n_max)]
    return jnp.asarray(table, jnp.float32)


def compute_relocation(
    opacities: jax.Array,  # [M] post-sigmoid
    scales: jax.Array,  # [M, 3] post-exp
    ratios: jax.Array,  # [M] int, number of samples landing on each Gaussian
    binoms: jax.Array,  # [n_max, n_max]
) -> Tuple[jax.Array, jax.Array]:
    """New (opacity, scale) for a Gaussian replaced by `ratios` copies.

    new_opacity = 1 - (1 - o)^(1/n);
    new_scale = o / (sum_{i=1..n} sum_{k=0..i-1} C(i-1,k) (-1)^k
                     new_o^(k+1) / sqrt(k+1)) * scale.
    """
    n_max = binoms.shape[0]
    ratios = jnp.clip(ratios, 1, n_max).astype(jnp.int32)
    new_op = 1.0 - jnp.power(1.0 - opacities, 1.0 / ratios)

    k = jnp.arange(n_max, dtype=jnp.float32)  # [n_max]
    sign = jnp.where(jnp.arange(n_max) % 2 == 0, 1.0, -1.0)
    term = (
        sign / jnp.sqrt(k + 1.0) * jnp.power(new_op[:, None], k[None, :] + 1.0)
    )  # [M, n_max]
    inner = term @ binoms.T  # inner[:, i-1] = sum_k C(i-1,k) term_k
    denom = jnp.cumsum(inner, axis=1)  # denom[:, n-1] = sum_{i<=n} inner_{i-1}
    denom_n = jnp.take_along_axis(denom, (ratios - 1)[:, None], axis=1)[:, 0]
    coeff = opacities / denom_n
    return new_op, coeff[:, None] * scales
