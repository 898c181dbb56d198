"""Densification strategies on the padded pool.

Parity model: /root/reference/tests/test_strategy.py:16-66 runs Default/MCMC
through a real render + backward and checks parameter/optimizer consistency.
Here we additionally check the padded-pool invariants (static shapes, live
mask bookkeeping) and the relocation math against a direct evaluation of
Eq. 9.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gsplat_tpu import rasterization
from gsplat_tpu.relocation import compute_relocation, make_binoms
from gsplat_tpu.strategy import DefaultStrategy, MCMCStrategy, ops


CAP = 128


def _pool(rng, n_live=64, cap=CAP):
    params = {
        "means": jnp.asarray(rng.standard_normal((cap, 3)), jnp.float32),
        "quats": jnp.asarray(rng.standard_normal((cap, 4)), jnp.float32),
        "scales": jnp.asarray(np.log(rng.random((cap, 3)) * 0.2 + 0.02), jnp.float32),
        "opacities": jnp.asarray(rng.standard_normal((cap,)), jnp.float32),
        "colors": jnp.asarray(rng.random((cap, 3)), jnp.float32),
    }
    live = jnp.arange(cap) < n_live
    return params, live


def _adam_state(params):
    tx = optax.adam(1e-2)
    return tx, tx.init(params)


def test_duplicate_fills_free_slots(rng):
    params, live = _pool(rng)
    tx, opt_state = _adam_state(params)
    mask = live & (jnp.arange(CAP) % 4 == 0)  # 16 candidates
    n_before = int(jnp.sum(live))
    extra = {"grad2d": jnp.arange(CAP, dtype=jnp.float32)}

    new_params, new_live, new_opt, new_extra = ops.duplicate(
        params, live, mask, opt_state, extra
    )
    assert int(jnp.sum(new_live)) == n_before + int(jnp.sum(mask))
    # the first free slot received the first candidate's values
    first_free = int(jnp.argmin(live))
    first_cand = int(jnp.argmax(mask))
    np.testing.assert_allclose(
        new_params["means"][first_free], params["means"][first_cand]
    )
    assert float(new_extra["grad2d"][first_free]) == float(extra["grad2d"][first_cand])
    # optimizer state zeroed at the new slot
    mu = new_opt[0].mu["means"]
    np.testing.assert_allclose(mu[first_free], 0.0)


def test_split_shrinks_scales_and_zeroes_state(rng):
    params, live = _pool(rng)
    tx, opt_state = _adam_state(params)
    # give the optimizer state nonzero values
    opt_state = jax.tree.map(lambda x: x + 1.0 if x.ndim > 0 else x, opt_state)
    mask = live & (jnp.arange(CAP) == 3)
    key = jax.random.PRNGKey(0)
    new_params, new_live, new_opt, _ = ops.split(params, live, mask, key, opt_state)
    assert int(jnp.sum(new_live)) == int(jnp.sum(live)) + 1
    # both children have scales / 1.6
    first_free = int(jnp.argmin(live))
    np.testing.assert_allclose(
        np.exp(new_params["scales"][3]), np.exp(params["scales"][3]) / 1.6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.exp(new_params["scales"][first_free]),
        np.exp(params["scales"][3]) / 1.6,
        rtol=1e-5,
    )
    mu = new_opt[0].mu["means"]
    np.testing.assert_allclose(mu[3], 0.0)
    np.testing.assert_allclose(mu[first_free], 0.0)
    # parent slot was moved, not kept
    assert not np.allclose(new_params["means"][3], params["means"][3])


def test_prune_and_reset_opa(rng):
    params, live = _pool(rng)
    tx, opt_state = _adam_state(params)
    mask = live & (jnp.arange(CAP) < 8)
    live2 = ops.remove(live, mask)
    assert int(jnp.sum(live2)) == int(jnp.sum(live)) - 8

    new_params, new_opt = ops.reset_opa(params, live2, 0.01, dict(opt_state[0].mu))
    limit = float(jax.scipy.special.logit(jnp.asarray(0.01)))
    assert float(new_params["opacities"][live2].max()) <= limit + 1e-6


def test_compute_relocation_matches_direct_eq9(rng):
    binoms = make_binoms()
    op = jnp.asarray([0.9, 0.5, 0.1])
    scales = jnp.asarray(rng.random((3, 3)), jnp.float32)
    ratios = jnp.asarray([1, 3, 7], jnp.int32)
    new_op, new_scales = compute_relocation(op, scales, ratios, binoms)

    for idx in range(3):
        n = int(ratios[idx])
        o = float(op[idx])
        no = 1.0 - (1.0 - o) ** (1.0 / n)
        denom = 0.0
        for i in range(1, n + 1):
            for k in range(i):
                denom += (
                    math.comb(i - 1, k)
                    * ((-1.0) ** k / math.sqrt(k + 1))
                    * no ** (k + 1)
                )
        np.testing.assert_allclose(float(new_op[idx]), no, rtol=1e-5)
        np.testing.assert_allclose(
            new_scales[idx], (o / denom) * scales[idx], rtol=1e-4
        )


def test_relocate_moves_dead_onto_live(rng):
    params, live = _pool(rng)
    tx, opt_state = _adam_state(params)
    binoms = make_binoms()
    # make slots 0..3 dead (tiny opacity)
    params["opacities"] = params["opacities"].at[:4].set(-10.0)
    dead = live & (jax.nn.sigmoid(params["opacities"]) <= 0.005)
    assert int(jnp.sum(dead)) == 4
    new_params, new_live, _ = ops.relocate(
        params, live, dead, jax.random.PRNGKey(1), binoms, opt_state
    )
    assert int(jnp.sum(new_live)) == int(jnp.sum(live))
    # relocated slots now have opacity >= min_opacity
    relocated_op = jax.nn.sigmoid(new_params["opacities"][:4])
    assert float(relocated_op.min()) >= 0.005 - 1e-6


def test_default_strategy_end_to_end(rng):
    """Run a few steps of render->grad->refine, shapes stay static."""
    cap = CAP
    params, live = _pool(rng, n_live=48, cap=cap)
    strategy = DefaultStrategy(
        refine_start_iter=0, refine_every=2, reset_every=1000, grow_grad2d=1e-8
    )
    state = strategy.initialize_state(cap, scene_scale=1.0)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    C, W, H = 1, 32, 32
    viewmats = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (C, 1, 1)))
    viewmats = viewmats.at[:, 2, 3].set(4.0)
    Ks = jnp.asarray(
        np.tile(np.array([[25.0, 0, 16], [0, 25.0, 16], [0, 0, 1]], np.float32), (C, 1, 1))
    )
    target = jnp.zeros((C, H, W, 3))

    def loss_fn(params, carrier, live):
        render, _, meta = rasterization(
            params["means"],
            params["quats"],
            jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opacities"]),
            params["colors"],
            viewmats,
            Ks,
            W,
            H,
            means2d_carrier=carrier,
            masks=live,
        )
        return jnp.mean((render - target) ** 2), meta

    carrier = jnp.zeros((C, cap, 2))
    for step in range(1, 5):
        (loss, meta), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            params, carrier, live
        )
        g_params, g_carrier = grads
        updates, opt_state = tx.update(g_params, opt_state, params)
        params = optax.apply_updates(params, updates)
        params, live, opt_state, state = strategy.step_post_backward(
            params, live, opt_state, state, step, meta, g_carrier,
            jax.random.PRNGKey(step),
        )
        for v in params.values():
            assert v.shape[0] == cap  # static!
    assert int(jnp.sum(live)) >= 48  # grew


def test_mcmc_strategy_end_to_end(rng):
    cap = CAP
    params, live = _pool(rng, n_live=40, cap=cap)
    strategy = MCMCStrategy(cap_max=cap, refine_start_iter=0, refine_every=2)
    state = strategy.initialize_state(cap)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    n0 = int(jnp.sum(live))
    for step in range(1, 5):
        params, live, opt_state, state = strategy.step_post_backward(
            params, live, opt_state, state, step, lr=1e-3,
            key=jax.random.PRNGKey(step),
        )
        for v in params.values():
            assert v.shape[0] == cap
        assert np.all(np.isfinite(np.asarray(params["means"])))
    assert int(jnp.sum(live)) > n0  # 5% growth happened
