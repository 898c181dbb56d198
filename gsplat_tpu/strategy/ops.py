"""Gaussian-pool surgery on a fixed-capacity padded pool, fully jit-able.

TPU-native counterpart of the reference's dynamic-shape parameter surgery
(gsplat/strategy/ops.py:47-369). The reference concatenates/filters parameter
tensors and rebuilds torch optimizer state; under XLA that would force a
recompile at every densification. Here the pool has a static capacity `cap`
and a boolean `live` mask; grow/prune/relocate become masked gathers+scatters
that keep every shape static:

  - duplicate: k-th candidate copied into the k-th free slot
    (ops.py:92-120 semantics; new slots get zeroed optimizer state).
  - split: candidate slot is overwritten by child 1, child 2 goes to a free
    slot; both sampled from the parent (ops.py:123-180; optimizer state
    zeroed at both slots).
  - remove: live &= ~mask (ops.py:183-210).
  - reset_opa: clamp live opacities, zero that parameter's optimizer state
    (ops.py:213-241).
  - relocate / sample_add: MCMC teleportation (ops.py:244-340) with
    categorical sampling over live opacities and Eq. 9 relocation updates.
  - inject_noise_to_position (ops.py:343-369).

Conventions: `params` is a dict of arrays with leading dim `cap`
("opacities" stores logits, "scales" stores logs). `opt_state` is any pytree
(e.g. optax adam state); every leaf with leading dimension `cap` is treated
as per-Gaussian state and zeroed at rewritten slots. `extra` pytrees
(strategy running stats) are copied with the Gaussian instead.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.projection import quat_to_rotmat
from ..relocation import compute_relocation


def _cap_leaves(tree: Any, cap: int, fn):
    """Apply fn to every array leaf with leading dimension `cap`."""
    def leaf(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == cap:
            return fn(x)
        return x

    return jax.tree.map(leaf, tree)


def _expand(ok: jax.Array, x: jax.Array) -> jax.Array:
    return ok.reshape(ok.shape + (1,) * (x.ndim - 1))


def pair_free_slots(
    live: jax.Array, cand: jax.Array, priority: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pair the k-th candidate with the k-th free slot.

    Returns (src [cap] int32 candidate indices first, dst [cap] int32 free
    slots first, ok [cap] bool marking pairs that are in range). When the pool
    is short on free slots, candidates with the highest `priority` win.
    """
    cap = live.shape[0]
    if priority is None:
        src = jnp.argsort(jnp.where(cand, 0, 1), stable=True)
    else:
        src = jnp.argsort(jnp.where(cand, -priority, jnp.inf), stable=True)
    dst = jnp.argsort(live, stable=True)  # free (False) slots first
    k = jnp.arange(cap)
    ok = (k < jnp.sum(cand)) & (k < jnp.sum(~live))
    return src.astype(jnp.int32), dst.astype(jnp.int32), ok


def _scatter_from(params, src, dst, ok, values=None):
    """params[dst] <- values[src] (or params[src]) where ok."""
    def one(name, p):
        v = p if values is None or name not in values else values[name]
        return p.at[dst].set(jnp.where(_expand(ok, p), v[src], p[dst]))

    return {name: one(name, p) for name, p in params.items()}


def duplicate(
    params: Dict[str, jax.Array],
    live: jax.Array,
    mask: jax.Array,
    opt_state: Any = None,
    extra: Any = None,
    priority: Optional[jax.Array] = None,
):
    """Copy masked Gaussians into free slots (gsplat/strategy/ops.py:92-120)."""
    cap = live.shape[0]
    src, dst, ok = pair_free_slots(live, mask, priority)
    params = _scatter_from(params, src, dst, ok)
    live = live.at[dst].set(live[dst] | ok)
    if opt_state is not None:
        opt_state = _cap_leaves(
            opt_state, cap,
            lambda x: x.at[dst].set(jnp.where(_expand(ok, x), 0, x[dst])),
        )
    if extra is not None:
        extra = _cap_leaves(
            extra, cap,
            lambda x: x.at[dst].set(jnp.where(_expand(ok, x), x[src], x[dst])),
        )
    return params, live, opt_state, extra


def split(
    params: Dict[str, jax.Array],
    live: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    opt_state: Any = None,
    extra: Any = None,
    revised_opacity: bool = False,
    priority: Optional[jax.Array] = None,
):
    """Split masked Gaussians into two children sampled from the parent
    (gsplat/strategy/ops.py:123-180): child 1 overwrites the parent's slot,
    child 2 takes a free slot; scales shrink by 1.6; optimizer state is
    zeroed at both slots."""
    cap = live.shape[0]
    scales = jnp.exp(params["scales"])  # [cap, 3]
    rot = quat_to_rotmat(params["quats"])  # [cap, 3, 3]
    z = jax.random.normal(key, (2, cap, 3), params["means"].dtype)
    samples = jnp.einsum("nij,nj,bnj->bni", rot, scales, z)  # [2, cap, 3]

    child = dict(params)
    child["scales"] = jnp.log(scales / 1.6)
    if revised_opacity and "opacities" in params:
        new_op = 1.0 - jnp.sqrt(
            jnp.clip(1.0 - jax.nn.sigmoid(params["opacities"]), 1e-12, None)
        )
        child["opacities"] = jax.scipy.special.logit(jnp.clip(new_op, 1e-7, 1 - 1e-7))

    src, dst, ok = pair_free_slots(live, mask, priority)
    # Child 2 -> free slots. Only pairs that fit (`ok`) actually split.
    vals2 = dict(child)
    vals2["means"] = params["means"] + samples[1]
    params = _scatter_from(params, src, dst, ok, values=vals2)
    live = live.at[dst].set(live[dst] | ok)

    # Child 1 overwrites the parent slot, only for parents that got a child 2.
    did = jnp.zeros((cap,), bool).at[src].set(ok)
    vals1 = dict(child)
    vals1["means"] = params["means"] + samples[0]
    params = {
        name: jnp.where(_expand(did, p), vals1[name][...] if name in vals1 else p, p)
        for name, p in params.items()
    }

    if opt_state is not None:
        def zero_both(x):
            x = x.at[dst].set(jnp.where(_expand(ok, x), 0, x[dst]))
            return jnp.where(_expand(did, x), 0, x)

        opt_state = _cap_leaves(opt_state, cap, zero_both)
    if extra is not None:
        extra = _cap_leaves(
            extra, cap,
            lambda x: x.at[dst].set(jnp.where(_expand(ok, x), x[src], x[dst])),
        )
    return params, live, opt_state, extra


def remove(live: jax.Array, mask: jax.Array) -> jax.Array:
    """Free masked slots (gsplat/strategy/ops.py:183-210); their stale values
    are overwritten (and optimizer state zeroed) when the slot is reused."""
    return live & ~mask


def reset_opa(
    params: Dict[str, jax.Array],
    live: jax.Array,
    value: float,
    opt_state: Any = None,
):
    """Clamp live opacities to logit(value), zero the opacities optimizer
    state (gsplat/strategy/ops.py:213-241)."""
    cap = live.shape[0]
    limit = jax.scipy.special.logit(jnp.asarray(value, jnp.float32))
    op = params["opacities"]
    params = dict(params)
    params["opacities"] = jnp.where(live, jnp.minimum(op, limit), op)
    if opt_state is not None and "opacities" in opt_state:
        opt_state = dict(opt_state)
        opt_state["opacities"] = _cap_leaves(
            opt_state["opacities"], cap, jnp.zeros_like
        )
    return params, opt_state


def _sample_targets(key, live, opacities_sig, cap):
    """One categorical sample per slot, over live Gaussians weighted by opacity."""
    logits = jnp.where(live, jnp.log(jnp.clip(opacities_sig, 1e-12, None)), -jnp.inf)
    return jax.random.categorical(key, logits, shape=(cap,)).astype(jnp.int32)


def _relocation_update(params, targets, used, binoms, min_opacity):
    """Apply Eq. 9 new opacity/scale at sampled target slots.

    `targets` [cap] are sampled indices, `used` [cap] marks which samples are
    real. Returns params with targets updated, plus the per-slot counts.
    """
    cap = used.shape[0]
    counts = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(used, targets, cap)
    ].add(1, mode="drop")
    op_sig = jax.nn.sigmoid(params["opacities"])
    new_op, new_scales = compute_relocation(
        op_sig, jnp.exp(params["scales"]), counts + 1, binoms
    )
    new_op = jnp.clip(new_op, min_opacity, 1.0 - 1e-7)
    hit = counts > 0
    params = dict(params)
    params["opacities"] = jnp.where(
        hit, jax.scipy.special.logit(new_op), params["opacities"]
    )
    params["scales"] = jnp.where(
        hit[:, None], jnp.log(new_scales), params["scales"]
    )
    return params, hit


def relocate(
    params: Dict[str, jax.Array],
    live: jax.Array,
    dead_mask: jax.Array,
    key: jax.Array,
    binoms: jax.Array,
    opt_state: Any = None,
    min_opacity: float = 0.005,
):
    """Teleport dead Gaussians onto samples of live ones
    (gsplat/strategy/ops.py:244-310). Optimizer state is zeroed at both the
    sampled targets and the relocated dead slots (the reference zeroes only
    the targets; zeroing the destination too avoids stale momentum on the
    teleported Gaussian)."""
    cap = live.shape[0]
    dead_mask = dead_mask & live
    alive = live & ~dead_mask
    targets = _sample_targets(key, alive, jax.nn.sigmoid(params["opacities"]), cap)

    dst = jnp.argsort(jnp.where(dead_mask, 0, 1), stable=True).astype(jnp.int32)
    k = jnp.arange(cap)
    ok = k < jnp.sum(dead_mask)

    params, hit = _relocation_update(params, targets, ok, binoms, min_opacity)
    # dead slot k receives (already-updated) params of its sampled target
    params = _scatter_from(params, targets, dst, ok)

    if opt_state is not None:
        def zero_touched(x):
            x = jnp.where(_expand(hit, x), 0, x)
            return x.at[dst].set(jnp.where(_expand(ok, x), 0, x[dst]))

        opt_state = _cap_leaves(opt_state, cap, zero_touched)
    return params, live, opt_state


def sample_add(
    params: Dict[str, jax.Array],
    live: jax.Array,
    n_add: jax.Array,
    key: jax.Array,
    binoms: jax.Array,
    opt_state: Any = None,
    min_opacity: float = 0.005,
):
    """Activate `n_add` free slots as samples of live Gaussians
    (gsplat/strategy/ops.py:313-340)."""
    cap = live.shape[0]
    targets = _sample_targets(key, live, jax.nn.sigmoid(params["opacities"]), cap)
    dst = jnp.argsort(live, stable=True).astype(jnp.int32)
    k = jnp.arange(cap)
    ok = (k < n_add) & (k < jnp.sum(~live))

    params, hit = _relocation_update(params, targets, ok, binoms, min_opacity)
    params = _scatter_from(params, targets, dst, ok)
    live = live.at[dst].set(live[dst] | ok)

    if opt_state is not None:
        def zero_touched(x):
            x = jnp.where(_expand(hit, x), 0, x)
            return x.at[dst].set(jnp.where(_expand(ok, x), 0, x[dst]))

        opt_state = _cap_leaves(opt_state, cap, zero_touched)
    return params, live, opt_state


def inject_noise_to_position(
    params: Dict[str, jax.Array],
    live: jax.Array,
    key: jax.Array,
    scaler: float,
) -> Dict[str, jax.Array]:
    """Perturb positions with opacity-gated anisotropic noise
    (gsplat/strategy/ops.py:343-369): noise ~ covar @ N(0,1), scaled by
    sigmoid(-100 * (opacity - 0.005))-style gate and `lr * noise_lr`."""
    from ..ops.projection import _covar_components, _sym_get

    op_sig = jax.nn.sigmoid(params["opacities"])
    scales = jnp.exp(params["scales"])

    def op_gate(x, k=100.0, x0=0.995):
        return 1.0 / (1.0 + jnp.exp(-k * (x - x0)))

    # Componentwise covar @ z: never materializes [cap, 3, 3] tensors
    # (3-wide minor dims tile-pad catastrophically on TPU; see
    # ops/projection.py docstring). cov holds 6 symmetric [cap] arrays.
    cov = _covar_components(params["quats"], scales)
    z = jax.random.normal(key, params["means"].shape, params["means"].dtype)
    gate = op_gate(1.0 - op_sig) * scaler  # [cap]
    zc = [z[:, j] * gate for j in range(3)]
    noise = jnp.stack(
        [sum(_sym_get(cov, i, j) * zc[j] for j in range(3)) for i in range(3)],
        axis=-1,
    )
    params = dict(params)
    params["means"] = params["means"] + jnp.where(live[:, None], noise, 0.0)
    return params
