"""Tile-based 2DGS (surfel) rasterization: Pallas TPU kernels + custom VJP.

TPU-native replacement for gsplat/cuda/csrc/RasterizeToPixels2DGS{Fwd,Bwd}.cu
(579 + 860 LoC CUDA), built on the same architecture as the 3DGS kernel
(ops/rasterize_tiled.py — see its docstring for the entry-stream/K-aligned
design): SoA entry stream [F, capacity], 128-lane Gaussian batches, pixels
on sublanes, log-space transmittance with exact f32 roll-scans, per-pixel
last_idx for oracle-exact termination.

2DGS specifics:
  - sigma = 0.5 * min(|uv|^2 from the ray-transform intersection, 2|dxy|^2)
    (Fwd.cu:340-358); the backward routes through whichever branch was the
    minimum, with a hand-derived cross-product VJP onto the 9 ray-transform
    components.
  - The linear feature block composites colors, the depth channel, and the
    3 normal components together in one MXU contraction.
  - Per-pixel depth-distortion (Mip-NeRF-360 pairwise form, Fwd.cu:389-399)
    is accumulated forward with a prefix carry, and differentiated in the
    reverse sweep by reconstructing the prefixes from the totals:
    W_<k = W_tot - w_k - S_>k (W_tot = 1 - T_final) and
    WM_<k = WM_tot - w_k m_k - SM_>k (WM_tot = the composited depth).
  - Median depth (last Gaussian with T > 0.5, Fwd.cu:402-405) is emitted as
    a non-differentiable output, like the reference (its backward takes no
    v_render_median).

Entry row layout [F, capA]: 0:mx 1:my 2..10:m00..m22 11:opacity
12..12+L: linear features (D colors incl. trailing depth, then 3 normals).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .isect import Isect
from .rasterize_ref import ALPHA_MAX, ALPHA_MIN, TRANSMITTANCE_EPS
from .rasterize_tiled import (
    LANES,
    _cum_lanes,
    _cumprod_lanes,
    _entry_copy,
    _interpret,
    _round_up,
)

NFIX = 12  # fixed rows before the linear feature block


def _sigma_2dgs(e, px, py, L):
    """Common forward math: returns (sig, use3d, u, v, crz, dx, dy)."""
    gx, gy = e[0:1, :], e[1:2, :]
    m = [e[2 + i : 3 + i, :] for i in range(9)]  # m[3*r + c]
    dx = px - gx  # [P, K]
    dy = py - gy
    # h_u = -M0 + px*M2 ; h_v = -M1 + py*M2  (rows of M, 3-vectors)
    hu = [-m[0] + px * m[6], -m[1] + px * m[7], -m[2] + px * m[8]]
    hv = [-m[3] + py * m[6], -m[4] + py * m[7], -m[5] + py * m[8]]
    cr0 = hu[1] * hv[2] - hu[2] * hv[1]
    cr1 = hu[2] * hv[0] - hu[0] * hv[2]
    cr2 = hu[0] * hv[1] - hu[1] * hv[0]
    crz = jnp.where(jnp.abs(cr2) < 1e-12, 1e-12, cr2)
    u = cr0 / crz
    v = cr1 / crz
    sig3 = u * u + v * v
    sig2 = 2.0 * (dx * dx + dy * dy)
    use3d = sig3 <= sig2
    sig = 0.5 * jnp.minimum(sig3, sig2)
    return sig, use3d, u, v, crz, dx, dy, hu, hv, m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    offs_ref, cnts_ref,  # scalar prefetch [T] each
    entries_hbm,  # [F, capA] ANY/HBM
    accum_ref,  # [1, Lp, P] linear features (colors+depth+normals)
    logT_ref,  # [1, 1, P]
    last_ref,  # [1, 1, P] i32
    dist_ref,  # [1, 1, P] distortion
    med_ref,  # [1, 1, P] median depth
    ebuf, esem,
    *, K, P, L, Lp, md, ts, tw, th, native,
):
    t = pl.program_id(0)
    off = offs_ref[t]
    n = cnts_ref[t]
    nb = pl.cdiv(n, K)

    rem = t % (th * tw)
    ty = rem // tw
    tx = rem % tw
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * ts + pix % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + pix // ts).astype(jnp.float32) + 0.5
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    accum_ref[...] = jnp.zeros_like(accum_ref)

    @pl.when(nb > 0)
    def _():
        _entry_copy(entries_hbm, ebuf, esem, off, 0, 0, K).start()

    def body(carry):
        b, T_test, T_out, last, dist, wsum, wmsum, med = carry
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nb)
        def _():
            _entry_copy(entries_hbm, ebuf, esem, off, b + 1, 1 - slot, K).start()

        _entry_copy(entries_hbm, ebuf, esem, off, b, slot, K).wait()
        e = ebuf[slot]  # [F, K]
        op = e[11:12, :]
        sig, _, _, _, _, _, _, _, _, _ = _sigma_2dgs(e, px, py, L)
        araw = op * jnp.exp(-sig)
        alpha = jnp.minimum(araw, ALPHA_MAX)
        colmask = (b * K + kidx) < n
        valid = colmask & (alpha >= ALPHA_MIN) & (sig >= 0.0)
        one_m = jnp.where(valid, 1.0 - alpha, 1.0)
        # multiplicative transmittance chain (see rasterize_binned._fwd_kernel)
        Tm = _cumprod_lanes(one_m, K, "fwd_incl", native)
        roll = pltpu.roll if native else jnp.roll
        Tm_excl = jnp.where(kidx >= 1, roll(Tm, 1, 1), 1.0)
        T_excl = Tm_excl * T_test
        T_incl = T_excl * one_m
        accept = valid & (T_incl > TRANSMITTANCE_EPS)
        w = jnp.where(accept, T_excl * alpha, 0.0)  # [P, K]

        accum_ref[0] += jax.lax.dot_general(
            e[NFIX : NFIX + Lp, :], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # distortion: 2 * sum_k w_k (m_k W_<k - WM_<k), prefixes carried
        mrow = e[NFIX + md : NFIX + md + 1, :]  # depth channel [1, K]
        w_pref = _cum_lanes(w, K, "fwd_incl", native) - w + wsum  # W_<k
        wm = w * mrow
        wm_pref = _cum_lanes(wm, K, "fwd_incl", native) - wm + wmsum
        dist = dist + jnp.sum(
            2.0 * (wm * w_pref - w * wm_pref), axis=1, keepdims=True
        )
        # median: last gaussian whose T-before > 0.5
        hit = accept & (T_excl > 0.5)
        med = jnp.where(
            jnp.any(hit, axis=1, keepdims=True),
            jnp.sum(
                jnp.where(
                    (b * K + kidx)
                    == jnp.max(jnp.where(hit, b * K + kidx, -1), axis=1, keepdims=True),
                    jnp.where(hit, mrow, 0.0),
                    0.0,
                ),
                axis=1,
                keepdims=True,
            ),
            med,
        )

        T_test = T_test * Tm[:, K - 1 :]
        # accepted-product == min accepted T_incl (monotone chain; Mosaic
        # has no reduce_prod)
        T_out = jnp.minimum(
            T_out,
            jnp.min(jnp.where(accept, T_incl, 1.0), axis=1, keepdims=True),
        )
        idx = b * K + kidx
        last = jnp.maximum(
            last, jnp.max(jnp.where(accept, idx, -1), axis=1, keepdims=True)
        )
        wsum = wsum + jnp.sum(w, axis=1, keepdims=True)
        wmsum = wmsum + jnp.sum(wm, axis=1, keepdims=True)
        return b + 1, T_test, T_out, last, dist, wsum, wmsum, med

    # static-trip fori, no data-dependent early exit (see
    # exp_fwd_breakdown.py: the while_loop's scalar cond serializes)
    zp = jnp.zeros((P, 1), jnp.float32)
    onep = jnp.ones((P, 1), jnp.float32)
    out = jax.lax.fori_loop(
        0, nb, lambda b, c: body(c),
        (jnp.int32(0), onep, onep, jnp.full((P, 1), -1, jnp.int32), zp, zp, zp, zp),
    )
    _, _, T_out, last, dist, _, _, med = out

    logT_ref[0] = jnp.transpose(jnp.log(T_out), (1, 0))
    last_ref[0] = jnp.transpose(last, (1, 0))
    dist_ref[0] = jnp.transpose(dist, (1, 0))
    med_ref[0] = jnp.transpose(med, (1, 0))


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    offs_ref, cnts_ref,
    entries_hbm,  # [F, capA]
    logT_ref,  # [1, 1, P] residual
    last_ref,  # [1, 1, P] residual
    wmtot_ref,  # [1, 1, P] residual: composited depth (= WM_tot)
    vaccum_ref,  # [1, Lp, P]
    vlogT_ref,  # [1, 1, P]
    vdist_ref,  # [1, 1, P]
    _vzero_hbm,
    ventries_hbm,  # [F, capA] out (aliased)
    ebuf, esem, wbuf, wsem,
    *, K, P, L, Lp, F, md, ts, tw, th, native,
):
    t = pl.program_id(0)
    off = offs_ref[t]
    n = cnts_ref[t]

    rem = t % (th * tw)
    ty = rem // tw
    tx = rem % tw
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * ts + pix % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + pix // ts).astype(jnp.float32) + 0.5
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    last_row = last_ref[0]
    last = jnp.transpose(last_row, (1, 0))  # [P, 1]
    T_fin = jnp.exp(jnp.transpose(logT_ref[0], (1, 0)))
    vlogT = jnp.transpose(vlogT_ref[0], (1, 0))
    vdist = jnp.transpose(vdist_ref[0], (1, 0))
    wm_tot = jnp.transpose(wmtot_ref[0], (1, 0))
    vaccum = vaccum_ref[0]  # [Lp, P]
    w_tot = 1.0 - T_fin  # [P, 1]

    last_max = jnp.max(last_row)
    start_b = last_max // K
    nb_eff = jnp.where((last_max >= 0) & (n > 0), start_b + 1, 0)

    def wcopy(b, slot):
        start = pl.multiple_of(off + b * K, LANES)
        return pltpu.make_async_copy(
            wbuf.at[slot], ventries_hbm.at[:, pl.ds(start, K)], wsem.at[slot]
        )

    @pl.when(nb_eff > 0)
    def _():
        _entry_copy(entries_hbm, ebuf, esem, off, start_b, start_b % 2, K).start()

    def body(i, carry):
        # suffix carries: accepted (1-a) product; w*G; w; w*m
        S, sG, sW, sWM = carry
        b = start_b - i
        slot = jax.lax.rem(b, 2)

        @pl.when(b - 1 >= 0)
        def _():
            _entry_copy(entries_hbm, ebuf, esem, off, b - 1, 1 - slot, K).start()

        _entry_copy(entries_hbm, ebuf, esem, off, b, slot, K).wait()
        e = ebuf[slot]
        op = e[11:12, :]
        feat = e[NFIX : NFIX + Lp, :]  # [Lp, K]
        sig, use3d, u, v, crz, dx, dy, hu, hv, m = _sigma_2dgs(e, px, py, L)
        eneg = jnp.exp(-sig)
        araw = op * eneg
        alpha = jnp.minimum(araw, ALPHA_MAX)
        colmask = (b * K + kidx) < n
        valid = colmask & (alpha >= ALPHA_MIN) & (sig >= 0.0)
        accept = valid & ((b * K + kidx) <= last)

        one_m = jnp.where(accept, 1.0 - alpha, 1.0)
        S_incl = _cumprod_lanes(one_m, K, "rev_incl", native) * S
        Tk = T_fin / S_incl
        w = jnp.where(accept, alpha * Tk, 0.0)

        # dL/dw_k: linear features + distortion
        cv = jax.lax.dot_general(
            vaccum, feat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [P, K]
        mrow = e[NFIX + md : NFIX + md + 1, :]
        wm = w * mrow
        # suffix sums over j > k (within batch + carry)
        S_w = _cum_lanes(w, K, "rev_excl", native) + sW
        S_wm = _cum_lanes(wm, K, "rev_excl", native) + sWM
        W_pref = w_tot - w - S_w  # W_<k
        WM_pref = wm_tot - wm - S_wm
        G = cv + vdist * 2.0 * (
            mrow * W_pref - WM_pref + (S_wm - mrow * S_w)
        )
        d = w * G
        S_excl = _cum_lanes(d, K, "rev_excl", native) + sG

        v_alpha = jnp.where(
            accept, Tk * G - (S_excl + vlogT) / one_m, 0.0
        )
        notclamp = araw < ALPHA_MAX
        v_sig = jnp.where(notclamp, -alpha * v_alpha, 0.0)
        v_op = jnp.sum(
            jnp.where(notclamp, eneg * v_alpha, 0.0), axis=0, keepdims=True
        )

        # linear feature grads [Lp, K] (+ distortion's depth-channel term)
        v_feat = jax.lax.dot_general(
            vaccum, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        v_m_extra = jnp.sum(
            vdist * 2.0 * w * (W_pref - S_w), axis=0, keepdims=True
        )  # [1, K]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Lp, K), 0)
        v_feat = v_feat + jnp.where(row_ids == md, v_m_extra, 0.0)

        # sigma -> (mean2d, M) through the min branch
        v_half = 0.5 * v_sig
        # 2D branch: sig = dx^2 + dy^2 (0.5 * 2(dx^2+dy^2))
        v_gx = -jnp.sum(jnp.where(use3d, 0.0, 2.0 * dx * v_sig), axis=0, keepdims=True)
        v_gy = -jnp.sum(jnp.where(use3d, 0.0, 2.0 * dy * v_sig), axis=0, keepdims=True)
        # 3D branch: sig = 0.5(u^2+v^2)
        v_u = jnp.where(use3d, u * v_sig, 0.0)
        v_v = jnp.where(use3d, v * v_sig, 0.0)
        v_cr0 = v_u / crz
        v_cr1 = v_v / crz
        v_cr2 = -(u * v_u + v * v_v) / crz
        # cross VJP: cr = hu x hv  =>  v_hu = hv x v_cr ; v_hv = v_cr x hu
        v_hu = [
            hv[1] * v_cr2 - hv[2] * v_cr1,
            hv[2] * v_cr0 - hv[0] * v_cr2,
            hv[0] * v_cr1 - hv[1] * v_cr0,
        ]
        v_hv = [
            v_cr1 * hu[2] - v_cr2 * hu[1],
            v_cr2 * hu[0] - v_cr0 * hu[2],
            v_cr0 * hu[1] - v_cr1 * hu[0],
        ]
        # hu = -M0 + px*M2 ; hv = -M1 + py*M2
        v_M = []
        for c in range(3):
            v_M.append(-jnp.sum(v_hu[c], axis=0, keepdims=True))  # M0c
        for c in range(3):
            v_M.append(-jnp.sum(v_hv[c], axis=0, keepdims=True))  # M1c
        for c in range(3):
            v_M.append(
                jnp.sum(px * v_hu[c] + py * v_hv[c], axis=0, keepdims=True)
            )  # M2c

        g = jnp.concatenate(
            [v_gx, v_gy] + v_M + [v_op, v_feat]
            + ([jnp.zeros((F - NFIX - Lp, K), jnp.float32)] if F > NFIX + Lp else []),
            axis=0,
        )

        @pl.when(i >= 2)
        def _():
            wcopy(b + 2, jax.lax.rem(i, 2)).wait()

        wslot = jax.lax.rem(i, 2)
        wbuf[wslot] = g
        wcopy(b, wslot).start()

        S = S_incl[:, 0:1]
        sG = sG + jnp.sum(d, axis=1, keepdims=True)
        sW = sW + jnp.sum(w, axis=1, keepdims=True)
        sWM = sWM + jnp.sum(wm, axis=1, keepdims=True)
        return S, sG, sW, sWM

    zp = jnp.zeros((P, 1), jnp.float32)
    jax.lax.fori_loop(
        0, nb_eff, body, (jnp.ones((P, 1), jnp.float32), zp, zp, zp)
    )

    @pl.when(nb_eff >= 2)
    def _():
        wcopy(start_b - (nb_eff - 2), jax.lax.rem(nb_eff - 2, 2)).wait()

    @pl.when(nb_eff >= 1)
    def _():
        wcopy(start_b - (nb_eff - 1), jax.lax.rem(nb_eff - 1, 2)).wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _fwd_call(cfg, entries, offs, cnts):
    (T, th, tw, ts, P, L, Lp, F, K, capA, md, interpret) = cfg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((1, Lp, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, F, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, K=K, P=P, L=L, Lp=Lp, md=md, ts=ts, tw=tw, th=th,
        native=not interpret,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, Lp, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(offs, cnts, entries)


def _bwd_call(cfg, entries, offs, cnts, logT, last, wmtot, v_accum, v_logT, v_dist):
    (T, th, tw, ts, P, L, Lp, F, K, capA, md, interpret) = cfg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, Lp, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, F, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, F, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, K=K, P=P, L=L, Lp=Lp, F=F, md=md, ts=ts, tw=tw, th=th,
        native=not interpret,
    )
    vzero = jnp.zeros_like(entries)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F, capA), jnp.float32)],
        input_output_aliases={9: 0},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(offs, cnts, entries, logT, last, wmtot, v_accum, v_logT, v_dist, vzero)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_entries_2dgs(cfg, entries, offs, cnts):
    accum, logT, _, dist, med = _fwd_call(cfg, entries, offs, cnts)
    return accum, logT, dist, med


def _fwd_rule(cfg, entries, offs, cnts):
    accum, logT, last, dist, med = _fwd_call(cfg, entries, offs, cnts)
    md = cfg[10]
    wmtot = accum[:, md : md + 1, :]  # composited depth channel
    return (accum, logT, dist, med), (entries, offs, cnts, logT, last, wmtot)


def _bwd_rule(cfg, res, cts):
    entries, offs, cnts, logT, last, wmtot = res
    v_accum, v_logT, v_dist, _v_med = cts  # median: non-differentiable
    v_entries = _bwd_call(
        cfg, entries, offs, cnts, logT, last, wmtot, v_accum, v_logT, v_dist
    )
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return v_entries, zi(offs), zi(cnts)


_raster_entries_2dgs.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def rasterize_to_pixels_2dgs_tiled(
    means2d,  # [C, N, 2] or (mx, my)
    ray_transforms,  # [C, N, 3, 3] or tuple of 9 [C, N] components
    colors: jax.Array,  # [C, N, D] — last channel must be the depth
    normals: jax.Array,  # [C, N, 3]
    opacities: jax.Array,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect: Isect,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    batch_size: int = LANES,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Pallas 2DGS rasterizer. Returns (render_colors [C,H,W,D], alphas,
    render_normals [C,H,W,3] (camera frame), render_distort, render_median).
    Semantics identical to :func:`rasterize_to_pixels_2dgs_ref`."""
    if isinstance(means2d, (tuple, list)):
        mean_x, mean_y = means2d
    else:
        mean_x, mean_y = means2d[..., 0], means2d[..., 1]
    if isinstance(ray_transforms, (tuple, list)):
        mrows = list(ray_transforms)
    else:
        mrows = [ray_transforms[..., r, c] for r in range(3) for c in range(3)]
    C, N = mean_x.shape
    D = colors.shape[-1]
    md = D - 1  # depth channel index within the linear block
    L = D + 3  # colors (incl. depth) + normals
    ts = tile_size
    th = -(-image_height // ts)
    tw = -(-image_width // ts)
    T = C * th * tw
    P = ts * ts
    Lp = _round_up(L, 8)
    F = _round_up(NFIX + Lp, 8)
    K = batch_size
    cap = isect.flatten_ids.shape[0]
    capA = cap + K * T

    counts = (isect.ends - isect.offsets).reshape(-1)
    acnts = -(-counts // K) * K
    aoff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(acnts).astype(jnp.int32)]
    )
    offs_by_tile = jnp.concatenate(
        [isect.offsets.reshape(-1), isect.n_isects[None]]
    ).astype(jnp.int32)
    tk = jnp.minimum(isect.tile_keys, T)
    tables = jnp.stack([offs_by_tile, aoff], axis=0)
    looked = jnp.take(tables, tk, axis=1)
    rank = jnp.arange(cap, dtype=jnp.int32) - looked[0]
    newpos = looked[1] + rank
    ids_al = (
        jnp.zeros((capA,), jnp.int32).at[newpos].set(isect.flatten_ids, mode="drop")
    )

    rows = [mean_x.reshape(-1), mean_y.reshape(-1)]
    rows += [mr.reshape(-1) for mr in mrows]
    rows += [opacities.reshape(-1)]
    rows += [colors[..., d].reshape(-1) for d in range(D)]
    rows += [normals[..., d].reshape(-1) for d in range(3)]
    rows += [jnp.zeros((C * N,), jnp.float32)] * (F - len(rows))
    packed = jnp.stack(rows, axis=0).astype(jnp.float32)
    packed, ids_al = jax.lax.optimization_barrier((packed, ids_al))
    entries = jnp.take(packed, ids_al, axis=1)

    cfg = (T, th, tw, ts, P, L, Lp, F, K, capA, md, _interpret())
    accum, logT, dist, med = _raster_entries_2dgs(
        cfg, entries, aoff[:-1], counts.astype(jnp.int32)
    )

    def unpack_img(x, d0, d1):
        img = x[:, d0:d1, :].reshape(C, th, tw, d1 - d0, ts, ts)
        return jnp.transpose(img, (0, 1, 4, 2, 5, 3)).reshape(
            C, th * ts, tw * ts, d1 - d0
        )[:, :image_height, :image_width]

    render = unpack_img(accum, 0, D)
    render_normals = unpack_img(accum, D, D + 3)

    def unpack_row(x):
        im = x.reshape(C, th, tw, ts, ts)
        return jnp.transpose(im, (0, 1, 3, 2, 4)).reshape(C, th * ts, tw * ts)[
            :, :image_height, :image_width
        ]

    Tfin = jnp.exp(unpack_row(logT))
    alphas = 1.0 - Tfin
    render_distort = unpack_row(dist)[..., None]
    render_median = unpack_row(med)[..., None]
    if backgrounds is not None:
        render = render + Tfin[..., None] * backgrounds[:, None, None, :]
    return render, alphas[..., None], render_normals, render_distort, render_median
