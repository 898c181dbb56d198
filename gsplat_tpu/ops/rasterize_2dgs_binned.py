"""2DGS (surfel) rasterizer on the binning engine.

The round-1 2DGS path (ops/rasterize_2dgs_tiled.py) builds its entry
stream with XLA repeat/scatter/gather glue — the per-index ops the binned
3DGS pipeline eliminated. This module gives 2DGS the same treatment: the
generic Pallas emitter (ops/binning.py, ``payload_rows``) duplicates the
surfel rows into per-entry form, one payload ``lax.sort`` orders them by
(cam-tile, depth), the fwd/bwd kernels read the sorted stream at unaligned
tile ranges, and the backward's per-entry gradients reduce to per-Gaussian
sums through the shared gid-sort + one-hot matmul reduce
(ops/rasterize_binned._reduce_call).

Entry stream rows (F total): [mx, my, M00..M22 (9), opacity,
colors(D incl. depth last), normals(3), pad..., gid]. Kernel math is
identical to rasterize_2dgs_tiled (sigma via ray-plane cross products,
distortion prefix reconstruction, median depth), so parity holds against
the same oracle. Reference roles: gsplat/cuda/csrc/RasterizeToPixels2DGS*
+ triton isect pipeline.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import emit_entries, sort_entries
from .rasterize_binned import RK, _ecopy, _reduce_call
from .rasterize_ref import ALPHA_MAX, ALPHA_MIN, TRANSMITTANCE_EPS
from .rasterize_2dgs_tiled import NFIX, _sigma_2dgs
from .rasterize_tiled import LANES, _cum_lanes, _cumprod_lanes, _interpret, _round_up


# ---------------------------------------------------------------------------
# Coefficient-form sigma (gated by GSPLAT_2DGS_COEF, default off)
# ---------------------------------------------------------------------------
#
# The surfel sigma's cross products are AFFINE in the pixel coords: with
# hu(px) = huc + pxl*r2 and hv(py) = hvc + pyl*r2 (hu depends only on px,
# hv only on py; huc/hvc anchored at the tile center x0/y0),
#
#   cr = hu x hv = (huc x hvc) + pxl*(r2 x hvc) + pyl*(huc x r2)
#
# — the pxl*pyl term is r2 x r2 = 0, cancelling identically. So nine
# per-entry [1, LANES] coefficient rows (~P x cheaper than per-pixel math)
# plus two broadcast FMAs per cross replace the 21 [P, LANES]-wide
# hu/hv/cross passes of `_sigma_2dgs`, and drop 6 [P, LANES] live arrays
# from the kernel's VMEM set. Tile-center anchoring bounds |pxl| <= ts/2,
# keeping the affine reconstruction's cancellation small (the same
# argument as the 3DGS mxu_sigma tile-center basis). The backward's nine
# v_M reductions become linear in the (1, pxl, pyl) moments of v_cr_k, so
# one [P,8]^T @ [P,LANES] MXU contraction per cross (+ one for the 2D
# branch) replaces the v_hu/v_hv cross-VJP chains — the same moment trick
# the 3DGS bwd kernel uses. Semantics match `_sigma_2dgs` up to f32
# reassociation (reference math: _torch_impl_2dgs.py:171-271).


def _cross_rows(x, y):
    return [
        x[1] * y[2] - x[2] * y[1],
        x[2] * y[0] - x[0] * y[2],
        x[0] * y[1] - x[1] * y[0],
    ]


def _coef_rows(e, x0, y0):
    """Per-entry [1, LANES] affine coefficients of the cross products."""
    m = [e[2 + i : 3 + i, :] for i in range(9)]
    huc = [x0 * m[6 + i] - m[i] for i in range(3)]
    hvc = [y0 * m[6 + i] - m[3 + i] for i in range(3)]
    r2 = [m[6], m[7], m[8]]
    a = _cross_rows(huc, hvc)
    b = _cross_rows(r2, hvc)
    c = _cross_rows(huc, r2)
    return m, huc, hvc, r2, a, b, c


def _sigma_2dgs_coef(pxl, pyl, gxl, gyl, a, b, c):
    """[P, LANES] sigma from the affine coefficient rows."""
    cr0 = a[0] + pxl * b[0] + pyl * c[0]
    cr1 = a[1] + pxl * b[1] + pyl * c[1]
    cr2 = a[2] + pxl * b[2] + pyl * c[2]
    crz = jnp.where(jnp.abs(cr2) < 1e-12, 1e-12, cr2)
    u = cr0 / crz
    v = cr1 / crz
    dx = pxl - gxl
    dy = pyl - gyl
    sig3 = u * u + v * v
    sig2 = 2.0 * (dx * dx + dy * dy)
    use3d = sig3 <= sig2
    sig = 0.5 * jnp.minimum(sig3, sig2)
    return sig, use3d, u, v, crz, dx, dy


# ---------------------------------------------------------------------------
# Forward kernel (unaligned tile ranges over the sorted stream)
# ---------------------------------------------------------------------------


def _fwd2_kernel(
    offs_ref, cnts_ref,  # [T] i32 scalar prefetch: true range per tile
    entries_hbm,  # [F, capA]
    accum_ref,  # [1, Lp, P]
    logT_ref,  # [1, 1, P]
    last_ref,  # [1, 1, P] i32 (absolute stream index)
    dist_ref,  # [1, 1, P]
    med_ref,  # [1, 1, P]
    ebuf, esem,
    Tt_s,  # [P, 1] f32 scratch: running transmittance
    dist_s,  # [P, 1] f32 scratch
    wsum_s,  # [P, 1] f32 scratch
    wmsum_s,  # [P, 1] f32 scratch
    med_s,  # [P, 1] f32 scratch
    Tov_s,  # [P, LANES] f32 scratch
    lv_s,  # [P, LANES] i32 scratch
    done_s,  # [1] i32 SMEM: whole-tile saturation flag
    *, K, P, L, Lp, md, ts, tw, th, native, skip, coef,
):
    t = pl.program_id(0)
    off = offs_ref[t]
    n = cnts_ref[t]
    # LANES-aligned (not K-aligned) stream base: DMA offsets only need
    # 128-lane alignment, and the tighter base cuts the masked-out
    # front-of-range boundary lanes from avg K/2 to LANES/2 entries per
    # tile (~15-25% of kernel compute at bench scale). Bit-exact: the
    # extra lanes were colmask-invalid no-ops.
    astart = (off // LANES) * LANES
    nb = pl.cdiv(off + n - astart, K)
    NS = K // LANES

    rem = t % (th * tw)
    ty = rem // tw
    tx = rem % tw
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * ts + pix % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + pix // ts).astype(jnp.float32) + 0.5
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    if coef:
        # tile-CENTER local coords (|pxl| <= ts/2) for the affine form
        pxl = (pix % ts).astype(jnp.float32) + (0.5 - ts / 2)
        pyl = (pix // ts).astype(jnp.float32) + (0.5 - ts / 2)
        x0 = (tx * ts).astype(jnp.float32) + (ts / 2)
        y0 = (ty * ts).astype(jnp.float32) + (ts / 2)

    accum_ref[...] = jnp.zeros_like(accum_ref)
    zp = jnp.zeros((P, 1), jnp.float32)
    Tt_s[...] = jnp.ones((P, 1), jnp.float32)
    dist_s[...] = zp
    wsum_s[...] = zp
    wmsum_s[...] = zp
    med_s[...] = zp
    Tov_s[...] = jnp.ones((P, LANES), jnp.float32)
    lv_s[...] = jnp.full((P, LANES), -1, jnp.int32)
    done_s[0] = 0

    @pl.when(nb > 0)
    def _():
        _ecopy(entries_hbm, ebuf, esem, astart, 0, K).start()

    def body(b, _):
        slot = jax.lax.rem(b, 2)

        # DMAs run unconditionally; only the compute is predicated (see
        # rasterize_binned._fwd_kernel for the rationale)
        @pl.when(b + 1 < nb)
        def _():
            _ecopy(entries_hbm, ebuf, esem, astart + (b + 1) * K, 1 - slot, K).start()

        _ecopy(entries_hbm, ebuf, esem, astart + b * K, slot, K).wait()

        @pl.when(done_s[0] == 0)
        def _compute():
            eb = ebuf[slot]
            T_test = Tt_s[...]
            T_out_v = Tov_s[...]
            last_v = lv_s[...]
            dist = dist_s[...]
            wsum = wsum_s[...]
            wmsum = wmsum_s[...]
            med = med_s[...]
            acc = jnp.zeros_like(accum_ref[0])
            for s in range(NS):
                e = eb[:, s * LANES : (s + 1) * LANES]
                op = e[11:12, :]
                if coef:
                    _, _, _, _, ar, br, cr = _coef_rows(e, x0, y0)
                    gxl = e[0:1, :] - x0
                    gyl = e[1:2, :] - y0
                    sig, _, _, _, _, _, _ = _sigma_2dgs_coef(
                        pxl, pyl, gxl, gyl, ar, br, cr
                    )
                else:
                    sig, _, _, _, _, _, _, _, _, _ = _sigma_2dgs(e, px, py, L)
                araw = op * jnp.exp(-sig)
                alpha = jnp.minimum(araw, ALPHA_MAX)
                gidx = astart + b * K + s * LANES + kidx
                colmask = (gidx >= off) & (gidx < off + n)
                valid = colmask & (alpha >= ALPHA_MIN) & (sig >= 0.0)
                one_m = jnp.where(valid, 1.0 - alpha, 1.0)

                Tm = _cumprod_lanes(one_m, LANES, "fwd_incl", native)
                roll = pltpu.roll if native else jnp.roll
                Tm_excl = jnp.where(kidx >= 1, roll(Tm, 1, 1), 1.0)
                T_excl = Tm_excl * T_test
                T_incl = T_excl * one_m
                accept = valid & (T_incl > TRANSMITTANCE_EPS)
                w = jnp.where(accept, T_excl * alpha, 0.0)  # [P, 128]

                acc += jax.lax.dot_general(
                    e[NFIX : NFIX + Lp, :], w,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

                # distortion: 2 * sum_k w_k (m_k W_<k - WM_<k), prefixes carried
                mrow = e[NFIX + md : NFIX + md + 1, :]
                w_pref = _cum_lanes(w, LANES, "fwd_incl", native) - w + wsum
                wm = w * mrow
                wm_pref = _cum_lanes(wm, LANES, "fwd_incl", native) - wm + wmsum
                dist = dist + jnp.sum(
                    2.0 * (wm * w_pref - w * wm_pref), axis=1, keepdims=True
                )
                # median: depth of the last accepted gaussian with T_excl > 0.5
                hit = accept & (T_excl > 0.5)
                med = jnp.where(
                    jnp.any(hit, axis=1, keepdims=True),
                    jnp.sum(
                        jnp.where(
                            gidx
                            == jnp.max(
                                jnp.where(hit, gidx, -1), axis=1, keepdims=True
                            ),
                            jnp.where(hit, mrow, 0.0),
                            0.0,
                        ),
                        axis=1,
                        keepdims=True,
                    ),
                    med,
                )

                T_test = T_test * Tm[:, LANES - 1 :]
                T_out_v = jnp.minimum(T_out_v, jnp.where(accept, T_incl, 1.0))
                last_v = jnp.maximum(last_v, jnp.where(accept, gidx, -1))
                wsum = wsum + jnp.sum(w, axis=1, keepdims=True)
                wmsum = wmsum + jnp.sum(wm, axis=1, keepdims=True)
            accum_ref[0] += acc
            Tt_s[...] = T_test
            Tov_s[...] = T_out_v
            lv_s[...] = last_v
            dist_s[...] = dist
            wsum_s[...] = wsum
            wmsum_s[...] = wmsum
            med_s[...] = med
            if skip:
                # whole-tile saturation: identical rationale + semantics to
                # rasterize_binned._fwd_kernel — every per-pixel statistic
                # (accum/dist/median/carries) is frozen once accept is
                # globally false, so dropping the compute is bit-identical
                sat = jnp.max(T_test) <= TRANSMITTANCE_EPS
                done_s[0] = jnp.where(sat, 1, done_s[0])

        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    T_out_v = Tov_s[...]
    last_v = lv_s[...]
    dist = dist_s[...]
    med = med_s[...]
    T_out = jnp.min(T_out_v, axis=1, keepdims=True)
    last = jnp.max(last_v, axis=1, keepdims=True)

    logT_ref[0] = jnp.transpose(jnp.log(T_out), (1, 0))
    last_ref[0] = jnp.transpose(last, (1, 0))
    dist_ref[0] = jnp.transpose(dist, (1, 0))
    med_ref[0] = jnp.transpose(med, (1, 0))


# ---------------------------------------------------------------------------
# Backward kernel: per-entry grads + gid, K-aligned per tile
# ---------------------------------------------------------------------------


def _bwd2_kernel(
    offs_ref, cnts_ref, aoff_ref,
    entries_hbm,  # [F, capA] (row F-1 = gid as exact f32)
    logT_ref, last_ref, wmtot_ref,
    vaccum_ref, vlogT_ref, vdist_ref,
    _vz_hbm,
    vgr_hbm,  # [GR, capA2] out: row 0 = gid, 1.. = grads
    ebuf, esem, wbuf, wsem,
    *, K, P, PB, L, Lp, GR, md, ts, tw, th, native, coef,
):
    t = pl.program_id(0)
    off = offs_ref[t]
    n = cnts_ref[t]
    aoff = aoff_ref[t]
    # LANES-aligned (not K-aligned) stream base: DMA offsets only need
    # 128-lane alignment, and the tighter base cuts the masked-out
    # front-of-range boundary lanes from avg K/2 to LANES/2 entries per
    # tile (~15-25% of kernel compute at bench scale). Bit-exact: the
    # extra lanes were colmask-invalid no-ops.
    astart = (off // LANES) * LANES
    NS = K // LANES
    # pixel sub-blocks: the slice body's ~35 live [PB, 128] f32 temporaries
    # (ray-transform rows, cross products, three scans, gradient rows) would
    # exceed the 16MB scoped VMEM at P = 1024 (ts = 32); processing PB
    # pixels at a time bounds the live set while the per-entry row sums
    # accumulate across sub-blocks (VERDICT r2 item 5)
    NH = P // PB

    rem = t % (th * tw)
    ty = rem // tw
    tx = rem % tw
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px_all = (tx * ts + pix % ts).astype(jnp.float32) + 0.5
    py_all = (ty * ts + pix // ts).astype(jnp.float32) + 0.5
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    if coef:
        # tile-CENTER local coords + (1, pxl, pyl) moment basis per sub-block
        pxl_all = (pix % ts).astype(jnp.float32) + (0.5 - ts / 2)
        pyl_all = (pix // ts).astype(jnp.float32) + (0.5 - ts / 2)
        x0 = (tx * ts).astype(jnp.float32) + (ts / 2)
        y0 = (ty * ts).astype(jnp.float32) + (ts / 2)
        ones_pb = jnp.ones((PB, 1), jnp.float32)
        zeros_pb = jnp.zeros((PB, 5), jnp.float32)

    last_row = last_ref[0]
    last_all = jnp.transpose(last_row, (1, 0))
    T_fin_all = jnp.exp(jnp.transpose(logT_ref[0], (1, 0)))
    vlogT_all = jnp.transpose(vlogT_ref[0], (1, 0))
    vdist_all = jnp.transpose(vdist_ref[0], (1, 0))
    wm_tot_all = jnp.transpose(wmtot_ref[0], (1, 0))
    vaccum = vaccum_ref[0]  # [Lp, P]
    w_tot_all = 1.0 - T_fin_all

    last_max = jnp.max(last_row)
    start_b = (last_max - astart) // K
    nb_eff = jnp.where((last_max >= off) & (n > 0), start_b + 1, 0)

    def wcopy(b, slot):
        start = pl.multiple_of(aoff + b * K, LANES)
        return pltpu.make_async_copy(
            wbuf.at[slot], vgr_hbm.at[:, pl.ds(start, K)], wsem.at[slot]
        )

    @pl.when(nb_eff > 0)
    def _():
        _ecopy(entries_hbm, ebuf, esem, astart + start_b * K, start_b % 2, K).start()

    def body(i, carry):
        S, sG, sW, sWM = carry
        b = start_b - i
        slot = jax.lax.rem(b, 2)

        @pl.when(b - 1 >= 0)
        def _():
            _ecopy(entries_hbm, ebuf, esem, astart + (b - 1) * K, 1 - slot, K).start()

        _ecopy(entries_hbm, ebuf, esem, astart + b * K, slot, K).wait()
        eb = ebuf[slot]

        @pl.when(i >= 2)
        def _():
            wcopy(b + 2, jax.lax.rem(i, 2)).wait()
        wslot = jax.lax.rem(i, 2)

        for s in reversed(range(NS)):
            e = eb[:, s * LANES : (s + 1) * LANES]
            gid = e[-1:, :].astype(jnp.int32)
            op = e[11:12, :]
            feat = e[NFIX : NFIX + Lp, :]
            gidx = astart + b * K + s * LANES + kidx
            colmask = (gidx >= off) & (gidx < off + n)

            # per-entry gradient rows accumulate over the pixel sub-blocks;
            # the per-pixel carries update block-wise (each pixel's chain is
            # independent of the others)
            num_acc = None
            S_new, sG_new, sW_new, sWM_new = [], [], [], []
            if coef:
                # per-entry rows are pixel-independent: build once per slice
                # (the exact path rebuilds hu/hv inside every sub-block)
                _, huc, hvc, r2, ar, br, crr = _coef_rows(e, x0, y0)
                gxl = e[0:1, :] - x0
                gyl = e[1:2, :] - y0
                Mcr0 = Mcr1 = Mcr2 = Ms2 = jnp.zeros((8, LANES), jnp.float32)
            for ph in range(NH):
                sl = slice(ph * PB, (ph + 1) * PB)
                px, py = px_all[sl], py_all[sl]
                last = last_all[sl]
                T_fin = T_fin_all[sl]
                vlogT = vlogT_all[sl]
                vdist = vdist_all[sl]
                wm_tot = wm_tot_all[sl]
                w_tot = w_tot_all[sl]
                vac = vaccum[:, sl]
                Sh, sGh = S[sl], sG[sl]
                sWh, sWMh = sW[sl], sWM[sl]

                if coef:
                    sig, use3d, u, v, crz, dx, dy = _sigma_2dgs_coef(
                        pxl_all[sl], pyl_all[sl], gxl, gyl, ar, br, crr
                    )
                else:
                    sig, use3d, u, v, crz, dx, dy, hu, hv, m = _sigma_2dgs(
                        e, px, py, L
                    )
                eneg = jnp.exp(-sig)
                araw = op * eneg
                alpha = jnp.minimum(araw, ALPHA_MAX)
                valid = colmask & (alpha >= ALPHA_MIN) & (sig >= 0.0)
                accept = valid & (gidx <= last)

                one_m = jnp.where(accept, 1.0 - alpha, 1.0)
                S_incl = _cumprod_lanes(one_m, LANES, "rev_incl", native) * Sh
                Tk = T_fin / S_incl
                w = jnp.where(accept, alpha * Tk, 0.0)

                cv = jax.lax.dot_general(
                    vac, feat,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                mrow = e[NFIX + md : NFIX + md + 1, :]
                wm = w * mrow
                S_w = _cum_lanes(w, LANES, "rev_excl", native) + sWh
                S_wm = _cum_lanes(wm, LANES, "rev_excl", native) + sWMh
                W_pref = w_tot - w - S_w
                WM_pref = wm_tot - wm - S_wm
                G = cv + vdist * 2.0 * (
                    mrow * W_pref - WM_pref + (S_wm - mrow * S_w)
                )
                d = w * G
                S_excl = _cum_lanes(d, LANES, "rev_excl", native) + sGh

                v_alpha = jnp.where(
                    accept, Tk * G - (S_excl + vlogT) / one_m, 0.0
                )
                notclamp = araw < ALPHA_MAX
                v_sig = jnp.where(notclamp, -alpha * v_alpha, 0.0)
                v_op = jnp.sum(
                    jnp.where(notclamp, eneg * v_alpha, 0.0),
                    axis=0, keepdims=True,
                )

                v_feat = jax.lax.dot_general(
                    vac, w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                v_m_extra = jnp.sum(
                    vdist * 2.0 * w * (W_pref - S_w), axis=0, keepdims=True
                )
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (Lp, LANES), 0)
                v_feat = v_feat + jnp.where(row_ids == md, v_m_extra, 0.0)

                v_u = jnp.where(use3d, u * v_sig, 0.0)
                v_v = jnp.where(use3d, v * v_sig, 0.0)
                v_cr0 = v_u / crz
                v_cr1 = v_v / crz
                v_cr2 = -(u * v_u + v * v_v) / crz
                if coef:
                    # (pxl, pyl, 1) moments of v_cr_k and the 2D-branch
                    # v_sig: ONE full-depth MXU contraction each replaces
                    # the per-pixel v_hu/v_hv cross-VJP chains; the row
                    # chains after the sub-block loop are linear in these
                    v_s2 = jnp.where(use3d, 0.0, v_sig)
                    Qh = jnp.concatenate(
                        [pxl_all[sl], pyl_all[sl], ones_pb, zeros_pb], axis=1
                    )  # [PB, 8]
                    mom = lambda X: jax.lax.dot_general(
                        Qh, X,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [8, LANES]
                    Mcr0 = Mcr0 + mom(v_cr0)
                    Mcr1 = Mcr1 + mom(v_cr1)
                    Mcr2 = Mcr2 + mom(v_cr2)
                    Ms2 = Ms2 + mom(v_s2)
                    num = jnp.concatenate([v_op, v_feat], axis=0)
                else:
                    v_gx = -jnp.sum(
                        jnp.where(use3d, 0.0, 2.0 * dx * v_sig),
                        axis=0, keepdims=True,
                    )
                    v_gy = -jnp.sum(
                        jnp.where(use3d, 0.0, 2.0 * dy * v_sig),
                        axis=0, keepdims=True,
                    )
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
                    v_M = []
                    for c in range(3):
                        v_M.append(-jnp.sum(v_hu[c], axis=0, keepdims=True))
                    for c in range(3):
                        v_M.append(-jnp.sum(v_hv[c], axis=0, keepdims=True))
                    for c in range(3):
                        v_M.append(
                            jnp.sum(
                                px * v_hu[c] + py * v_hv[c],
                                axis=0, keepdims=True,
                            )
                        )
                    num = jnp.concatenate(
                        [v_gx, v_gy] + v_M + [v_op, v_feat], axis=0
                    )
                num_acc = num if num_acc is None else num_acc + num
                S_new.append(S_incl[:, 0:1])
                sG_new.append(sGh + jnp.sum(d, axis=1, keepdims=True))
                sW_new.append(sWh + jnp.sum(w, axis=1, keepdims=True))
                sWM_new.append(sWMh + jnp.sum(wm, axis=1, keepdims=True))

            if coef:
                # row chains from the accumulated moments (all [1, LANES]).
                # sum_p dx*v_s2 = mom_pxl - gxl*mom_1 (dx = pxl - gxl)
                v_gx = -2.0 * (Ms2[0:1] - gxl * Ms2[2:3])
                v_gy = -2.0 * (Ms2[1:2] - gyl * Ms2[2:3])
                v_a = [Mcr0[2:3], Mcr1[2:3], Mcr2[2:3]]
                v_b = [Mcr0[0:1], Mcr1[0:1], Mcr2[0:1]]
                v_c = [Mcr0[1:2], Mcr1[1:2], Mcr2[1:2]]
                # cross-product VJPs of a = huc x hvc, b = r2 x hvc,
                # c = huc x r2 (for z = x x y: v_x = y x v_z, v_y = v_z x x)
                add3 = lambda f, g: [f[i] + g[i] for i in range(3)]
                v_huc = add3(_cross_rows(hvc, v_a), _cross_rows(r2, v_c))
                v_hvc = add3(_cross_rows(v_a, huc), _cross_rows(v_b, r2))
                v_r2 = add3(_cross_rows(hvc, v_b), _cross_rows(v_c, huc))
                # huc[i] = x0 m[6+i] - m[i]; hvc[i] = y0 m[6+i] - m[3+i];
                # r2[i] = m[6+i]
                v_M = (
                    [-v_huc[i] for i in range(3)]
                    + [-v_hvc[i] for i in range(3)]
                    + [
                        x0 * v_huc[i] + y0 * v_hvc[i] + v_r2[i]
                        for i in range(3)
                    ]
                )
                num_acc = jnp.concatenate([v_gx, v_gy] + v_M + [num_acc], axis=0)

            rows = [
                jnp.where(colmask, gid, jnp.int32(1 << 24)).astype(jnp.float32),
                num_acc,
            ]
            used = 1 + 2 + 9 + 1 + Lp
            if GR > used:
                rows.append(jnp.zeros((GR - used, LANES), jnp.float32))
            wbuf[wslot, :, s * LANES : (s + 1) * LANES] = jnp.concatenate(
                rows, axis=0
            )

            cat = (lambda xs: xs[0] if NH == 1 else jnp.concatenate(xs, axis=0))
            S = cat(S_new)
            sG = cat(sG_new)
            sW = cat(sW_new)
            sWM = cat(sWM_new)

        wcopy(b, wslot).start()
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
# pallas_call wrappers + custom VJP over the binned 2DGS pipeline
# ---------------------------------------------------------------------------


def _fwd2_call(cfg, entries, offs, cnts):
    (C, N, T, th, tw, ts, P, D, L, Lp, F, KF, KB, capA, GR, md, interpret, coef) = cfg
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
            pltpu.VMEM((2, F, KF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, LANES), jnp.float32),
            pltpu.VMEM((P, LANES), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _fwd2_kernel, K=KF, P=P, L=L, Lp=Lp, md=md, ts=ts, tw=tw, th=th,
        native=not interpret, skip=True, coef=coef,
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


def _bwd2_call(
    cfg, entries, offs, cnts, aoff, capA2, logT, last, wmtot,
    v_accum, v_logT, v_dist,
):
    (C, N, T, th, tw, ts, P, D, L, Lp, F, KF, KB, capA, GR, md, interpret, coef) = cfg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
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
            pltpu.VMEM((2, F, KB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, GR, KB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # on-device sweep hook: the bwd live set scales with PB x KB; the coef
    # path drops ~12 [PB, LANES] arrays, so larger PB may fit at ts=32
    PB = int(os.environ.get("GSPLAT_PB", "256"))
    assert PB > 0 and P % min(P, PB) == 0, (P, PB)
    kernel = functools.partial(
        _bwd2_kernel, K=KB, P=P, PB=min(P, PB), L=L, Lp=Lp, GR=GR, md=md,
        ts=ts, tw=tw,
        th=th, native=not interpret, coef=coef,
    )
    vzero = jnp.concatenate(
        [
            jnp.full((1, capA2), float(1 << 24), jnp.float32),
            jnp.zeros((GR - 1, capA2), jnp.float32),
        ],
        axis=0,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((GR, capA2), jnp.float32)],
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(offs, cnts, aoff, entries, logT, last, wmtot, v_accum, v_logT,
      v_dist, vzero)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_2dgs_binned(cfg, packed, radii, depths):
    out, _ = _raster_2dgs_binned_fwd(cfg, packed, radii, depths)
    return out


def _bin_from_packed(cfg, packed, radii, depths):
    (C, N, T, th, tw, ts, P, D, L, Lp, F, KF, KB, capA, GR, md, interpret, coef) = cfg
    rows = [packed[r].reshape(C, N) for r in range(NFIX + L)]
    # NOTE: no AABB tightening here. Unlike the 3DGS conic, a surfel's
    # alpha >= 1/255 support extends FAR beyond the dual-conic 3-sigma
    # extents (measured: 5x+ along the plane's vanishing direction), so
    # the radii circle — the oracle's own observable in_rect bound — is
    # already the tightest output-exact emission rect.
    ops, slab_required = emit_entries(
        rows[0], rows[1], None, None, None, None, None, radii, depths,
        ts, tw, th, capacity=capA, cull=False, payload_rows=rows,
    )
    return sort_entries(ops, T, slab_required)


def _raster_2dgs_binned_fwd(cfg, packed, radii, depths):
    (C, N, T, th, tw, ts, P, D, L, Lp, F, KF, KB, capA, GR, md, interpret, coef) = cfg
    binned = _bin_from_packed(cfg, jax.lax.stop_gradient(packed), radii, depths)
    # stream layout: NFIX fixed rows, L features padded to Lp, zero filler,
    # gid as the last row (exact f32 < 2^24, for the backward's reduce)
    entries = jnp.concatenate(
        [
            binned.entries[: NFIX + L],
            jnp.zeros((Lp - L, capA), jnp.float32),
            jnp.zeros((F - (NFIX + Lp) - 1, capA), jnp.float32),
            binned.gids.astype(jnp.float32),
        ],
        axis=0,
    )
    # see the 3DGS twin: LANES-aligned stream base can read past capA by
    # up to max(K)-LANES columns at the slab boundary — pad, don't overrun
    overrun = max(KF, KB) - LANES
    if overrun > 0:
        entries = jnp.pad(entries, ((0, 0), (0, overrun)))
    accum, logT, last, dist, med = _fwd2_call(cfg, entries, binned.offs, binned.cnts)
    res = (entries, binned.offs, binned.cnts, logT, last,
           accum[:, md : md + 1, :])
    return (accum, logT, dist, med, binned.n_isects, binned.slab_required), res


def _raster_2dgs_binned_bwd(cfg, res, cts):
    (C, N, T, th, tw, ts, P, D, L, Lp, F, KF, KB, capA, GR, md, interpret, coef) = cfg
    entries, offs, cnts, logT, last, wmtot = res
    v_accum, v_logT, v_dist, _v_med, _, _ = cts
    acnt = ((cnts + KB - 1) // KB + 1) * KB
    aoff = (jnp.cumsum(acnt) - acnt).astype(jnp.int32)
    # RK-rounded for the reduce kernel's RK-aligned block reads (see the
    # 3DGS twin's comment)
    capA2 = _round_up(capA + 2 * KB * T, RK)
    vgr = _bwd2_call(
        cfg, entries, offs, cnts, aoff, capA2, logT, last, wmtot,
        v_accum, v_logT, v_dist,
    )
    used = 1 + 2 + 9 + 1 + Lp
    ops = (vgr[0].astype(jnp.int32),) + tuple(vgr[1:used])
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=False)
    vg_s = jnp.concatenate(
        [
            jnp.stack(
                (sorted_ops[0].astype(jnp.float32),) + sorted_ops[1:], axis=0
            ),
            jnp.zeros((GR - used, capA2), jnp.float32),
        ],
        axis=0,
    )
    red = _reduce_call(
        sorted_ops[0], vg_s, M=C * N, GR=GR, interpret=interpret
    )
    # red rows: gid-garbage, v_gx, v_gy, v_M(9), v_op, v_feat(Lp, of which
    # the first L are live feature grads)
    v_packed = jnp.concatenate(
        [
            red[1:3],  # mx, my
            red[3:12],  # M rows
            red[12:13],  # opacity
            red[13 : 13 + L],  # colors + normals
        ],
        axis=0,
    )
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return v_packed, zi(jnp.zeros((C, N), jnp.int32)), jnp.zeros((C, N), jnp.float32)


_raster_2dgs_binned.defvjp(_raster_2dgs_binned_fwd, _raster_2dgs_binned_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def rasterize_to_pixels_2dgs_binned(
    means2d,  # [C, N, 2] or (mx, my)
    ray_transforms,  # [C, N, 3, 3] or tuple of 9 [C, N] rows
    colors: jax.Array,  # [C, N, D] — last channel must be the depth
    normals: jax.Array,  # [C, N, 3]
    opacities: jax.Array,  # [C, N]
    radii: jax.Array,  # [C, N] i32
    depths: jax.Array,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int,
    capacity: int,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    batch_size: int = 2 * LANES,
    bwd_batch_size: Optional[int] = None,
    coef_sigma: Optional[bool] = None,
):
    """Binned-pipeline 2DGS rasterizer. Returns (render_colors, alphas,
    render_normals, render_distort, render_median, aux) with
    aux = {"n_isects", "slab_required"} for the capacity loop. Semantics
    identical to rasterize_to_pixels_2dgs_ref / _tiled.

    ``coef_sigma`` evaluates sigma through the affine coefficient form of
    the cross products and the backward through MXU moment contractions
    (see the module-level note above `_coef_rows`); env
    ``GSPLAT_2DGS_COEF=1`` flips the default. A/B'd on-device 2026-08-19
    (PERF.md round-4): LOSES — 3563.7 ms vs the exact path at the same
    workload (ts=16, parity held) and FAILS parity at ts=32 (the affine
    coefficient expansion cancels too coarsely at 32-pixel tile extents).
    Stays off; kept for re-testing on future hardware."""
    if coef_sigma is None:
        coef_sigma = os.environ.get("GSPLAT_2DGS_COEF", "0") == "1"
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
    md = D - 1
    L = D + 3
    ts = tile_size
    th = -(-image_height // ts)
    tw = -(-image_width // ts)
    T = C * th * tw
    P = ts * ts
    Lp = _round_up(L, 8)
    F = _round_up(NFIX + Lp + 1, 8)
    if os.environ.get("GSPLAT_KF"):  # on-device sweep hook (see 3DGS twin)
        batch_size = int(os.environ["GSPLAT_KF"])
        assert batch_size > 0 and batch_size % LANES == 0, batch_size
    if os.environ.get("GSPLAT_KB"):
        bwd_batch_size = int(os.environ["GSPLAT_KB"])
        assert bwd_batch_size > 0 and bwd_batch_size % LANES == 0, bwd_batch_size
    KF = batch_size
    if bwd_batch_size is None:
        # the 2DGS bwd live set exceeds scoped VMEM past P*KB ~ 256*128
        bwd_batch_size = LANES
    KB = bwd_batch_size
    GR = _round_up(1 + 2 + 9 + 1 + Lp, 8)

    rows = [mean_x, mean_y] + mrows + [opacities]
    rows += [colors[..., d] for d in range(D)]
    rows += [normals[..., d] for d in range(3)]
    packed = jnp.stack(
        [r.reshape(-1) for r in rows], axis=0
    ).astype(jnp.float32)

    capA = _round_up(max(capacity, 512), 512)
    cfg = (
        C, N, T, th, tw, ts, P, D, L, Lp, F, KF, KB, capA, GR, md,
        _interpret(), coef_sigma,
    )
    accum, logT, dist, med, n_isects, slab_required = _raster_2dgs_binned(
        cfg, packed, radii, depths
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
    aux = {"n_isects": n_isects, "slab_required": slab_required}
    return render, alphas[..., None], render_normals, render_distort, render_median, aux
