"""Binned-pipeline rasterizer: Pallas kernels over the sorted entry stream.

Round-2 replacement for the rasterize_tiled glue (see ops/binning.py for
why): the Pallas emit + payload sort produce the per-entry feature stream
directly, so the forward kernel reads it with no gather and no K-alignment
scatter — tile ranges start at arbitrary offsets and the kernel reads
lane-aligned blocks rounded down, masking foreign entries.

The backward writes per-entry gradients (plus the per-entry gid and the
absgrad rows) into a per-tile K-aligned buffer (no cross-tile write
conflicts), then ONE `lax.sort` by gid groups them and a Pallas one-hot
matmul reduce produces per-Gaussian gradients — replacing the XLA
scatter-add that cost ~116 ns/index (the single largest op in the round-1
frame; the reference uses atomicAdd here,
gsplat/triton_impl/rasterize_to_pixels_bwd.py:199-337).

Compositing semantics are identical to ops/rasterize_ref.py (the oracle) and
ops/rasterize_tiled.py; parity is enforced by tests/test_rasterize_binned.py
and scripts/check_tiled_tpu.py on hardware.
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

from .binning import Binned, bin_gaussians
from .rasterize_ref import ALPHA_MAX, ALPHA_MIN, TRANSMITTANCE_EPS
from .rasterize_tiled import _cum_lanes, _cumprod_lanes

LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ecopy(hbm, buf, sem, start, slot, K, R=None):
    start = pl.multiple_of(start, LANES)
    src = hbm.at[:, pl.ds(start, K)] if R is None else hbm.at[:R, pl.ds(start, K)]
    return pltpu.make_async_copy(src, buf.at[slot], sem.at[slot])


# ---------------------------------------------------------------------------
# Forward kernel (unaligned tile ranges)
# ---------------------------------------------------------------------------


def _fwd_kernel(
    offs_ref,  # [T] i32 scalar prefetch: true range start per tile
    cnts_ref,  # [T] i32 scalar prefetch: true entry count per tile
    entries_hbm,  # [F, capA] f32 HBM (sorted stream)
    accum_ref,  # [1, Dp, P] f32 out
    logT_ref,  # [1, 1, P] f32 out
    last_ref,  # [1, 1, P] i32 out (absolute stream index, -1 = none)
    ebuf,  # [2, F, K] VMEM
    esem,
    Tt_ref,  # [P, 1] f32 scratch: running per-pixel transmittance
    Tov_ref,  # [P, LANES] f32 scratch: lane-wise T_out carry
    lv_ref,  # [P, LANES] i32 scratch: lane-wise last carry
    acc_ref,  # [Dp, P] f32 scratch: per-batch color accumulator (slice_skip)
    done_ref,  # [1] i32 SMEM scratch: whole-tile saturation flag
    *,
    K: int,
    P: int,
    Dp: int,
    ts: int,
    tw: int,
    th: int,
    native: bool,
    skip: bool,
    mxu_sigma: bool,
    slice_skip: bool,
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
    NS = K // LANES  # 128-lane compute slices per DMA batch

    rem = t % (th * tw)
    ty = rem // tw
    tx = rem % tw

    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * ts + pix % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + pix // ts).astype(jnp.float32) + 0.5
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    if mxu_sigma:
        # sigma as a [P,8]@[8,LANES] MXU contraction: sigma is a degree-2
        # polynomial in the pixel coords, so a monomial basis Qm contracted
        # against per-entry coefficient rows replaces the ~9-op VPU chain
        # (VERDICT r2 item 3; reference computes the same quadratic per
        # (pixel, gaussian), gsplat/triton_impl/rasterize_to_pixels_fwd.py:107-123).
        # Tile-CENTER local coords bound the monomials (|pxl| <= ts/2) so the
        # f32 cancellation in the expanded polynomial stays ~1e-3 absolute
        # worst-case (tiny far-center gaussians); see _bwd_kernel's moment
        # basis for the same argument.
        pxl = (pix % ts).astype(jnp.float32) + (0.5 - ts / 2)
        pyl = (pix // ts).astype(jnp.float32) + (0.5 - ts / 2)
        x0 = (tx * ts).astype(jnp.float32) + (ts / 2)
        y0 = (ty * ts).astype(jnp.float32) + (ts / 2)
        Qm = jnp.concatenate(
            [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl,
             jnp.ones((P, 1), jnp.float32), jnp.zeros((P, 2), jnp.float32)],
            axis=1,
        )  # [P, 8]

    accum_ref[...] = jnp.zeros_like(accum_ref)
    Tt_ref[...] = jnp.ones((P, 1), jnp.float32)
    Tov_ref[...] = jnp.ones((P, LANES), jnp.float32)
    lv_ref[...] = jnp.full((P, LANES), -1, jnp.int32)
    done_ref[0] = 0

    @pl.when(nb > 0)
    def _():
        _ecopy(entries_hbm, ebuf, esem, astart, 0, K).start()

    def body(b, _):
        slot = jax.lax.rem(b, 2)

        # DMAs run UNCONDITIONALLY (the whole slab streams ~200us at HBM
        # bandwidth vs ~70ms of compute) so the skip path never has to
        # reason about in-flight copies or semaphore drains.
        @pl.when(b + 1 < nb)
        def _():
            _ecopy(entries_hbm, ebuf, esem, astart + (b + 1) * K, 1 - slot, K).start()

        _ecopy(entries_hbm, ebuf, esem, astart + b * K, slot, K).wait()

        def slice_math(e, s, T_test, T_out_v, last_v):
            """One 128-lane compute slice; returns the color contribution
            [Dp, P] and the updated (T_test, T_out_v, last_v) carries."""
            gx, gy = e[0:1, :], e[1:2, :]
            ca, cb, cc = e[2:3, :], e[3:4, :], e[4:5, :]
            op = e[5:6, :]
            if mxu_sigma:
                gxl = gx - x0
                gyl = gy - y0
                coef = jnp.concatenate(
                    [0.5 * ca, cb, 0.5 * cc,
                     -(ca * gxl + cb * gyl), -(cc * gyl + cb * gxl),
                     0.5 * (ca * gxl * gxl + cc * gyl * gyl)
                     + cb * gxl * gyl,
                     jnp.zeros((2, LANES), jnp.float32)],
                    axis=0,
                )  # [8, LANES] — built on 1-sublane rows, ~P x cheaper
                sig = jax.lax.dot_general(
                    Qm, coef, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [P, LANES]
                # the expanded polynomial cancels at gaussian centers
                # (true sigma -> 0): accept tiny negative rounding noise
                # instead of dropping the center pixel, but still reject
                # genuinely indefinite conics like the exact path does
                araw = op * jnp.exp(-jnp.maximum(sig, 0.0))
                sig_ok = sig >= -1e-3
            else:
                dx = px - gx
                dy = py - gy
                sig = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
                araw = op * jnp.exp(-sig)
                sig_ok = sig >= 0.0
            alpha = jnp.minimum(araw, ALPHA_MAX)
            gidx = astart + b * K + s * LANES + kidx  # [1, 128]
            colmask = (gidx >= off) & (gidx < off + n)
            valid = colmask & (alpha >= ALPHA_MIN) & sig_ok
            one_m = jnp.where(valid, 1.0 - alpha, 1.0)

            # multiplicative transmittance (reference CUDA semantics:
            # progressive T *= (1-alpha)); two transcendentals fewer
            # per pair than the log-space chain. The exclusive product
            # comes from a lane roll of the inclusive scan — NOT
            # T_incl/one_m, whose division would amplify rounding by
            # up to 1/(1-MAX)=1e3
            Tm = _cumprod_lanes(one_m, LANES, "fwd_incl", native)
            roll = pltpu.roll if native else jnp.roll
            Tm_excl = jnp.where(kidx >= 1, roll(Tm, 1, 1), 1.0)
            T_excl = Tm_excl * T_test
            T_incl = T_excl * one_m
            accept = valid & (T_incl > TRANSMITTANCE_EPS)
            w = jnp.where(accept, T_excl * alpha, 0.0)

            contrib = jax.lax.dot_general(
                e[6 : 6 + Dp, :], w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

            T_test = T_test * Tm[:, LANES - 1 :]
            # deferred reductions: accumulate LANE-WISE min/max and
            # reduce once per tile after the loop. Product over
            # accepted == T_incl at the LAST accepted pair (monotone
            # chain; Mosaic has no reduce_prod).
            T_out_v = jnp.minimum(T_out_v, jnp.where(accept, T_incl, 1.0))
            last_v = jnp.maximum(last_v, jnp.where(accept, gidx, -1))
            return contrib, T_test, T_out_v, last_v

        @pl.when(done_ref[0] == 0)
        def _compute():
            eb = ebuf[slot]  # [F, K]
            if slice_skip:
                # Per-slice skip of fully-dead trailing lanes: slices at or
                # past off+n hold only colmask-invalid entries (astart is
                # rounded DOWN, so there are no fully-dead leading slices)
                # and change no carry — their VPU math is skipped entirely
                # under a scalar pl.when (the same non-serializing predicate
                # pattern as the done flag; trip counts stay static, DMAs
                # unconditional). Carries ride the existing VMEM refs; the
                # price is per-live-slice ref traffic (2x [P,LANES]
                # load+store), weighed against ~KF/2 dead trailing lanes per
                # tile at KF=512 — an on-device A/B decision
                # (GSPLAT_SLICE_SKIP).
                # per-batch accumulator ref keeps the summation order
                # identical to the default path (acc summed across slices,
                # added to accum_ref once per batch) -> bit-identical
                acc_ref[...] = jnp.zeros_like(acc_ref)
                for s in range(NS):
                    @pl.when(astart + b * K + s * LANES < off + n)
                    def _sl(s=s):
                        contrib, T_test, T_out_v, last_v = slice_math(
                            eb[:, s * LANES : (s + 1) * LANES], s,
                            Tt_ref[...], Tov_ref[...], lv_ref[...],
                        )
                        acc_ref[...] += contrib
                        Tt_ref[...] = T_test
                        Tov_ref[...] = T_out_v
                        lv_ref[...] = last_v
                accum_ref[0] += acc_ref[...]
            else:
                T_test = Tt_ref[...]
                T_out_v = Tov_ref[...]
                last_v = lv_ref[...]
                acc = jnp.zeros_like(accum_ref[0])
                # one DMA per K entries, VPU math in 128-lane slices
                for s in range(NS):
                    contrib, T_test, T_out_v, last_v = slice_math(
                        eb[:, s * LANES : (s + 1) * LANES], s,
                        T_test, T_out_v, last_v,
                    )
                    acc += contrib
                accum_ref[0] += acc
                Tt_ref[...] = T_test
                Tov_ref[...] = T_out_v
                lv_ref[...] = last_v
            if skip:
                # whole-tile saturation: once EVERY pixel's running T is at
                # or below the termination threshold, no later entry can be
                # accepted (T_incl <= T_excl <= T_test) — the remaining
                # batches are runtime-skipped. A per-batch pl.when branch
                # does NOT serialize the pipeline the way a data-dependent
                # fori/while condition does (PERF.md round-2 rule): the
                # trip count stays static and DMAs stay unconditional.
                sat = jnp.max(Tt_ref[...]) <= TRANSMITTANCE_EPS
                done_ref[0] = jnp.where(sat, 1, done_ref[0])

        return 0

    # static-trip fori, NO data-dependent trip count: a while_loop whose
    # condition reduces the carry to a scalar serializes the batch
    # pipeline on TPU and measured ~3x slower than walking every batch
    # (scripts/exp_fwd_breakdown.py); terminated pixels contribute
    # nothing through the accept mask, and with skip=True saturated
    # tiles drop the per-batch compute under a scalar predicate instead.
    jax.lax.fori_loop(0, nb, body, 0)
    T_out = jnp.min(Tov_ref[...], axis=1, keepdims=True)
    last = jnp.max(lv_ref[...], axis=1, keepdims=True)

    # external contract stays log-space (one log per pixel per tile)
    logT_ref[0] = jnp.transpose(jnp.log(T_out), (1, 0))
    last_ref[0] = jnp.transpose(last, (1, 0))


# ---------------------------------------------------------------------------
# Backward kernel: per-entry grads + gid written K-aligned per tile
# ---------------------------------------------------------------------------


def _bwd_kernel(
    offs_ref,  # [T] i32
    cnts_ref,  # [T] i32
    aoff_ref,  # [T] i32: aligned write base per tile
    entries_hbm,  # [F, capA] f32 (row F-1 = gid as exact f32)
    logT_ref,  # [1, 1, P]
    last_ref,  # [1, 1, P] i32
    vaccum_ref,  # [1, Dp, P]
    vlogT_ref,  # [1, 1, P]
    _vz_hbm,  # [GR, capA2] f32 (aliased out, pre-zeroed; gid row = sentinel)
    vgr_hbm,  # [GR, capA2] f32 out: row 0 = gid (as f32), 1.. = grads
    ebuf,  # [2, F, K]
    esem,
    wbuf,  # [2, GR, K]
    wsem,
    *,
    K: int,
    P: int,
    PB: int,
    Dp: int,
    D: int,
    GR: int,
    ts: int,
    tw: int,
    th: int,
    native: bool,
    absgrad: bool,
    mxu_sigma: bool,
):
    t = pl.program_id(0)
    off = offs_ref[t]
    n = cnts_ref[t]
    aoff = aoff_ref[t]
    NPB = P // PB  # pixel sub-blocks per slice (PB=P: single block)
    # LANES-aligned (not K-aligned) stream base: DMA offsets only need
    # 128-lane alignment, and the tighter base cuts the masked-out
    # front-of-range boundary lanes from avg K/2 to LANES/2 entries per
    # tile (~15-25% of kernel compute at bench scale). Bit-exact: the
    # extra lanes were colmask-invalid no-ops.
    astart = (off // LANES) * LANES
    NS = K // LANES

    rem = t % (th * tw)
    ty = rem // tw
    tx = rem % tw

    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    # tile-LOCAL pixel coords: the gradient moments below contract degree-2
    # pixel polynomials on the MXU, and local coords keep the monomial
    # magnitudes (<= ts^2) small enough that the reconstruction's
    # cancellation stays ~1e-7 relative. dx = pxl - gxl is bit-identical to
    # the global px - gx (both shifts are exact f32 subtractions: operands
    # < 2^24 and |result| <= |operands|).
    # tile-CENTER origin halves the monomial magnitudes (|pxl| <= ts/2)
    pxl = (pix % ts).astype(jnp.float32) + (0.5 - ts / 2)
    pyl = (pix // ts).astype(jnp.float32) + (0.5 - ts / 2)
    x0 = (tx * ts).astype(jnp.float32) + (ts / 2)
    y0 = (ty * ts).astype(jnp.float32) + (ts / 2)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    # moment basis [P, 8]: the five per-entry quadratic reductions
    # (v_ca, v_cb, v_cc, v_gx, v_gy) are linear in the moments
    # M = Q^T v_sig — ONE full-depth [P,8]x[P,K] MXU contraction replaces
    # five [P,K]-wide multiply+reduce chains (VERDICT r2 item 3).
    ones_p = jnp.ones((P, 1), jnp.float32)
    Qm = jnp.concatenate(
        [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl, ones_p,
         jnp.zeros((P, 2), jnp.float32)],
        axis=1,
    )

    last_row = last_ref[0]  # [1, P]
    last = jnp.transpose(last_row, (1, 0))  # [P, 1]
    T_fin = jnp.exp(jnp.transpose(logT_ref[0], (1, 0)))
    vlogT = jnp.transpose(vlogT_ref[0], (1, 0))
    vaccum = vaccum_ref[0]  # [Dp, P]

    last_max = jnp.max(last_row)
    start_b = (last_max - astart) // K
    nb_eff = jnp.where((last_max >= off) & (n > 0), start_b + 1, 0)

    def wcopy(b, slot):
        # batch b of this tile writes to aligned slot aoff + b*K
        start = pl.multiple_of(aoff + b * K, LANES)
        return pltpu.make_async_copy(
            wbuf.at[slot], vgr_hbm.at[:, pl.ds(start, K)], wsem.at[slot]
        )

    @pl.when(nb_eff > 0)
    def _():
        _ecopy(entries_hbm, ebuf, esem, astart + start_b * K, start_b % 2, K).start()

    def body(i, carry):
        S, ssum = carry
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

        # reverse sweep: slices processed back-to-front within the batch.
        # Per-pixel math runs in PB-row sub-blocks (static unrolled — the
        # same straight-dataflow shape as the 2DGS bwd's PB sub-blocking):
        # at PB < P the [PB, LANES] live set shrinks proportionally, which
        # is what lets KB=256 (NS=2, real read double-buffering) fit the
        # 16MB VMEM at ts=32. Cross-pixel reductions (moments M, v_col)
        # accumulate across blocks as values; PB=P reproduces the original
        # single-block dataflow bit-for-bit.
        for s in reversed(range(NS)):
            e = eb[:, s * LANES : (s + 1) * LANES]
            gid = e[-1:, :].astype(jnp.int32)  # [1, 128] exact (< 2^24)

            gx, gy = e[0:1, :], e[1:2, :]
            ca, cb, cc = e[2:3, :], e[3:4, :], e[4:5, :]
            op = e[5:6, :]
            ecol = e[6 : 6 + Dp, :]
            gxl = gx - x0
            gyl = gy - y0
            if mxu_sigma:
                # same MXU contraction as the fwd kernel (and the same
                # monomial basis Qm the moment contraction below uses);
                # dx/dy are never needed — sdx/sdy come from the moments
                coef = jnp.concatenate(
                    [0.5 * ca, cb, 0.5 * cc,
                     -(ca * gxl + cb * gyl), -(cc * gyl + cb * gxl),
                     0.5 * (ca * gxl * gxl + cc * gyl * gyl) + cb * gxl * gyl,
                     jnp.zeros((2, LANES), jnp.float32)],
                    axis=0,
                )
            gidx = astart + b * K + s * LANES + kidx
            colmask = (gidx >= off) & (gidx < off + n)

            M = None  # [8, LANES] moment accumulator across pixel blocks
            v_col_full = None  # [Dp, LANES]
            S_parts, ssum_parts = [], []
            for p0 in range(0, P, PB):
                pb = slice(p0, p0 + PB)
                if mxu_sigma:
                    sig = jax.lax.dot_general(
                        Qm[pb], coef,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    araw = op * jnp.exp(-jnp.maximum(sig, 0.0))
                    sig_ok = sig >= -1e-3
                else:
                    dx = pxl[pb] - gxl
                    dy = pyl[pb] - gyl
                    sig = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
                    araw = op * jnp.exp(-sig)
                    sig_ok = sig >= 0.0
                alpha = jnp.minimum(araw, ALPHA_MAX)
                valid = colmask & (alpha >= ALPHA_MIN) & sig_ok
                accept = valid & (gidx <= last[pb])

                one_m = jnp.where(accept, 1.0 - alpha, 1.0)
                # reverse multiplicative chain: S_incl = prod_{j>=k}(1-a_j);
                # T_excl(k) = T_fin / S_incl (reference bwd's progressive
                # T /= (1-alpha), rasterize_to_pixels_bwd.py)
                S_incl = (
                    _cumprod_lanes(one_m, LANES, "rev_incl", native) * S[pb]
                )
                Tk = T_fin[pb] / S_incl
                w = jnp.where(accept, alpha * Tk, 0.0)

                cv = jax.lax.dot_general(
                    vaccum[:, pb], ecol,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                d = w * cv
                s_excl = _cum_lanes(d, LANES, "rev_excl", native) + ssum[pb]

                v_alpha = jnp.where(
                    accept, Tk * cv - (s_excl + vlogT[pb]) / one_m, 0.0
                )
                notclamp = araw < ALPHA_MAX
                v_sig = jnp.where(notclamp, -alpha * v_alpha, 0.0)
                # moment contraction: M[m] = sum_p monomial_m(pxl,pyl)*v_sig
                # — full-depth (PB) MXU matmul; the quadratic reductions
                # are lane-wide combinations of M with per-entry coeffs
                Mb = jax.lax.dot_general(
                    Qm[pb], v_sig,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [8, LANES]
                vcb = jax.lax.dot_general(
                    vaccum[:, pb], w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [Dp, LANES]
                M = Mb if M is None else M + Mb
                v_col_full = vcb if v_col_full is None else v_col_full + vcb
                S_parts.append(S_incl[:, 0:1])
                ssum_parts.append(
                    ssum[pb] + jnp.sum(d, axis=1, keepdims=True)
                )

            mxx, mxy, myy = M[0:1, :], M[1:2, :], M[2:3, :]
            mx, my, m1 = M[3:4, :], M[4:5, :], M[5:6, :]
            sdx = mx - gxl * m1  # sum_p dx * v_sig
            sdy = my - gyl * m1
            # v_op: v_sig = -op * (eneg * v_alpha * notclamp) pointwise, so
            # sum_p eneg*v_alpha*notclamp = -m1/op (op is per-entry; op ~ 0
            # implies alpha < ALPHA_MIN everywhere -> m1 = 0 -> 0)
            v_op = -m1 / jnp.maximum(op, 1e-12)
            v_ca = 0.5 * (mxx - 2.0 * gxl * mx + gxl * gxl * m1)
            v_cb = mxy - gxl * my - gyl * mx + gxl * gyl * m1
            v_cc = 0.5 * (myy - 2.0 * gyl * my + gyl * gyl * m1)
            v_gx = -(ca * sdx + cb * sdy)
            v_gy = -(cb * sdx + cc * sdy)
            v_col = v_col_full[:D]

            rows = [
                jnp.where(colmask, gid, jnp.int32(1 << 24)).astype(jnp.float32),
                v_gx, v_gy, v_ca, v_cb, v_cc, v_op, v_col,
            ]
            if absgrad:
                rows += [jnp.abs(v_gx), jnp.abs(v_gy)]
            used = 7 + D + (2 if absgrad else 0)
            if GR > used:
                rows.append(jnp.zeros((GR - used, LANES), jnp.float32))
            wbuf[wslot, :, s * LANES : (s + 1) * LANES] = jnp.concatenate(
                rows, axis=0
            )

            # running product/sum now include this slice
            S = (
                S_parts[0] if NPB == 1
                else jnp.concatenate(S_parts, axis=0)
            )
            ssum = (
                ssum_parts[0] if NPB == 1
                else jnp.concatenate(ssum_parts, axis=0)
            )

        wcopy(b, wslot).start()
        return S, ssum

    zero_p = jnp.zeros((P, 1), jnp.float32)
    jax.lax.fori_loop(0, nb_eff, body, (jnp.ones((P, 1), jnp.float32), zero_p))

    @pl.when(nb_eff >= 2)
    def _():
        wcopy(start_b - (nb_eff - 2), jax.lax.rem(nb_eff - 2, 2)).wait()

    @pl.when(nb_eff >= 1)
    def _():
        wcopy(start_b - (nb_eff - 1), jax.lax.rem(nb_eff - 1, 2)).wait()


# ---------------------------------------------------------------------------
# Gradient reduce: sorted-by-gid stream -> per-Gaussian sums (one-hot matmul)
# ---------------------------------------------------------------------------

RK = 512  # source block size
RCHUNK = 1024  # output gid chunk


def _reduce_kernel(
    bounds_ref,  # [M/RCHUNK + 1] i32: searchsorted chunk boundaries
    vg_hbm,  # [GR, capA2] f32 sorted by gid; row 0 = gid as exact f32
    out_ref,  # [GR, RCHUNK] out block (row 0 = garbage gid sums)
    vbuf,  # [2, GR, RK]
    vsem,
    *,
    GR: int,
):
    j = pl.program_id(0)
    lo = bounds_ref[j]
    hi = bounds_ref[j + 1]
    alo = (lo // RK) * RK
    nb = pl.cdiv(hi - alo, RK)
    base = j * RCHUNK

    # tpu.iota is integer-only; build the f32 column grid by casting
    cit = jax.lax.broadcasted_iota(jnp.int32, (RK, RCHUNK), 1).astype(
        jnp.float32
    )
    sit = jax.lax.broadcasted_iota(jnp.int32, (RK, 1), 0)

    @pl.when(nb > 0)
    def _():
        _ecopy(vg_hbm, vbuf, vsem, alo, 0, RK).start()

    def body(b, acc):
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nb)
        def _():
            _ecopy(vg_hbm, vbuf, vsem, alo + (b + 1) * RK, 1 - slot, RK).start()

        _ecopy(vg_hbm, vbuf, vsem, alo + b * RK, slot, RK).wait()
        vg = vbuf[slot]  # [GR, RK]

        # [RK, 1] orientation built without bool transposes (unsupported):
        # gid row is exact f32, so transpose it as f32; positions come from
        # a sublane iota directly.
        gidT = jnp.transpose(vg[0:1, :], (1, 0))  # [RK, 1] f32
        pos = alo + b * RK + sit  # [RK, 1] i32
        inrange = (pos >= lo) & (pos < hi)
        onehot = (
            ((gidT - jnp.float32(base)) == cit) & inrange
        ).astype(jnp.float32)  # [RK, RCHUNK]
        # 3-pass exact segmented sum: the one-hot side is 0/1 (bf16-exact),
        # so splitting ONLY the value side into three disjoint-bit bf16
        # planes (hi+mid+lo == vg exactly — the standard f32 split) and
        # accumulating three DEFAULT (single-pass) matmuls reproduces the
        # full f32 product at HALF the MXU passes of HIGHEST, which must
        # split BOTH operands (6 partials). Mosaic rejects per-operand
        # precision, hence the manual split.
        hi3 = vg.astype(jnp.bfloat16).astype(jnp.float32)
        r3 = vg - hi3
        mid3 = r3.astype(jnp.bfloat16).astype(jnp.float32)
        lo3 = r3 - mid3
        dot = lambda a: jax.lax.dot_general(
            a, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + dot(hi3) + dot(mid3) + dot(lo3)
        return acc

    # every started copy is waited inside body (prefetch for b+1 is waited
    # by iteration b+1, which always runs when the prefetch was issued)
    acc = jax.lax.fori_loop(
        0, nb, body, jnp.zeros((GR, RCHUNK), jnp.float32)
    )
    out_ref[...] = acc


def _reduce_call(gid_sorted, vg_sorted, M: int, GR: int, interpret: bool):
    """[GR, capA2] sorted-by-gid rows (row 0 = gid) -> [GR, M_pad] sums."""
    M_pad = _round_up(M, RCHUNK)
    nchunks = M_pad // RCHUNK
    bounds = jnp.searchsorted(
        gid_sorted.reshape(-1),
        jnp.arange(0, M_pad + 1, RCHUNK, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((GR, RCHUNK), lambda j, *_: (0, j)),
        scratch_shapes=[
            pltpu.VMEM((2, GR, RK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_reduce_kernel, GR=GR)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GR, M_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(bounds, vg_sorted)
    return out[:, :M]


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP over the whole binned pipeline
# ---------------------------------------------------------------------------


def _fwd_call(cfg, entries, offs, cnts):
    (C, N, T, th, tw, ts, P, D, Dp, F, KF, KB, PB, capA, GR, interpret, absgrad, cull, skipf, mxu_sigma, slice_skip) = cfg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((1, Dp, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, F, KF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, LANES), jnp.float32),
            pltpu.VMEM((P, LANES), jnp.int32),
            pltpu.VMEM((Dp, P), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, K=KF, P=P, Dp=Dp, ts=ts, tw=tw, th=th,
        native=not interpret, skip=skipf, mxu_sigma=mxu_sigma,
        slice_skip=slice_skip,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, Dp, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(offs, cnts, entries)


def _bwd_call(cfg, entries, offs, cnts, aoff, capA2, logT, last, v_accum, v_logT):
    (C, N, T, th, tw, ts, P, D, Dp, F, KF, KB, PB, capA, GR, interpret, absgrad, cull, skipf, mxu_sigma, slice_skip) = cfg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # entries
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),  # logT
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),  # last
            pl.BlockSpec((1, Dp, P), lambda t, *_: (t, 0, 0)),  # v_accum
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),  # v_logT
            pl.BlockSpec(memory_space=pltpu.ANY),  # vzero (aliased)
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, F, KB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, GR, KB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, K=KB, P=P, PB=PB, Dp=Dp, D=D, GR=GR, ts=ts, tw=tw, th=th,
        native=not interpret, absgrad=absgrad, mxu_sigma=mxu_sigma,
    )
    # pre-zeroed (gid row = sentinel) so unprocessed aligned slots reduce
    # to nothing
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
        # operand index counts the 3 scalar-prefetch args: vzero is input 8
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(offs, cnts, aoff, entries, logT, last, v_accum, v_logT, vzero)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_binned(cfg, packed, absc, radii, depths):
    out, _ = _raster_binned_fwd(cfg, packed, absc, radii, depths)
    return out


def _bin_from_packed(cfg, packed, radii, depths):
    (C, N, T, th, tw, ts, P, D, Dp, F, KF, KB, PB, capA, GR, interpret, absgrad, cull, skipf, mxu_sigma, slice_skip) = cfg
    rs = lambda r: packed[r].reshape(C, N)
    colors = jnp.stack([rs(6 + d) for d in range(D)], axis=-1)
    return bin_gaussians(
        rs(0), rs(1), rs(2), rs(3), rs(4), rs(5), colors, radii, depths,
        ts, tw, th, capacity=capA, cull=cull,
    )


def _raster_binned_fwd(cfg, packed, absc, radii, depths):
    (C, N, T, th, tw, ts, P, D, Dp, F, KF, KB, PB, capA, GR, interpret, absgrad, cull, skipf, mxu_sigma, slice_skip) = cfg
    binned = _bin_from_packed(cfg, jax.lax.stop_gradient(packed), radii, depths)
    NF = binned.entries.shape[0]
    # row F-1 carries the entry's gid as an exact f32 (< 2^24) for the
    # backward; the forward kernel never reads past row 6+Dp.
    entries = jnp.concatenate(
        [
            binned.entries,
            jnp.zeros((F - NF - 1, binned.entries.shape[1]), jnp.float32),
            binned.gids.astype(jnp.float32),
        ],
        axis=0,
    )
    # the kernels' LANES-aligned stream base makes the last DMA of a tile
    # whose range ends at the slab boundary read up to max(K)-LANES columns
    # past capA — pad with zeros (colmask-invalid, so semantically inert)
    # instead of reading out of bounds
    overrun = max(KF, KB) - LANES
    if overrun > 0:
        entries = jnp.pad(entries, ((0, 0), (0, overrun)))
    accum, logT, last = _fwd_call(cfg, entries, binned.offs, binned.cnts)
    res = (entries, binned.offs, binned.cnts, logT, last)
    return (accum, logT, binned.n_isects, binned.slab_required), res


def _raster_binned_bwd(cfg, res, cts):
    (C, N, T, th, tw, ts, P, D, Dp, F, KF, KB, PB, capA, GR, interpret, absgrad, cull, skipf, mxu_sigma, slice_skip) = cfg
    entries, offs, cnts, logT, last = res
    v_accum, v_logT, _, _ = cts
    acnt = ((cnts + KB - 1) // KB + 1) * KB  # +KB: astart may precede offs
    aoff = (jnp.cumsum(acnt) - acnt).astype(jnp.int32)
    # RK-rounded (not just LANES): _reduce_kernel DMAs RK-aligned blocks
    # whose last read ends at round_up(hi, RK) — a LANES-only rounding
    # lets it run past the array when T is odd (2*KB*T ≡ 256 mod 512)
    capA2 = _round_up(capA + 2 * KB * T, RK)
    vgr = _bwd_call(
        cfg, entries, offs, cnts, aoff, capA2, logT, last, v_accum, v_logT
    )
    # sort only the populated rows (GR is 8-rounded; pads are zeros)
    used = 7 + D + (2 if absgrad else 0)
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
    )  # [GR, capA2], row 0 = gid
    red = _reduce_call(
        sorted_ops[0], vg_s, M=C * N, GR=GR, interpret=interpret
    )
    # red rows: gid-garbage, v_gx, v_gy, v_ca, v_cb, v_cc, v_op, v_col[D],
    # (abs x2)
    v_packed = jnp.concatenate(
        [red[1 : 7 + D], jnp.zeros((F - 6 - D, C * N), jnp.float32)], axis=0
    )
    if absgrad:
        v_absc = red[7 + D : 9 + D]
    else:
        v_absc = jnp.zeros((2, C * N), jnp.float32)
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return v_packed, v_absc, zi(jnp.zeros((C, N), jnp.int32)), jnp.zeros((C, N), jnp.float32)


_raster_binned.defvjp(_raster_binned_fwd, _raster_binned_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def rasterize_to_pixels_binned(
    means2d,  # [C, N, 2] or (mean_x, mean_y) [C, N] tuple
    conics,  # [C, N, 3] or (a, b, c) tuple
    colors: jax.Array,  # [C, N, D]
    opacities: jax.Array,  # [C, N]
    radii: jax.Array,  # [C, N] i32
    depths: jax.Array,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int,
    capacity: int,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    abs_carrier: Optional[Tuple[jax.Array, jax.Array]] = None,
    cull: bool = True,
    batch_size: int = 4 * LANES,
    bwd_batch_size: Optional[int] = None,
    skip_saturated: bool = True,
    sigma_mxu: Optional[bool] = None,
    slice_skip: Optional[bool] = None,
    per_camera: Optional[bool] = None,
    bwd_pixel_block: Optional[int] = None,
):
    """Rasterize via the binning engine (emit -> payload sort -> kernels).

    Returns (render_colors [C,H,W,D], render_alphas [C,H,W,1], aux) where
    aux = {"n_isects", "slab_required"} for the out-of-jit capacity loop.
    Semantics identical to rasterize_to_pixels_ref / rasterize_to_pixels_tiled.
    ``skip_saturated`` runtime-skips fwd batch compute once every pixel of
    the tile is past the termination threshold (bit-identical output; the
    CUDA analogue is the reference fwd's per-warp ``break``).
    ``sigma_mxu`` evaluates the fwd sigma quadratic as one [P,8]@[8,LANES]
    MXU contraction instead of the VPU chain (env ``GSPLAT_SIGMA_MXU=1``
    flips the default; off until the on-device A/B in
    scripts/exp_mxu_kernel_shapes.py shows a win — expanded-polynomial
    rounding is ~1e-3 absolute in sigma vs the exact path).
    ``slice_skip`` runtime-skips fully-dead trailing 128-lane slices in the
    fwd kernel (bit-identical; env ``GSPLAT_SLICE_SKIP=1`` flips the
    default, off until the on-device A/B: it trades ~KF/2 dead trailing
    lanes/tile for 2x [P,LANES] carry-ref traffic per live slice).
    ``per_camera`` bins/sorts/rasterizes each camera separately under
    ``lax.map`` with ``capacity`` as the PER-CAMERA slab budget — removes
    batched rendering's shared-slab tax (env ``GSPLAT_PER_CAM=1``).
    """
    if sigma_mxu is None:
        sigma_mxu = os.environ.get("GSPLAT_SIGMA_MXU", "0") == "1"
    if slice_skip is None:
        slice_skip = os.environ.get("GSPLAT_SLICE_SKIP", "0") == "1"
    if per_camera is None:
        per_camera = os.environ.get("GSPLAT_PER_CAM", "0") == "1"
    if per_camera and (
        isinstance(means2d, (tuple, list)) and means2d[0].shape[0] > 1
        or not isinstance(means2d, (tuple, list)) and means2d.shape[0] > 1
    ):
        # Per-camera slab partition (VERDICT r4 item 6): bin + sort +
        # rasterize each camera separately under lax.map instead of one
        # shared C-times-larger slab. Removes the batched mode's max-slab
        # tax (every camera padding to the worst camera's entry count) and
        # the sort's n*log(n) growth; cameras serialize, but each camera's
        # pipeline already fills the chip. ``capacity`` becomes the
        # PER-CAMERA slab budget; aux reports the max across cameras so
        # the out-of-jit growth loop keeps its semantics.
        if isinstance(means2d, (tuple, list)):
            mx_, my_ = means2d
        else:
            mx_, my_ = means2d[..., 0], means2d[..., 1]
        if isinstance(conics, (tuple, list)):
            ca_, cb_, cc_ = conics
        else:
            ca_, cb_, cc_ = conics[..., 0], conics[..., 1], conics[..., 2]
        sl = {
            "mx": mx_, "my": my_, "ca": ca_, "cb": cb_, "cc": cc_,
            "op": opacities, "col": colors, "rad": radii, "dep": depths,
        }
        if backgrounds is not None:
            sl["bg"] = backgrounds
        if abs_carrier is not None:
            sl["abx"] = abs_carrier[0]
            sl["aby"] = abs_carrier[1]

        def _one(s):
            img, al, aux = rasterize_to_pixels_binned(
                (s["mx"][None], s["my"][None]),
                (s["ca"][None], s["cb"][None], s["cc"][None]),
                s["col"][None], s["op"][None], s["rad"][None],
                s["dep"][None], image_width, image_height, tile_size,
                capacity,
                backgrounds=s["bg"][None] if "bg" in s else None,
                abs_carrier=(
                    (s["abx"][None], s["aby"][None])
                    if "abx" in s else None
                ),
                cull=cull, batch_size=batch_size,
                bwd_batch_size=bwd_batch_size,
                skip_saturated=skip_saturated, sigma_mxu=sigma_mxu,
                slice_skip=slice_skip, per_camera=False,
                bwd_pixel_block=bwd_pixel_block,
            )
            return img[0], al[0], aux["n_isects"], aux["slab_required"]

        img, alphas, n_isects, slab = jax.lax.map(_one, sl)
        aux = {
            "n_isects": jnp.max(n_isects),
            "slab_required": jnp.max(slab),
        }
        return img, alphas, aux
    # on-device sweep hooks: with the LANES-aligned stream base the
    # back-of-range boundary waste scales with K, so smaller K trades DMA
    # count against masked lanes — measure, don't guess
    if os.environ.get("GSPLAT_KF"):
        batch_size = int(os.environ["GSPLAT_KF"])
        assert batch_size > 0 and batch_size % LANES == 0, batch_size
    if os.environ.get("GSPLAT_KB"):
        bwd_batch_size = int(os.environ["GSPLAT_KB"])
        assert bwd_batch_size > 0 and bwd_batch_size % LANES == 0, bwd_batch_size
    if isinstance(means2d, (tuple, list)):
        mean_x, mean_y = means2d
    else:
        mean_x, mean_y = means2d[..., 0], means2d[..., 1]
    if isinstance(conics, (tuple, list)):
        con_a, con_b, con_c = conics
    else:
        con_a, con_b, con_c = conics[..., 0], conics[..., 1], conics[..., 2]
    C, N = mean_x.shape
    D = colors.shape[-1]
    ts = tile_size
    th = -(-image_height // ts)
    tw = -(-image_width // ts)
    T = C * th * tw
    P = ts * ts
    Dp = _round_up(D, 8)
    F = _round_up(6 + Dp, 8)
    if bwd_batch_size is None:
        # the bwd kernel's live set scales with P*KB: at P=1024 (ts=32)
        # KB=256 overflows the 16MB scoped VMEM by ~1MB
        bwd_batch_size = 2 * LANES if tile_size * tile_size <= 512 else LANES
    KF, KB = batch_size, bwd_batch_size
    assert KF % LANES == 0 and KB % LANES == 0
    # bwd pixel sub-block (GSPLAT_BWD_PB): shrinks the bwd kernel's
    # [P, LANES] live set by P/PB so larger KB (NS >= 2: real read
    # double-buffering) fits VMEM at ts=32 — PB=P keeps the original
    # single-block dataflow (bit-identical). On-device A/B decides the
    # default (r5 queue).
    PB = bwd_pixel_block or P
    if os.environ.get("GSPLAT_BWD_PB"):
        PB = int(os.environ["GSPLAT_BWD_PB"])
    PB = min(PB, P)
    assert P % PB == 0 and PB % 8 == 0, (P, PB)
    GR = _round_up(1 + 6 + D + (2 if abs_carrier is not None else 0), 8)

    rows = [
        mean_x.reshape(-1), mean_y.reshape(-1),
        con_a.reshape(-1), con_b.reshape(-1), con_c.reshape(-1),
        opacities.reshape(-1),
    ] + [colors[..., d].reshape(-1) for d in range(D)]
    rows += [jnp.zeros((C * N,), jnp.float32)] * (F - len(rows))
    packed = jnp.stack(rows, axis=0).astype(jnp.float32)

    if abs_carrier is not None:
        absc = jnp.stack(
            [abs_carrier[0].reshape(-1), abs_carrier[1].reshape(-1)], axis=0
        ).astype(jnp.float32)
    else:
        absc = jnp.zeros((2, C * N), jnp.float32)

    cfg = (
        C, N, T, th, tw, ts, P, D, Dp, F, KF, KB, PB,
        _round_up(capacity, 512), GR, _interpret(),
        abs_carrier is not None, cull, skip_saturated, sigma_mxu,
        slice_skip,
    )
    accum, logT, n_isects, slab_required = _raster_binned(
        cfg, packed, absc, radii, depths
    )

    img = accum[:, :D, :].reshape(C, th, tw, D, ts, ts)
    img = jnp.transpose(img, (0, 1, 4, 2, 5, 3)).reshape(
        C, th * ts, tw * ts, D
    )[:, :image_height, :image_width]
    Tfin = jnp.exp(logT).reshape(C, th, tw, ts, ts)
    Tfin = jnp.transpose(Tfin, (0, 1, 3, 2, 4)).reshape(C, th * ts, tw * ts)[
        :, :image_height, :image_width
    ]
    alphas = 1.0 - Tfin
    if backgrounds is not None:
        img = img + Tfin[..., None] * backgrounds[:, None, None, :]
    aux = {"n_isects": n_isects, "slab_required": slab_required}
    return img, alphas[..., None], aux
