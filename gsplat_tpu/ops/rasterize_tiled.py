"""Tile-based rasterization: Pallas TPU kernels with a hand-written VJP.

This is the TPU-native replacement for the reference's rasterize kernels
(gsplat/triton_impl/rasterize_to_pixels_fwd.py, .../rasterize_to_pixels_bwd.py
and gsplat/cuda/csrc/RasterizeToPixels3DGS{Fwd,Bwd}.cu). Not a translation —
the design is rebuilt around TPU/XLA constraints:

  - **Pre-gathered SoA entry stream.** The depth-sorted intersection list
    (ops/isect.py) is turned into a dense ``[F, capacity]`` float32 "entry"
    array *outside* the kernel by one XLA gather (``packed[:, flatten_ids]``).
    Each tile's entries are contiguous columns, so the kernel streams them
    with lane-aligned dynamic-slice DMAs (batch K = 128 columns = one lane
    tile) — no per-element gathers on the TPU, and the gather's own autodiff
    VJP is exactly the gradient scatter-add the CUDA backward implements with
    atomics (RasterizeToPixels3DGSBwd.cu uses atomicAdd; XLA's scatter is
    deterministic).
  - **K-aligned tile ranges.** Each tile's column range is padded to a
    multiple of K, so every fixed-size batch read/write stays inside the
    owning tile's region. The backward kernel can then DMA per-entry gradient
    batches without cross-tile races (megacore-safe).
  - **Vectorized compositing.** One grid step per (camera, tile). Pixels live
    on the sublane axis (P = tile_size^2 = 256), the Gaussian batch on the
    128-lane axis. The per-pixel sequential transmittance recurrence becomes
    a per-batch triangular-matmul cumsum in log space on the MXU (the
    reference's Triton kernel uses a log-space cumsum for the same reason —
    rasterize_to_pixels_fwd.py:126-135 — TPU has no per-pixel threads
    either). Color accumulation is a [Dp,K]x[P,K]->[Dp,P] MXU contraction.
  - **Exact oracle semantics.** Per-pixel termination (inclusive
    transmittance <= 1e-4 ends the pixel) is reproduced via a per-pixel
    ``last_idx`` output — the TPU analogue of the reference's ``last_ids``
    (rasterize_to_pixels_fwd.py:151-155). The backward reconstructs the
    transmittance far->near from the stored final log-T, mirroring the
    reference's reverse sweep (rasterize_to_pixels_bwd.py:190-196) without
    storing per-pixel T.
  - Background blending and the alpha output are computed *outside* the
    kernel from the final log-transmittance, so their gradients come from
    XLA autodiff and the hand-written VJP only covers the compositing loop.
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

LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cum_lanes(x, K: int, kind: str, native: bool):
    """Cumulative sum along the lane axis (axis=1) via log2(K) shifted adds.

    Exact f32 on the VPU — an MXU triangular-matmul cumsum would run at bf16
    input precision on TPU, which is too coarse for log-transmittance terms.
    """
    roll = pltpu.roll if native else jnp.roll
    kidx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    shift = 1
    if kind == "fwd_incl":  # out[k] = sum_{j<=k} x[j]
        while shift < K:
            s = s + jnp.where(kidx >= shift, roll(s, shift, 1), 0.0)
            shift *= 2
        return s
    # reverse: out[k] = sum_{j>=k} x[j]; roll by K-shift == roll by -shift
    # (pltpu.roll requires non-negative shifts)
    while shift < K:
        s = s + jnp.where(kidx < K - shift, roll(s, K - shift, 1), 0.0)
        shift *= 2
    if kind == "rev_excl":  # out[k] = sum_{j>k} x[j]
        s = s - x
    return s


def _cumprod_lanes(x, K: int, kind: str, native: bool):
    """Cumulative product along the lane axis via log2(K) shifted
    multiplies (the multiplicative twin of rasterize_tiled._cum_lanes).
    Multiplicative transmittance chains match the reference CUDA kernels'
    f32 semantics (progressive T *= (1-alpha) / T /= (1-alpha)) and cost
    two fewer transcendentals per (pixel, entry) pair than log-space."""
    roll = pltpu.roll if native else jnp.roll
    kidx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    shift = 1
    if kind == "fwd_incl":  # out[k] = prod_{j<=k} x[j]
        while shift < K:
            s = s * jnp.where(kidx >= shift, roll(s, shift, 1), 1.0)
            shift *= 2
        return s
    # rev_incl: out[k] = prod_{j>=k} x[j]
    while shift < K:
        s = s * jnp.where(kidx < K - shift, roll(s, K - shift, 1), 1.0)
        shift *= 2
    return s


def _entry_copy(entries_hbm, ebuf, esem, off, b, slot, K):
    # Tile ranges are K-aligned by construction (see the wrapper), which is
    # what lets Mosaic slice the lane axis at a dynamic offset.
    start = pl.multiple_of(off + b * K, LANES)
    return pltpu.make_async_copy(
        entries_hbm.at[:, pl.ds(start, K)], ebuf.at[slot], esem.at[slot]
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    offs_ref,  # [T] int32 (scalar prefetch): aligned start per tile
    cnts_ref,  # [T] int32 (scalar prefetch): true entry count per tile
    entries_hbm,  # [F, capA] f32 in HBM
    accum_ref,  # [1, Dp, P] f32 out block
    logT_ref,  # [1, 1, P] f32 out block (accepted-only log transmittance)
    last_ref,  # [1, 1, P] i32 out block (last accepted local index, -1 none)
    ebuf,  # [2, F, K] f32 VMEM scratch
    esem,  # DMA sems (2,)
    *,
    K: int,
    P: int,
    Dp: int,
    ts: int,
    tw: int,
    th: int,
    native: bool,
):
    t = pl.program_id(0)
    off = offs_ref[t]
    n = cnts_ref[t]
    nb = pl.cdiv(n, K)

    rem = t % (th * tw)
    ty = rem // tw
    tx = rem % tw

    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * ts + pix % ts).astype(jnp.float32) + 0.5  # [P, 1]
    py = (ty * ts + pix // ts).astype(jnp.float32) + 0.5
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    accum_ref[...] = jnp.zeros_like(accum_ref)

    @pl.when(nb > 0)
    def _():
        _entry_copy(entries_hbm, ebuf, esem, off, 0, 0, K).start()

    def body(carry):
        b, T_test, T_out, last = carry
        slot = jax.lax.rem(b, 2)

        # Speculatively prefetch the next batch (waited post-loop on exit).
        @pl.when(b + 1 < nb)
        def _():
            _entry_copy(entries_hbm, ebuf, esem, off, b + 1, 1 - slot, K).start()

        _entry_copy(entries_hbm, ebuf, esem, off, b, slot, K).wait()
        e = ebuf[slot]  # [F, K]

        gx, gy = e[0:1, :], e[1:2, :]  # [1, K]
        ca, cb, cc = e[2:3, :], e[3:4, :], e[4:5, :]
        op = e[5:6, :]
        dx = px - gx  # [P, K]
        dy = py - gy
        sig = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        araw = op * jnp.exp(-sig)
        alpha = jnp.minimum(araw, ALPHA_MAX)
        colmask = (b * K + kidx) < n  # [1, K]
        valid = colmask & (alpha >= ALPHA_MIN) & (sig >= 0.0)
        one_m = jnp.where(valid, 1.0 - alpha, 1.0)

        # multiplicative transmittance chain, identical to the oracle and
        # the reference CUDA (progressive T *= (1-alpha)); exclusive
        # product via lane roll, never division (see rasterize_binned)
        Tm = _cumprod_lanes(one_m, K, "fwd_incl", native)
        roll = pltpu.roll if native else jnp.roll
        Tm_excl = jnp.where(kidx >= 1, roll(Tm, 1, 1), 1.0)
        T_excl = Tm_excl * T_test
        T_incl = T_excl * one_m
        accept = valid & (T_incl > TRANSMITTANCE_EPS)
        w = jnp.where(accept, T_excl * alpha, 0.0)  # [P, K]

        accum_ref[0] += jax.lax.dot_general(
            e[6 : 6 + Dp, :],
            w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Dp, P]

        T_test = T_test * Tm[:, K - 1 :]
        T_out = jnp.minimum(
            T_out,
            jnp.min(jnp.where(accept, T_incl, 1.0), axis=1, keepdims=True),
        )
        idx = b * K + kidx  # [1, K]
        last = jnp.maximum(
            last, jnp.max(jnp.where(accept, idx, -1), axis=1, keepdims=True)
        )
        return b + 1, T_test, T_out, last

    # static-trip fori, no data-dependent early exit: the while_loop's
    # scalar condition serialized the batch pipeline (~3x, see
    # exp_fwd_breakdown.py); the accept mask already zeroes terminated
    # pixels.
    one_p = jnp.ones((P, 1), jnp.float32)
    _, _, T_out, last = jax.lax.fori_loop(
        0, nb, lambda b, c: body(c),
        (jnp.int32(0), one_p, one_p, jnp.full((P, 1), -1, jnp.int32)),
    )

    logT_ref[0] = jnp.transpose(jnp.log(T_out), (1, 0))
    last_ref[0] = jnp.transpose(last, (1, 0))


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    offs_ref,  # [T] int32 scalar prefetch
    cnts_ref,  # [T] int32 scalar prefetch
    entries_hbm,  # [F, capA] f32 HBM
    logT_ref,  # [1, 1, P] f32 block (fwd residual)
    last_ref,  # [1, 1, P] i32 block (fwd residual)
    vaccum_ref,  # [1, Dp, P] f32 block (cotangent of accum)
    vlogT_ref,  # [1, 1, P] f32 block (cotangent of logT)
    _vzero_hbm,  # [F, capA] f32 HBM — aliased to ventries (pre-zeroed)
    ventries_hbm,  # [F, capA] f32 HBM out
    ebuf,  # [2, F, K] scratch
    esem,
    wbuf,  # [2, F, K] scratch (gradient write staging)
    wsem,
    *,
    K: int,
    P: int,
    Dp: int,
    F: int,
    ts: int,
    tw: int,
    th: int,
    native: bool,
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

    last_row = last_ref[0]  # [1, P]
    last = jnp.transpose(last_row, (1, 0))  # [P, 1]
    T_fin = jnp.exp(jnp.transpose(logT_ref[0], (1, 0)))  # [P, 1]
    vlogT = jnp.transpose(vlogT_ref[0], (1, 0))  # [P, 1]
    vaccum = vaccum_ref[0]  # [Dp, P]

    last_max = jnp.max(last_row)
    start_b = last_max // K
    nb_eff = jnp.where((last_max >= 0) & (n > 0), start_b + 1, 0)

    def wcopy(b, slot):
        start = pl.multiple_of(off + b * K, LANES)
        return pltpu.make_async_copy(
            wbuf.at[slot],
            ventries_hbm.at[:, pl.ds(start, K)],
            wsem.at[slot],
        )

    @pl.when(nb_eff > 0)
    def _():
        _entry_copy(entries_hbm, ebuf, esem, off, start_b, start_b % 2, K).start()

    def body(i, carry):
        S, ssum = carry  # [P,1] accepted (1-a) suffix product; [P,1] w*(c.v) suffix
        b = start_b - i
        slot = jax.lax.rem(b, 2)

        @pl.when(b - 1 >= 0)
        def _():
            _entry_copy(entries_hbm, ebuf, esem, off, b - 1, 1 - slot, K).start()

        _entry_copy(entries_hbm, ebuf, esem, off, b, slot, K).wait()
        e = ebuf[slot]  # [F, K]

        gx, gy = e[0:1, :], e[1:2, :]
        ca, cb, cc = e[2:3, :], e[3:4, :], e[4:5, :]
        op = e[5:6, :]
        ecol = e[6 : 6 + Dp, :]  # [Dp, K]
        dx = px - gx
        dy = py - gy
        sig = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        eneg = jnp.exp(-sig)
        araw = op * eneg
        alpha = jnp.minimum(araw, ALPHA_MAX)
        colmask = (b * K + kidx) < n
        valid = colmask & (alpha >= ALPHA_MIN) & (sig >= 0.0)
        accept = valid & ((b * K + kidx) <= last)  # [P, K]

        one_m = jnp.where(accept, 1.0 - alpha, 1.0)
        # T_k (exclusive) = T_final / prod_{accepted j >= k} (1-a_j) —
        # the reference bwd's progressive T /= (1-alpha)
        S_incl = _cumprod_lanes(one_m, K, "rev_incl", native) * S
        Tk = T_fin / S_incl
        w = jnp.where(accept, alpha * Tk, 0.0)  # [P, K]

        cv = jax.lax.dot_general(  # (c_k . v_accum) per pixel: [P, K]
            vaccum,
            ecol,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = w * cv
        s_excl = _cum_lanes(d, K, "rev_excl", native) + ssum

        v_alpha = jnp.where(
            accept, Tk * cv - (s_excl + vlogT) / one_m, 0.0
        )
        notclamp = araw < ALPHA_MAX
        v_sig = jnp.where(notclamp, -alpha * v_alpha, 0.0)
        v_op = jnp.sum(
            jnp.where(notclamp, eneg * v_alpha, 0.0), axis=0, keepdims=True
        )  # [1, K]
        v_ca = jnp.sum(0.5 * dx * dx * v_sig, axis=0, keepdims=True)
        v_cb = jnp.sum(dx * dy * v_sig, axis=0, keepdims=True)
        v_cc = jnp.sum(0.5 * dy * dy * v_sig, axis=0, keepdims=True)
        v_gx = -jnp.sum((ca * dx + cb * dy) * v_sig, axis=0, keepdims=True)
        v_gy = -jnp.sum((cb * dx + cc * dy) * v_sig, axis=0, keepdims=True)
        v_col = jax.lax.dot_general(  # [Dp, K]
            vaccum,
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        g = jnp.concatenate(
            [v_gx, v_gy, v_ca, v_cb, v_cc, v_op, v_col]
            + ([jnp.zeros((F - 6 - Dp, K), jnp.float32)] if F > 6 + Dp else []),
            axis=0,
        )  # [F, K]

        # Reuse of a write slot requires its previous DMA (iteration i-2) done.
        @pl.when(i >= 2)
        def _():
            wcopy(b + 2, jax.lax.rem(i, 2)).wait()

        wslot = jax.lax.rem(i, 2)
        wbuf[wslot] = g
        wcopy(b, wslot).start()

        S = S_incl[:, 0:1]
        ssum = ssum + jnp.sum(d, axis=1, keepdims=True)
        return S, ssum

    zero_p = jnp.zeros((P, 1), jnp.float32)
    jax.lax.fori_loop(
        0, nb_eff, body, (jnp.ones((P, 1), jnp.float32), zero_p)
    )

    # Drain outstanding gradient writes (iterations nb_eff-1 and nb_eff-2).
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
    (T, th, tw, ts, P, D, Dp, F, K, capA, interpret) = cfg
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
            pltpu.VMEM((2, F, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, K=K, P=P, Dp=Dp, ts=ts, tw=tw, th=th, native=not interpret
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


def _bwd_call(cfg, entries, offs, cnts, logT, last, v_accum, v_logT):
    (T, th, tw, ts, P, D, Dp, F, K, capA, interpret) = cfg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # entries
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),  # logT
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),  # last
            pl.BlockSpec((1, Dp, P), lambda t, *_: (t, 0, 0)),  # v_accum
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),  # v_logT
            pl.BlockSpec(memory_space=pltpu.ANY),  # vzero (aliased out)
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
        _bwd_kernel, K=K, P=P, Dp=Dp, F=F, ts=ts, tw=tw, th=th, native=not interpret
    )
    vzero = jnp.zeros_like(entries)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F, capA), jnp.float32)],
        # operand index includes the 2 scalar-prefetch args: vzero is input 7
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(offs, cnts, entries, logT, last, v_accum, v_logT, vzero)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_entries(cfg, entries, offs, cnts):
    accum, logT, _ = _fwd_call(cfg, entries, offs, cnts)
    return accum, logT


def _raster_entries_fwd(cfg, entries, offs, cnts):
    accum, logT, last = _fwd_call(cfg, entries, offs, cnts)
    return (accum, logT), (entries, offs, cnts, logT, last)


def _raster_entries_bwd(cfg, res, cts):
    entries, offs, cnts, logT, last = res
    v_accum, v_logT = cts
    v_entries = _bwd_call(cfg, entries, offs, cnts, logT, last, v_accum, v_logT)
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return v_entries, zi(offs), zi(cnts)


_raster_entries.defvjp(_raster_entries_fwd, _raster_entries_bwd)


# Custom VJP spanning gather + kernel, so the backward can fuse extra rows
# into the single gradient scatter-add. `absc` [2, M] is a zeros carrier
# whose cotangent is the reference's absgrad statistic: per-tile screen-space
# gradient magnitudes summed per Gaussian (|d mu2d| accumulated per tile in
# gsplat/triton_impl/rasterize_to_pixels_bwd.py:282-292) — NOT |sum over
# tiles|. Because XLA scatter cost is per-index, the two extra rows ride the
# same scatter for free.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_packed(cfg, packed, absc, ids_al, offs, cnts):
    entries = jnp.take(packed, ids_al, axis=1)
    accum, logT, _ = _fwd_call(cfg[:11], entries, offs, cnts)
    return accum, logT


def _raster_packed_fwd(cfg, packed, absc, ids_al, offs, cnts):
    entries = jnp.take(packed, ids_al, axis=1)
    accum, logT, last = _fwd_call(cfg[:11], entries, offs, cnts)
    return (accum, logT), (entries, ids_al, offs, cnts, logT, last)


def _raster_packed_bwd(cfg, res, cts):
    (T, th, tw, ts, P, D, Dp, F, K, capA, interpret, M, absgrad) = cfg
    entries, ids_al, offs, cnts, logT, last = res
    v_accum, v_logT = cts
    v_entries = _bwd_call(
        cfg[:11], entries, offs, cnts, logT, last, v_accum, v_logT
    )
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    if absgrad:
        vext = jnp.concatenate([v_entries, jnp.abs(v_entries[0:2])], axis=0)
        scat = jnp.zeros((F + 2, M), jnp.float32).at[:, ids_al].add(vext)
        v_packed, v_absc = scat[:F], scat[F:]
    else:
        v_packed = jnp.zeros((F, M), jnp.float32).at[:, ids_al].add(v_entries)
        v_absc = jnp.zeros((2, M), jnp.float32)
    return v_packed, v_absc, zi(ids_al), zi(offs), zi(cnts)


_raster_packed.defvjp(_raster_packed_fwd, _raster_packed_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def rasterize_to_pixels_tiled(
    means2d,  # [C, N, 2] array or (mean_x [C,N], mean_y [C,N]) tuple
    conics,  # [C, N, 3] array or (a, b, c) tuple of [C,N]
    colors: jax.Array,  # [C, N, D]
    opacities: jax.Array,  # [C, N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect: Isect,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    batch_size: int = LANES,
    abs_carrier: Optional[Tuple[jax.Array, jax.Array]] = None,  # ([C,N], [C,N])
) -> Tuple[jax.Array, jax.Array]:
    """Rasterize depth-sorted, tile-binned Gaussians with Pallas TPU kernels.

    Returns (render_colors [C, H, W, D], render_alphas [C, H, W, 1]).
    Semantics identical to :func:`rasterize_to_pixels_ref`. ``means2d`` and
    ``conics`` may be passed SoA ([C, N] component arrays) to keep every
    XLA-materialized buffer lane-friendly (see ops/projection.py docstring).

    ``abs_carrier``: optional pair of zero [C, N] arrays; differentiating
    w.r.t. them yields the reference's absgrad statistic (per-tile |d mu2d|
    sums, rasterize_to_pixels_bwd.py:282-292). The forward output does not
    depend on them.
    """
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
    K = batch_size
    assert K % LANES == 0, "batch size must be lane-aligned"
    cap = isect.flatten_ids.shape[0]
    capA = cap + K * T

    # --- K-aligned entry layout -------------------------------------------
    counts = (isect.ends - isect.offsets).reshape(-1)  # [T]
    acnts = -(-counts // K) * K
    aoff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(acnts).astype(jnp.int32)]
    )  # [T+1]
    offs_by_tile = jnp.concatenate(
        [isect.offsets.reshape(-1), isect.n_isects[None]]
    ).astype(jnp.int32)
    tk = jnp.minimum(isect.tile_keys, T)  # padding sentinel -> T
    # single 2-row table lookup (gather cost is per-index, not per-row)
    tables = jnp.stack([offs_by_tile, aoff], axis=0)  # [2, T+1]
    looked = jnp.take(tables, tk, axis=1)  # [2, cap]
    rank = jnp.arange(cap, dtype=jnp.int32) - looked[0]
    newpos = looked[1] + rank
    ids_al = (
        jnp.zeros((capA,), jnp.int32).at[newpos].set(isect.flatten_ids, mode="drop")
    )

    # --- pack + gather entries (VJP of this gather == gradient scatter) ----
    # Row-wise stack of [C*N] component vectors: no [C*N, small] temporaries
    # are ever materialized (lane dim stays C*N throughout).
    rows = [
        mean_x.reshape(-1),
        mean_y.reshape(-1),
        con_a.reshape(-1),
        con_b.reshape(-1),
        con_c.reshape(-1),
        opacities.reshape(-1),
    ] + [colors[..., d].reshape(-1) for d in range(D)]
    rows += [jnp.zeros((C * N,), jnp.float32)] * (F - len(rows))
    packed = jnp.stack(rows, axis=0).astype(jnp.float32)  # [F, C*N]
    # Materialization barrier: fusing the gather with its producers makes
    # XLA pick a slow per-element gather path (~4x, measured); a standalone
    # gather over a materialized table runs near the per-index floor.
    packed, ids_al = jax.lax.optimization_barrier((packed, ids_al))

    if abs_carrier is not None:
        absc = jnp.stack(
            [abs_carrier[0].reshape(-1), abs_carrier[1].reshape(-1)], axis=0
        ).astype(jnp.float32)
    else:
        absc = jnp.zeros((2, C * N), jnp.float32)
    cfg = (
        T, th, tw, ts, P, D, Dp, F, K, capA, _interpret(), C * N,
        abs_carrier is not None,
    )
    accum, logT = _raster_packed(
        cfg, packed, absc, ids_al, aoff[:-1], counts.astype(jnp.int32)
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
    return img, alphas[..., None]
