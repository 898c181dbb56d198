"""Pallas binning engine: per-entry emission + payload sort, no per-index XLA ops.

This replaces the XLA glue pipeline (jnp.repeat emit -> key sort -> K-align
scatter -> [F, capA] entry gather) that dominated round-1 frame time. The
reference builds its intersection list with a CUDA kernel + CUB radix sort
(gsplat/triton_impl/isect_tiles.py:14-131, radix_sort/radix_sort.cu:36-43);
on TPU, XLA gather/scatter/repeat cost ~22-116 ns *per index* regardless of
row count (measured, PERF.md), so every cap-sized indexed op is ~75-400 ms
at production sizes. The two primitives that ARE fast:

  - `lax.sort`: ~40-56 ms at 3.4-6.8M entries, and extra payload rows are
    nearly free (measured: 2 keys + 17 payloads costs the same as + 1).
  - Pallas kernels at HBM bandwidth with MXU one-hot matmuls for local
    data movement. A one-hot *selection* matmul (each output column has
    exactly one 1.0) is bit-exact for f32 under precision=HIGHEST: the
    bf16x3 operand split holds all 24 mantissa bits, `x * 1.0` needs only
    the hi/mid/lo x B_hi partial products (all present in the 6-pass
    scheme), and `y * 0.0` terms are exactly 0 — provided inputs are
    sanitized (NaN * 0 = NaN), which the wrapper guarantees.

So the engine is: Pallas emit kernel (duplicate per-Gaussian rows into
per-entry rows via one-hot selection, compute tile keys, tight-cull) ->
one payload `lax.sort` carrying the rasterizer features -> searchsorted
offsets. The sorted stream feeds the rasterize kernels directly; no
gather, no alignment scatter.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
GB = 1024  # gaussians per emit block
SB = 512  # entries per emit write chunk (slab alignment quantum)
ALPHA_CULL = 1.0 / 255.0


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x, m):
    return (x + m - 1) // m * m


class Binned(NamedTuple):
    """Sorted per-entry stream (static capacity).

    entries: [NF, capA] f32 — per-entry features in (cam, tile, depth, gid)
        order: rows = gx, gy, conic_a, conic_b, conic_c, opacity, colors[D].
    gids: [1, capA] i32 — flattened cam*N + gaussian index per entry;
        sentinel C*N at padding/culled slots (sorted to the end).
    offs: [T] i32 — start of each (cam, tile) range in the stream.
    cnts: [T] i32 — entries per (cam, tile).
    n_isects: [] i32 — true (culled) entry count.
    slab_required: [] i32 — slab capacity needed to emit without
        truncation (includes alignment padding; feed back into `capacity`).
    """

    entries: jax.Array
    gids: jax.Array
    offs: jax.Array
    cnts: jax.Array
    n_isects: jax.Array
    slab_required: jax.Array


def _emit_kernel(
    soff_ref,  # [NB] i32 scalar prefetch: slab offsets (SB-aligned)
    scnt_ref,  # [NB] i32 scalar prefetch: true entry counts per block
    attr_hbm,  # [A_pad, CN_pad] f32 in HBM (block b = cols [b*GB, (b+1)*GB))
    keys_hbm,  # [8, capA] f32 out: tile_key, depth, gid, zeros
    feat_hbm,  # [NF_pad, capA] f32 out: per-entry features
    abuf,  # [A_pad, GB] VMEM scratch
    asem,
    kbuf,  # [8, SB] VMEM scratch
    fbuf,  # [NF_pad, SB] VMEM scratch
    wsem,  # DMA sems (2,)
    *,
    A: int,
    NF: int,
    n_tiles: int,
    tile_width: int,
    tile_size: int,
    N: int,
    sentinel_key: int,
    cull: bool,
):
    b = pl.program_id(0)
    soff = soff_ref[b]
    scnt = scnt_ref[b]
    nchunk = pl.cdiv(scnt, SB)

    cp = pltpu.make_async_copy(attr_hbm.at[:, pl.ds(b * GB, GB)], abuf, asem)
    cp.start()
    cp.wait()
    attrs = abuf[...]  # [A_pad, GB]
    prefix = attrs[3:4, :]  # [1, GB] exclusive within-block entry prefix
    # 3-way disjoint-bit bf16 split of the selection values, once per
    # block: the selection matmul's one-hot side is 0/1 (bf16-exact), so
    # three DEFAULT (single-pass) matmuls on hi/mid/lo reproduce the exact
    # f32 selection at half the MXU passes of HIGHEST (which must split
    # both operands into 6 partials; Mosaic rejects per-operand precision).
    # Bit-exact: each pass contributes x_part * 1.0 exactly, and
    # hi+mid+lo == x exactly (disjoint mantissa bit ranges).
    attrs_hi = attrs.astype(jnp.bfloat16).astype(jnp.float32)
    attrs_r = attrs - attrs_hi
    attrs_mid = attrs_r.astype(jnp.bfloat16).astype(jnp.float32)
    attrs_lo = attrs_r - attrs_mid

    git = jax.lax.broadcasted_iota(jnp.int32, (GB, SB), 0)
    sit = jax.lax.broadcasted_iota(jnp.int32, (1, SB), 1)
    ones = jnp.ones((1, GB), jnp.float32)

    def chunk_body(c, _):
        s = (c * SB + sit).astype(jnp.float32)  # [1, SB] slot within block
        # rank: src[s] = (# prefix <= s) - 1 (prefix ascending; counts and
        # slots < 2^24 so every f32 value here is integer-exact)
        cmp = (attrs[3:4, :].T <= s).astype(jnp.float32)  # [GB, SB]
        # 0/1 inputs are bf16-exact and the MXU accumulates in f32, so
        # DEFAULT precision gives exact integer counts at 1/6 the passes
        rank = (
            jax.lax.dot_general(
                ones, cmp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - 1.0
        )  # [1, SB]
        ranki = rank.astype(jnp.int32)
        onehot = (git == ranki).astype(jnp.float32)  # [GB, SB]
        seldot = lambda a: jax.lax.dot_general(
            a, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sel = seldot(attrs_hi) + seldot(attrs_mid) + seldot(attrs_lo)
        # [A, SB] bit-exact selection (3-pass split, see block header)
        tminx, tminy, rw = sel[0:1], sel[1:2], sel[2:3]
        spre = sel[3:4]
        local = (s - spre).astype(jnp.int32)
        rwi = jnp.maximum(rw.astype(jnp.int32), 1)
        tx = tminx.astype(jnp.int32) + local % rwi
        ty = tminy.astype(jnp.int32) + local // rwi
        src_global = b * GB + ranki  # [1, SB] flatten id
        cam = src_global // N
        tile_key = cam * n_tiles + ty * tile_width + tx

        valid = sit < (scnt - c * SB)
        if cull:
            # Exact min of the conic quadratic over the tile's pixel-center
            # box; drop entries whose best-case alpha stays below 1/255.
            # The continuous min lower-bounds the min over pixel centers,
            # so no contributing entry is ever dropped (the kernel's
            # per-pixel ALPHA_MIN test would reject them anyway — output
            # images are bit-identical, only dead entries disappear).
            gx, gy = sel[5:6], sel[6:7]
            ca, cb, cc = sel[7:8], sel[8:9], sel[9:10]
            op = sel[10:11]
            x0 = tx.astype(jnp.float32) * tile_size + 0.5 - gx
            x1 = x0 + (tile_size - 1)
            y0 = ty.astype(jnp.float32) * tile_size + 0.5 - gy
            y1 = y0 + (tile_size - 1)

            def q(dx, dy):
                return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

            zero = jnp.zeros_like(x0)
            safe_cc = jnp.where(jnp.abs(cc) > 1e-12, cc, 1.0)
            safe_ca = jnp.where(jnp.abs(ca) > 1e-12, ca, 1.0)
            ye0 = jnp.clip(-cb * x0 / safe_cc, y0, y1)
            ye1 = jnp.clip(-cb * x1 / safe_cc, y0, y1)
            xe0 = jnp.clip(-cb * y0 / safe_ca, x0, x1)
            xe1 = jnp.clip(-cb * y1 / safe_ca, x0, x1)
            minq = jnp.minimum(
                jnp.minimum(q(x0, ye0), q(x1, ye1)),
                jnp.minimum(q(xe0, y0), q(xe1, y1)),
            )
            inside = (x0 <= zero) & (zero <= x1) & (y0 <= zero) & (zero <= y1)
            minq = jnp.where(inside, 0.0, minq)
            keep = op * jnp.exp(-minq) >= ALPHA_CULL
            valid = valid & keep

        kbuf[...] = jnp.concatenate(
            [
                jnp.where(valid, tile_key, sentinel_key).astype(jnp.float32),
                sel[4:5],  # depth (f32 value, exact)
                jnp.where(valid, src_global, -1).astype(jnp.float32),
                jnp.zeros((5, SB), jnp.float32),
            ],
            axis=0,
        )
        nf_pad = fbuf.shape[0]
        fb = sel[5 : 5 + NF, :]
        if nf_pad > NF:
            fb = jnp.concatenate(
                [fb, jnp.zeros((nf_pad - NF, SB), jnp.float32)], axis=0
            )
        fbuf[...] = fb

        start = pl.multiple_of(soff + c * SB, LANES)
        wk = pltpu.make_async_copy(
            kbuf, keys_hbm.at[:, pl.ds(start, SB)], wsem.at[0]
        )
        wf = pltpu.make_async_copy(
            fbuf, feat_hbm.at[:, pl.ds(start, SB)], wsem.at[1]
        )
        wk.start()
        wf.start()
        wk.wait()
        wf.wait()
        return 0

    jax.lax.fori_loop(0, nchunk, chunk_body, 0)


def emit_entries(
    mean_x, mean_y,  # [C, N] f32
    con_a, con_b, con_c,  # [C, N]
    opacities,  # [C, N]
    colors,  # [C, N, D]
    radii,  # [C, N] i32
    depths,  # [C, N] f32
    tile_size: int,
    tile_width: int,
    tile_height: int,
    capacity: int,
    cull: bool = True,
    payload_rows=None,
    extents=None,
):
    """Pallas emit stage: per-entry rows, unsorted. Returns
    ``(ops, slab_required)`` where ``ops = (tile_key, d_key, gid,
    *feature_rows)`` ready for :func:`sort_entries`.

    ``payload_rows`` (a sequence of [C, N] arrays) overrides the default
    3DGS feature layout — that's how other model families (2DGS surfels)
    ride the same engine. The exact ellipse cull needs the 3DGS layout,
    so ``cull`` must be False with custom payloads; such callers can
    instead pass ``extents=(ext_x, ext_y)`` — per-axis rect half-widths
    in pixels (clipped to the radii circle) — for an output-exact
    AABB cut of their own making.
    """
    C, N = mean_x.shape
    n_tiles = tile_width * tile_height
    T = C * n_tiles
    CN = C * N
    assert CN < (1 << 24), "flatten ids must stay f32-exact"
    assert payload_rows is None or not cull
    capA = _round_up(max(capacity, SB), SB)

    sg = jax.lax.stop_gradient
    fin = lambda x: jnp.nan_to_num(sg(x), nan=0.0, posinf=0.0, neginf=0.0)
    mx, my = fin(mean_x), fin(mean_y)
    dep = fin(depths)

    if cull:
        # Tight per-axis extent: the ellipse {0.5 x^T conic x <= tau},
        # tau = ln(255 * op), bounds the alpha >= 1/255 region exactly, and
        # its AABB half-widths are sqrt(2 tau * Sigma_xx/yy) with
        # Sigma = conic^-1. Any pixel center outside the AABB fails the
        # kernels' alpha test, so shrinking the rect to it is output-exact
        # (same argument as the in-kernel ellipse-vs-tile cull, which still
        # runs and removes the AABB's corner tiles). Elongated Gaussians —
        # the common case after optimization — emit far fewer entries this
        # way than with the circumscribed radii circle.
        cca, ccb, ccc = fin(con_a), fin(con_b), fin(con_c)
        det = cca * ccc - ccb * ccb
        tau = jnp.log(jnp.clip(fin(opacities), 1e-12, None) * 255.0)
        ok = (det > 1e-24) & (cca > 0) & (ccc > 0)
        sdet = jnp.where(ok, det, 1.0)
        ext_x = jnp.sqrt(jnp.clip(2.0 * tau * ccc / sdet, 0.0, None)) + 0.5
        ext_y = jnp.sqrt(jnp.clip(2.0 * tau * cca / sdet, 0.0, None)) + 0.5
        rad = radii.astype(jnp.float32)
        ext_x = jnp.where(ok, jnp.minimum(ext_x, rad), rad)
        ext_y = jnp.where(ok, jnp.minimum(ext_y, rad), rad)
        alive = (radii > 0) & (tau > 0.0)
    elif extents is not None:
        rad = radii.astype(jnp.float32)
        ext_x = jnp.minimum(fin(extents[0]), rad)
        ext_y = jnp.minimum(fin(extents[1]), rad)
        alive = radii > 0
    else:
        ext_x = ext_y = radii.astype(jnp.float32)
        alive = radii > 0
    # same `m/ts - r/ts` form as isect_tiles so cull=False emits the
    # bit-identical rect (tests/test_rasterize_binned.py emit parity)
    rx, ry = ext_x / tile_size, ext_y / tile_size
    tminx = jnp.clip(jnp.floor(mx / tile_size - rx), 0, tile_width)
    tmaxx = jnp.clip(jnp.ceil(mx / tile_size + rx), 0, tile_width)
    tminy = jnp.clip(jnp.floor(my / tile_size - ry), 0, tile_height)
    tmaxy = jnp.clip(jnp.ceil(my / tile_size + ry), 0, tile_height)
    rw = (tmaxx - tminx).astype(jnp.int32)
    rh = (tmaxy - tminy).astype(jnp.int32)
    tpg = jnp.where(alive, rw * rh, 0).reshape(-1)  # [CN] i32

    NB = -(-CN // GB)
    CN_pad = NB * GB
    tpg_p = jnp.pad(tpg, (0, CN_pad - CN))
    per_block = tpg_p.reshape(NB, GB)
    block_tot = per_block.sum(axis=1)  # [NB]
    slab = ((block_tot + SB - 1) // SB) * SB
    soff_all = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(slab).astype(jnp.int32)]
    )  # [NB+1]
    slab_required = soff_all[-1]
    fits = soff_all[1:] <= capA  # prefix property (cumsum is monotone)
    scnt = jnp.where(fits, block_tot, 0).astype(jnp.int32)
    soff = jnp.where(fits, soff_all[:-1], 0).astype(jnp.int32)
    written_end = jnp.max(jnp.where(fits, soff_all[1:], 0))
    prefix = (jnp.cumsum(per_block, axis=1) - per_block).astype(jnp.float32)

    def pad(x):
        return jnp.pad(fin(x).reshape(-1), (0, CN_pad - CN))

    if payload_rows is None:
        D = colors.shape[-1]
        payload = [mean_x, mean_y, con_a, con_b, con_c, opacities] + [
            colors[..., d] for d in range(D)
        ]
    else:
        payload = list(payload_rows)
    NF = len(payload)
    attr_rows = [
        pad(tminx),
        pad(tminy),
        pad(rw.astype(jnp.float32)),
        prefix.reshape(-1),
        pad(dep),
    ] + [pad(r) for r in payload]
    A = len(attr_rows)  # 5 + NF
    # HBM slices must be 8-sublane aligned on the row dim: pad row counts.
    A_pad = _round_up(A, 8)
    NF_pad = _round_up(NF, 8)
    attr_rows += [jnp.zeros((CN_pad,), jnp.float32)] * (A_pad - A)
    attr = jnp.stack(attr_rows, axis=0).astype(jnp.float32)

    sentinel_key = T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((A_pad, GB), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((8, SB), jnp.float32),
            pltpu.VMEM((NF_pad, SB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _emit_kernel,
        A=A, NF=NF, n_tiles=n_tiles, tile_width=tile_width,
        tile_size=tile_size, N=N, sentinel_key=sentinel_key, cull=cull,
    )
    keys, feats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, capA), jnp.float32),
            jax.ShapeDtypeStruct((NF_pad, capA), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(soff, scnt, attr)

    # capacity tail beyond the last written slab must be sentinels too
    pos = jnp.arange(capA, dtype=jnp.int32)
    written = pos < written_end
    tile_key = jnp.where(written, keys[0].astype(jnp.int32), sentinel_key)
    is_sent = tile_key == sentinel_key
    # depths > 0, so f32 bit order == int order; sentinel = +inf bits
    d_key = jnp.where(
        is_sent,
        jnp.int32(0x7F800000),
        jax.lax.bitcast_convert_type(keys[1], jnp.int32),
    )
    gid = jnp.where(is_sent, CN, keys[2].astype(jnp.int32))

    ops = (tile_key, d_key, gid) + tuple(feats[r] for r in range(NF))
    return ops, slab_required


def sort_entries(ops, T: int, slab_required=None) -> Binned:
    """Sort the emitted per-entry rows by (tile, depth, gid) and build the
    per-tile offset table (one payload ``lax.sort`` + a searchsorted)."""
    sorted_ops = jax.lax.sort(ops, num_keys=3, is_stable=False)
    tile_key_s, gid_s = sorted_ops[0], sorted_ops[2]
    entries = jnp.stack(sorted_ops[3:], axis=0)  # [NF, capA]
    capA = tile_key_s.shape[0]

    bounds = jnp.searchsorted(
        tile_key_s, jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    offs = bounds[:-1]
    cnts = bounds[1:] - bounds[:-1]
    n_isects = bounds[-1]

    # Sentinel slots sort past n_isects but hold uninitialized HBM bytes
    # (possibly NaN); the kernels' masked math still computes NaN*0 through
    # the color matmul, so zero the tail once here.
    pos = jnp.arange(capA, dtype=jnp.int32)
    entries = jnp.where(pos[None, :] < n_isects, entries, 0.0)

    if slab_required is None:
        slab_required = n_isects
    return Binned(
        entries=entries,
        gids=gid_s[None, :],
        offs=offs,
        cnts=cnts,
        n_isects=n_isects,
        slab_required=slab_required,
    )


def bin_gaussians(
    mean_x, mean_y,  # [C, N] f32
    con_a, con_b, con_c,  # [C, N]
    opacities,  # [C, N]
    colors,  # [C, N, D]
    radii,  # [C, N] i32
    depths,  # [C, N] f32
    tile_size: int,
    tile_width: int,
    tile_height: int,
    capacity: int,
    cull: bool = True,
) -> Binned:
    """Emit + sort the per-entry stream. ``capacity`` is the slab budget
    (aligned emission slots, >= n_isects + SB-rounding waste); the returned
    ``slab_required`` is the exact budget needed — feed it back like
    ``n_isects`` for the out-of-jit capacity decision."""
    ops, slab_required = emit_entries(
        mean_x, mean_y, con_a, con_b, con_c, opacities, colors, radii,
        depths, tile_size, tile_width, tile_height, capacity, cull,
    )
    return sort_entries(
        ops, colors.shape[0] * tile_width * tile_height, slab_required
    )
