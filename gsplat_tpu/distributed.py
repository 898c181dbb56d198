"""Distributed rendering over a JAX device mesh.

TPU-native replacement for the reference's NCCL layer (gsplat/distributed.py)
and distributed rasterization protocol (gsplat/rendering.py:295-494):

  Reference (Grendel-style, arXiv 2406.18533): each rank owns a Gaussian
  shard and a camera batch; projection runs on the owner rank for ALL
  cameras; per-(camera, gaussian) payloads are all-to-all'd to the rank that
  rasterizes that camera; gradients flow back through differentiable
  collectives (torch.distributed.nn.functional).

  Here: one ``shard_map`` over a mesh axis. Projection is sharded over
  Gaussians, the payload exchange is ``jax.lax.all_to_all`` (split over the
  camera axis, concat over the Gaussian axis — the dense variant of the
  reference's exchange, rendering.py:464-494, which is the shape-static one),
  and rasterization is sharded over cameras. ``shard_map`` autodiff
  differentiates through the collective, and on TPU the all-to-all rides ICI.

All three rasterizer backends run under the mesh — ``oracle`` (jnp, CPU
parity tests), ``tiled`` (round-1 Pallas) and ``binned`` (the flagship
Pallas engine; the exchange produces exactly the SoA [C/n, N*n] rows its
emitter consumes). The same applies to the 2DGS surfel pipeline
(:func:`rasterization_2dgs_distributed`), matching the reference's
backend-agnostic distributed protocol (gsplat/rendering.py:413-494, 1018+).

Camera/shard layouts: when ``C % n_shards == 0`` each shard rasterizes
``C / n_shards`` whole cameras (the reference's only layout,
rendering.py:305-306). When ``n_shards % C == 0`` (including the headline
C=1 case the reference cannot scale at all) each camera's tile grid is
split into ``n_shards / C`` horizontal strips of tile rows and every shard
rasterizes one (camera, strip) — the SURVEY §7 "tile rows within a camera"
design. Strips reuse the same binning engine on a shifted sub-image, and
gradients flow back through the replicated exchange (the all-to-all
transpose sums the per-strip contributions per Gaussian).

There is no separate process-launcher module: multi-host JAX initializes via
``jax.distributed.initialize()`` and the mesh spans all hosts' devices — the
single-program SPMD replacement for the reference's mp.spawn/OMPI ``cli()``
launcher (gsplat/distributed.py:304-360).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    def shard_map(f, **kw):
        # Pallas out_shapes carry no varying-mesh-axes annotation; skip the
        # new vma check (the old jax.experimental behavior)
        return _shard_map(f, check_vma=False, **kw)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .ops.isect import isect_tiles
from .ops.projection import fully_fused_projection_soa
from .ops.rasterize import resolve_auto_backend
from .ops.rasterize_ref import rasterize_to_pixels_ref
from .ops.sh import spherical_harmonics


def _raster_rows(
    backend, mean_x, mean_y, depth, con_a, con_b, con_c, radii, opac,
    cols, width, height, tile_size, isect_capacity, bg, abs_carrier,
):
    """Per-shard 3DGS rasterization over exchanged SoA rows.

    Returns (render, alphas, n_isects, slab_required) — the latter two are
    scalars for this shard's capacity-growth feedback (zeros for oracle).
    """
    if backend == "binned":
        from .ops.rasterize_binned import rasterize_to_pixels_binned

        render, alphas, aux = rasterize_to_pixels_binned(
            (mean_x, mean_y), (con_a, con_b, con_c), cols, opac,
            radii, depth, width, height, tile_size,
            capacity=isect_capacity, backgrounds=bg, abs_carrier=abs_carrier,
        )
        return render, alphas, aux["n_isects"], aux["slab_required"]
    if backend == "tiled":
        from .ops.rasterize_tiled import rasterize_to_pixels_tiled

        tile_width = math.ceil(width / tile_size)
        tile_height = math.ceil(height / tile_size)
        isect = isect_tiles(
            (mean_x, mean_y), radii, depth, tile_size,
            tile_width, tile_height, capacity=isect_capacity,
        )
        render, alphas = rasterize_to_pixels_tiled(
            (mean_x, mean_y), (con_a, con_b, con_c), cols, opac,
            width, height, tile_size, isect, backgrounds=bg,
            abs_carrier=abs_carrier,
        )
        return render, alphas, isect.n_isects, isect.n_isects
    assert backend == "oracle", backend
    means2d = jnp.stack([mean_x, mean_y], axis=-1)
    conics = jnp.stack([con_a, con_b, con_c], axis=-1)
    if abs_carrier is not None:
        from .ops.rasterize_ref import rasterize_to_pixels_ref_absgrad

        carrier = jnp.stack(abs_carrier, axis=-1)
        bg_ = bg if bg is not None else jnp.zeros(
            (cols.shape[0], cols.shape[-1]), cols.dtype
        )
        render, alphas = rasterize_to_pixels_ref_absgrad(
            means2d, conics, cols, opac, radii, depth,
            width, height, tile_size, bg_, carrier,
        )
    else:
        render, alphas = rasterize_to_pixels_ref(
            means2d, conics, cols, opac, radii, depth,
            width, height, tile_size, bg,
        )
    zero = jnp.zeros((), jnp.int32)
    return render, alphas, zero, zero


def _depth_mode_backgrounds(backgrounds, render_mode, C):
    """Match the colors' depth-channel augmentation in the backgrounds,
    exactly like the single-device paths (rendering.py:148-157, 368-377):
    depth-carrying channels composite over a zero background."""
    if backgrounds is None:
        return None
    if render_mode in ("RGB+D", "RGB+ED"):
        return jnp.concatenate(
            [backgrounds, jnp.zeros((C, 1), backgrounds.dtype)], axis=-1
        )
    if render_mode in ("D", "ED"):
        return jnp.zeros((C, 1), backgrounds.dtype)
    return backgrounds


def _shard_backgrounds(backgrounds, axis, C, n_shards):
    if backgrounds is None:
        return None
    idx = lax.axis_index(axis)
    return lax.dynamic_slice_in_dim(
        backgrounds, idx * (C // n_shards), C // n_shards, axis=0
    )


def rasterization_distributed(
    means: jax.Array,  # [N, 3] sharded over `axis`
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    opacities: jax.Array,  # [N]
    colors: jax.Array,  # [N, D] or [N, K, 3] (per-Gaussian only)
    viewmats: jax.Array,  # [C, 4, 4] replicated
    Ks: jax.Array,  # [C, 3, 3] replicated
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "gauss",
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = 0.3,
    tile_size: int = 16,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    render_mode: str = "RGB",
    rasterize_mode: str = "classic",  # or "antialiased" (opacity comp.)
    backend: str = "auto",
    isect_capacity: Optional[int] = None,  # per-shard capacity
    masks: Optional[jax.Array] = None,  # [N] bool
    means2d_carrier: Optional[jax.Array] = None,  # [C, N, 2] zeros, N-sharded
    per_camera_colors: bool = False,  # colors is [C, N, D] (N-sharded)
    absgrad: bool = False,
    camera_model: str = "pinhole",  # pinhole | ortho | fisheye
) -> Tuple[jax.Array, jax.Array, Dict]:
    """Distributed rasterization: Gaussian-sharded projection, camera-sharded
    rasterization, differentiable all-to-all exchange.

    ``per_camera_colors=True`` means ``colors`` is already view-dependent
    [C, N, D] (e.g. from an appearance module, reference
    simple_trainer.py:380-410 DDP path) — it rides the exchange as-is.

    ``render_mode`` supports the depth-augmented modes ("RGB+D"/"RGB+ED"/
    "D"/"ED"): the owner shard appends its per-(camera, gaussian) depth as
    the last color channel pre-exchange, and the expected-depth division
    runs on the gathered camera-sharded output (gsplat/rendering.py:574-585).

    ``absgrad=True`` routes ``means2d_carrier`` through the exchange into
    the backward kernels' per-tile |d mu2d| accumulation instead of adding
    it to the projected means (same semantics as ``rasterization``).

    Returns (render_colors [C, H, W, D(+1)], render_alphas [C, H, W, 1],
    meta) with the camera axis sharded over `axis`. ``meta["slab_required"]``
    is the max per-shard capacity requirement for the out-of-jit growth loop.
    """
    n_shards = mesh.shape[axis]
    C = viewmats.shape[0]
    N = means.shape[0]
    if C % n_shards != 0:
        if n_shards % C == 0:
            # fewer cameras than shards: split each camera's tile grid into
            # strips of tile rows so small batches (incl. C=1, the headline
            # training config) still use the whole mesh
            return _rasterization_distributed_strips(
                means, quats, scales, opacities, colors, viewmats, Ks,
                width, height, mesh, axis=axis, sh_degree=sh_degree,
                near_plane=near_plane, far_plane=far_plane,
                radius_clip=radius_clip, eps2d=eps2d, tile_size=tile_size,
                backgrounds=backgrounds, render_mode=render_mode,
                rasterize_mode=rasterize_mode, backend=backend,
                isect_capacity=isect_capacity, masks=masks,
                means2d_carrier=means2d_carrier,
                per_camera_colors=per_camera_colors, absgrad=absgrad,
                camera_model=camera_model,
            )
        raise ValueError(
            f"#cameras ({C}) and mesh axis '{axis}' ({n_shards}) must divide "
            "one another: C % n == 0 shards whole cameras, n % C == 0 shards "
            "tile-row strips within each camera"
        )
    backend, isect_capacity = resolve_auto_backend(
        backend, isect_capacity, C // n_shards, means.shape[0], width, height
    )
    backgrounds = _depth_mode_backgrounds(backgrounds, render_mode, C)

    if per_camera_colors:
        assert sh_degree is None
        color_spec = P(None, axis, None)
    elif sh_degree is not None:
        color_spec = P(axis, None, None)
    else:
        color_spec = P(axis, None)
    extra_specs = ()
    if masks is not None:
        extra_specs = extra_specs + (P(axis),)
    if means2d_carrier is not None:
        extra_specs = extra_specs + (P(None, axis, None),)

    in_specs = (
        P(axis, None),  # means
        P(axis, None),  # quats
        P(axis, None),  # scales
        P(axis),  # opacities
        color_spec,  # colors
        P(),  # viewmats
        P(),  # Ks
    ) + extra_specs
    # render/alphas camera-sharded; radii stay owner-side (N-sharded) so the
    # caller gets true per-Gaussian visibility for SelectiveAdam and
    # densification stats (the reference's info["radii"],
    # gsplat/rendering.py:353-365); n_isects/slab_required are per-shard
    # [1] values concatenated to [n_shards] by the P(axis) out_spec
    # (lax.pmax/psum in-shard would be cleaner but has no autodiff rule).
    out_specs = (P(axis), P(axis), P(None, axis), P(axis), P(axis))

    def a2a(x):
        # [C, N_local, ...] -> [C / n, N_local * n, ...]: camera-split,
        # gaussian-concat — the reference's dense exchange.
        return lax.all_to_all(x, axis, split_axis=0, concat_axis=1, tiled=True)

    def _render(means, quats, scales, opacities, colors, viewmats, Ks, *rest):
        rest = list(rest)
        live = rest.pop(0) if masks is not None else None
        carrier = rest.pop(0) if means2d_carrier is not None else None
        proj = fully_fused_projection_soa(
            means, quats, scales, viewmats, Ks, width, height,
            eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip,
            calc_compensations=(rasterize_mode == "antialiased"),
            camera_model=camera_model,
        )
        radii = proj["radii"]
        if live is not None:
            radii = jnp.where(live[None, :], radii, 0)
        if carrier is not None and not absgrad:
            # densification gradient carrier, applied by the Gaussian's
            # owner shard pre-exchange (so its cotangent is N-sharded too)
            proj = dict(proj)
            proj["mean_x"] = proj["mean_x"] + carrier[..., 0]
            proj["mean_y"] = proj["mean_y"] + carrier[..., 1]
        n_local = means.shape[0]

        # per-view colors, evaluated by the Gaussian's owner shard
        if per_camera_colors:
            colors_cn = colors
        elif sh_degree is None:
            colors_cn = jnp.broadcast_to(
                colors[None], (C, n_local, colors.shape[-1])
            )
        else:
            camtoworlds = jnp.linalg.inv(viewmats)
            dirs = means[None, :, :] - camtoworlds[:, None, :3, 3]
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
            colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=radii > 0)
            colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)

        # depth channel augmentation, owner-side (depth is per-(cam, gauss))
        if render_mode in ("RGB+D", "RGB+ED"):
            colors_cn = jnp.concatenate(
                [colors_cn, proj["depth"][..., None]], axis=-1
            )
        elif render_mode in ("D", "ED"):
            colors_cn = proj["depth"][..., None]

        opac_cn = jnp.broadcast_to(opacities[None, :], (C, n_local))
        if "compensation" in proj:
            opac_cn = opac_cn * proj["compensation"]

        # exchange: every per-(camera, gaussian) payload moves to the shard
        # that rasterizes the camera (gsplat/rendering.py:413-494)
        mean_x = a2a(proj["mean_x"])
        mean_y = a2a(proj["mean_y"])
        depth = a2a(proj["depth"])
        con_a = a2a(proj["conic_a"])
        con_b = a2a(proj["conic_b"])
        con_c = a2a(proj["conic_c"])
        radii_g = a2a(radii)
        opac_g = a2a(opac_cn)
        cols_g = a2a(colors_cn)
        abs_c = None
        if carrier is not None and absgrad:
            abs_c = (a2a(carrier[..., 0]), a2a(carrier[..., 1]))

        bg = _shard_backgrounds(backgrounds, axis, C, n_shards)
        render, alphas, n_isects, slab = _raster_rows(
            backend, mean_x, mean_y, depth, con_a, con_b, con_c,
            radii_g, opac_g, cols_g, width, height, tile_size,
            isect_capacity, bg, abs_c,
        )
        return (
            render, alphas, jax.lax.stop_gradient(radii),
            n_isects[None], slab[None],
        )

    fn = shard_map(_render, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    args = (means, quats, scales, opacities, colors, viewmats, Ks)
    if masks is not None:
        args = args + (masks,)
    if means2d_carrier is not None:
        args = args + (means2d_carrier,)
    render, alphas, radii, n_isects, slab = fn(*args)

    if render_mode in ("ED", "RGB+ED"):
        render = jnp.concatenate(
            [
                render[..., :-1],
                render[..., -1:] / jnp.clip(alphas, 1e-10, None),
            ],
            axis=-1,
        )

    # static comm-volume accounting (VERDICT r4 item 9): rows crossing the
    # ICI per device during the all-to-all. Dense exchange ships every
    # (camera, gaussian) payload: 8 scalar rows + color channels (+2 abs).
    D_base = 3 if sh_degree is not None else colors.shape[-1]
    if render_mode in ("D", "ED"):
        D_ex = 1
    else:
        D_ex = D_base + (1 if render_mode in ("RGB+D", "RGB+ED") else 0)
    n_rows = 8 + D_ex + (2 if (means2d_carrier is not None and absgrad) else 0)
    n_local = N // n_shards
    a2a_bytes = n_rows * C * n_local * 4 * (n_shards - 1) // n_shards

    meta = {
        "width": width,
        "height": height,
        "n_cameras": C,
        # true per-Gaussian visibility, computed owner-side pre-exchange
        # ([C, N] with N sharded over `axis`)
        "radii": radii,
        # per-shard intersection counts [n_shards] — the rasterization
        # load-balance signal (uniform shards => uniform counts)
        "n_isects": n_isects,
        # max per-shard slab/entry budget: feed back into isect_capacity
        "slab_required": jnp.max(slab),
        "isect_capacity": isect_capacity,  # truncation-detect signal
        # bytes each device SENDS over the mesh axis in the forward
        # exchange (the backward a2a transpose moves the same volume)
        "a2a_bytes_per_device": a2a_bytes,
    }
    return render, alphas, meta


def _rasterization_distributed_strips(
    means, quats, scales, opacities, colors, viewmats, Ks,
    width, height, mesh, axis, sh_degree, near_plane, far_plane,
    radius_clip, eps2d, tile_size, backgrounds, render_mode,
    rasterize_mode, backend, isect_capacity, masks, means2d_carrier,
    per_camera_colors, absgrad, camera_model,
):
    """Tile-row-strip distributed rasterization for C < n_shards.

    Layout: shard ``s`` rasterizes strip ``s % G`` of camera ``s // G``
    where ``G = n_shards / C`` — each camera's tile grid is cut into G
    horizontal strips of ``ceil(th / G)`` tile rows. Projection stays
    Gaussian-sharded; the exchange replicates each camera's payload rows
    G times along the camera axis so ONE tiled all-to-all delivers every
    gaussian of camera c to each of its G strip shards (same wire volume
    per device as an all-gather of the rows). Each shard then shifts the
    projected y means into strip-local pixel coordinates and runs the
    unmodified rasterizer on a ``[strip_rows * ts, width]`` sub-image —
    binning, kernels and capacity feedback all work per-strip because the
    engine is already per-tile. The strip outputs concatenate along the
    row axis (out_spec on dim 1) and reshape to [C, H_pad, W, D] outside
    the shard_map; gradients flow through the replicated exchange, whose
    transpose sums the G strips' per-Gaussian contributions.

    This is the SURVEY §7 "tile rows within a camera" design the
    reference cannot express (its exchange is whole-camera only,
    gsplat/rendering.py:305-306,464-494).
    """
    n_shards = mesh.shape[axis]
    C = viewmats.shape[0]
    N = means.shape[0]
    G = n_shards // C
    assert C * G == n_shards
    ts = tile_size
    th = -(-height // ts)
    strip_rows = -(-th // G)
    strip_h = strip_rows * ts  # strip sub-image height (static)

    backend, isect_capacity = resolve_auto_backend(
        backend, isect_capacity, 1, N, width, strip_h
    )
    backgrounds = _depth_mode_backgrounds(backgrounds, render_mode, C)

    if per_camera_colors:
        assert sh_degree is None
        color_spec = P(None, axis, None)
    elif sh_degree is not None:
        color_spec = P(axis, None, None)
    else:
        color_spec = P(axis, None)
    extra_specs = ()
    if masks is not None:
        extra_specs = extra_specs + (P(axis),)
    if means2d_carrier is not None:
        extra_specs = extra_specs + (P(None, axis, None),)

    in_specs = (
        P(axis, None), P(axis, None), P(axis, None), P(axis), color_spec,
        P(), P(),
    ) + extra_specs
    # render/alphas are strip images concatenated along dim 1 (rows);
    # radii stay owner-side (N-sharded, dim 1); n_isects/slab per-shard
    out_specs = (P(None, axis), P(None, axis), P(None, axis), P(axis), P(axis))

    def a2a_rep(x):
        # [C, n_local, ...] -> replicate each camera G times -> [S, n_local]
        # -> all_to_all -> [1, n_local * S, ...] = every gaussian of this
        # shard's camera. broadcast_to+reshape (not repeat) keeps it a
        # zero-gather relayout; the a2a transpose under autodiff sums the
        # G strip cotangents back onto the owner shard.
        xr = jnp.broadcast_to(
            x[:, None], (C, G) + x.shape[1:]
        ).reshape((n_shards,) + x.shape[1:])
        return lax.all_to_all(xr, axis, split_axis=0, concat_axis=1, tiled=True)

    def _render(means, quats, scales, opacities, colors, viewmats, Ks, *rest):
        rest = list(rest)
        live = rest.pop(0) if masks is not None else None
        carrier = rest.pop(0) if means2d_carrier is not None else None
        proj = fully_fused_projection_soa(
            means, quats, scales, viewmats, Ks, width, height,
            eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip,
            calc_compensations=(rasterize_mode == "antialiased"),
            camera_model=camera_model,
        )
        radii = proj["radii"]
        if live is not None:
            radii = jnp.where(live[None, :], radii, 0)
        if carrier is not None and not absgrad:
            proj = dict(proj)
            proj["mean_x"] = proj["mean_x"] + carrier[..., 0]
            proj["mean_y"] = proj["mean_y"] + carrier[..., 1]
        n_local = means.shape[0]

        if per_camera_colors:
            colors_cn = colors
        elif sh_degree is None:
            colors_cn = jnp.broadcast_to(
                colors[None], (C, n_local, colors.shape[-1])
            )
        else:
            camtoworlds = jnp.linalg.inv(viewmats)
            dirs = means[None, :, :] - camtoworlds[:, None, :3, 3]
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
            colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=radii > 0)
            colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)

        if render_mode in ("RGB+D", "RGB+ED"):
            colors_cn = jnp.concatenate(
                [colors_cn, proj["depth"][..., None]], axis=-1
            )
        elif render_mode in ("D", "ED"):
            colors_cn = proj["depth"][..., None]

        opac_cn = jnp.broadcast_to(opacities[None, :], (C, n_local))
        if "compensation" in proj:
            opac_cn = opac_cn * proj["compensation"]

        # exchange: each (camera, strip) shard receives the camera's FULL
        # gaussian payload [1, N]
        mean_x = a2a_rep(proj["mean_x"])
        mean_y = a2a_rep(proj["mean_y"])
        depth = a2a_rep(proj["depth"])
        con_a = a2a_rep(proj["conic_a"])
        con_b = a2a_rep(proj["conic_b"])
        con_c = a2a_rep(proj["conic_c"])
        radii_g = a2a_rep(radii)
        opac_g = a2a_rep(opac_cn)
        cols_g = a2a_rep(colors_cn)
        abs_c = None
        if carrier is not None and absgrad:
            abs_c = (a2a_rep(carrier[..., 0]), a2a_rep(carrier[..., 1]))

        # strip-local pixel frame: shift y by the strip's row offset and
        # rasterize a [strip_h, width] sub-image. Gaussians outside the
        # strip clip to empty tile rects in the emitter (zero entries) —
        # no explicit mask needed, and the per-strip n_isects/slab
        # feedback doubles as the load-balance signal.
        idx = lax.axis_index(axis)
        g = jnp.remainder(idx, G)
        y_off = (g * strip_h).astype(jnp.float32)
        mean_y = mean_y - y_off

        bg = None
        if backgrounds is not None:
            cam = idx // G
            bg = lax.dynamic_slice_in_dim(backgrounds, cam, 1, axis=0)

        render, alphas, n_isects, slab = _raster_rows(
            backend, mean_x, mean_y, depth, con_a, con_b, con_c,
            radii_g, opac_g, cols_g, width, strip_h, tile_size,
            isect_capacity, bg, abs_c,
        )
        # [1, strip_h, W, D] per shard; drop the camera dim so the global
        # concat runs along rows (dim 1 of the [1, strip_h, ...] value)
        return (
            render, alphas, jax.lax.stop_gradient(radii),
            n_isects[None], slab[None],
        )

    fn = shard_map(_render, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    args = (means, quats, scales, opacities, colors, viewmats, Ks)
    if masks is not None:
        args = args + (masks,)
    if means2d_carrier is not None:
        args = args + (means2d_carrier,)
    render, alphas, radii, n_isects, slab = fn(*args)

    # [1, S*strip_h, W, D] in (camera-major strip) order -> [C, H_pad, ...]
    def assemble(x):
        x = x.reshape((C, G * strip_h) + x.shape[2:])
        return x[:, :height]

    render = assemble(render)
    alphas = assemble(alphas)

    if render_mode in ("ED", "RGB+ED"):
        render = jnp.concatenate(
            [
                render[..., :-1],
                render[..., -1:] / jnp.clip(alphas, 1e-10, None),
            ],
            axis=-1,
        )

    D_base = 3 if sh_degree is not None else colors.shape[-1]
    if render_mode in ("D", "ED"):
        D_ex = 1
    else:
        D_ex = D_base + (1 if render_mode in ("RGB+D", "RGB+ED") else 0)
    n_rows = 8 + D_ex + (2 if (means2d_carrier is not None and absgrad) else 0)
    n_local = N // n_shards
    # replicated exchange: each device sends its n_local rows to every
    # other device (all-gather volume)
    a2a_bytes = n_rows * n_local * 4 * (n_shards - 1)

    meta = {
        "width": width,
        "height": height,
        "n_cameras": C,
        "radii": radii,
        "n_isects": n_isects,  # per-(camera, strip) shard — balance signal
        "slab_required": jnp.max(slab),
        "isect_capacity": isect_capacity,
        "n_strips": G,
        "strip_rows": strip_rows,
        "a2a_bytes_per_device": a2a_bytes,
    }
    return render, alphas, meta


def rasterization_distributed_packed(
    means: jax.Array,  # [N, 3] sharded over `axis`
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    opacities: jax.Array,  # [N]
    colors: jax.Array,  # [N, D] or [N, K, 3]
    viewmats: jax.Array,  # [C, 4, 4] replicated
    Ks: jax.Array,  # [C, 3, 3] replicated
    width: int,
    height: int,
    mesh: Mesh,
    pack_capacity: int,
    axis: str = "gauss",
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = 0.3,
    tile_size: int = 16,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    render_mode: str = "RGB",
    rasterize_mode: str = "classic",  # or "antialiased" (opacity comp.)
    backend: str = "auto",
    isect_capacity: Optional[int] = None,
    masks: Optional[jax.Array] = None,  # [N] bool
    means2d_carrier: Optional[jax.Array] = None,  # [C, N, 2], N-sharded
    absgrad: bool = False,
    camera_model: str = "pinhole",  # pinhole | ortho | fisheye
) -> Tuple[jax.Array, jax.Array, Dict]:
    """Packed (fixed-capacity) distributed rasterization.

    TPU analogue of the reference's ``packed=True`` exchange
    (gsplat/rendering.py:413-459, distributed.py:55-99): instead of
    shipping every (camera, gaussian) payload, each owner shard compacts
    the *visible* Gaussians per camera (radii > 0 after frustum culling)
    to the front of a fixed ``pack_capacity`` buffer and only that buffer
    crosses the ICI. Dynamic COO lists don't exist under XLA, so the
    compaction is a stable per-camera ``lax.sort`` on the visibility key
    carrying the SoA payload rows (differentiable: sort/slice transpose is
    the inverse permutation + pad) — the memory/bandwidth win of the
    reference's packed mode with static shapes.

    ``pack_capacity`` bounds visible Gaussians per (camera, owner shard);
    overflow is silently truncated (highest-index visible entries drop) and
    reported via ``meta["pack_required"]`` = max owner-side visible count,
    for the same out-of-jit capacity-growth loop as ``isect_capacity``.

    Returns (render [C,H,W,D] camera-sharded, alphas, meta); meta["radii"]
    is the owner-side [C, N] visibility like the dense variant.
    """
    n_shards = mesh.shape[axis]
    C = viewmats.shape[0]
    assert C % n_shards == 0
    backend, isect_capacity = resolve_auto_backend(
        backend, isect_capacity, C // n_shards, means.shape[0], width, height
    )
    backgrounds = _depth_mode_backgrounds(backgrounds, render_mode, C)

    if sh_degree is not None:
        color_spec = P(axis, None, None)
    else:
        color_spec = P(axis, None)
    extra_specs = ()
    if masks is not None:
        extra_specs = extra_specs + (P(axis),)
    if means2d_carrier is not None:
        extra_specs = extra_specs + (P(None, axis, None),)

    in_specs = (
        P(axis, None), P(axis, None), P(axis, None), P(axis), color_spec,
        P(), P(),
    ) + extra_specs
    out_specs = (P(axis), P(axis), P(None, axis), P(axis), P(axis), P(axis))

    def a2a(x):
        return lax.all_to_all(x, axis, split_axis=0, concat_axis=1, tiled=True)

    def _render(means, quats, scales, opacities, colors, viewmats, Ks, *rest):
        rest = list(rest)
        live = rest.pop(0) if masks is not None else None
        carrier = rest.pop(0) if means2d_carrier is not None else None
        proj = fully_fused_projection_soa(
            means, quats, scales, viewmats, Ks, width, height,
            eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip,
            calc_compensations=(rasterize_mode == "antialiased"),
            camera_model=camera_model,
        )
        radii = proj["radii"]
        if live is not None:
            radii = jnp.where(live[None, :], radii, 0)
        if carrier is not None and not absgrad:
            proj = dict(proj)
            proj["mean_x"] = proj["mean_x"] + carrier[..., 0]
            proj["mean_y"] = proj["mean_y"] + carrier[..., 1]
        n_local = means.shape[0]

        if sh_degree is None:
            colors_cn = jnp.broadcast_to(
                colors[None], (C, n_local, colors.shape[-1])
            )
        else:
            camtoworlds = jnp.linalg.inv(viewmats)
            dirs = means[None, :, :] - camtoworlds[:, None, :3, 3]
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
            colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=radii > 0)
            colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)
        if render_mode in ("RGB+D", "RGB+ED"):
            colors_cn = jnp.concatenate(
                [colors_cn, proj["depth"][..., None]], axis=-1
            )
        elif render_mode in ("D", "ED"):
            colors_cn = proj["depth"][..., None]
        D = colors_cn.shape[-1]

        vis = radii > 0  # [C, n_local]
        n_vis = jnp.sum(vis.astype(jnp.int32), axis=1)  # [C]
        pack_required = jnp.max(n_vis)

        # Stable sort by (not visible): visible payloads compact to the
        # front, relative (depth-irrelevant) order preserved. One sort
        # carries every row the rasterizer needs.
        key = (~vis).astype(jnp.int32)
        opac_cn = jnp.broadcast_to(opacities[None, :], (C, n_local))
        if "compensation" in proj:
            opac_cn = opac_cn * proj["compensation"]
        rows = [
            proj["mean_x"], proj["mean_y"], proj["depth"],
            proj["conic_a"], proj["conic_b"], proj["conic_c"],
            radii.astype(jnp.float32),
            opac_cn,
        ] + [colors_cn[..., d] for d in range(D)]
        n_abs = 0
        if carrier is not None and absgrad:
            rows += [carrier[..., 0], carrier[..., 1]]
            n_abs = 2
        sorted_ops = jax.lax.sort(
            (key,) + tuple(rows), num_keys=1, is_stable=True, dimension=1
        )
        cap = min(pack_capacity, n_local)
        packed = [op[:, :cap] for op in sorted_ops[1:]]
        (mean_x, mean_y, depth, con_a, con_b, con_c, radf, opac_p) = packed[:8]
        cols_p = jnp.stack(packed[8 : 8 + D], axis=-1)
        # truncation/padding guard: slots past the per-camera visible count
        # are culled via radii=0 (their payloads are sorted-invisible rows)
        slot_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (C, cap), 1) < n_vis[:, None]
        )
        radii_p = jnp.where(slot_ok, radf.astype(jnp.int32), 0)

        # exchange only the packed buffers
        mean_x = a2a(mean_x)
        mean_y = a2a(mean_y)
        depth = a2a(depth)
        con_a = a2a(con_a)
        con_b = a2a(con_b)
        con_c = a2a(con_c)
        radii_g = a2a(radii_p)
        opac_g = a2a(opac_p)
        cols_g = a2a(cols_p)
        abs_c = None
        if n_abs:
            abs_c = (a2a(packed[8 + D]), a2a(packed[9 + D]))

        bg = _shard_backgrounds(backgrounds, axis, C, n_shards)
        render, alphas, n_isects, slab = _raster_rows(
            backend, mean_x, mean_y, depth, con_a, con_b, con_c,
            radii_g, opac_g, cols_g, width, height, tile_size,
            isect_capacity, bg, abs_c,
        )
        return (
            render, alphas, jax.lax.stop_gradient(radii), n_isects[None],
            slab[None], pack_required[None],
        )

    fn = shard_map(_render, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    args = (means, quats, scales, opacities, colors, viewmats, Ks)
    if masks is not None:
        args = args + (masks,)
    if means2d_carrier is not None:
        args = args + (means2d_carrier,)
    render, alphas, radii, n_isects, slab, pack_required = fn(*args)

    if render_mode in ("ED", "RGB+ED"):
        render = jnp.concatenate(
            [
                render[..., :-1],
                render[..., -1:] / jnp.clip(alphas, 1e-10, None),
            ],
            axis=-1,
        )

    meta = {
        "width": width,
        "height": height,
        "n_cameras": C,
        "radii": radii,
        "n_isects": n_isects,
        "slab_required": jnp.max(slab),
        "isect_capacity": isect_capacity,  # truncation-detect signal
        # max owner-side visible count per camera across shards: feed back
        # into pack_capacity out-of-jit (the truncation signal)
        "pack_required": jnp.max(pack_required),
    }
    return render, alphas, meta


def _postprocess_2dgs(
    render_colors, render_alphas, render_normals, render_distort,
    render_median, viewmats, Ks, render_mode, depth_mode, distloss,
):
    """Post-processing on the gathered (camera-sharded) 2DGS outputs,
    identical to rasterization_2dgs — elementwise, so XLA keeps the
    sharding. Returns (render_colors, render_normals [world frame],
    normals_from_depth, render_distort)."""
    if render_mode in ("ED", "RGB+ED"):
        render_colors = jnp.concatenate(
            [
                render_colors[..., :-1],
                render_colors[..., -1:]
                / jnp.clip(render_alphas, 1e-10, None),
            ],
            axis=-1,
        )

    from .utils import depth_to_normal

    normals_from_depth = None
    if render_mode in ("RGB+D", "RGB+ED"):
        if depth_mode == "expected":
            depth_for_normal = render_colors[..., -1:]
        elif depth_mode == "median":
            depth_for_normal = render_median
        else:
            raise ValueError(f"Unknown depth_mode: {depth_mode}")
        camtoworlds = jnp.linalg.inv(viewmats)
        normals_from_depth = depth_to_normal(depth_for_normal, camtoworlds, Ks)

    if not distloss:
        render_distort = jnp.zeros_like(jax.lax.stop_gradient(render_distort))

    R_wc = jnp.swapaxes(viewmats[:, :3, :3], -1, -2)
    render_normals = jnp.einsum("cij,chwj->chwi", R_wc, render_normals)
    return render_colors, render_normals, normals_from_depth, render_distort


def _raster_rows_2dgs(
    backend, mean_x, mean_y, depth, mrows, normals_g, radii_g, opac_g,
    cols_g, width, height, tile_size, isect_capacity, bg,
):
    """Per-shard 2DGS rasterization over exchanged surfel SoA rows.

    Returns (render, alphas, normals_img, distort, median, n_isects, slab)
    — the latter two are capacity-growth scalars (zeros for oracle).
    """
    zero = jnp.zeros((), jnp.int32)
    if backend == "binned":
        from .ops.rasterize_2dgs_binned import rasterize_to_pixels_2dgs_binned

        (
            render, alphas, normals_img, distort, median, aux
        ) = rasterize_to_pixels_2dgs_binned(
            (mean_x, mean_y), mrows, cols_g, normals_g, opac_g,
            radii_g, depth, width, height, tile_size,
            capacity=isect_capacity, backgrounds=bg,
        )
        return (
            render, alphas, normals_img, distort, median,
            aux["n_isects"], aux["slab_required"],
        )
    if backend == "tiled":
        from .ops.rasterize_2dgs_tiled import rasterize_to_pixels_2dgs_tiled

        tile_width = math.ceil(width / tile_size)
        tile_height = math.ceil(height / tile_size)
        isect = isect_tiles(
            (mean_x, mean_y), radii_g, depth, tile_size,
            tile_width, tile_height, capacity=isect_capacity,
        )
        means2d = jnp.stack([mean_x, mean_y], axis=-1)
        rt = jnp.stack(
            [jnp.stack(mrows[r * 3 : r * 3 + 3], axis=-1) for r in range(3)],
            axis=-2,
        )
        (
            render, alphas, normals_img, distort, median
        ) = rasterize_to_pixels_2dgs_tiled(
            means2d, rt, cols_g, normals_g, opac_g,
            width, height, tile_size, isect, bg,
        )
        return (
            render, alphas, normals_img, distort, median,
            isect.n_isects, isect.n_isects,
        )
    assert backend == "oracle", backend
    from .ops.rasterize_2dgs_ref import rasterize_to_pixels_2dgs_ref

    means2d = jnp.stack([mean_x, mean_y], axis=-1)
    rt = jnp.stack(
        [jnp.stack(mrows[r * 3 : r * 3 + 3], axis=-1) for r in range(3)],
        axis=-2,
    )
    (
        render, alphas, normals_img, distort, median
    ) = rasterize_to_pixels_2dgs_ref(
        means2d, rt, cols_g, normals_g, opac_g, radii_g, depth,
        width, height, tile_size, bg,
    )
    return render, alphas, normals_img, distort, median, zero, zero


def rasterization_2dgs_distributed(
    means: jax.Array,  # [N, 3] sharded over `axis`
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    opacities: jax.Array,  # [N]
    colors: jax.Array,  # [N, D] or [N, K, 3] (per-Gaussian only)
    viewmats: jax.Array,  # [C, 4, 4] replicated
    Ks: jax.Array,  # [C, 3, 3] replicated
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "gauss",
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    tile_size: int = 16,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    render_mode: str = "RGB",
    distloss: bool = False,
    depth_mode: str = "expected",
    backend: str = "auto",
    isect_capacity: Optional[int] = None,  # per-shard capacity
    masks: Optional[jax.Array] = None,  # [N] bool
    densify_carrier: Optional[jax.Array] = None,  # [C, N, 2], N-sharded
    per_camera_colors: bool = False,
):
    """Distributed 2DGS (surfel) rasterization under the same protocol:
    Gaussian-sharded surfel projection, all-to-all exchange of the ray
    transform / normal / color rows, camera-sharded rasterization.

    The reference trains 2DGS through the same distributed machinery as
    3DGS (gsplat/rendering.py:1018+ uses the world_rank/world_size exchange
    for its projection outputs); here the surfel rows simply ride the same
    dense exchange the 3DGS path uses.

    Returns the :func:`gsplat_tpu.rendering.rasterization_2dgs` 7-tuple
    (render_colors, render_alphas, render_normals [world frame],
    normals_from_depth, render_distort, render_median, meta), every image
    output camera-sharded over ``axis``; ``meta["radii"]`` is the owner-side
    [C, N] visibility and ``meta["slab_required"]`` the max per-shard
    capacity requirement.
    """
    from .ops.projection_2dgs import fully_fused_projection_2dgs_soa

    n_shards = mesh.shape[axis]
    C = viewmats.shape[0]
    if C % n_shards != 0:
        if n_shards % C == 0:
            return _rasterization_2dgs_distributed_strips(
                means, quats, scales, opacities, colors, viewmats, Ks,
                width, height, mesh, axis=axis, sh_degree=sh_degree,
                near_plane=near_plane, far_plane=far_plane,
                radius_clip=radius_clip, tile_size=tile_size,
                backgrounds=backgrounds, render_mode=render_mode,
                distloss=distloss, depth_mode=depth_mode, backend=backend,
                isect_capacity=isect_capacity, masks=masks,
                densify_carrier=densify_carrier,
                per_camera_colors=per_camera_colors,
            )
        raise ValueError(
            f"#cameras ({C}) and mesh axis '{axis}' ({n_shards}) must "
            "divide one another (strip layout covers C < n_shards)"
        )
    backend, isect_capacity = resolve_auto_backend(
        backend, isect_capacity, C // n_shards, means.shape[0], width, height
    )
    backgrounds = _depth_mode_backgrounds(backgrounds, render_mode, C)

    if per_camera_colors:
        assert sh_degree is None
        color_spec = P(None, axis, None)
    elif sh_degree is not None:
        color_spec = P(axis, None, None)
    else:
        color_spec = P(axis, None)
    extra_specs = ()
    if masks is not None:
        extra_specs = extra_specs + (P(axis),)
    if densify_carrier is not None:
        extra_specs = extra_specs + (P(None, axis, None),)

    in_specs = (
        P(axis, None), P(axis, None), P(axis, None), P(axis), color_spec,
        P(), P(),
    ) + extra_specs
    # render, alphas, normals, distort, median camera-sharded; radii
    # owner-side; n_isects / slab per-shard
    out_specs = (
        P(axis), P(axis), P(axis), P(axis), P(axis),
        P(None, axis), P(axis), P(axis),
    )

    def a2a(x):
        return lax.all_to_all(x, axis, split_axis=0, concat_axis=1, tiled=True)

    M_KEYS = [f"m{r}{c}" for r in range(3) for c in range(3)]

    def _render(means, quats, scales, opacities, colors, viewmats, Ks, *rest):
        rest = list(rest)
        live = rest.pop(0) if masks is not None else None
        carrier = rest.pop(0) if densify_carrier is not None else None
        proj = fully_fused_projection_2dgs_soa(
            means, quats, scales, viewmats, Ks, width, height,
            near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip,
        )
        radii = proj["radii"]
        if live is not None:
            radii = jnp.where(live[None, :], radii, 0)
        mean_x, mean_y = proj["mean_x"], proj["mean_y"]
        if carrier is not None:
            mean_x = mean_x + carrier[..., 0]
            mean_y = mean_y + carrier[..., 1]
        n_local = means.shape[0]

        if per_camera_colors:
            colors_cn = colors
        elif sh_degree is None:
            colors_cn = jnp.broadcast_to(
                colors[None], (C, n_local, colors.shape[-1])
            )
        else:
            camtoworlds = jnp.linalg.inv(viewmats)
            dirs = means[None, :, :] - camtoworlds[:, None, :3, 3]
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
            colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=radii > 0)
            colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)

        # depth channel layout matches rasterization_2dgs exactly: the
        # kernels read the LAST channel as depth for distortion/median
        if render_mode in ("RGB+D", "RGB+ED"):
            colors_cn = jnp.concatenate(
                [colors_cn, proj["depth"][..., None]], axis=-1
            )
        elif render_mode in ("D", "ED"):
            colors_cn = proj["depth"][..., None]

        # exchange the surfel rows
        mean_x = a2a(mean_x)
        mean_y = a2a(mean_y)
        depth = a2a(proj["depth"])
        mrows = tuple(a2a(proj[k]) for k in M_KEYS)
        nrows = tuple(a2a(proj[k]) for k in ("normal_x", "normal_y", "normal_z"))
        radii_g = a2a(radii)
        opac_g = a2a(jnp.broadcast_to(opacities[None, :], (C, n_local)))
        cols_g = a2a(colors_cn)
        normals_g = jnp.stack(nrows, axis=-1)

        bg = _shard_backgrounds(backgrounds, axis, C, n_shards)
        (
            render, alphas, normals_img, distort, median, n_isects, slab
        ) = _raster_rows_2dgs(
            backend, mean_x, mean_y, depth, mrows, normals_g, radii_g,
            opac_g, cols_g, width, height, tile_size, isect_capacity, bg,
        )
        return (
            render, alphas, normals_img, distort, median,
            jax.lax.stop_gradient(radii), n_isects[None], slab[None],
        )

    fn = shard_map(_render, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    args = (means, quats, scales, opacities, colors, viewmats, Ks)
    if masks is not None:
        args = args + (masks,)
    if densify_carrier is not None:
        args = args + (densify_carrier,)
    (
        render_colors, render_alphas, render_normals, render_distort,
        render_median, radii, n_isects, slab,
    ) = fn(*args)

    (
        render_colors, render_normals, normals_from_depth, render_distort
    ) = _postprocess_2dgs(
        render_colors, render_alphas, render_normals, render_distort,
        render_median, viewmats, Ks, render_mode, depth_mode, distloss,
    )

    meta = {
        "width": width,
        "height": height,
        "n_cameras": C,
        "radii": radii,
        "n_isects": n_isects,
        "slab_required": jnp.max(slab),
        "isect_capacity": isect_capacity,  # truncation-detect signal
    }
    return (
        render_colors,
        render_alphas,
        render_normals,
        normals_from_depth,
        render_distort,
        render_median,
        meta,
    )


def _rasterization_2dgs_distributed_strips(
    means, quats, scales, opacities, colors, viewmats, Ks,
    width, height, mesh, axis, sh_degree, near_plane, far_plane,
    radius_clip, tile_size, backgrounds, render_mode, distloss,
    depth_mode, backend, isect_capacity, masks, densify_carrier,
    per_camera_colors,
):
    """Tile-row-strip distributed 2DGS for C < n_shards (the surfel
    counterpart of :func:`_rasterization_distributed_strips`).

    Strip localization of the surfel rows: the kernels intersect rays via
    ``h_u = -M[0] + px*M[2]``, ``h_v = -M[1] + py*M[2]``
    (ops/rasterize_2dgs_ref.py:73-81), so shifting the pixel frame by
    ``y_off`` means ``M[1] <- M[1] - y_off * M[2]`` (and ``mean_y`` shifts
    like the 3DGS path for binning and the low-pass 2D fallback). Depth,
    normals and distortion are per-splat values — unaffected by the pixel
    reframe."""
    n_shards = mesh.shape[axis]
    C = viewmats.shape[0]
    N = means.shape[0]
    G = n_shards // C
    assert C * G == n_shards
    ts = tile_size
    th = -(-height // ts)
    strip_rows = -(-th // G)
    strip_h = strip_rows * ts

    backend, isect_capacity = resolve_auto_backend(
        backend, isect_capacity, 1, N, width, strip_h
    )
    backgrounds = _depth_mode_backgrounds(backgrounds, render_mode, C)

    if per_camera_colors:
        assert sh_degree is None
        color_spec = P(None, axis, None)
    elif sh_degree is not None:
        color_spec = P(axis, None, None)
    else:
        color_spec = P(axis, None)
    extra_specs = ()
    if masks is not None:
        extra_specs = extra_specs + (P(axis),)
    if densify_carrier is not None:
        extra_specs = extra_specs + (P(None, axis, None),)

    in_specs = (
        P(axis, None), P(axis, None), P(axis, None), P(axis), color_spec,
        P(), P(),
    ) + extra_specs

    def a2a_rep(x):
        xr = jnp.broadcast_to(
            x[:, None], (C, G) + x.shape[1:]
        ).reshape((n_shards,) + x.shape[1:])
        return lax.all_to_all(xr, axis, split_axis=0, concat_axis=1, tiled=True)

    M_KEYS = [f"m{r}{c}" for r in range(3) for c in range(3)]

    from .ops.projection_2dgs import fully_fused_projection_2dgs_soa

    def _render(means, quats, scales, opacities, colors, viewmats, Ks, *rest):
        rest = list(rest)
        live = rest.pop(0) if masks is not None else None
        carrier = rest.pop(0) if densify_carrier is not None else None
        proj = fully_fused_projection_2dgs_soa(
            means, quats, scales, viewmats, Ks, width, height,
            near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip,
        )
        radii = proj["radii"]
        if live is not None:
            radii = jnp.where(live[None, :], radii, 0)
        mean_x, mean_y = proj["mean_x"], proj["mean_y"]
        if carrier is not None:
            mean_x = mean_x + carrier[..., 0]
            mean_y = mean_y + carrier[..., 1]
        n_local = means.shape[0]

        if per_camera_colors:
            colors_cn = colors
        elif sh_degree is None:
            colors_cn = jnp.broadcast_to(
                colors[None], (C, n_local, colors.shape[-1])
            )
        else:
            camtoworlds = jnp.linalg.inv(viewmats)
            dirs = means[None, :, :] - camtoworlds[:, None, :3, 3]
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
            colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=radii > 0)
            colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)
        if render_mode in ("RGB+D", "RGB+ED"):
            colors_cn = jnp.concatenate(
                [colors_cn, proj["depth"][..., None]], axis=-1
            )
        elif render_mode in ("D", "ED"):
            colors_cn = proj["depth"][..., None]

        mean_x = a2a_rep(mean_x)
        mean_y = a2a_rep(mean_y)
        depth = a2a_rep(proj["depth"])
        mrows = [a2a_rep(proj[k]) for k in M_KEYS]
        nrows = tuple(a2a_rep(proj[k]) for k in ("normal_x", "normal_y", "normal_z"))
        radii_g = a2a_rep(radii)
        opac_g = a2a_rep(jnp.broadcast_to(opacities[None, :], (C, n_local)))
        cols_g = a2a_rep(colors_cn)
        normals_g = jnp.stack(nrows, axis=-1)

        # strip-local pixel frame
        idx = lax.axis_index(axis)
        g = jnp.remainder(idx, G)
        y_off = (g * strip_h).astype(jnp.float32)
        mean_y = mean_y - y_off
        # M[1] <- M[1] - y_off * M[2]  (rows m1c, m2c)
        for c_ in range(3):
            mrows[3 + c_] = mrows[3 + c_] - y_off * mrows[6 + c_]
        mrows = tuple(mrows)

        bg = None
        if backgrounds is not None:
            cam = idx // G
            bg = lax.dynamic_slice_in_dim(backgrounds, cam, 1, axis=0)

        (
            render, alphas, normals_img, distort, median, n_isects, slab
        ) = _raster_rows_2dgs(
            backend, mean_x, mean_y, depth, mrows, normals_g, radii_g,
            opac_g, cols_g, width, strip_h, tile_size, isect_capacity, bg,
        )
        return (
            render, alphas, normals_img, distort, median,
            jax.lax.stop_gradient(radii), n_isects[None], slab[None],
        )

    # 5 strip-image outputs + owner-side radii (N on dim 1) + per-shard
    # n_isects/slab
    out_specs = (
        P(None, axis), P(None, axis), P(None, axis), P(None, axis),
        P(None, axis), P(None, axis), P(axis), P(axis),
    )
    fn = shard_map(_render, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    args = (means, quats, scales, opacities, colors, viewmats, Ks)
    if masks is not None:
        args = args + (masks,)
    if densify_carrier is not None:
        args = args + (densify_carrier,)
    (
        render_colors, render_alphas, render_normals, render_distort,
        render_median, radii, n_isects, slab,
    ) = fn(*args)

    def assemble(x):
        x = x.reshape((C, G * strip_h) + x.shape[2:])
        return x[:, :height]

    render_colors = assemble(render_colors)
    render_alphas = assemble(render_alphas)
    render_normals = assemble(render_normals)
    render_distort = assemble(render_distort)
    render_median = assemble(render_median)

    (
        render_colors, render_normals, normals_from_depth, render_distort
    ) = _postprocess_2dgs(
        render_colors, render_alphas, render_normals, render_distort,
        render_median, viewmats, Ks, render_mode, depth_mode, distloss,
    )

    n_rows_ex = 17 + (
        1 if render_mode in ("D", "ED")
        else (3 if sh_degree is not None else colors.shape[-1])
        + (1 if render_mode in ("RGB+D", "RGB+ED") else 0)
    )
    meta = {
        "width": width,
        "height": height,
        "n_cameras": C,
        "radii": radii,
        "n_isects": n_isects,
        "slab_required": jnp.max(slab),
        "isect_capacity": isect_capacity,
        "n_strips": G,
        "strip_rows": strip_rows,
        "a2a_bytes_per_device": n_rows_ex * (N // n_shards) * 4 * (n_shards - 1),
    }
    return (
        render_colors,
        render_alphas,
        render_normals,
        normals_from_depth,
        render_distort,
        render_median,
        meta,
    )


def rasterization_2dgs_distributed_packed(
    means: jax.Array,  # [N, 3] sharded over `axis`
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    opacities: jax.Array,  # [N]
    colors: jax.Array,  # [N, D] or [N, K, 3] (per-Gaussian only)
    viewmats: jax.Array,  # [C, 4, 4] replicated
    Ks: jax.Array,  # [C, 3, 3] replicated
    width: int,
    height: int,
    mesh: Mesh,
    pack_capacity: int,
    axis: str = "gauss",
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    tile_size: int = 16,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    render_mode: str = "RGB",
    distloss: bool = False,
    depth_mode: str = "expected",
    backend: str = "auto",
    isect_capacity: Optional[int] = None,
    masks: Optional[jax.Array] = None,  # [N] bool
    densify_carrier: Optional[jax.Array] = None,  # [C, N, 2], N-sharded
):
    """Packed (fixed-capacity) distributed 2DGS rasterization.

    The surfel counterpart of :func:`rasterization_distributed_packed`,
    completing the reference's backend-agnostic packed protocol for 2DGS
    (gsplat/rendering.py:416-459 with csrc/Projection2DGSPacked.cu as the
    producer): each owner shard compacts the frustum-visible surfels per
    camera (radii > 0) to the front of a fixed ``pack_capacity`` buffer
    with one stable per-camera ``lax.sort`` carrying the full surfel
    payload (2D mean, depth, the 3x3 ray transform, normal, opacity,
    colors), and only that buffer crosses the ICI. Overflow is truncated
    and reported via ``meta["pack_required"]`` (max owner-side visible
    count) for the out-of-jit capacity-growth loop.

    Returns the same 7-tuple as :func:`rasterization_2dgs_distributed`,
    image outputs camera-sharded over ``axis``.
    """
    from .ops.projection_2dgs import fully_fused_projection_2dgs_soa

    n_shards = mesh.shape[axis]
    C = viewmats.shape[0]
    assert C % n_shards == 0, (
        f"#cameras ({C}) must be divisible by mesh axis '{axis}' ({n_shards})"
    )
    backend, isect_capacity = resolve_auto_backend(
        backend, isect_capacity, C // n_shards, means.shape[0], width, height
    )
    backgrounds = _depth_mode_backgrounds(backgrounds, render_mode, C)

    if sh_degree is not None:
        color_spec = P(axis, None, None)
    else:
        color_spec = P(axis, None)
    extra_specs = ()
    if masks is not None:
        extra_specs = extra_specs + (P(axis),)
    if densify_carrier is not None:
        extra_specs = extra_specs + (P(None, axis, None),)

    in_specs = (
        P(axis, None), P(axis, None), P(axis, None), P(axis), color_spec,
        P(), P(),
    ) + extra_specs
    out_specs = (
        P(axis), P(axis), P(axis), P(axis), P(axis),
        P(None, axis), P(axis), P(axis), P(axis),
    )

    def a2a(x):
        return lax.all_to_all(x, axis, split_axis=0, concat_axis=1, tiled=True)

    M_KEYS = [f"m{r}{c}" for r in range(3) for c in range(3)]

    def _render(means, quats, scales, opacities, colors, viewmats, Ks, *rest):
        rest = list(rest)
        live = rest.pop(0) if masks is not None else None
        carrier = rest.pop(0) if densify_carrier is not None else None
        proj = fully_fused_projection_2dgs_soa(
            means, quats, scales, viewmats, Ks, width, height,
            near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip,
        )
        radii = proj["radii"]
        if live is not None:
            radii = jnp.where(live[None, :], radii, 0)
        mean_x, mean_y = proj["mean_x"], proj["mean_y"]
        if carrier is not None:
            # densification grad carrier, applied by the owner shard
            # pre-pack so its cotangent stays N-sharded
            mean_x = mean_x + carrier[..., 0]
            mean_y = mean_y + carrier[..., 1]
        n_local = means.shape[0]

        if sh_degree is None:
            colors_cn = jnp.broadcast_to(
                colors[None], (C, n_local, colors.shape[-1])
            )
        else:
            camtoworlds = jnp.linalg.inv(viewmats)
            dirs = means[None, :, :] - camtoworlds[:, None, :3, 3]
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
            colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=radii > 0)
            colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)
        if render_mode in ("RGB+D", "RGB+ED"):
            colors_cn = jnp.concatenate(
                [colors_cn, proj["depth"][..., None]], axis=-1
            )
        elif render_mode in ("D", "ED"):
            colors_cn = proj["depth"][..., None]
        D = colors_cn.shape[-1]

        vis = radii > 0  # [C, n_local]
        n_vis = jnp.sum(vis.astype(jnp.int32), axis=1)  # [C]
        pack_required = jnp.max(n_vis)

        key = (~vis).astype(jnp.int32)
        opac_cn = jnp.broadcast_to(opacities[None, :], (C, n_local))
        rows = [mean_x, mean_y, proj["depth"]]
        rows += [proj[k] for k in M_KEYS]
        rows += [proj[f"normal_{a}"] for a in ("x", "y", "z")]
        rows += [radii.astype(jnp.float32), opac_cn]
        rows += [colors_cn[..., d] for d in range(D)]
        sorted_ops = jax.lax.sort(
            (key,) + tuple(rows), num_keys=1, is_stable=True, dimension=1
        )
        cap = min(pack_capacity, n_local)
        packed = [op[:, :cap] for op in sorted_ops[1:]]
        mean_xp, mean_yp, depth_p = packed[0:3]
        mrows_p = packed[3:12]
        nrows_p = packed[12:15]
        radf, opac_p = packed[15:17]
        cols_p = jnp.stack(packed[17 : 17 + D], axis=-1)
        slot_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (C, cap), 1) < n_vis[:, None]
        )
        radii_p = jnp.where(slot_ok, radf.astype(jnp.int32), 0)

        # exchange only the packed surfel buffers
        mean_xg = a2a(mean_xp)
        mean_yg = a2a(mean_yp)
        depth_g = a2a(depth_p)
        mrows_g = tuple(a2a(r) for r in mrows_p)
        normals_g = jnp.stack([a2a(r) for r in nrows_p], axis=-1)
        radii_g = a2a(radii_p)
        opac_g = a2a(opac_p)
        cols_g = a2a(cols_p)

        bg = _shard_backgrounds(backgrounds, axis, C, n_shards)
        (
            render, alphas, normals_img, distort, median, n_isects, slab
        ) = _raster_rows_2dgs(
            backend, mean_xg, mean_yg, depth_g, mrows_g, normals_g, radii_g,
            opac_g, cols_g, width, height, tile_size, isect_capacity, bg,
        )
        return (
            render, alphas, normals_img, distort, median,
            jax.lax.stop_gradient(radii), n_isects[None], slab[None],
            pack_required[None],
        )

    fn = shard_map(_render, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    args = (means, quats, scales, opacities, colors, viewmats, Ks)
    if masks is not None:
        args = args + (masks,)
    if densify_carrier is not None:
        args = args + (densify_carrier,)
    (
        render_colors, render_alphas, render_normals, render_distort,
        render_median, radii, n_isects, slab, pack_required,
    ) = fn(*args)

    (
        render_colors, render_normals, normals_from_depth, render_distort
    ) = _postprocess_2dgs(
        render_colors, render_alphas, render_normals, render_distort,
        render_median, viewmats, Ks, render_mode, depth_mode, distloss,
    )

    meta = {
        "width": width,
        "height": height,
        "n_cameras": C,
        "radii": radii,
        "n_isects": n_isects,
        "slab_required": jnp.max(slab),
        "isect_capacity": isect_capacity,  # truncation-detect signal
        "pack_required": jnp.max(pack_required),
    }
    return (
        render_colors,
        render_alphas,
        render_normals,
        normals_from_depth,
        render_distort,
        render_median,
        meta,
    )
