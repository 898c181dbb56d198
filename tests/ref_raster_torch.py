"""Run the reference's torch compositing oracle offline.

`gsplat/cuda/_torch_impl._rasterize_to_pixels` (the reference's golden
rasterizer, /root/reference) depends on (a) the `nerfacc` package and (b)
the CUDA-backed `rasterize_to_indices_in_range` from `.._wrapper`. Neither
is available offline, so this module substitutes pure-torch
implementations of their *documented contracts* (no reference code is
copied) and loads `_torch_impl` inside a synthetic package so its relative
import resolves. The reference's own batched compositing loop then runs
unmodified on CPU, giving an independent golden target for garden-fixture
image + gradient parity.

Contracts implemented here:
  - nerfacc.render_weight_from_alpha(alphas, ray_indices, n_rays):
    per-ray exclusive transmittance T_i = prod_{j<i} (1 - a_j) over the
    packed (grouped, depth-ordered) samples; returns (a_i * T_i, T_i).
  - nerfacc.accumulate_along_rays(weights, values, ray_indices, n_rays):
    segment-sum of weights (* values) into rays.
  - rasterize_to_indices_in_range: the semantics of
    csrc/RasterizeToIndices3DGS.cu:102-174 — per pixel, walk the tile's
    depth-sorted entries in batches of tile_size^2 restricted to batch
    range [range_start, range_end); skip sigma<0 or alpha<1/255; stop
    (exclusive) when the running transmittance would drop to <= 1e-4;
    emit (gaussian_id, pixel_id, camera_id) grouped by pixel.
"""

import importlib.util
import os
import sys
import types

import pytest

_REF = "/root/reference/gsplat/cuda/_torch_impl.py"


def _make_fake_nerfacc(torch):
    mod = types.ModuleType("nerfacc")

    def render_weight_from_alpha(alphas, ray_indices=None, n_rays=None):
        # Log-space segment renormalization (a GLOBAL cumprod over the
        # packed stream underflows to exactly 0). The cumsum MUST run in
        # float64: over a ~300k-entry stream the running log sum reaches
        # ~1e4-1e5, where f32 resolution is ~5e-3 PER ENTRY — the
        # excl - excl[base] cancellation then corrupts every late-stream
        # transmittance by ~0.5% (measured: accumulated alphas came out
        # > 1.02). f64 keeps the difference exact to ~1e-11.
        log1m = torch.log1p(-alphas.double().clamp(max=0.9999999))
        incl = torch.cumsum(log1m, dim=0)
        excl = incl - log1m
        # group starts: first sample of each packed ray segment
        first = torch.ones_like(ray_indices, dtype=torch.bool)
        first[1:] = ray_indices[1:] != ray_indices[:-1]
        idx = torch.arange(ray_indices.numel())
        base_idx = torch.cummax(torch.where(first, idx, 0), dim=0).values
        trans = torch.exp(excl - excl[base_idx]).float()
        return alphas * trans, trans

    def accumulate_along_rays(weights, values=None, ray_indices=None, n_rays=None):
        src = weights[:, None] if values is None else weights[:, None] * values
        out = torch.zeros((n_rays, src.shape[-1]), dtype=src.dtype)
        out.index_add_(0, ray_indices, src)
        return out

    mod.render_weight_from_alpha = render_weight_from_alpha
    mod.accumulate_along_rays = accumulate_along_rays
    return mod


def _make_fake_wrapper(torch):
    mod = types.ModuleType("refgsplat.cuda._wrapper")

    def rasterize_to_indices_in_range(
        range_start, range_end, transmittances, means2d, conics, opacities,
        image_width, image_height, tile_size, isect_offsets, flatten_ids,
    ):
        C, N, _ = means2d.shape
        th, tw = isect_offsets.shape[1:3]
        n_isects = flatten_ids.numel()
        offs = torch.cat(
            [isect_offsets.reshape(-1), torch.tensor([n_isects])]
        )
        block = tile_size * tile_size
        gs_out, pix_out, cam_out = [], [], []
        py, px = torch.meshgrid(
            torch.arange(image_height), torch.arange(image_width),
            indexing="ij",
        )
        for c in range(C):
            for t in range(th * tw):
                lin = c * th * tw + t
                s, e = int(offs[lin]), int(offs[lin + 1])
                lo = s + range_start * block
                hi = min(s + range_end * block, e)
                if lo >= hi:
                    continue
                ty, tx = t // tw, t % tw
                ys = slice(ty * tile_size, min((ty + 1) * tile_size, image_height))
                xs = slice(tx * tile_size, min((tx + 1) * tile_size, image_width))
                pid = (py[ys, xs] * image_width + px[ys, xs]).reshape(-1)
                pxy = torch.stack(
                    [px[ys, xs].reshape(-1), py[ys, xs].reshape(-1)], dim=-1
                ).float() + 0.5  # [P, 2]
                fid = flatten_ids[lo:hi].long()  # [E] in [C*N)
                g = fid % N
                mu = means2d[c, g]  # [E, 2]
                con = conics[c, g]
                op = opacities[c, g]
                d = pxy[:, None, :] - mu[None, :, :]  # [P, E, 2]
                sigma = (
                    0.5 * (con[None, :, 0] * d[..., 0] ** 2
                           + con[None, :, 2] * d[..., 1] ** 2)
                    + con[None, :, 1] * d[..., 0] * d[..., 1]
                )
                alpha = (op[None, :] * torch.exp(-sigma)).clamp(max=0.999)
                valid = (sigma >= 0.0) & (alpha >= 1.0 / 255.0)
                t0 = transmittances[c].reshape(-1)[pid]  # [P]
                one_m = torch.where(valid, 1.0 - alpha, torch.ones_like(alpha))
                t_incl = t0[:, None] * torch.cumprod(one_m, dim=1)
                accept = valid & (t_incl > 1e-4)
                pp, ee = torch.nonzero(accept, as_tuple=True)  # pixel-major
                gs_out.append(g[ee])
                pix_out.append(pid[pp])
                cam_out.append(torch.full_like(pid[pp], c))
        if not gs_out:
            z = torch.zeros((0,), dtype=torch.long)
            return z, z, z
        return (
            torch.cat(gs_out), torch.cat(pix_out), torch.cat(cam_out)
        )

    def rasterize_to_indices_in_range_2dgs(
        range_start, range_end, transmittances, means2d, ray_transforms,
        opacities, image_width, image_height, tile_size, isect_offsets,
        flatten_ids,
    ):
        # Contract of csrc/RasterizeToIndices2DGS.cu:150-205: per pixel,
        # walk the tile's depth-sorted entries in batches of tile_size^2
        # restricted to [range_start, range_end); sigma is the 2DGS
        # ray-plane intersection weight min'd with the 2D low-pass filter
        # (FILTER_INV_SQUARE_2DGS = 2.0, Rasterization.h:11); skip
        # ray_cross.z == 0, sigma < 0 or alpha < 1/255; stop (exclusive)
        # when the running transmittance would drop to <= 1e-4.
        C, N, _ = means2d.shape
        th, tw = isect_offsets.shape[1:3]
        n_isects = flatten_ids.numel()
        offs = torch.cat(
            [isect_offsets.reshape(-1), torch.tensor([n_isects])]
        )
        block = tile_size * tile_size
        gs_out, pix_out, cam_out = [], [], []
        py, px = torch.meshgrid(
            torch.arange(image_height), torch.arange(image_width),
            indexing="ij",
        )
        for c in range(C):
            for t in range(th * tw):
                lin = c * th * tw + t
                s, e = int(offs[lin]), int(offs[lin + 1])
                lo = s + range_start * block
                hi = min(s + range_end * block, e)
                if lo >= hi:
                    continue
                ty, tx = t // tw, t % tw
                ys = slice(ty * tile_size, min((ty + 1) * tile_size, image_height))
                xs = slice(tx * tile_size, min((tx + 1) * tile_size, image_width))
                pid = (py[ys, xs] * image_width + px[ys, xs]).reshape(-1)
                pxy = torch.stack(
                    [px[ys, xs].reshape(-1), py[ys, xs].reshape(-1)], dim=-1
                ).float() + 0.5  # [P, 2]
                fid = flatten_ids[lo:hi].long()  # [E] in [C*N)
                g = fid % N
                M = ray_transforms[c, g]  # [E, 3, 3]
                mu = means2d[c, g]  # [E, 2]
                op = opacities[c, g]
                # h_u = px * w_M - u_M, h_v = py * w_M - v_M  -> [P, E, 3]
                h_u = (
                    pxy[:, None, 0:1] * M[None, :, 2, :] - M[None, :, 0, :]
                )
                h_v = (
                    pxy[:, None, 1:2] * M[None, :, 2, :] - M[None, :, 1, :]
                )
                cross = torch.cross(h_u, h_v, dim=-1)
                zsafe = torch.where(
                    cross[..., 2] == 0.0, torch.ones_like(cross[..., 2]),
                    cross[..., 2],
                )
                sx = cross[..., 0] / zsafe
                sy = cross[..., 1] / zsafe
                gw3d = sx * sx + sy * sy
                d = mu[None, :, :] - pxy[:, None, :]
                gw2d = 2.0 * (d[..., 0] ** 2 + d[..., 1] ** 2)
                sigma = 0.5 * torch.minimum(gw3d, gw2d)
                alpha = (op[None, :] * torch.exp(-sigma)).clamp(max=0.999)
                valid = (
                    (sigma >= 0.0)
                    & (alpha >= 1.0 / 255.0)
                    & (cross[..., 2] != 0.0)
                )
                t0 = transmittances[c].reshape(-1)[pid]  # [P]
                one_m = torch.where(valid, 1.0 - alpha, torch.ones_like(alpha))
                t_incl = t0[:, None] * torch.cumprod(one_m, dim=1)
                accept = valid & (t_incl > 1e-4)
                pp, ee = torch.nonzero(accept, as_tuple=True)  # pixel-major
                gs_out.append(g[ee])
                pix_out.append(pid[pp])
                cam_out.append(torch.full_like(pid[pp], c))
        if not gs_out:
            z = torch.zeros((0,), dtype=torch.long)
            return z, z, z
        return (
            torch.cat(gs_out), torch.cat(pix_out), torch.cat(cam_out)
        )

    mod.rasterize_to_indices_in_range = rasterize_to_indices_in_range
    mod.rasterize_to_indices_in_range_2dgs = rasterize_to_indices_in_range_2dgs
    return mod


def load_ref_rasterizer():
    """Returns the reference _torch_impl module with working
    `_rasterize_to_pixels` (stubs injected)."""
    if not os.path.exists(_REF):
        pytest.skip("reference checkout not available")
    import torch

    if "nerfacc" not in sys.modules:
        sys.modules["nerfacc"] = _make_fake_nerfacc(torch)
    pkg = types.ModuleType("refgsplat")
    pkg.__path__ = []
    cuda_pkg = types.ModuleType("refgsplat.cuda")
    cuda_pkg.__path__ = []
    sys.modules.setdefault("refgsplat", pkg)
    sys.modules.setdefault("refgsplat.cuda", cuda_pkg)
    sys.modules["refgsplat.cuda._wrapper"] = _make_fake_wrapper(torch)
    spec = importlib.util.spec_from_file_location(
        "refgsplat.cuda._torch_impl", _REF
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refgsplat.cuda._torch_impl"] = mod
    spec.loader.exec_module(mod)
    return mod


_REF_2DGS = "/root/reference/gsplat/cuda/_torch_impl_2dgs.py"


def load_ref_rasterizer_2dgs():
    """Returns the reference _torch_impl_2dgs module with working
    `_rasterize_to_pixels_2dgs` (stubs injected).

    `_torch_impl_2dgs.py` does an ABSOLUTE `from gsplat.cuda._torch_impl
    import _quat_scale_to_matrix` (reference line 6); no real `gsplat`
    package exists in this image, so the loaded `_torch_impl` module is
    aliased under that name too.
    """
    if not os.path.exists(_REF_2DGS):
        pytest.skip("reference checkout not available")
    import torch

    base = load_ref_rasterizer()  # installs nerfacc + wrapper stubs
    gs_pkg = types.ModuleType("gsplat")
    gs_pkg.__path__ = []
    gs_cuda = types.ModuleType("gsplat.cuda")
    gs_cuda.__path__ = []
    sys.modules.setdefault("gsplat", gs_pkg)
    sys.modules.setdefault("gsplat.cuda", gs_cuda)
    sys.modules.setdefault("gsplat.cuda._torch_impl", base)
    spec = importlib.util.spec_from_file_location(
        "refgsplat.cuda._torch_impl_2dgs", _REF_2DGS
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refgsplat.cuda._torch_impl_2dgs"] = mod
    spec.loader.exec_module(mod)
    return mod
