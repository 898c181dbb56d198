"""Tile intersection + depth-ordered binning, XLA-native with static shapes.

The reference builds a dynamically-sized COO intersection list on the host
(`.item()` sync at gsplat/triton_impl/isect_tiles.py:100-104), packs 64-bit
keys `cam_id || tile_id || f32(depth) bits`, and radix-sorts them with CUB
(gsplat/triton_impl/radix_sort/radix_sort.cu). None of that maps to TPU/XLA:

  - Dynamic shapes force recompiles and host syncs -> we emit into a
    **fixed-capacity** buffer of `capacity` entries (jnp.repeat with
    total_repeat_length) and surface the true count so callers can grow the
    capacity between steps (a bounded, out-of-jit decision).
  - int64 keys are emulated and slow on TPU -> we sort with **two int32 keys**
    ((cam*n_tiles + tile), f32-depth-bits) via `jax.lax.sort(num_keys=2)`,
    which lowers to the XLA TPU sort (the CUB-radix-sort equivalent).
  - The offset "back-fill" kernel (gsplat/triton_impl/isect_offset.py:39-63)
    becomes a single `jnp.searchsorted` over the sorted major keys.

Parity oracle: gsplat/cuda/_torch_impl.py:331-429.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Isect(NamedTuple):
    """Depth-sorted tile intersection list (static capacity).

    Attributes:
        tile_keys: [capacity] int32, `cam_id * n_tiles + tile_id` per entry,
            sorted ascending; padding entries hold `C * n_tiles`.
        depth_keys: [capacity] int32, f32 depth bits (secondary sort key).
        flatten_ids: [capacity] int32, flattened `cam_id * N + gaussian_id`
            per entry (indexes [C*N] projection outputs). Padding holds 0 but
            is excluded by the offsets below.
        offsets: [C, tile_height, tile_width] int32, start index of each
            tile's range in the sorted list; the range end is the next tile's
            start (`ends`).
        ends: [C, tile_height, tile_width] int32, end index of each range.
        n_isects: [] int32, true number of intersections (may exceed
            `capacity`, in which case the list was truncated and the caller
            should re-run with a larger capacity).
        tiles_per_gauss: [C, N] int32.
    """

    tile_keys: jax.Array
    depth_keys: jax.Array
    flatten_ids: jax.Array
    offsets: jax.Array
    ends: jax.Array
    n_isects: jax.Array
    tiles_per_gauss: jax.Array


def isect_tiles(
    means2d,  # [C, N, 2] array or (mean_x [C,N], mean_y [C,N]) tuple
    radii: jax.Array,  # [C, N] int32
    depths: jax.Array,  # [C, N]
    tile_size: int,
    tile_width: int,
    tile_height: int,
    capacity: int,
) -> Isect:
    """Bin Gaussians into the image tiles they overlap, sorted by (cam, tile, depth).

    Each Gaussian covers the axis-aligned tile rectangle
    [floor((mean - r)/ts), ceil((mean + r)/ts)) clamped to the grid
    (parity: gsplat/cuda/_torch_impl.py:350-360). One entry is emitted per
    (gaussian, covered tile) into a `capacity`-sized buffer.

    ``means2d`` may be passed SoA (two [C, N] arrays) — the layout-friendly
    form on TPU, see ops/projection.py docstring.
    """
    if isinstance(means2d, (tuple, list)):
        mean_x, mean_y = means2d
    else:
        mean_x, mean_y = means2d[..., 0], means2d[..., 1]
    C, N = mean_x.shape
    n_tiles = tile_width * tile_height

    mean_x = jax.lax.stop_gradient(mean_x)
    mean_y = jax.lax.stop_gradient(mean_y)
    depths = jax.lax.stop_gradient(depths)

    tile_r = radii / tile_size
    tminx = jnp.clip(jnp.floor(mean_x / tile_size - tile_r), 0, tile_width).astype(jnp.int32)
    tmaxx = jnp.clip(jnp.ceil(mean_x / tile_size + tile_r), 0, tile_width).astype(jnp.int32)
    tminy = jnp.clip(jnp.floor(mean_y / tile_size - tile_r), 0, tile_height).astype(jnp.int32)
    tmaxy = jnp.clip(jnp.ceil(mean_y / tile_size + tile_r), 0, tile_height).astype(jnp.int32)
    rect_w = tmaxx - tminx  # [C, N]
    rect_h = tmaxy - tminy
    tiles_per_gauss = jnp.where(radii > 0, rect_w * rect_h, 0)  # [C, N]
    tile_mins = (tminx, tminy)

    tpg_flat = tiles_per_gauss.reshape(-1)  # [C*N]
    cum = jnp.cumsum(tpg_flat)
    n_isects = cum[-1]
    starts = cum - tpg_flat  # exclusive prefix

    # Expand: entry e in [0, capacity) belongs to source (cam,gauss) `src[e]`,
    # and is that source's `local[e]`-th covered tile (row-major over the rect).
    src = jnp.repeat(
        jnp.arange(C * N, dtype=jnp.int32),
        tpg_flat,
        total_repeat_length=capacity,
    )  # [capacity]
    pos = jnp.arange(capacity, dtype=jnp.int32)

    # One multi-row gather instead of five: XLA TPU gather cost is dominated
    # by per-index processing, so fetching all per-source emit attributes in
    # a single [5, capacity] gather is ~5x cheaper than five 1-row gathers.
    emit_rows = jnp.stack(
        [
            starts.astype(jnp.int32),
            jnp.maximum(rect_w.reshape(-1), 1).astype(jnp.int32),
            tile_mins[0].reshape(-1),
            tile_mins[1].reshape(-1),
            jax.lax.bitcast_convert_type(depths.reshape(-1), jnp.int32),
        ],
        axis=0,
    )  # [5, C*N]
    g = jnp.take(emit_rows, src, axis=1)  # [5, capacity]
    local = pos - g[0]
    rw = g[1]
    tx = g[2] + local % rw
    ty = g[3] + local // rw
    cam = src // N

    valid = pos < n_isects
    tile_keys = jnp.where(
        valid, cam * n_tiles + ty * tile_width + tx, C * n_tiles
    ).astype(jnp.int32)
    # depths > near_plane > 0 so f32 bit order == int32 order
    depth_keys = g[4]
    flatten_ids = jnp.where(valid, src, 0).astype(jnp.int32)

    tile_keys, depth_keys, flatten_ids = jax.lax.sort(
        (tile_keys, depth_keys, flatten_ids), num_keys=2
    )

    bounds = jnp.searchsorted(
        tile_keys, jnp.arange(n_tiles * C + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    offsets = bounds[:-1].reshape(C, tile_height, tile_width)
    ends = bounds[1:].reshape(C, tile_height, tile_width)

    return Isect(
        tile_keys=tile_keys,
        depth_keys=depth_keys,
        flatten_ids=flatten_ids,
        offsets=offsets,
        ends=ends,
        n_isects=n_isects.astype(jnp.int32),
        tiles_per_gauss=tiles_per_gauss.astype(jnp.int32),
    )


def suggest_capacity(n_isects: int, slack: float = 1.3, align: int = 4096) -> int:
    """Out-of-jit helper: next capacity given an observed intersection count."""
    cap = int(n_isects * slack) + align
    return (cap + align - 1) // align * align


def isect_offset_encode(
    tile_keys: jax.Array,  # [capacity] sorted (cam*n_tiles + tile) keys
    n_cameras: int,
    tile_width: int,
    tile_height: int,
) -> jax.Array:
    """Sorted intersection keys -> per-(cam, tile) start offsets
    [C, tile_height, tile_width] (parity: gsplat/cuda/_wrapper.
    isect_offset_encode / triton_impl/isect_offset.py:8-33; the backfill
    kernel becomes one searchsorted). `isect_tiles` already returns offsets;
    this exists for API parity and for externally-sorted key streams."""
    n_tiles = tile_width * tile_height
    bounds = jnp.searchsorted(
        tile_keys, jnp.arange(n_tiles * n_cameras, dtype=tile_keys.dtype),
        side="left",
    ).astype(jnp.int32)
    return bounds.reshape(n_cameras, tile_height, tile_width)
