"""Tile intersection parity vs the reference torch oracle.

The reference emits a dynamically-sized sorted list keyed by
cam||tile||depth-bits; we emit a fixed-capacity list with two int32 keys.
After masking padding, the (tile, depth, flatten_id) triples must agree, and
the per-(cam,tile) ranges must match the oracle's offset encoding.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from gsplat_tpu.ops.isect import isect_tiles
from gsplat_tpu.ops.projection import fully_fused_projection
from gsplat_tpu import load_test_data

from ref_oracle import load_ref_oracle


@pytest.fixture(scope="module")
def ref():
    return load_ref_oracle()


def test_isect_tiles_parity(ref):
    means, quats, scales, opacities, colors, viewmats, Ks, width, height = (
        load_test_data()
    )
    n = 300  # oracle is a python loop; keep it small
    width, height = 160, 120
    Ks = Ks.copy()
    Ks[:, :2] *= 0.25  # shrink intrinsics to match the smaller image

    radii, means2d, depths, conics, _ = fully_fused_projection(
        jnp.asarray(means[:n]), jnp.asarray(quats[:n]), jnp.asarray(scales[:n]),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
    )
    tile_size = 16
    tile_width = -(-width // tile_size)
    tile_height = -(-height // tile_size)

    capacity = 16384
    isect = isect_tiles(
        means2d, radii, depths, tile_size, tile_width, tile_height, capacity
    )
    n_isects = int(isect.n_isects)
    assert 0 < n_isects < capacity

    tpg_ref, isect_ids_ref, flatten_ids_ref = ref._isect_tiles(
        torch.from_numpy(np.asarray(means2d)),
        torch.from_numpy(np.asarray(radii)),
        torch.from_numpy(np.asarray(depths)),
        tile_size,
        tile_width,
        tile_height,
    )
    np.testing.assert_array_equal(
        np.asarray(isect.tiles_per_gauss), tpg_ref.numpy()
    )
    assert n_isects == len(isect_ids_ref)

    # reference key: (cam << (32 + tile_bits)) | (tile << 32) | f32bits(depth)
    tile_n_bits = (tile_width * tile_height).bit_length()
    ids_ref = isect_ids_ref.numpy()
    cam_ref = ids_ref >> (32 + tile_n_bits)
    tile_ref = (ids_ref >> 32) & ((1 << tile_n_bits) - 1)
    depth_ref = (ids_ref & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    n_tiles = tile_width * tile_height
    tk = np.asarray(isect.tile_keys)[:n_isects]
    np.testing.assert_array_equal(tk // n_tiles, cam_ref)
    np.testing.assert_array_equal(tk % n_tiles, tile_ref)
    np.testing.assert_array_equal(
        np.asarray(isect.depth_keys)[:n_isects], depth_ref
    )
    # torch.sort is unstable: ties in (tile, depth) may order flatten_ids
    # differently. Compare after a full lexicographic sort on both sides.
    ours_fl = np.asarray(isect.flatten_ids)[:n_isects]
    ref_fl = flatten_ids_ref.numpy()
    np.testing.assert_array_equal(
        ours_fl[np.lexsort((ours_fl, depth_ref * 0 + np.asarray(isect.depth_keys)[:n_isects], tk))],
        ref_fl[np.lexsort((ref_fl, depth_ref, tile_ref + cam_ref * n_tiles))],
    )

    offsets_ref = ref._isect_offset_encode(
        isect_ids_ref, means2d.shape[0], tile_width, tile_height
    )
    np.testing.assert_array_equal(np.asarray(isect.offsets), offsets_ref.numpy())
    # ends must close the ranges: ends.flatten()[:-1] == offsets.flatten()[1:]
    ends = np.asarray(isect.ends).reshape(-1)
    offs = np.asarray(isect.offsets).reshape(-1)
    np.testing.assert_array_equal(ends[:-1], offs[1:])
    assert ends[-1] == n_isects


def test_isect_tiles_truncation():
    """Overflowing the capacity keeps the list sorted and reports the count."""
    rng = np.random.default_rng(1)
    C, N = 2, 64
    means2d = jnp.asarray(rng.uniform(0, 64, (C, N, 2)).astype(np.float32))
    radii = jnp.full((C, N), 40, jnp.int32)
    depths = jnp.asarray(rng.uniform(0.1, 10, (C, N)).astype(np.float32))
    isect = isect_tiles(means2d, radii, depths, 16, 4, 4, capacity=128)
    assert int(isect.n_isects) > 128
    tk = np.asarray(isect.tile_keys)
    assert (np.diff(tk) >= 0).all()
