"""Band (tile-row) sharding support for the rasterize wrappers.

The second TPU scaling axis next to camera-batch DP: one image's pixels are
split into horizontal tile-row bands across a device mesh. The full-frame
preprocess (N-sized, cheap) runs replicated; the binning and blend (the
I-sized and pixel-sized work — the actual cost) operate only on each
device's band; the blended maps are reassembled with an all_gather over ICI
so every downstream loss (SSIM windows, depth->normal finite differences,
PGSR homography warps) sees the full frame and needs NO halo logic.

Gradient story: with the full-frame loss computed replicated on every
device after the all_gather, the VJP of all_gather (a psum_scatter) hands
each device n_band x the true cotangent for its band; `pmean` of the
resulting per-gaussian gradients over the band axis therefore equals the
exact single-device gradient. (Wired up in scene/vanilla.py
setup_parallel / _build_step_fn.)

Replaces the reference's... nothing: the CUDA build has no intra-job
parallelism at all (reference train.py:78-80 refuses world_size > 1).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gssr_tpu.ops.projection import TILE


def band_ty0(band_axis: str, band_ty: int):
    """This device's first tile row (traced) given its band axis index."""
    return jax.lax.axis_index(band_axis) * band_ty


def clip_to_band(rect, tiles_full, tile_mask, ty0, band_ty: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray],
                            jnp.ndarray]:
    """Clip tile rects to rows [ty0, ty0+band_ty) and rebase to band-local
    rows. Returns (rect_band, tiles_band, mask_band, exact_band) where
    exact_band is the exact valid-instance count within the band
    (popcount of the in-window clipped mask + the beyond-window area).

    tiles_full gates culled gaussians: their rect can be geometrically
    non-degenerate (tile_rect clamps, it does not collapse), so the band
    area must inherit the full-frame tiles_touched == 0 cull.

    The intersect bitmask covers the first 32 rect tiles in row-major
    order; dropping `r0` leading rows shifts the enumeration by r0*w bits.
    Bits that shift in from beyond the 32-tile window are set (those rect
    positions followed unconditionally in the full-frame enumeration), so
    the clipped mask is conservative-exact: it never drops a hit tile.
    """
    x0, y0f, x1, y1f = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    y0 = jnp.clip(y0f, ty0, ty0 + band_ty)
    y1 = jnp.clip(y1f, ty0, ty0 + band_ty)
    rect_band = jnp.stack([x0, y0 - ty0, x1, y1 - ty0], axis=1)
    tiles_band = (x1 - x0) * (y1 - y0)
    tiles_band = jnp.where(tiles_full > 0, tiles_band, 0).astype(jnp.int32)

    mask_band = None
    if tile_mask is not None:
        w = jnp.maximum(x1 - x0, 1)
        sh = (y0 - y0f) * w                       # dropped leading bits
        m = tile_mask.astype(jnp.uint32)
        shifted = jnp.where(sh >= 32, jnp.uint32(0),
                            m >> jnp.clip(sh, 0, 31).astype(jnp.uint32))
        keep = 32 - sh                            # surviving window bits
        fill = jnp.where(
            keep <= 0, ~jnp.uint32(0),
            jnp.where(keep >= 32, jnp.uint32(0),
                      (~jnp.uint32(0))
                      << jnp.clip(keep, 0, 31).astype(jnp.uint32)))
        mask_band = (shifted | fill).astype(jnp.int32)

    from gssr_tpu.ops.projection import MASK_TILES, _popcount32
    if mask_band is None:
        exact_band = tiles_band
    else:
        window = jnp.minimum(tiles_band, MASK_TILES)
        keep_bits = jnp.where(
            window >= 32, ~jnp.uint32(0),
            (jnp.uint32(1) << jnp.clip(window, 0, 31).astype(jnp.uint32))
            - 1)
        in_window = _popcount32(
            (mask_band.astype(jnp.uint32) & keep_bits).astype(jnp.int32))
        exact_band = jnp.where(
            tiles_band > 0,
            in_window + jnp.maximum(tiles_band - MASK_TILES, 0),
            0).astype(jnp.int32)
    return rect_band, tiles_band, mask_band, exact_band


def shift_mean2d(mean2d, ty0):
    """Screen positions in band-local pixel coordinates."""
    return mean2d - jnp.stack(
        [jnp.zeros((), jnp.float32), (ty0 * TILE).astype(jnp.float32)])


def gather_bands(x, band_axis: str):
    """Reassemble per-band maps [band_h, W, ...] -> full [H, W, ...]."""
    return jax.lax.all_gather(x, band_axis, axis=0, tiled=True)


def merge_flags(num_rendered, overflow, band_axis: str):
    """Across-band instance count (sum) and overflow flag (any)."""
    total = jax.lax.psum(num_rendered, band_axis)
    over = jax.lax.pmax(overflow.astype(jnp.int32), band_axis) > 0
    return total, over
