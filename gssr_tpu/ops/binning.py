"""Tile binning: duplicate gaussians into (tile, depth)-sorted instances.

TPU re-design of the CUDA duplicateWithKeys + RadixSort + identifyTileRanges
pipeline (diff-gaussian-rasterization/cuda_rasterizer/rasterizer_impl.cu:
70-138, 277-308). Instead of data-dependent buffer sizes, instances live in
a fixed-capacity buffer: each virtual instance finds its source gaussian by
binary search over the cumulative tiles-touched counts; invalid slots get a
sentinel tile id that sorts to the end. Sorting uses a single lexicographic
`lax.sort` over (tile_id, depth) — positive-float depth ordering equals the
CUDA uint32 bit ordering.

All integer/index math here is non-differentiable by construction; callers
wrap inputs in stop_gradient.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    gauss_id: jnp.ndarray      # [I] int32 source gaussian per sorted instance
    tile_of: jnp.ndarray       # [I] int32 tile id per sorted instance (sentinel = num_tiles)
    valid: jnp.ndarray         # [I] bool — real instance vs padding slot
    tile_ranges: jnp.ndarray   # [num_tiles + 1] int32 start offsets per tile
    num_rendered: jnp.ndarray  # [] int32 total valid instances (pre-clamp)
    overflow: jnp.ndarray      # [] bool — true if capacity was exceeded


def bin_gaussians(rect, depth, tiles_touched, tiles_x: int, tiles_y: int,
                  instance_cap: int, chunk: int = 1) -> Binning:
    """Build the depth-sorted per-tile instance list.

    Args:
      rect: [N,4] int32 tile rects (x0,y0,x1,y1), exclusive max.
      depth: [N] float32 view-space depth (>0 for visible gaussians).
      tiles_touched: [N] int32 — 0 for culled gaussians.
      instance_cap: static instance capacity I.
      chunk: pad each tile's range to a multiple of this, so Pallas blend
        kernels own aligned [*, chunk] slices exclusively (race-free DMA
        writes in the backward). Padding slots have valid=False and blend
        as alpha=0, so they are exact no-ops in fwd and produce zero grads.
    """
    num_tiles = tiles_x * tiles_y
    n = depth.shape[0]

    offsets = jnp.cumsum(tiles_touched)                  # [N] inclusive
    num_rendered = offsets[-1]

    ii = jnp.arange(instance_cap, dtype=jnp.int32)
    # source gaussian of instance i: first g with offsets[g] > i
    g = jnp.searchsorted(offsets, ii, side="right").astype(jnp.int32)
    valid = ii < num_rendered
    g_c = jnp.clip(g, 0, n - 1)

    base = jnp.where(g_c > 0, offsets[jnp.maximum(g_c - 1, 0)], 0)
    local = ii - base                                    # slot within the rect
    x0 = rect[g_c, 0]
    y0 = rect[g_c, 1]
    w = jnp.maximum(rect[g_c, 2] - x0, 1)
    tx = x0 + local % w
    ty = y0 + local // w
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)

    d = jnp.where(valid, depth[g_c], jnp.inf).astype(jnp.float32)
    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile_id, d, g_c), num_keys=2)

    tile_ranges = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    if chunk == 1:
        return Binning(gauss_id=sorted_gauss, tile_of=sorted_tile,
                       valid=sorted_tile < num_tiles,
                       tile_ranges=tile_ranges,
                       num_rendered=jnp.minimum(num_rendered, instance_cap),
                       overflow=num_rendered > instance_cap)

    # --- re-scatter into chunk-aligned per-tile ranges -------------------
    assert instance_cap % chunk == 0, "instance_cap must be chunk-aligned"
    counts = tile_ranges[1:] - tile_ranges[:-1]                  # [T]
    padded_counts = (counts + chunk - 1) // chunk * chunk
    padded_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(padded_counts).astype(jnp.int32)])           # [T+1]
    total_padded = padded_starts[-1]
    overflow = (num_rendered > instance_cap) | (total_padded > instance_cap)
    # clamp so kernels never address past the buffer even on overflow
    padded_starts = jnp.minimum(padded_starts, instance_cap)

    inst_valid = sorted_tile < num_tiles
    t_c = jnp.minimum(sorted_tile, num_tiles - 1)
    pos_in_tile = ii - tile_ranges[t_c]
    new_pos = jnp.where(inst_valid,
                        padded_starts[t_c] + pos_in_tile,
                        instance_cap)                            # drop sentinels
    pad_gauss = jnp.zeros(instance_cap, jnp.int32)
    pad_tile = jnp.full(instance_cap, num_tiles, jnp.int32)
    gauss_p = pad_gauss.at[new_pos].set(sorted_gauss, mode="drop")
    tile_p = pad_tile.at[new_pos].set(sorted_tile, mode="drop")
    valid_p = jnp.zeros(instance_cap, bool).at[new_pos].set(
        inst_valid, mode="drop")
    # padding slots inside a tile's padded range keep tile sentinels but the
    # kernels never read tile_of; they use padded ranges directly.
    return Binning(gauss_id=gauss_p, tile_of=tile_p, valid=valid_p,
                   tile_ranges=padded_starts,
                   num_rendered=jnp.minimum(num_rendered, instance_cap),
                   overflow=overflow)
