"""Tile binning: duplicate gaussians into (tile, depth)-sorted instances.

TPU re-design of the CUDA duplicateWithKeys + RadixSort + identifyTileRanges
pipeline (diff-gaussian-rasterization/cuda_rasterizer/rasterizer_impl.cu:
70-138, 277-308). Instead of data-dependent buffer sizes, instances live in
a fixed-capacity buffer: each virtual instance finds its source gaussian by
binary search over the cumulative tiles-touched counts; invalid slots get a
sentinel tile id that sorts to the end. Sorting uses a single `lax.sort`
over a fused 32-bit (tile | quantized-depth) key — positive-float depth
ordering equals the CUDA uint32 bit ordering.

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
    tile_counts: jnp.ndarray = None  # [num_tiles] int32 REAL (unpadded) counts
    # sorted-segment-reduction support (see segment_reduce_sorted): gaussian
    # id per slot with sentinel N for padding/culled slots, and the [N+1]
    # per-gaussian segment boundaries in gid-sorted order (exclusive cumsum
    # of the exact per-gaussian valid-instance counts)
    gid_reduce: jnp.ndarray = None   # [I] int32
    seg_bounds: jnp.ndarray = None   # [N+1] int32


def segment_reduce_sorted(vals, gid_reduce, seg_bounds, block: int = 128):
    """Per-gaussian sums of per-instance values WITHOUT a scatter.

    XLA's scatter-add costs ~18ns/row regardless of width (the top single
    backward cost at ~43ms for 2.4M instances on v5e). Instead: sort the
    value columns by gaussian id (radix sort moves payloads coalesced,
    ~10ms for 10 columns), then take prefix sums ONLY at the N+1
    per-gaussian segment boundaries — known cheaply from the exact tile
    counts, no searchsorted — via a two-level blocked prefix:

      * per column, reshape [I] -> [I/128, 128] and cumsum the MINOR axis
        (a full [I, C] axis-0 cumsum pads the C=9 minor dim to 128 lanes,
        a 14x bandwidth waste, and scans a multi-million-long axis — that
        formulation measured SLOWER than the scatter it replaces);
      * a tiny [I/128] block-prefix scan;
      * one monotone flat gather of the within-block prefix at each
        boundary (monotone gathers from big tables are fast on TPU).

    prefix(p) = blockpre[p // 128] + within[p - 1 | guarded], and the
    per-gaussian sum is prefix(bounds[g+1]) - prefix(bounds[g]).

    vals: [I, C] float32, I a multiple of `block` (instance_cap is
    128-chunk aligned). Padding slots may hold garbage: their gid is the
    sentinel N and sorts past seg_bounds[-1], structurally excluded.
    Returns [N, C].
    """
    i_cap = vals.shape[0]
    assert i_cap % block == 0, "instance_cap must be block-aligned"
    cols = tuple(vals[:, i] for i in range(vals.shape[1]))
    out = jax.lax.sort((gid_reduce,) + cols, num_keys=1)

    pb = seg_bounds // block                      # [N+1] block index
    po = seg_bounds - pb * block                  # [N+1] within-block offset
    # flat index of the inclusive within-block prefix at p-1; when po == 0
    # the within-block term is zero — clamp the index and mask it out
    flat = jnp.clip(seg_bounds - 1, 0, i_cap - 1)
    has_within = po > 0

    res = []
    for c in out[1:]:
        w = jnp.cumsum(c.reshape(-1, block), axis=1)     # [I/B, B] inclusive
        blockpre = jnp.concatenate(
            [jnp.zeros(1, c.dtype), jnp.cumsum(w[:, -1])])  # [I/B+1] excl.
        prefix = blockpre[pb] + jnp.where(has_within, w.reshape(-1)[flat],
                                          0.0)           # [N+1]
        res.append(prefix[1:] - prefix[:-1])
    return jnp.stack(res, axis=1)


def bin_gaussians(rect, depth, tiles_touched, tiles_x: int, tiles_y: int,
                  instance_cap: int, chunk: int = 1,
                  tile_mask=None, exact_counts=None,
                  need_valid: bool = True) -> Binning:
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
      tile_mask: optional [N] int32 intersect bitmask over the first
        MASK_TILES rect tiles (projection.tile_intersect_mask). When given,
        tiles_touched must be the matching exact count and instances
        enumerate only the set bits (rect tiles past MASK_TILES follow
        unconditionally).
      exact_counts: optional [N] int32 exact valid-instance count per
        gaussian (Projected.exact_tiles). Enables gid_reduce/seg_bounds
        for the sorted segment-reduction backward.
      need_valid: when False (chunked path only), skip the per-instance
        valid channel entirely — one cummax broadcast, the compare chain
        and the [16, I] ATTR_VALID row write all disappear (~8ms at 2.4M
        instances). Callers must then derive lane validity from
        tile_counts (the Pallas kernels do: lane < count - k*CHUNK).
    """
    num_tiles = tiles_x * tiles_y
    n = depth.shape[0]
    seg_bounds = None
    if exact_counts is not None:
        seg_bounds = jnp.minimum(
            jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(exact_counts).astype(jnp.int32)]),
            instance_cap)

    offsets = jnp.cumsum(tiles_touched)                  # [N] inclusive
    num_rendered = offsets[-1]
    starts = offsets - tiles_touched                     # exclusive starts

    # instance -> gaussian via scatter + running max: TPU random gathers
    # are slow, and searchsorted costs ~18 binary-search rounds of them; a
    # single small scatter + one big cummax replaces it entirely. Each
    # visible gaussian marks its first instance slot with (index+1); the
    # running max then broadcasts the latest mark forward (marks appear in
    # increasing index order by construction).
    ii = jnp.arange(instance_cap, dtype=jnp.int32)
    gauss_idx = jnp.arange(n, dtype=jnp.int32)
    marks = jnp.zeros(instance_cap, jnp.int32).at[
        jnp.where(tiles_touched > 0, starts, instance_cap)
    ].set(gauss_idx + 1, mode="drop")
    g_c = jnp.clip(jax.lax.cummax(marks) - 1, 0, n - 1).astype(jnp.int32)
    valid = ii < num_rendered

    # one packed gather for all per-gaussian fields; the rect fits in one
    # int32 with 10-bit fields (supports images up to 1024 tiles per axis
    # = 16k pixels), so 3-4 columns instead of 5+
    assert tiles_x <= 1024 and tiles_y <= 1024, "rect pack field overflow"
    rect_w = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
    rect_pack = (rect[:, 0] | (rect[:, 1] << 10) | (rect_w << 20))
    # per-gaussian f32 reciprocal of the rect width: the per-instance
    # local//w and local%w below become a multiply + floor + one +-1
    # correction instead of a dynamic-divisor integer division (which the
    # VPU emulates slowly over 2.4M+ instances)
    rcp_w = jax.lax.bitcast_convert_type(
        1.0 / rect_w.astype(jnp.float32), jnp.int32)
    cols = [rect_pack, starts.astype(jnp.int32),
            jax.lax.bitcast_convert_type(depth.astype(jnp.float32),
                                         jnp.int32), rcp_w]
    if tile_mask is not None:
        cols.append(tile_mask.astype(jnp.int32))
    recs = jnp.stack(cols, axis=1)                       # [N,4 or 5] int32
    r = recs[g_c]                                        # [I,*]
    x0 = r[:, 0] & 0x3FF
    y0 = (r[:, 0] >> 10) & 0x3FF
    rw = (r[:, 0] >> 20) & 0x3FF
    local = ii - r[:, 1]
    if tile_mask is not None:
        # exact-intersection bit for this rect position; positions past the
        # mask width pass unconditionally. Culled instances keep their
        # allocated slot (mapping stays trivial) but take the sentinel tile
        # and sort to the end, so no blend range ever includes them.
        hit = ((r[:, 4] >> jnp.minimum(local, 31)) & 1) == 1
        valid = valid & (hit | (local >= 32))
    # local // rw via f32 reciprocal multiply: |fl(local*fl(1/rw)) -
    # local/rw| < 1 for local < 2^20 (two roundings, rel err <= 2^-23), so
    # the candidate is off by at most one — fixed by the remainder test
    rcp = jax.lax.bitcast_convert_type(r[:, 3], jnp.float32)
    q0 = jnp.floor(jnp.maximum(local, 0).astype(jnp.float32) * rcp
                   ).astype(jnp.int32)
    r0 = local - q0 * rw
    ty_off = q0 + (r0 >= rw).astype(jnp.int32) - (r0 < 0).astype(jnp.int32)
    tx = x0 + local - ty_off * rw
    ty = y0 + ty_off
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)

    # Fused 32-bit (tile | depth) sort key: ONE key operand + the gaussian
    # payload instead of (tile, depth, gauss) with num_keys=2 — lax.sort
    # cost scales with operand count (2-op ~21.6ms vs 3-op ~30ms at 8.4M
    # rows on v5e). Positive-float depth bit patterns are order-preserving
    # as unsigned ints (same fact the CUDA radix sort uses,
    # rasterizer_impl.cu:70-111); we keep the top `32 - tile_bits` of the
    # 31 magnitude bits. The unsigned->signed XOR of the top bit makes the
    # packed key monotone under int32 comparison. Depth ties within
    # 2^-(23-(tile_bits-8)) relative resolution break stably by gaussian
    # index — the same class of tie-breaking the CUDA 64-bit radix key has
    # at bit granularity, just coarser.
    tile_bits = max(1, int(num_tiles + 1).bit_length())
    depth_bits = 32 - tile_bits
    inf_bits = jnp.int32(0x7F800000)
    dq = jnp.where(valid, r[:, 2], inf_bits) >> (31 - depth_bits)
    key = ((tile_id << depth_bits) | (dq & ((1 << depth_bits) - 1))) \
        ^ jnp.int32(-(2 ** 31))
    sorted_key, sorted_gauss = jax.lax.sort((key, g_c), num_keys=1)

    bounds = (jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits) \
        ^ jnp.int32(-(2 ** 31))
    tile_ranges = jnp.searchsorted(
        sorted_key, bounds, side="left").astype(jnp.int32)
    sorted_tile = jnp.minimum(
        jax.lax.shift_right_logical(sorted_key ^ jnp.int32(-(2 ** 31)),
                                    depth_bits),
        num_tiles).astype(jnp.int32)

    if chunk == 1:
        valid1 = sorted_tile < num_tiles
        return Binning(gauss_id=sorted_gauss, tile_of=sorted_tile,
                       valid=valid1,
                       tile_ranges=tile_ranges,
                       num_rendered=jnp.minimum(num_rendered, instance_cap),
                       overflow=num_rendered > instance_cap,
                       tile_counts=tile_ranges[1:] - tile_ranges[:-1],
                       gid_reduce=(jnp.where(valid1, sorted_gauss, n)
                                   if seg_bounds is not None else None),
                       seg_bounds=seg_bounds)

    # --- move into chunk-aligned per-tile ranges (gather formulation) ----
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

    # Gather formulation with scatter+cummax broadcasts. Per-slot lookups
    # into the [T] tables (padded_starts, tile_ranges, counts) would each
    # cost a full 8M-index gather (TPU gather cost is per-index, not
    # per-table); instead every needed per-tile value is MONOTONE
    # NON-DECREASING over tiles, so a tiny scatter of the value at each
    # tile's padded start + a running max broadcasts it to every slot of
    # the segment. Only ONE big gather remains (the instance move itself).
    tile_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    start_pos = jnp.where(padded_counts > 0, padded_starts[:-1], instance_cap)

    def bcast(vals):  # vals[t] monotone non-decreasing, >= 0
        m = jnp.zeros(instance_cap, jnp.int32).at[start_pos].set(
            vals, mode="drop")
        return jax.lax.cummax(m)

    # cumulative padding before tile t — non-decreasing, so one channel
    # replaces (padded_start, unpadded_start): src = ii - shift, and
    # src >= tile_ranges[t] holds automatically within a segment
    seg_shift = bcast(padded_starts[:-1] - tile_ranges[:-1])
    src = ii - seg_shift                         # candidate source index
    # src >= 0 always: the broadcast value at slot ii was scattered at a
    # padded start <= ii and shift <= that start
    if not (need_valid or seg_bounds is not None):
        # fast path: padding slots gather a neighbouring tile's gaussian
        # (harmless garbage — the kernels mask lanes >= tile_counts[t]
        # and the VJP masks slots >= tile_ranges[-1])
        gauss_p = sorted_gauss[src]
        return Binning(gauss_id=gauss_p, tile_of=None, valid=None,
                       tile_ranges=padded_starts,
                       num_rendered=jnp.minimum(num_rendered, instance_cap),
                       overflow=overflow, tile_counts=counts)
    seg_nxt = bcast(tile_ranges[1:])             # unpadded end of tile
    in_range = (src >= 0) & (src < seg_nxt) & (ii < total_padded)
    gauss_p = jnp.where(in_range,
                        sorted_gauss[jnp.where(in_range, src, 0)], 0)
    # tile id per slot: only the reference (chunk=1) backend reads
    # tile_of, so XLA dead-code-eliminates this channel on the Pallas path
    seg_tile = bcast(tile_idx + 1) - 1
    tile_p = jnp.where(in_range, seg_tile, num_tiles)
    # padding slots inside a tile's padded range keep tile sentinels but the
    # kernels never read tile_of; they use padded ranges directly.
    return Binning(gauss_id=gauss_p, tile_of=tile_p, valid=in_range,
                   tile_ranges=padded_starts,
                   num_rendered=jnp.minimum(num_rendered, instance_cap),
                   overflow=overflow, tile_counts=counts,
                   gid_reduce=(jnp.where(in_range, gauss_p, n)
                               if seg_bounds is not None else None),
                   seg_bounds=seg_bounds)
