"""Tile binning: duplicate gaussians into (tile, depth)-sorted instances.

TPU re-design of the CUDA duplicateWithKeys + RadixSort + identifyTileRanges
pipeline (diff-gaussian-rasterization/cuda_rasterizer/rasterizer_impl.cu:
70-138, 277-308). Instead of data-dependent buffer sizes, instances live in
a fixed-capacity buffer: each virtual instance finds its source gaussian by
binary search over the cumulative tiles-touched counts; sorting uses a
single `lax.sort` over a fused 32-bit (tile | quantized-depth) key —
positive-float depth ordering equals the CUDA uint32 bit ordering.

Chunked path (the Pallas backends): the sort lands DIRECTLY in the
chunk-aligned per-tile layout. Per-tile instance counts are known before
the sort — they are rect-coverage counts, computable as one MXU matmul of
0/1 interval indicators (exact in f32) — so per-tile padded ranges are
fixed up front and per-tile FILLER instances carrying a max-depth key sort
exactly into the padding slots. This removes the post-sort re-layout pass
(a second cummax broadcast + a full instance-capacity gather) entirely.
Per-instance validity (exact ellipse-tile hit + real-vs-filler) rides the
sort payload as a high bit; the attr pack multiplies it into the instance
attributes, making invalid lanes exact alpha=0 no-ops in the kernels, so
the kernels need no count/validity side channel at all.

All integer/index math here is non-differentiable by construction; callers
wrap inputs in stop_gradient.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    gauss_id: jnp.ndarray      # [I] int32 source gaussian per sorted instance
    tile_ranges: jnp.ndarray   # [num_tiles + 1] int32 start offsets per tile
    num_rendered: jnp.ndarray  # [] int32 total valid instances (pre-clamp)
    overflow: jnp.ndarray      # [] bool — true if capacity was exceeded
    tile_counts: jnp.ndarray = None  # [num_tiles] int32 REAL (unpadded) counts
    # chunked path only: per-instance validity (real exact-hit instance vs
    # filler/non-hit), multiplied into the attr pack -> alpha=0 no-op lanes
    hit: jnp.ndarray = None          # [I] float32 in {0, 1}
    # chunk -> tile map for the flat-chunk-grid kernels; dead chunks past
    # the live range inherit the last live tile id (so the kernels' output
    # revisiting never flushes stale data over a written tile)
    chunk_map: jnp.ndarray = None    # [I // chunk] int32
    n_live_chunks: jnp.ndarray = None  # [1] int32
    # sorted-segment-reduction backward (see segment_reduce_sorted):
    # gaussian id per slot with sentinel N for filler/dead slots, and the
    # [N+1] per-gaussian segment boundaries in gid-sorted order (exclusive
    # cumsum of the per-gaussian rect-slot counts)
    gid_reduce: jnp.ndarray = None   # [I] int32
    seg_bounds: jnp.ndarray = None   # [N+1] int32
    # reference (chunk=1) path only:
    tile_of: jnp.ndarray = None      # [I] int32 (sentinel = num_tiles)
    valid: jnp.ndarray = None        # [I] bool


def segment_reduce_sorted(vals, gid_reduce, seg_bounds, block: int = 128):
    """Per-gaussian sums of per-instance values WITHOUT a scatter.

    XLA's TPU scatter-add costs ~180ns PER OUTPUT-TABLE ROW, almost
    independent of index count and width (measured v5e: [2.36M]->[200k]
    41ms, ->[1.31M] 241ms) — ruinous for scaffold/octree payloads whose
    decoded-gaussian table has millions of rows. Instead: sort the value
    columns by gaussian id (radix sort moves payloads coalesced), then take
    prefix sums ONLY at the N+1 per-gaussian segment boundaries via a
    two-level blocked prefix:

      * per column, reshape [I] -> [I/128, 128] and cumsum the MINOR axis;
      * a tiny [I/128] block-prefix scan;
      * one monotone flat gather of the within-block prefix per boundary.

    prefix(p) = blockpre[p // 128] + within[p - 1 | guarded], and the
    per-gaussian sum is prefix(bounds[g+1]) - prefix(bounds[g]).

    vals: [I, C] float32, I a multiple of `block`. Filler/dead slots carry
    gid sentinel N and sort past seg_bounds[-1] (their values are exact
    zeros anyway). Returns [N, C].
    """
    i_cap, n_cols = vals.shape
    assert i_cap % block == 0, "instance_cap must be block-aligned"
    if os.environ.get("GSSR_SEGRED_PERM", "0") != "0":
        # permutation variant: a 2-operand (gid, iota) sort plus ONE row
        # gather of the value block, instead of carrying all C value
        # columns through a (1+C)-operand sort. Wins when C is large
        # enough that sort ops dominate the gather's ~6ns/idx
        # (A/B-measured on chip; see docs/tpu-perf-notes.md).
        from gssr_tpu.ops.blend_pallas import _row_gather as _rg
        _, order = jax.lax.sort(
            (gid_reduce, jnp.arange(i_cap, dtype=jnp.int32)), num_keys=1)
        g = _rg(vals, order)
        out = (None,) + tuple(g[:, i] for i in range(n_cols))
    else:
        cols = tuple(vals[:, i] for i in range(n_cols))
        out = jax.lax.sort((gid_reduce,) + cols, num_keys=1)

    pb = seg_bounds // block                      # [N+1] block index
    po = seg_bounds - pb * block                  # [N+1] within-block offset
    flat = jnp.clip(seg_bounds - 1, 0, i_cap - 1)
    has_within = (po > 0)[:, None]

    # per-column block prefixes keep the 128-lane axis on the block dim (a
    # joint [I/B, B, C] cumsum would pad C to 128 lanes); the BOUNDARY
    # lookups are then done as TWO row gathers over stacked [*, C] tables —
    # N+1 per-column gathers (the r2 formulation) cost ~15ms EACH at
    # millions of boundaries, dwarfing everything else.
    ws = [jnp.cumsum(c.reshape(-1, block), axis=1) for c in out[1:]]
    w_flat = jnp.stack([w.reshape(-1) for w in ws], axis=1)       # [I, C]
    blockpre = jnp.concatenate(
        [jnp.zeros((1, n_cols), vals.dtype),
         jnp.cumsum(jnp.stack([w[:, -1] for w in ws], axis=1), axis=0)])

    from gssr_tpu.ops.blend_pallas import _row_gather
    prefix = (blockpre[pb]
              + jnp.where(has_within, _row_gather(w_flat, flat), 0.0))
    return prefix[1:] - prefix[:-1]


def tile_cover_counts(rect, visible, tiles_x: int, tiles_y: int):
    """Per-tile rect-coverage counts as one MXU matmul.

    count[ty, tx] = sum_g visible_g * [y0<=ty<y1] * [x0<=tx<x1] factorizes
    into indicator matrices U [N, tiles_y], V [N, tiles_x] with
    count = U^T V. 0/1 entries are exact in bf16, accumulation is f32, and
    counts stay below 2^24 — so the result is exact integer arithmetic at
    MXU speed (vs a 4N-row corner scatter-add).
    """
    v = visible
    ty = jnp.arange(tiles_y, dtype=jnp.int32)
    tx = jnp.arange(tiles_x, dtype=jnp.int32)
    U = ((rect[:, 1:2] <= ty[None, :]) & (ty[None, :] < rect[:, 3:4])
         & v[:, None]).astype(jnp.float32)
    V = ((rect[:, 0:1] <= tx[None, :]) & (tx[None, :] < rect[:, 2:3])
         & v[:, None]).astype(jnp.float32)
    c = jax.lax.dot_general(U, V, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return c.reshape(-1).astype(jnp.int32)             # [tiles_y * tiles_x]


def _expand_keys(rect, depth, tiles_touched, tile_mask, tiles_x, num_tiles,
                 instance_cap, depth_bits, fill_pos=None, fill_vals=None):
    """Per-instance (sort key, payload) for the real instances.

    Key = tile << depth_bits | quantized depth (sign-flipped for int32
    compare); payload = gaussian index | exact-hit bit << 30.

    fill_pos/fill_vals (chunked path): extra marks merged into the ONE
    scatter+cummax broadcast — filler-region tile ids tagged with bit 30 so
    they dominate every real gaussian mark; the caller decodes them from
    the returned raw cummax `v`. Saves a second full-capacity cummax.
    """
    n = depth.shape[0]
    offsets = jnp.cumsum(tiles_touched)                  # [N] inclusive
    num_rendered = offsets[-1]
    starts = offsets - tiles_touched                     # exclusive starts

    # instance -> gaussian via scatter + running max: TPU random gathers
    # are slow, and searchsorted costs ~18 binary-search rounds of them; a
    # single small scatter + one big cummax replaces it entirely.
    ii = jnp.arange(instance_cap, dtype=jnp.int32)
    gauss_idx = jnp.arange(n, dtype=jnp.int32)
    marks = jnp.zeros(instance_cap, jnp.int32).at[
        jnp.where(tiles_touched > 0, starts, instance_cap)
    ].set(gauss_idx + 1, mode="drop")
    if fill_pos is not None:
        marks = marks.at[fill_pos].max(fill_vals, mode="drop")
    v = jax.lax.cummax(marks)
    g_c = jnp.clip(v - 1, 0, n - 1).astype(jnp.int32)

    # one packed gather for all per-gaussian fields; the rect fits in one
    # int32 with 10-bit fields. rect_w - 1 is packed (valid range 0..1023)
    # so a full-width 1024-tile rect still round-trips (ADVICE r2).
    assert tiles_x <= 1024, "rect pack field overflow"
    rect_w = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
    rect_pack = (rect[:, 0] | (rect[:, 1] << 10) | ((rect_w - 1) << 20))
    # per-gaussian f32 reciprocal of the rect width: the per-instance
    # local//w below becomes a multiply + floor + one +-1 correction
    # instead of a dynamic-divisor integer division
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
    rw = ((r[:, 0] >> 20) & 0x3FF) + 1
    local = ii - r[:, 1]
    if tile_mask is not None:
        # exact-intersection bit for this rect position; positions past the
        # mask window pass unconditionally
        hit = (((r[:, 4] >> jnp.minimum(local, 31)) & 1) == 1) | (local >= 32)
    else:
        hit = jnp.ones((instance_cap,), bool)
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
    tile_id = (ty * tiles_x + tx).astype(jnp.int32)

    # Fused 32-bit (tile | depth) sort key: ONE key operand + one payload
    # operand — lax.sort cost scales with operand count. Positive-float
    # depth bit patterns are order-preserving as unsigned ints (same fact
    # the CUDA radix sort uses, rasterizer_impl.cu:70-111). The
    # unsigned->signed XOR of the top bit makes the packed key monotone
    # under int32 comparison. Depth ties within 2^-(23-(tile_bits-8))
    # relative resolution break stably by slot order.
    # payload bits: 0-28 gaussian index, 29 real-instance flag (vs filler/
    # dead — needed to build exact per-gaussian segments for the sorted
    # reduction backward), 30 exact-ellipse-hit flag
    assert n < (1 << 29), "gaussian capacity exceeds payload index bits"
    dq = (r[:, 2] >> (31 - depth_bits)) & ((1 << depth_bits) - 1)
    key = (tile_id << depth_bits) | dq
    payload = g_c | (hit.astype(jnp.int32) << 30) | (1 << 29)
    return key, payload, num_rendered, ii, v


def bin_gaussians(rect, depth, tiles_touched, tiles_x: int, tiles_y: int,
                  instance_cap: int, chunk: int = 1,
                  tile_mask=None) -> Binning:
    """Build the depth-sorted per-tile instance list.

    Args:
      rect: [N,4] int32 tile rects (x0,y0,x1,y1), exclusive max.
      depth: [N] float32 view-space depth (>0 for visible gaussians).
      tiles_touched: [N] int32 rect area — 0 for culled gaussians.
      instance_cap: static instance capacity I.
      chunk: pad each tile's range to a multiple of this, so the Pallas
        blend kernels own aligned [*, chunk] slices exclusively (race-free
        DMA writes in the backward). Filler slots carry hit=0 and blend as
        alpha=0, so they are exact no-ops in fwd and produce zero grads.
      tile_mask: optional [N] int32 exact ellipse-tile intersect bitmask
        over the first 32 rect tiles (projection.tile_intersect_mask);
        non-hit rect slots become hit=0 no-op lanes.
    """
    num_tiles = tiles_x * tiles_y
    n = depth.shape[0]
    tile_bits = max(1, int(num_tiles + 1).bit_length())
    depth_bits = 32 - tile_bits
    sign = jnp.int32(-(2 ** 31))

    if chunk == 1:
        key, payload, num_rendered, ii, _ = _expand_keys(
            rect, depth, tiles_touched, tile_mask, tiles_x, num_tiles,
            instance_cap, depth_bits)
        # reference-backend path: sentinel keys for padding, post-sort
        # ranges by searchsorted (no alignment constraints to satisfy)
        in_range = ii < num_rendered
        hit = (payload >> 30) == 1
        key = jnp.where(in_range & hit, key,
                        (jnp.int32(num_tiles) << depth_bits))
        skey, spayload = jax.lax.sort((key ^ sign, payload), num_keys=1)
        bounds = (jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits) \
            ^ sign
        tile_ranges = jnp.searchsorted(skey, bounds,
                                       side="left").astype(jnp.int32)
        sorted_tile = jnp.minimum(
            jax.lax.shift_right_logical(skey ^ sign, depth_bits),
            num_tiles).astype(jnp.int32)
        valid1 = sorted_tile < num_tiles
        return Binning(gauss_id=spayload & 0x1FFFFFFF, tile_of=sorted_tile,
                       valid=valid1, tile_ranges=tile_ranges,
                       num_rendered=jnp.minimum(num_rendered, instance_cap),
                       overflow=num_rendered > instance_cap,
                       tile_counts=tile_ranges[1:] - tile_ranges[:-1])

    # ---- chunked path: sort directly into the padded layout -------------
    assert instance_cap % chunk == 0, "instance_cap must be chunk-aligned"
    counts = tile_cover_counts(rect, tiles_touched > 0, tiles_x, tiles_y)
    num_rendered = jnp.sum(tiles_touched)
    padded_counts = (counts + chunk - 1) // chunk * chunk
    padded_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(padded_counts).astype(jnp.int32)])           # [T+1]
    total_padded = padded_starts[-1]
    overflow = (num_rendered > instance_cap) | (total_padded > instance_cap)
    padded_starts = jnp.minimum(padded_starts, instance_cap)

    # Filler instances occupy slots [num_rendered, total_padded): tile t
    # contributes pad_counts[t] of them, with depth field all-ones so they
    # sort after every real instance of their tile (finite positive floats
    # never quantize to all-ones: 0x7F7FFFFF >> s < the inf pattern).
    # Their tile ids broadcast across the filler segments through the SAME
    # scatter+cummax the gaussian-index expansion uses, tagged with bit 30
    # so they dominate every (gaussian+1) mark; slots past total_padded
    # take the global sentinel tile.
    pad_counts = padded_counts - counts
    fill_starts = num_rendered + jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(pad_counts).astype(jnp.int32)])[:-1]
    tidx = jnp.arange(num_tiles, dtype=jnp.int32)
    tag = jnp.int32(1 << 30)
    fill_pos = jnp.concatenate([
        jnp.where(pad_counts > 0, fill_starts, instance_cap),
        jnp.minimum(total_padded, instance_cap - 1)[None]])
    fill_vals = jnp.concatenate([
        tag | (tidx + 1),
        jnp.where(total_padded < instance_cap,
                  tag | (num_tiles + 1), 0)[None]])

    key, payload, _, ii, v = _expand_keys(
        rect, depth, tiles_touched, tile_mask, tiles_x, num_tiles,
        instance_cap, depth_bits, fill_pos=fill_pos, fill_vals=fill_vals)

    fill_tile = jnp.clip((v & (tag - 1)) - 1, 0, num_tiles)
    fill_key = (fill_tile << depth_bits) | ((1 << depth_bits) - 1)

    is_real = ii < num_rendered
    key = jnp.where(is_real, key, fill_key) ^ sign
    payload = jnp.where(is_real, payload, 0)
    _, spayload = jax.lax.sort((key, payload), num_keys=1)
    gauss_id = spayload & 0x1FFFFFFF
    hit = (spayload >> 30).astype(jnp.float32)
    # sorted-segment-reduction support: filler/dead slots (real bit off)
    # take the sentinel gid N and sort past seg_bounds[-1]
    gid_reduce = jnp.where(((spayload >> 29) & 1) == 1, gauss_id, n)
    seg_bounds = jnp.minimum(
        jnp.concatenate([jnp.zeros(1, jnp.int32),
                         jnp.cumsum(tiles_touched).astype(jnp.int32)]),
        instance_cap)

    # chunk -> tile map: scatter tile id at each live tile's first chunk,
    # cummax broadcast; dead chunks past the live range inherit the last
    # live tile id (clipped to 0 when nothing is live at all)
    n_chunks = instance_cap // chunk
    cpos = jnp.where(padded_counts > 0, padded_starts[:-1] // chunk,
                     n_chunks)
    cmarks = jnp.zeros(n_chunks, jnp.int32).at[cpos].set(
        tidx + 1, mode="drop")
    chunk_map = jnp.clip(jax.lax.cummax(cmarks) - 1, 0, num_tiles - 1)
    n_live = ((jnp.minimum(total_padded, instance_cap) + chunk - 1)
              // chunk).reshape(1).astype(jnp.int32)

    return Binning(gauss_id=gauss_id, hit=hit, tile_ranges=padded_starts,
                   num_rendered=jnp.minimum(num_rendered, instance_cap),
                   overflow=overflow, tile_counts=counts,
                   chunk_map=chunk_map, n_live_chunks=n_live,
                   gid_reduce=gid_reduce, seg_bounds=seg_bounds)
