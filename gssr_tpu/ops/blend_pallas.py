"""Pallas TPU tile-blend kernels (forward + analytic backward).

TPU re-design of renderCUDA fwd/bwd (diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:261-374, backward.cu:400-557). Key differences
from the CUDA scheme, chosen for the TPU execution model:

* Forward: one grid program per 16x16 tile, consuming CHUNK-sized
  depth-ordered instance slices with manual double-buffered DMA — the
  early stop can then skip the DMA and loop iterations of every chunk
  past the tile's saturation point. Each program prefetches the NEXT
  tile's first chunk into a head buffer that persists across grid steps,
  hiding the per-tile cold-start DMA latency.
* Backward: a FLAT grid over chunks with a scalar-prefetched chunk->tile
  map driving the BlockSpecs — every chunk writes a gradient block anyway,
  so Pallas's automatic pipeline double-buffers the whole instance stream
  and the per-tile state lives in scratch, reset at tile boundaries.
* Per-tile ranges are CHUNK-aligned with filler no-op instances (see
  binning.bin_gaussians), so every chunk belongs to exactly one tile and
  the backward writes per-instance gradients race-free — where CUDA uses
  atomicAdd (backward.cu:523-554). Fully deterministic.
* Instance validity needs no side channel: filler and non-ellipse-hit
  lanes have their packed attributes multiplied by 0 (binning.hit), which
  makes them exact alpha=0 no-ops in fwd and zero-gradient lanes in bwd.
* Data layout is attribute-major [NUM_ATTRS, I]: instance chunks live on
  the 128-lane axis so every DMA slice is lane-aligned; in-kernel math runs
  in (PIX, CHUNK) orientation (pixels on sublanes, instances on lanes).
* The per-pixel sequential front-to-back recurrence becomes a chunk-wide
  exclusive prefix product of (1 - alpha) along lanes via shift-doubling
  on the VPU; the T<1e-4 early-stop is exact because transmittance is
  monotone (the first instance whose inclusion would cross the threshold
  and everything after it get zero weight — the CUDA 'done' flag).
* Backward recomputes the forward walk in forward order (total-minus-
  prefix gives the suffix sums) instead of CUDA's back-to-front T division.

The blend is wrapped in jax.custom_vjp; everything upstream (projection,
SH, instance gather) is differentiated by XLA.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gssr_tpu.ops.binning import Binning
from gssr_tpu.ops.projection import TILE

# instance attribute rows (vanilla payload), layout [NUM_ATTRS, I].
# 9 live rows padded to 16: manual HBM DMA slices must be sublane-tile
# (8-row) aligned, and HBM stores the array 16-row padded either way. Only
# the 9 live rows are computed on / scatter-added back (LIVE_ATTRS).
ATTR_MX, ATTR_MY = 0, 1
ATTR_CXX, ATTR_CXY, ATTR_CYY = 2, 3, 4
ATTR_OP = 5
ATTR_R, ATTR_G, ATTR_B = 6, 7, 8
LIVE_ATTRS = 9
NUM_ATTRS = 16

OUT_ROWS = 8          # 0-2 acc color, 3 final_T (contributing-only product)
PIX = TILE * TILE     # 256 pixels per tile
CHUNK = 128           # instances per chunk; binning pads ranges to this

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _interpret() -> bool:
    return os.environ.get("GSSR_TPU_INTERPRET", "0") == "1"


def _pixel_cols(t, tiles_x):
    """Pixel centers of tile t as (PIX, 1) float columns (x and y)."""
    ty = t // tiles_x
    tx = t % tiles_x
    sub = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + sub % TILE).astype(jnp.float32)
    py = (ty * TILE + sub // TILE).astype(jnp.float32)
    return px, py


def _prefix_sum_lanes(x, exclusive: bool):
    """Prefix sum along the lane (instance) axis via log-shift adds.

    Exact f32 on the VPU — deliberately NOT a triangular matmul: the MXU
    would round inputs to bf16 at default precision.
    """
    n = x.shape[1]
    zeros_col = jnp.zeros_like(x)
    y = x
    k = 1
    while k < n:
        y = y + jnp.concatenate([zeros_col[:, :k], y[:, : n - k]], axis=1)
        k *= 2
    return y - x if exclusive else y


def _prefix_prod_excl_lanes(x):
    """Exclusive prefix product along lanes via shift-doubling multiplies.

    Matches the CUDA sequential T *= (1 - alpha) recurrence to a few ulp
    without transcendentals (log1p/exp round-tripping costs ~1e-5 absolute,
    too much for the pixel-grad parity target)."""
    n = x.shape[1]
    ones_col = jnp.ones_like(x)
    y = jnp.concatenate([ones_col[:, :1], x[:, : n - 1]], axis=1)
    k = 1
    while k < n:
        y = y * jnp.concatenate([ones_col[:, :k], y[:, : n - k]], axis=1)
        k *= 2
    return y


def _total_prod_lanes(x):
    """Product along lanes as (PIX, 1) — Mosaic lacks reduce_prod."""
    return _prefix_prod_excl_lanes(x)[:, -1:] * x[:, -1:]


def _chunk_alpha(A, px, py):
    """Per-(pixel, instance) alpha for one chunk.

    A: (NUM_ATTRS, CHUNK) attrs. Returns (a, extras) with a (PIX, CHUNK) —
    zero wherever the CUDA loop would `continue`. Filler / non-hit lanes
    arrive with all-zero attrs (power 0, raw 0) and fall out of the
    alpha >= 1/255 gate with no special casing.
    """
    r = lambda i: A[i:i + 1, :]                 # (1, CHUNK)
    dx = r(ATTR_MX) - px                        # (PIX, CHUNK)
    dy = r(ATTR_MY) - py
    cxx, cxy, cyy = r(ATTR_CXX), r(ATTR_CXY), r(ATTR_CYY)
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    g_exp = jnp.exp(power)
    raw = r(ATTR_OP) * g_exp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(ok, alpha, 0.0)
    return a, (dx, dy, g_exp, raw, ok)


# ---------------------------------------------------------------------------
# Forward kernel
#
# Per-TILE grid (not flat-chunk like the backward): the T<1e-4 early stop
# lets the forward skip the DMA *and* the loop iterations of every chunk
# past a tile's saturation point — a static flat grid would stream them all
# (measured +11ms on the bench workload). The per-tile cold-start DMA is
# hidden by a cross-program prefetch: each program issues the DMA for the
# NEXT tile's first chunk into a dedicated head buffer as soon as its own
# first chunk has landed, so the next program's wait is a no-op. Scratch
# buffers and semaphores persist across grid programs, which is what makes
# the handoff possible.
# ---------------------------------------------------------------------------

def _fwd_kernel(tiles_x, num_tiles, ranges_ref, attrs_ref, out_ref,
                abuf, hbuf, state_ref, sem, hsem):
    t = pl.program_id(0)
    start = pl.multiple_of(ranges_ref[t], CHUNK)
    end = ranges_ref[t + 1]
    total = ranges_ref[num_tiles]
    nchunks = (end - start) // CHUNK

    px, py = _pixel_cols(t, tiles_x)
    out_ref[0] = jnp.zeros((PIX, OUT_ROWS), jnp.float32)
    out_ref[0, :, 3:4] = jnp.ones((PIX, 1), jnp.float32)
    # state cols: 0 -> D (all-lane transmittance), 1 -> Tb (contributing-
    # only product, the CUDA final_T)
    state_ref[:] = jnp.ones((PIX, 2), jnp.float32)

    def in_copy(k, slot):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(start + k * CHUNK, CHUNK)],
            abuf.at[slot], sem.at[slot])

    def head_copy(offset):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(pl.multiple_of(offset, CHUNK), CHUNK)],
            hbuf, hsem)

    def chunk_step(A, k):
        a, _extras = _chunk_alpha(A, px, py)
        one_m = 1.0 - a
        pfx = _prefix_prod_excl_lanes(one_m)
        d0 = state_ref[:, 0:1]
        d_before = d0 * pfx
        d_inc = d_before * one_m
        contrib = (a > 0.0) & (d_inc >= T_EPS)
        w = jnp.where(contrib, a * d_before, 0.0)          # (PIX, CHUNK)
        # color accumulation as one (PIX,CHUNK)@(CHUNK,3) MXU matmul
        # instead of 3 lane-reductions; HIGHEST keeps f32 accuracy
        out_ref[0, :, 0:3] += jax.lax.dot_general(
            w, A[ATTR_R:ATTR_B + 1, :], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        # blended-only transmittance update WITHOUT a second prefix
        # product: within a chunk every a>0 lane up to the last
        # contributing lane c contributes (d_inc = d0*pfx[i+1] is monotone
        # non-increasing), so prod_{contrib}(1-a) = pfx[c]*one_m[c] =
        # d_inc[c]/d0 = min_{contrib}(d_inc)/d0. When some lane
        # contributes, d_inc[c] >= T_EPS forces d0 > 0.
        mind = jnp.min(jnp.where(contrib, d_inc, 3.0e38), axis=1,
                       keepdims=True)
        state_ref[:, 0:1] = d0 * (pfx[:, -1:] * one_m[:, -1:])
        state_ref[:, 1:2] = state_ref[:, 1:2] * jnp.where(
            mind < 3.0e38, mind / jnp.maximum(d0, 1e-30), 1.0)
        out_ref[0, :, 3:4] = state_ref[:, 1:2]

    @pl.when(nchunks > 0)
    def _():
        # chunk 0 arrives via the head buffer. The first nonempty tile
        # (unique: start == 0 with nchunks > 0) cold-starts the chain; every
        # other nonempty tile's chunk 0 was prefetched by its predecessor.
        @pl.when(start == 0)
        def _():
            head_copy(0).start()
        head_copy(start).wait()

        @pl.when(nchunks > 1)
        def _():
            in_copy(1, 1).start()

        chunk_step(hbuf[:, :], 0)

        # hand the head buffer to the next nonempty tile (owner of the next
        # global chunk at `end`) — overlaps the rest of this tile's loop
        @pl.when(end < total)
        def _():
            head_copy(end).start()

        def body(k, pending):
            # pending == 1 iff the DMA for chunk k was issued; once the
            # early stop trips, the in-flight fetch is drained (wait) and
            # no further DMAs are issued, so no semaphore leaks across
            # grid steps.
            slot = jax.lax.rem(k, 2)

            @pl.when(pending == 1)
            def _():
                in_copy(k, slot).wait()

            alive = jnp.max(state_ref[:, 0]) >= T_EPS
            do = (pending == 1) & alive
            fetch_next = do & (k + 1 < nchunks)

            @pl.when(fetch_next)
            def _():
                in_copy(k + 1, 1 - slot).start()   # overlaps compute of k

            @pl.when(do)
            def _():
                chunk_step(abuf[slot], k)

            return jnp.where(fetch_next, jnp.int32(1), jnp.int32(0))

        jax.lax.fori_loop(1, nchunks, body, jnp.int32(nchunks > 1))


# ---------------------------------------------------------------------------
# Backward kernel (forward-order re-walk)
# ---------------------------------------------------------------------------

def _bwd_kernel(tiles_x, cmap_ref, nlive_ref, attrs_ref, fwd_ref, cot_ref,
                dattr_ref, state_ref):
    i = pl.program_id(0)
    t = cmap_ref[i]
    live = i < nlive_ref[0]
    # every chunk writes its gradient block (zeros when dead), so the
    # output needs no post-hoc validity masking
    dattr_ref[:, :] = jnp.zeros((NUM_ATTRS, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        first = jnp.logical_or(i == 0, cmap_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(first)
        def _():
            # state cols: 0 -> D, 2 -> running prefix of w*u
            state_ref[:] = jnp.zeros((PIX, 4), jnp.float32)
            state_ref[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)

        @pl.when(jnp.max(state_ref[:, 0]) >= T_EPS)
        def _():
            px, py = _pixel_cols(t, tiles_x)
            dacc = cot_ref[0, :, 0:3]                 # (PIX, 3)
            dT = cot_ref[0, :, 3:4]                   # (PIX, 1)
            final_T = fwd_ref[0, :, 3:4]              # (PIX, 1)
            bgterm = final_T * dT
            # total = sum_i w_i (color_i . dacc) = dacc . acc_rgb: the
            # per-pixel total the CUDA backward rebuilds in a first pass is
            # the forward RGB accumulation contracted with its cotangent —
            # read it instead of re-walking the instance list.
            total = (fwd_ref[0, :, 0:1] * dacc[:, 0:1]
                     + fwd_ref[0, :, 1:2] * dacc[:, 1:2]
                     + fwd_ref[0, :, 2:3] * dacc[:, 2:3])       # (PIX, 1)

            # Tile-LOCAL pixel polynomial basis for the moment matmul.
            # Local coords keep |mean - origin| on the same scale as dx, so
            # the binomial expansions of sum(dpower*dx^a*dy^b) below never
            # cancel catastrophically (global px^2 ~ 2.6e6 would eat ~3
            # f32 digits).
            ox = px[0:1, :]                           # tile origin
            oy = py[0:1, :]
            pxl = px - ox
            pyl = py - oy
            poly = jnp.concatenate(
                [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pxl * pyl,
                 pyl * pyl], axis=1)                  # (PIX, 6)

            A = attrs_ref[:, :]
            a, (dx, dy, g_exp, raw, ok) = _chunk_alpha(A, px, py)
            one_m = 1.0 - a
            pfx = _prefix_prod_excl_lanes(one_m)
            d_before = state_ref[:, 0:1] * pfx
            contrib = (a > 0.0) & (d_before * one_m >= T_EPS)
            w = jnp.where(contrib, a * d_before, 0.0)
            # u[p,i] = color_i . dacc_p as a (PIX,3)@(3,CHUNK) matmul
            u = jax.lax.dot_general(
                dacc, A[ATTR_R:ATTR_B + 1, :], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            wu = w * u
            prefix_inc = state_ref[:, 2:3] + _prefix_sum_lanes(wu, False)
            suffix = total - prefix_inc                    # (PIX, CHUNK)
            inv1ma = 1.0 / one_m
            da = jnp.where(contrib,
                           d_before * u - (suffix + bgterm) * inv1ma,
                           0.0)
            # chain through alpha = min(0.99, op * exp(power))
            unclamped = raw < ALPHA_MAX
            da_eff = jnp.where(ok & unclamped, da, 0.0)
            dpower = da_eff * raw                          # d alpha/d power
            # All six geometry/opacity rows are sums over pixels of
            # dpower * poly(dx, dy) with dx = mx - px. Expanding in the
            # tile-local frame, every row is algebra over the six moments
            # M[m,i] = sum_p dpower[p,i] * poly[p,m] — ONE (6,PIX)@(PIX,
            # CHUNK) MXU matmul replaces nine sublane reductions. The
            # opacity row uses sum(da_eff*g_exp) = sum(dpower)/op exactly
            # (raw = op*g_exp and clamped/masked lanes have dpower = 0).
            M = jax.lax.dot_general(
                poly, dpower, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # (6, CHUNK)
            m0, m_x, m_y = M[0:1, :], M[1:2, :], M[2:3, :]
            mxx, mxy, myy = M[3:4, :], M[4:5, :], M[5:6, :]
            r = lambda j: A[j:j + 1, :]
            cxx, cxy, cyy = r(ATTR_CXX), r(ATTR_CXY), r(ATTR_CYY)
            gx = r(ATTR_MX) - ox               # mean in the tile-local frame
            gy = r(ATTR_MY) - oy
            ex = gx * m0 - m_x                 # sum_p dpower * dx
            ey = gy * m0 - m_y
            sxx = gx * (gx * m0 - 2.0 * m_x) + mxx   # sum_p dpower * dx*dx
            sxy = gx * ey - gy * m_x + mxy           # sum_p dpower * dx*dy
            syy = gy * (gy * m0 - 2.0 * m_y) + myy
            rows = [
                -(cxx * ex + cxy * ey),
                -(cyy * ey + cxy * ex),
                -0.5 * sxx,
                -sxy,
                -0.5 * syy,
                m0 / jnp.maximum(r(ATTR_OP), 1e-20),
            ]
            # color rows: (3,PIX)@(PIX,CHUNK) matmul over the blend weights
            crows = jax.lax.dot_general(
                dacc, w, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # (3, CHUNK)
            dattr_ref[:, :] = jnp.concatenate(
                rows + [crows, jnp.zeros((NUM_ATTRS - LIVE_ATTRS, CHUNK),
                                         jnp.float32)], axis=0)
            state_ref[:, 2:3] = prefix_inc[:, -1:]
            state_ref[:, 0:1] = state_ref[:, 0:1] * (pfx[:, -1:]
                                                     * one_m[:, -1:])


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _run_fwd(attrs, ranges, tiles_x: int, tiles_y: int):
    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, PIX, OUT_ROWS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ATTRS, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_ATTRS, CHUNK), jnp.float32),
            pltpu.VMEM((PIX, 2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x, num_tiles),
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, OUT_ROWS),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(ranges, attrs)


def _run_bwd(attrs, cmap, nlive, fwd_out, cot, tiles_x: int, tiles_y: int):
    n_chunks = attrs.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((NUM_ATTRS, CHUNK), lambda i, cmap, nl: (0, i)),
            pl.BlockSpec((1, PIX, OUT_ROWS),
                         lambda i, cmap, nl: (cmap[i], 0, 0)),
            pl.BlockSpec((1, PIX, OUT_ROWS),
                         lambda i, cmap, nl: (cmap[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((NUM_ATTRS, CHUNK),
                               lambda i, cmap, nl: (0, i)),
        scratch_shapes=[pltpu.VMEM((PIX, 4), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x),
        out_shape=jax.ShapeDtypeStruct(attrs.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(cmap, nlive, attrs, fwd_out, cot)


def _tiles_to_image(out, tiles_x, tiles_y, rows):
    """[num_tiles, PIX, OUT_ROWS] -> [H, W, rows]."""
    x = out.reshape(tiles_y, tiles_x, TILE, TILE, OUT_ROWS)
    x = x.transpose(0, 2, 1, 3, 4)      # ty, py, tx, px, c
    return x.reshape(tiles_y * TILE, tiles_x * TILE, OUT_ROWS)[..., :rows]


def _image_to_tiles(img_rows, tiles_x, tiles_y):
    """[H, W, OUT_ROWS] -> [num_tiles, PIX, OUT_ROWS]."""
    H, W, _ = img_rows.shape
    x = img_rows.reshape(tiles_y, TILE, tiles_x, TILE, OUT_ROWS)
    x = x.transpose(0, 2, 1, 3, 4)      # ty, tx, py, px, c
    return x.reshape(tiles_y * tiles_x, PIX, OUT_ROWS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _blend_core(attrs, ranges, cmap, nlive, tiles_x, tiles_y):
    out = _run_fwd(attrs, ranges, tiles_x, tiles_y)
    img = _tiles_to_image(out, tiles_x, tiles_y, 4)
    return img[..., :3], img[..., 3]


def _blend_core_fwd(attrs, ranges, cmap, nlive, tiles_x, tiles_y):
    out = _run_fwd(attrs, ranges, tiles_x, tiles_y)
    img = _tiles_to_image(out, tiles_x, tiles_y, 4)
    return (img[..., :3], img[..., 3]), (attrs, ranges, cmap, nlive, out)


def _blend_core_bwd(tiles_x, tiles_y, res, cotangents):
    attrs, ranges, cmap, nlive, fwd_out = res
    d_img, d_T = cotangents
    H, W = d_img.shape[:2]
    cot_rows = jnp.concatenate(
        [d_img, d_T[..., None],
         jnp.zeros((H, W, OUT_ROWS - 4), jnp.float32)], axis=-1)
    cot = _image_to_tiles(cot_rows, tiles_x, tiles_y)
    dattrs = _run_bwd(attrs, cmap, nlive, fwd_out, cot, tiles_x, tiles_y)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return dattrs, f0(ranges), f0(cmap), f0(nlive)


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


def _row_gather(per_gauss, gauss_id):
    """per_gauss[gauss_id], split into <=16-column pieces for wide tables:
    XLA's TPU row gather falls off a cliff past 16 f32 columns on large
    tables (measured v5e, 2.36M indices x [1.31M, C]: C=16 20ms, C=24
    77ms); two narrow gathers re-pay the index cost but stay on the fast
    path, a net win once the table is big."""
    n, width = per_gauss.shape
    if width <= 16 or n <= 1 << 19:
        return per_gauss[gauss_id]
    return jnp.concatenate(
        [per_gauss[:, c:c + 16][gauss_id] for c in range(0, width, 16)],
        axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(per_gauss, gauss_id, n_used):
    """per_gauss[gauss_id] with a VJP that scatter-adds only the first
    n_used columns (any remaining columns are structurally zero-gradient
    padding rows)."""
    return _row_gather(per_gauss, gauss_id)


def _gather_rows_fwd(per_gauss, gauss_id, n_used):
    return _row_gather(per_gauss, gauss_id), (per_gauss.shape[0], gauss_id)


def _gather_rows_bwd(n_used, res, dg):
    n, gauss_id = res
    dpg = jnp.zeros((n, n_used), dg.dtype).at[gauss_id].add(
        dg[:, :n_used], mode="drop")
    if dg.shape[1] > n_used:
        dpg = jnp.concatenate(
            [dpg, jnp.zeros((n, dg.shape[1] - n_used), dg.dtype)], axis=1)
    return dpg, np.zeros(gauss_id.shape, jax.dtypes.float0)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_rows_segred(per_gauss, gauss_id, gid_reduce, seg_bounds, n_used):
    """per_gauss[gauss_id] whose VJP is the sorted segment reduction
    (binning.segment_reduce_sorted) instead of a scatter-add. XLA's TPU
    scatter-add costs ~180ns per OUTPUT ROW (see segment_reduce_sorted),
    so for payloads whose per-gaussian table is large — scaffold/octree
    decode emits millions of rows — the sort-based reduction, whose cost
    scales with the instance count instead, wins by multiples."""
    return _row_gather(per_gauss, gauss_id)


def _grs_fwd(per_gauss, gauss_id, gid_reduce, seg_bounds, n_used):
    return _row_gather(per_gauss, gauss_id), (per_gauss.shape, gauss_id,
                                              gid_reduce, seg_bounds)


def _grs_bwd(n_used, res, dg):
    from gssr_tpu.ops.binning import segment_reduce_sorted
    (n, width), gauss_id, gid_reduce, seg_bounds = res
    dpg = segment_reduce_sorted(dg[:, :n_used], gid_reduce, seg_bounds)
    if width > n_used:
        dpg = jnp.concatenate(
            [dpg, jnp.zeros((n, width - n_used), dg.dtype)], axis=1)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return dpg, f0(gauss_id), f0(gid_reduce), f0(seg_bounds)


gather_rows_segred.defvjp(_grs_fwd, _grs_bwd)


def gather_rows_auto(per_gauss, binning: Binning, n_used):
    """Pick the per-gaussian gradient-reduction strategy from the measured
    v5e cost model: scatter-add ~ 180ns x N table rows; sorted segment
    reduction ~ 1.45ns x (n_used + 1 sort operands) x instance capacity.
    Both cross over around N ~ I x C / 124; below it (vanilla's compact
    gaussian table) the scatter wins, above it (scaffold/octree decode
    tables) the sort would.

    GSSR_SEGRED=0 opts out (forces the scatter path). During the round-4
    compiled-gradient investigation (docs/known-issues.md) segred was
    temporarily suspected, but forcing the scatter path did NOT change the
    faulty composed gradients, and segment_reduce_sorted verifies exact on
    TPU in isolation (1.4e-5 rel at 1.57M slots) — so the cost-model
    default stands."""
    n = per_gauss.shape[0]
    i_cap = binning.gauss_id.shape[0]
    if (os.environ.get("GSSR_SEGRED", "1") != "0"
            and binning.gid_reduce is not None
            and n * 180.0 > i_cap * (n_used + 1) * 1.45):
        return gather_rows_segred(per_gauss, binning.gauss_id,
                                  binning.gid_reduce, binning.seg_bounds,
                                  n_used)
    return gather_rows(per_gauss, binning.gauss_id, n_used)


def pack_instance_attrs(mean2d, conic, color, opacity, binning: Binning):
    """Gather per-gaussian attrs into the sorted-instance layout
    [NUM_ATTRS, I]. One packed [N, A] gather (TPU random gathers are slow;
    a row gather amortizes the index cost over all attrs); its VJP is the
    scatter-add of instance gradients back to gaussians. The per-instance
    hit multiply zeroes filler / non-ellipse-hit lanes (exact no-ops) and
    symmetrically zeroes their gradients on the way back."""
    n = mean2d.shape[0]
    per_gauss = jnp.concatenate([
        mean2d, conic, opacity[:, None], color,
        jnp.zeros((n, NUM_ATTRS - LIVE_ATTRS), jnp.float32)], axis=1)
    gathered = gather_rows_auto(per_gauss, binning, LIVE_ATTRS)
    return (gathered * binning.hit[:, None]).T                  # [16, I]


def tile_nonempty_mask(tile_counts, tiles_x: int, tiles_y: int):
    """[H, W] bool — pixels of tiles with at least one instance. Used by
    the flat-chunk-grid payloads (pgsr) whose forward never visits empty
    tiles."""
    ne = (tile_counts > 0).reshape(tiles_y, 1, tiles_x, 1)
    ne = jnp.broadcast_to(ne, (tiles_y, TILE, tiles_x, TILE))
    return ne.reshape(tiles_y * TILE, tiles_x * TILE)


def blend_pallas(mean2d, conic, color, opacity, binning: Binning,
                 width: int, height: int, bg):
    """Blend sorted instances into an image (Pallas path).

    Returns (image [H,W,3] incl. background composite, final_T [H,W]).
    """
    assert width % TILE == 0 and height % TILE == 0
    tiles_x, tiles_y = width // TILE, height // TILE
    attrs = pack_instance_attrs(mean2d, conic, color, opacity, binning)
    acc, final_T = _blend_core(attrs, binning.tile_ranges,
                               binning.chunk_map, binning.n_live_chunks,
                               tiles_x, tiles_y)
    image = acc + final_T[..., None] * bg
    return image, final_T
