"""Pallas TPU planar (PGSR) blend kernels: forward + analytic backward.

TPU re-design of diff-plane-rasterization renderCUDA fwd/bwd
(cuda_rasterizer/forward.cu:280-405, backward.cu:400-603). Same skeleton as
the vanilla kernels (per-16x16-tile forward grid with double-buffered chunk
DMA, early-stop DMA skip, cross-program head-buffer prefetch; flat-chunk
backward grid; MXU dot_general channel accumulation and the tile-local
moment-matmul backward) with the planar payload:

* 4 extra blended channels — camera-space normal (3) and plane distance —
  the reference's 5-channel all_map; its constant-1 channel equals 1-T and
  is not blended separately. All 7 channels (rgb+normal+distance) ride ONE
  (PIX, CHUNK) @ (CHUNK, 7) MXU contraction per chunk.
* per-pixel plane depth (distance / -(n . ray + 1e-8), forward.cu:403-405)
  is computed OUTSIDE the kernel in jnp from the blended maps, so XLA
  autodiff replaces the CUDA hand-written plane-depth backward
  (backward.cu:471-484).
* out_observe (pixels with blend-T > 0.5 per gaussian, forward.cu:380-383)
  lives in a SEPARATE forward-only kernel (_obsp_kernel) so the hot forward
  pays nothing for it: training reads observe from the backward's gradient
  side channel (P_OBS row), and eval never consumes it — XLA dead-code
  eliminates the observe kernel in both cases. Only the forward-parity
  path (tests, reference comparison) actually runs it.
* abs screen-gradients (backward.cu:602-603) are written to dedicated attr
  rows whose gather-VJP scatter-adds them onto a zero dummy input — the
  JAX equivalent of the reference's means2D_abs retain_grad trick.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gssr_tpu.ops.binning import Binning
from gssr_tpu.ops.blend_pallas import (
    ALPHA_MAX,
    ALPHA_MIN,
    CHUNK,
    PIX,
    T_EPS,
    _chunk_alpha,
    _interpret,
    _pixel_cols,
    _prefix_prod_excl_lanes,
    _prefix_sum_lanes,
    gather_rows_auto,
)
from gssr_tpu.ops.projection import TILE

# attribute rows, layout [NUM_ATTRS_P, I]. Rows 0-5 match the vanilla
# layout so _chunk_alpha is shared.
P_MX, P_MY = 0, 1
P_CXX, P_CXY, P_CYY = 2, 3, 4
P_OP = 5
P_RGB = 6         # 6-8
P_NRM = 9         # 9-11 camera-space normal
P_DIST = 12       # plane distance
P_OBS = 13        # zero input; bwd writes per-instance observe counts here
P_ABSX, P_ABSY = 14, 15   # zero inputs; bwd writes |mean2d grad| here
NUM_ATTRS_P = 16
NCH = 7           # blended channels rgb+nrm+dist = attr rows 6..12

# output columns: the 7 blended channels lead so the backward's cotangent
# block is one contiguous (PIX, 7) slice for its MXU contractions; T last.
PO_RGB = 0        # 0-2
PO_NRM = 3        # 3-5
PO_DIST = 6
PO_T = 7
OUTP_ROWS = 8

OBS_ROWS = 8      # observe output sublane padding; row 0 used


# ---------------------------------------------------------------------------
# Forward kernel — per-TILE grid (see blend_pallas._fwd_kernel for the
# early-stop / head-buffer rationale)
# ---------------------------------------------------------------------------

def _fwdp_kernel(tiles_x, num_tiles, ranges_ref, attrs_ref, out_ref,
                 abuf, hbuf, state_ref, sem, hsem):
    t = pl.program_id(0)
    start = pl.multiple_of(ranges_ref[t], CHUNK)
    end = ranges_ref[t + 1]
    total = ranges_ref[num_tiles]
    nchunks = (end - start) // CHUNK

    px, py = _pixel_cols(t, tiles_x)
    out_ref[0] = jnp.zeros((PIX, OUTP_ROWS), jnp.float32)
    out_ref[0, :, PO_T:PO_T + 1] = jnp.ones((PIX, 1), jnp.float32)
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
        # rgb+normal+distance accumulation as ONE (PIX,CHUNK)@(CHUNK,7)
        # MXU matmul instead of 7 lane-reductions
        out_ref[0, :, 0:NCH] += jax.lax.dot_general(
            w, A[P_RGB:P_DIST + 1, :], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        # blended-only transmittance via the min-of-d_inc identity (see
        # blend_pallas chunk_step) — no second prefix product
        mind = jnp.min(jnp.where(contrib, d_inc, 3.0e38), axis=1,
                       keepdims=True)
        state_ref[:, 0:1] = d0 * (pfx[:, -1:] * one_m[:, -1:])
        state_ref[:, 1:2] = state_ref[:, 1:2] * jnp.where(
            mind < 3.0e38, mind / jnp.maximum(d0, 1e-30), 1.0)
        out_ref[0, :, PO_T:PO_T + 1] = state_ref[:, 1:2]

    @pl.when(nchunks > 0)
    def _():
        # chunk 0 via the cross-program head buffer: predecessor prefetched
        # it; the first nonempty tile cold-starts the chain
        @pl.when(start == 0)
        def _():
            head_copy(0).start()
        head_copy(start).wait()

        @pl.when(nchunks > 1)
        def _():
            in_copy(1, 1).start()

        chunk_step(hbuf[:, :], 0)

        @pl.when(end < total)
        def _():
            head_copy(end).start()

        def body(k, pending):
            slot = jax.lax.rem(k, 2)

            @pl.when(pending == 1)
            def _():
                in_copy(k, slot).wait()

            alive = jnp.max(state_ref[:, 0]) >= T_EPS
            do = (pending == 1) & alive
            fetch_next = do & (k + 1 < nchunks)

            @pl.when(fetch_next)
            def _():
                in_copy(k + 1, 1 - slot).start()

            @pl.when(do)
            def _():
                chunk_step(abuf[slot], k)

            return jnp.where(fetch_next, jnp.int32(1), jnp.int32(0))

        jax.lax.fori_loop(1, nchunks, body, jnp.int32(nchunks > 1))


# ---------------------------------------------------------------------------
# Observe kernel — forward-only re-walk producing per-instance out_observe
# (forward.cu:380-383). Flat-chunk grid; runs ONLY when a caller actually
# consumes forward observe (XLA DCE removes it otherwise): the training
# path reads observe from the backward's P_OBS gradient row instead.
# ---------------------------------------------------------------------------

def _obsp_kernel(tiles_x, cmap_ref, nlive_ref, attrs_ref, obs_ref,
                 state_ref):
    i = pl.program_id(0)
    t = cmap_ref[i]
    live = i < nlive_ref[0]
    obs_ref[:, :] = jnp.zeros((OBS_ROWS, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        first = jnp.logical_or(i == 0, cmap_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(first)
        def _():
            state_ref[:] = jnp.ones((PIX, 1), jnp.float32)

        @pl.when(jnp.max(state_ref[:, 0]) >= T_EPS)
        def _():
            px, py = _pixel_cols(t, tiles_x)
            a, _ = _chunk_alpha(attrs_ref[:, :], px, py)
            one_m = 1.0 - a
            pfx = _prefix_prod_excl_lanes(one_m)
            d_before = state_ref[:, 0:1] * pfx
            contrib = (a > 0.0) & (d_before * one_m >= T_EPS)
            obs_ref[0:1, :] = jnp.sum(
                jnp.where(contrib & (d_before > 0.5), 1.0, 0.0),
                axis=0, keepdims=True)
            state_ref[:, 0:1] = state_ref[:, 0:1] * (pfx[:, -1:]
                                                     * one_m[:, -1:])


# ---------------------------------------------------------------------------
# Backward kernel (forward-order re-walk, flat-chunk grid)
# ---------------------------------------------------------------------------

def _bwdp_kernel(tiles_x, cmap_ref, nlive_ref, attrs_ref, fwd_ref,
                 cot_ref, dattr_ref, state_ref):
    i = pl.program_id(0)
    t = cmap_ref[i]
    live = i < nlive_ref[0]
    dattr_ref[:, :] = jnp.zeros((NUM_ATTRS_P, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        first = jnp.logical_or(i == 0, cmap_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(first)
        def _():
            state_ref[:] = jnp.zeros((PIX, 4), jnp.float32)
            state_ref[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)

        @pl.when(jnp.max(state_ref[:, 0]) >= T_EPS)
        def _():
            px, py = _pixel_cols(t, tiles_x)
            dch = cot_ref[0, :, 0:NCH]                # (PIX, 7) rgb nrm dist
            dT = cot_ref[0, :, PO_T:PO_T + 1]
            final_T = fwd_ref[0, :, PO_T:PO_T + 1]
            bgterm = final_T * dT
            # total = sum_i w_i (payload_i . dch): every channel is linear
            # in w, so the CUDA pass-1 walk reduces to contracting the
            # forward accumulators with their cotangents.
            total = jnp.sum(fwd_ref[0, :, 0:NCH] * dch, axis=1,
                            keepdims=True)

            # tile-LOCAL pixel polynomial basis — see blend_pallas
            # _bwd_kernel for the cancellation rationale
            ox = px[0:1, :]
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
            # u[p,i] = payload_i . dch_p as one (PIX,7)@(7,CHUNK) matmul
            u = jax.lax.dot_general(
                dch, A[P_RGB:P_DIST + 1, :], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            wu = w * u
            prefix_inc = state_ref[:, 2:3] + _prefix_sum_lanes(wu, False)
            suffix = total - prefix_inc
            inv1ma = 1.0 / one_m
            da = jnp.where(contrib,
                           d_before * u - (suffix + bgterm) * inv1ma,
                           0.0)
            unclamped = raw < ALPHA_MAX
            da_eff = jnp.where(ok & unclamped, da, 0.0)
            dpower = da_eff * raw
            # geometry/opacity rows via the tile-local moment matmul —
            # ONE (6,PIX)@(PIX,CHUNK) MXU contraction (see blend_pallas)
            M = jax.lax.dot_general(
                poly, dpower, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # (6, CHUNK)
            m0, m_x, m_y = M[0:1, :], M[1:2, :], M[2:3, :]
            mxx, mxy, myy = M[3:4, :], M[4:5, :], M[5:6, :]
            r = lambda j: A[j:j + 1, :]
            cxx, cxy, cyy = r(P_CXX), r(P_CXY), r(P_CYY)
            gx_m = r(P_MX) - ox            # mean in the tile-local frame
            gy_m = r(P_MY) - oy
            ex = gx_m * m0 - m_x           # sum_p dpower * dx
            ey = gy_m * m0 - m_y
            sxx = gx_m * (gx_m * m0 - 2.0 * m_x) + mxx
            sxy = gx_m * ey - gy_m * m_x + mxy
            syy = gy_m * (gy_m * m0 - 2.0 * m_y) + myy
            rows6 = [
                -(cxx * ex + cxy * ey),
                -(cyy * ey + cxy * ex),
                -0.5 * sxx,
                -sxy,
                -0.5 * syy,
                m0 / jnp.maximum(r(P_OP), 1e-20),
            ]
            # channel rows: one (7,PIX)@(PIX,CHUNK) matmul
            crows = jax.lax.dot_general(
                dch, w, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # (7, CHUNK)
            # abs screen grads (backward.cu:602-603) need the elementwise
            # per-pixel contributions (|.| breaks the moment factorization)
            gx = dpower * -(cxx * dx + cxy * dy)
            gy = dpower * -(cyy * dy + cxy * dx)
            sm = lambda v: jnp.sum(v, axis=0, keepdims=True)
            # observe counts ride the gradient scatter for free
            # (forward.cu:380-383 out_observe)
            obs = sm(jnp.where(contrib & (d_before > 0.5), 1.0, 0.0))
            dattr_ref[:, :] = jnp.concatenate(
                rows6 + [crows, obs, sm(jnp.abs(gx)), sm(jnp.abs(gy))],
                axis=0)
            state_ref[:, 2:3] = prefix_inc[:, -1:]
            state_ref[:, 0:1] = state_ref[:, 0:1] * (pfx[:, -1:]
                                                     * one_m[:, -1:])


# ---------------------------------------------------------------------------
# wrappers + custom VJP
# ---------------------------------------------------------------------------

def _run_fwdp(attrs, ranges, tiles_x: int, tiles_y: int):
    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, PIX, OUTP_ROWS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ATTRS_P, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_ATTRS_P, CHUNK), jnp.float32),
            pltpu.VMEM((PIX, 2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwdp_kernel, tiles_x, num_tiles),
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, OUTP_ROWS),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(ranges, attrs)


def _run_obsp(attrs, cmap, nlive, tiles_x: int, tiles_y: int):
    n_chunks = attrs.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((NUM_ATTRS_P, CHUNK),
                               lambda i, cmap, nl: (0, i))],
        out_specs=pl.BlockSpec((OBS_ROWS, CHUNK),
                               lambda i, cmap, nl: (0, i)),
        scratch_shapes=[pltpu.VMEM((PIX, 1), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_obsp_kernel, tiles_x),
        out_shape=jax.ShapeDtypeStruct((OBS_ROWS, attrs.shape[1]),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(cmap, nlive, attrs)


def _run_bwdp(attrs, cmap, nlive, fwd_out, cot, tiles_x: int,
              tiles_y: int):
    n_chunks = attrs.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((NUM_ATTRS_P, CHUNK), lambda i, cmap, nl: (0, i)),
            pl.BlockSpec((1, PIX, OUTP_ROWS),
                         lambda i, cmap, nl: (cmap[i], 0, 0)),
            pl.BlockSpec((1, PIX, OUTP_ROWS),
                         lambda i, cmap, nl: (cmap[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((NUM_ATTRS_P, CHUNK),
                               lambda i, cmap, nl: (0, i)),
        scratch_shapes=[pltpu.VMEM((PIX, 4), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwdp_kernel, tiles_x),
        out_shape=jax.ShapeDtypeStruct(attrs.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(cmap, nlive, attrs, fwd_out, cot)


def _tiles_to_rows(out, tiles_x, tiles_y):
    x = out.reshape(tiles_y, tiles_x, TILE, TILE, OUTP_ROWS)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(tiles_y * TILE, tiles_x * TILE, OUTP_ROWS)


def _rows_to_tiles(rows, tiles_x, tiles_y):
    H, W, _ = rows.shape
    x = rows.reshape(tiles_y, TILE, tiles_x, TILE, OUTP_ROWS)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(tiles_y * tiles_x, PIX, OUTP_ROWS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _blendp_core(attrs, ranges, cmap, nlive, tiles_x, tiles_y):
    out = _run_fwdp(attrs, ranges, tiles_x, tiles_y)
    return _tiles_to_rows(out, tiles_x, tiles_y)


def _blendp_core_fwd(attrs, ranges, cmap, nlive, tiles_x, tiles_y):
    out = _run_fwdp(attrs, ranges, tiles_x, tiles_y)
    return _tiles_to_rows(out, tiles_x, tiles_y), \
        (attrs, cmap, nlive, out)


def _blendp_core_bwd(tiles_x, tiles_y, res, g_rows):
    attrs, cmap, nlive, fwd_out = res
    cot = _rows_to_tiles(g_rows, tiles_x, tiles_y)
    dattrs = _run_bwdp(attrs, cmap, nlive, fwd_out, cot, tiles_x, tiles_y)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (dattrs, np.zeros((tiles_x * tiles_y + 1,), jax.dtypes.float0),
            f0(cmap), f0(nlive))


_blendp_core.defvjp(_blendp_core_fwd, _blendp_core_bwd)


def pack_instance_attrs_pgsr(mean2d, conic, color, opacity, normal, distance,
                             obs_dummy, abs_dummy, binning: Binning):
    """obs_dummy [N,1] / abs_dummy [N,2] zeros — their gather-VJP columns
    receive the per-gaussian observe counts and abs screen grads (both
    written by the backward kernel), riding the one scatter-add that the
    real gradients already pay for.
    Single packed [N, A] gather (see vanilla pack_instance_attrs)."""
    per_gauss = jnp.concatenate([
        mean2d, conic, opacity[:, None], color, normal, distance[:, None],
        obs_dummy, abs_dummy], axis=1)
    # zero filler / non-ellipse-hit lanes -> exact alpha=0 no-ops; the
    # gradient reduction scatters/sorts ALL 16 columns (P_OBS/P_ABS ride it)
    return (gather_rows_auto(per_gauss, binning, NUM_ATTRS_P)
            * binning.hit[:, None]).T


class PlanarMaps:
    def __init__(self, rows, observe_inst):
        self.color = rows[..., PO_RGB:PO_RGB + 3]
        self.final_T = rows[..., PO_T]
        self.normal = rows[..., PO_NRM:PO_NRM + 3]
        self.distance = rows[..., PO_DIST]
        self.observe_inst = observe_inst     # [OBS_ROWS, I], row 0


def blend_pgsr_pallas(mean2d, conic, color, opacity, normal, distance,
                      obs_dummy, abs_dummy, binning: Binning,
                      width: int, height: int) -> PlanarMaps:
    assert width % TILE == 0 and height % TILE == 0
    tiles_x, tiles_y = width // TILE, height // TILE
    attrs = pack_instance_attrs_pgsr(mean2d, conic, color, opacity, normal,
                                     distance, obs_dummy, abs_dummy, binning)
    rows = _blendp_core(attrs, binning.tile_ranges, binning.chunk_map,
                        binning.n_live_chunks, tiles_x, tiles_y)
    # forward out_observe from its dedicated lazy kernel: XLA DCEs this
    # whole branch unless a caller actually consumes forward observe
    obs = _run_obsp(jax.lax.stop_gradient(attrs), binning.chunk_map,
                    binning.n_live_chunks, tiles_x, tiles_y)
    return PlanarMaps(rows, obs)
