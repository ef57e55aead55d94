"""Pallas TPU planar (PGSR) blend kernels: forward + analytic backward.

TPU re-design of diff-plane-rasterization renderCUDA fwd/bwd
(cuda_rasterizer/forward.cu:280-405, backward.cu:400-603). Same skeleton as
the vanilla kernels with the planar payload:

* 4 extra blended channels — camera-space normal (3) and plane distance —
  the reference's 5-channel all_map; its constant-1 channel equals 1-T and
  is not blended separately.
* per-pixel plane depth (distance / -(n . ray + 1e-8), forward.cu:403-405)
  is computed OUTSIDE the kernel in jnp from the blended maps, so XLA
  autodiff replaces the CUDA hand-written plane-depth backward
  (backward.cu:471-484).
* out_observe (pixels with blend-T > 0.5 per gaussian, forward.cu:380-383)
  is a per-instance forward output, segment-summed outside.
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
    _interpret,
    _pixel_cols,
    _prefix_prod_excl_lanes,
    _prefix_sum_lanes,
    _total_prod_lanes,
    gather_rows_auto,
)
from gssr_tpu.ops.projection import TILE

# attribute rows, layout [NUM_ATTRS_P, I]
P_MX, P_MY = 0, 1
P_CXX, P_CXY, P_CYY = 2, 3, 4
P_OP = 5
P_RGB = 6         # 6-8
P_NRM = 9         # 9-11 camera-space normal
P_DIST = 12       # plane distance
P_OBS = 13        # zero input; bwd writes per-instance observe counts here
P_ABSX, P_ABSY = 14, 15   # zero inputs; bwd writes |mean2d grad| here
NUM_ATTRS_P = 16

# output columns
PO_RGB = 0        # 0-2
PO_T = 3
PO_NRM = 4        # 4-6
PO_DIST = 7
OUTP_ROWS = 8

OBS_ROWS = 8      # observe output sublane padding; row 0 used


def _chunk_alpha_p(A, px, py):
    """Filler / non-hit lanes arrive with all-zero attrs (pack multiplies
    binning.hit): power 0, raw 0 fails the alpha >= 1/255 gate, so they are
    exact no-op lanes with no validity side channel.
    """
    r = lambda i: A[i:i + 1, :]
    dx = r(P_MX) - px
    dy = r(P_MY) - py
    cxx, cxy, cyy = r(P_CXX), r(P_CXY), r(P_CYY)
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    g_exp = jnp.exp(power)
    raw = r(P_OP) * g_exp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(ok, alpha, 0.0)
    return a, (dx, dy, g_exp, raw, ok)


def _fwdp_kernel(tiles_x, cmap_ref, nlive_ref, attrs_ref, out_ref,
                 obs_ref, state_ref):
    i = pl.program_id(0)
    t = cmap_ref[i]
    live = i < nlive_ref[0]
    # every chunk writes its observe slice (zeros when dead)
    obs_ref[:, :] = jnp.zeros((OBS_ROWS, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        first = jnp.logical_or(i == 0, cmap_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(first)
        def _():
            out_ref[0] = jnp.zeros((PIX, OUTP_ROWS), jnp.float32)
            out_ref[0, :, PO_T:PO_T + 1] = jnp.ones((PIX, 1), jnp.float32)
            state_ref[:] = jnp.ones((PIX, 2), jnp.float32)

        @pl.when(jnp.max(state_ref[:, 0]) >= T_EPS)
        def _():
            px, py = _pixel_cols(t, tiles_x)
            A = attrs_ref[:, :]
            a, _extras = _chunk_alpha_p(A, px, py)
            one_m = 1.0 - a
            pfx = _prefix_prod_excl_lanes(one_m)
            d_before = state_ref[:, 0:1] * pfx
            d_inc = d_before * one_m
            contrib = (a > 0.0) & (d_inc >= T_EPS)
            w = jnp.where(contrib, a * d_before, 0.0)
            for c in range(3):
                out_ref[0, :, PO_RGB + c:PO_RGB + c + 1] += jnp.sum(
                    w * A[P_RGB + c:P_RGB + c + 1, :], axis=1, keepdims=True)
                out_ref[0, :, PO_NRM + c:PO_NRM + c + 1] += jnp.sum(
                    w * A[P_NRM + c:P_NRM + c + 1, :], axis=1, keepdims=True)
            out_ref[0, :, PO_DIST:PO_DIST + 1] += jnp.sum(
                w * A[P_DIST:P_DIST + 1, :], axis=1, keepdims=True)
            # out_observe: pixels whose blend-T before this gaussian > 0.5
            obs_ref[0:1, :] = jnp.sum(
                jnp.where(contrib & (d_before > 0.5), 1.0, 0.0),
                axis=0, keepdims=True)
            state_ref[:, 0:1] = state_ref[:, 0:1] * (pfx[:, -1:]
                                                     * one_m[:, -1:])
            state_ref[:, 1:2] = state_ref[:, 1:2] * _total_prod_lanes(
                jnp.where(contrib, one_m, 1.0))
            out_ref[0, :, PO_T:PO_T + 1] = state_ref[:, 1:2]


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
            dC = cot_ref[0, :, PO_RGB:PO_RGB + 3]       # (PIX, 3)
            dT = cot_ref[0, :, PO_T:PO_T + 1]
            dN = cot_ref[0, :, PO_NRM:PO_NRM + 3]
            dDist = cot_ref[0, :, PO_DIST:PO_DIST + 1]
            final_T = fwd_ref[0, :, PO_T:PO_T + 1]

            def u_of(A):
                u = A[P_DIST:P_DIST + 1, :] * dDist
                for c in range(3):
                    u += A[P_RGB + c:P_RGB + c + 1, :] * dC[:, c:c + 1]
                    u += A[P_NRM + c:P_NRM + c + 1, :] * dN[:, c:c + 1]
                return u

            # total = sum_i w_i u_i: every u channel (rgb, normal,
            # distance) is linear in w, so the pass-1 walk the CUDA
            # backward does reduces to contracting the forward accumulators
            # with their cotangents.
            total = dDist * fwd_ref[0, :, PO_DIST:PO_DIST + 1]
            for _c in range(3):
                total += dC[:, _c:_c + 1] * fwd_ref[0, :, PO_RGB + _c:
                                                    PO_RGB + _c + 1]
                total += dN[:, _c:_c + 1] * fwd_ref[0, :, PO_NRM + _c:
                                                    PO_NRM + _c + 1]
            bgterm = final_T * dT

            A = attrs_ref[:, :]
            a, (dx, dy, g_exp, raw, ok) = _chunk_alpha_p(A, px, py)
            one_m = 1.0 - a
            pfx = _prefix_prod_excl_lanes(one_m)
            d_before = state_ref[:, 0:1] * pfx
            contrib = (a > 0.0) & (d_before * one_m >= T_EPS)
            w = jnp.where(contrib, a * d_before, 0.0)
            u = u_of(A)
            wu = w * u
            prefix_inc = state_ref[:, 2:3] + _prefix_sum_lanes(wu, False)
            suffix = total - prefix_inc
            inv1ma = 1.0 / one_m
            da = jnp.where(contrib,
                           d_before * u - (suffix + bgterm) * inv1ma, 0.0)
            unclamped = raw < ALPHA_MAX
            da_eff = jnp.where(ok & unclamped, da, 0.0)
            dpower = da_eff * raw
            r = lambda j: A[j:j + 1, :]
            cxx, cxy, cyy = r(P_CXX), r(P_CXY), r(P_CYY)
            gx = dpower * -(cxx * dx + cxy * dy)
            gy = dpower * -(cyy * dy + cxy * dx)
            sm = lambda v: jnp.sum(v, axis=0, keepdims=True)
            # rows in P_* order: mx my cxx cxy cyy op rgb nrm dist
            # obs absx absy — abs screen grads per backward.cu:602-603
            rows = ([sm(gx), sm(gy),
                     sm(dpower * (-0.5 * dx * dx)),
                     sm(dpower * (-dx * dy)),
                     sm(dpower * (-0.5 * dy * dy)),
                     sm(da_eff * g_exp)]
                    + [sm(w * dC[:, c:c + 1]) for c in range(3)]
                    + [sm(w * dN[:, c:c + 1]) for c in range(3)]
                    + [sm(w * dDist),
                       # observe counts ride the gradient scatter for free
                       # (forward.cu:380-383 out_observe, gathered on the
                       # backward's existing per-gaussian reduction)
                       sm(jnp.where(contrib & (d_before > 0.5), 1.0, 0.0)),
                       sm(jnp.abs(gx)), sm(jnp.abs(gy))])
            dattr_ref[:, :] = jnp.concatenate(rows, axis=0)
            state_ref[:, 2:3] = state_ref[:, 2:3] + jnp.sum(
                wu, axis=1, keepdims=True)
            state_ref[:, 0:1] = state_ref[:, 0:1] * (pfx[:, -1:]
                                                     * one_m[:, -1:])


# ---------------------------------------------------------------------------
# wrappers + custom VJP
# ---------------------------------------------------------------------------

def _run_fwdp(attrs, cmap, nlive, tiles_x: int, tiles_y: int):
    num_tiles = tiles_x * tiles_y
    n_chunks = attrs.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((NUM_ATTRS_P, CHUNK),
                               lambda i, cmap, nl: (0, i))],
        out_specs=(
            pl.BlockSpec((1, PIX, OUTP_ROWS),
                         lambda i, cmap, nl: (cmap[i], 0, 0)),
            pl.BlockSpec((OBS_ROWS, CHUNK), lambda i, cmap, nl: (0, i)),
        ),
        scratch_shapes=[pltpu.VMEM((PIX, 2), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwdp_kernel, tiles_x),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, PIX, OUTP_ROWS), jnp.float32),
            jax.ShapeDtypeStruct((OBS_ROWS, attrs.shape[1]), jnp.float32),
        ),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _blendp_core(attrs, cmap, nlive, tiles_x, tiles_y):
    out, obs = _run_fwdp(attrs, cmap, nlive, tiles_x, tiles_y)
    return _tiles_to_rows(out, tiles_x, tiles_y), obs


def _blendp_core_fwd(attrs, cmap, nlive, tiles_x, tiles_y):
    out, obs = _run_fwdp(attrs, cmap, nlive, tiles_x, tiles_y)
    return (_tiles_to_rows(out, tiles_x, tiles_y), obs), \
        (attrs, cmap, nlive, out)


def _blendp_core_bwd(tiles_x, tiles_y, res, cotangents):
    attrs, cmap, nlive, fwd_out = res
    g_rows, _g_obs = cotangents            # observe output: no gradient
    cot = _rows_to_tiles(g_rows, tiles_x, tiles_y)
    dattrs = _run_bwdp(attrs, cmap, nlive, fwd_out, cot, tiles_x, tiles_y)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return dattrs, f0(cmap), f0(nlive)


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
    rows, obs = _blendp_core(attrs, binning.chunk_map,
                             binning.n_live_chunks, tiles_x, tiles_y)
    # tiles with no instances are never visited by the flat-chunk grid;
    # splice in the empty render (all-zero channels, T = 1)
    from gssr_tpu.ops.blend_pallas import tile_nonempty_mask
    ne = tile_nonempty_mask(binning.tile_counts, tiles_x, tiles_y)
    empty_rows = jnp.zeros((OUTP_ROWS,), jnp.float32).at[PO_T].set(1.0)
    rows = jnp.where(ne[..., None], rows, empty_rows)
    return PlanarMaps(rows, obs)
