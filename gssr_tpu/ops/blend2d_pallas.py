"""Pallas TPU surfel (2DGS) blend kernels: forward + analytic backward.

TPU re-design of diff-surfel-rasterization renderCUDA fwd/bwd
(cuda_rasterizer/forward.cu:261-446, backward.cu:144-448). Same skeleton as
the vanilla kernels (chunked depth-ordered instances per 16x16 tile,
attribute-major lane-aligned layout, (PIX, CHUNK) math orientation,
prefix-product transmittance, two forward-order backward passes) with the
surfel payload: per-pixel ray-splat intersection through the 3x3 homogeneous
transform T, min(rho3d, rho2d) low-pass, and the auxiliary channels
(expected depth, blended normal, median depth, depth distortion).

The distortion backward avoids CUDA's running-accumulator reversal: since
1 - T_i telescopes to sum_{j<i} w_j, the per-pixel distortion equals the
pairwise form sum_{j<i} w_i w_j (m_i - m_j)^2, whose gradient needs only the
totals S0 = sum w, S1 = sum w m, S2 = sum w m^2 — computed in pass 1.
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
    gather_rows_auto,
)
from gssr_tpu.ops.projection import TILE

# attribute rows, layout [NUM_ATTRS2, I].
#
# The ray-splat intersection point s = cross(k, l) with k = px*Tw - Tu,
# l = py*Tw - Tv expands by bilinearity (cross(Tw, Tw) = 0) to
#     s = cross(Tu, Tv) - px*cross(Tw, Tv) - py*cross(Tu, Tw)
#       =: CA - px*CB - py*CC,
# so the three cross products are PER-GAUSSIAN invariants, computed once
# in the XLA pack stage instead of per (pixel, instance) inside the
# kernel — that removes the k/l assembly and the 9-op cross product from
# the forward and the two adjoint cross products from the backward
# (~30% of the per-pixel VPU work). Tw still rides along for the
# per-splat depth s0*Tw0 + s1*Tw1 + Tw2. Gradients flow back to the T
# matrix through the pack's jnp cross products (XLA autodiff).
A_XY = 0          # 0-1  mean2d (low-pass center)
A_CA = 2          # 2-4  cross(Tu, Tv)
A_CB = 5          # 5-7  cross(Tw, Tv)
A_CC = 8          # 8-10 cross(Tu, Tw)
A_TW = 11         # 11-13
A_OP = 14
A_RGB = 15        # 15-17
A_NRM = 18        # 18-20
NUM_ATTRS2 = 24

# output columns: rgb+normal lead as one contiguous 6-block so the forward
# accumulates them with a single (PIX,CHUNK)@(CHUNK,6) MXU matmul and the
# backward reads their cotangents as one (PIX,6) slice
O_RGB = 0         # 0-2
O_NRM = 3         # 3-5
O_D = 6
O_DIST = 7
O_T = 8
O_MED = 9
O_SELPOS = 10
O_MEDNRM = 11     # 11-13
O_S1 = 14         # distortion total S1 = sum w*m (internal, for backward)
O_S2 = 15         # distortion total S2 = sum w*m^2
OUT2_ROWS = 16

NEAR_N = 0.2
FAR_N = 100.0
M_COEF = FAR_N / (FAR_N - NEAR_N)


def _surfel_alpha(A, px, py):
    """Per-(pixel, instance) surfel evaluation for one chunk.

    A: (NUM_ATTRS2, CHUNK). Returns (a, aux), a is (PIX, CHUNK). Filler /
    non-hit lanes arrive with all-zero attrs (pack multiplies binning.hit),
    which fails pz_ok and the depth >= near gate — exact no-op lanes with
    no validity side channel.
    """
    r = lambda i: A[i:i + 1, :]
    tw0, tw1, tw2 = r(A_TW), r(A_TW + 1), r(A_TW + 2)

    # s = CA - px*CB - py*CC (see the attr-layout comment above)
    p0 = r(A_CA) - px * r(A_CB) - py * r(A_CC)           # (PIX, CHUNK)
    p1 = r(A_CA + 1) - px * r(A_CB + 1) - py * r(A_CC + 1)
    p2 = r(A_CA + 2) - px * r(A_CB + 2) - py * r(A_CC + 2)
    pz_ok = p2 != 0.0
    pz = jnp.where(pz_ok, p2, 1.0)
    rpz = 1.0 / pz          # one reciprocal, shared with the backward
    # clamped: degenerate splats otherwise blow up the backward chain
    s0 = jnp.clip(p0 * rpz, -1e4, 1e4)
    s1 = jnp.clip(p1 * rpz, -1e4, 1e4)
    rho3d = s0 * s0 + s1 * s1
    dx = r(A_XY) - px
    dy = r(A_XY + 1) - py
    rho2d = 2.0 * (dx * dx + dy * dy)
    is3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(is3d, s0 * tw0 + s1 * tw1 + tw2, tw2 + 0.0 * s0)
    g_exp = jnp.exp(-0.5 * rho)
    raw = r(A_OP) * g_exp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    ok = (pz_ok & (depth >= NEAR_N)
          & (alpha >= ALPHA_MIN))
    a = jnp.where(ok, alpha, 0.0)
    safe_depth = jnp.maximum(depth, 1e-6)
    m = M_COEF * (1.0 - NEAR_N / safe_depth)
    aux = dict(rpz=rpz, s0=s0, s1=s1,
               dx=dx, dy=dy, is3d=is3d, depth=depth, safe_depth=safe_depth,
               m=m, g_exp=g_exp, raw=raw, ok=ok)
    return a, aux


def _fwd2_kernel(tiles_x, num_tiles, ranges_ref, attrs_ref, out_ref,
                 abuf, hbuf, acc_ref, state_ref, sem, hsem):
    t = pl.program_id(0)
    start = pl.multiple_of(ranges_ref[t], CHUNK)
    end = ranges_ref[t + 1]
    total = ranges_ref[num_tiles]
    nchunks = (end - start) // CHUNK

    px, py = _pixel_cols(t, tiles_x)
    acc_ref[:] = jnp.zeros((PIX, OUT2_ROWS), jnp.float32)
    acc_ref[:, O_SELPOS:O_SELPOS + 1] = -jnp.ones((PIX, 1), jnp.float32)
    # state cols: 0 D(all-valid T), 1 Tb(blend T), 2 M1, 3 M2
    state_ref[:] = jnp.zeros((PIX, 4), jnp.float32)
    state_ref[:, 0:2] = jnp.ones((PIX, 2), jnp.float32)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (PIX, CHUNK), 1)

    def in_copy(k, slot):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(start + k * CHUNK, CHUNK)],
            abuf.at[slot], sem.at[slot])

    def head_copy(offset):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(pl.multiple_of(offset, CHUNK), CHUNK)],
            hbuf, hsem)

    def chunk_step(A, k):
        a, aux = _surfel_alpha(A, px, py)
        one_m = 1.0 - a
        pfx = _prefix_prod_excl_lanes(one_m)
        d0 = state_ref[:, 0:1]
        d_before = d0 * pfx
        d_inc = d_before * one_m
        contrib = (a > 0.0) & (d_inc >= T_EPS)
        w = jnp.where(contrib, a * d_before, 0.0)

        depth = aux["depth"]
        m = aux["m"]
        wm = w * m
        # rgb+normal accumulation: ONE (PIX,CHUNK)@(CHUNK,6) MXU matmul
        # instead of 6 lane reductions; HIGHEST keeps f32 accuracy
        # (Mosaic supports only DEFAULT and HIGHEST dot precisions)
        acc_ref[:, O_RGB:O_RGB + 6] += jax.lax.dot_general(
            w, A[A_RGB:A_NRM + 3, :], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

        # median (last contributing instance with blend-T > 0.5)
        med_mask = contrib & (d_before > 0.5)
        idx1 = jnp.max(jnp.where(med_mask, gidx + 1, 0), axis=1,
                       keepdims=True)                       # (PIX, 1)
        has = idx1 > 0
        ohf = jnp.where((gidx + 1) == idx1, 1.0, 0.0)
        sel_n = jax.lax.dot_general(
            ohf, A[A_NRM:A_NRM + 3, :], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # (PIX, 3)
        acc_ref[:, O_MEDNRM:O_MEDNRM + 3] = jnp.where(
            has, sel_n, acc_ref[:, O_MEDNRM:O_MEDNRM + 3])

        # distortion: per-instance prefix accumulators. The EXCLUSIVE
        # prefixes feed the distortion term, and their last INCLUSIVE
        # column is the chunk total — the M1/M2 state updates come free
        # out of the same shift-add chains (no extra reduction).
        A_bef = 1.0 - d_before
        wmm = wm * m
        pfx_wm = _prefix_sum_lanes(wm, False)               # inclusive
        pfx_wmm = _prefix_sum_lanes(wmm, False)
        M1_bef = state_ref[:, 2:3] + pfx_wm - wm
        M2_bef = state_ref[:, 3:4] + pfx_wmm - wmm
        distt = (m * m * A_bef + M2_bef - 2.0 * m * M1_bef) * w
        acc_ref[:, O_D:O_D + 1] += jnp.sum(w * depth, axis=1,
                                           keepdims=True)
        acc_ref[:, O_DIST:O_DIST + 1] += jnp.sum(distt, axis=1,
                                                 keepdims=True)
        state_ref[:, 2:3] += pfx_wm[:, -1:]
        state_ref[:, 3:4] += pfx_wmm[:, -1:]
        acc_ref[:, O_MED:O_MED + 1] = jnp.where(
            has, jnp.sum(ohf * depth, axis=1, keepdims=True),
            acc_ref[:, O_MED:O_MED + 1])
        acc_ref[:, O_SELPOS:O_SELPOS + 1] = jnp.where(
            has, (k * CHUNK + idx1 - 1).astype(jnp.float32),
            acc_ref[:, O_SELPOS:O_SELPOS + 1])

        # blended-only transmittance via the min-of-d_inc identity (see
        # blend_pallas chunk_step) — no second prefix product
        mind = jnp.min(jnp.where(contrib, d_inc, 3.0e38), axis=1,
                       keepdims=True)
        state_ref[:, 0:1] = d0 * (pfx[:, -1:] * one_m[:, -1:])
        state_ref[:, 1:2] = state_ref[:, 1:2] * jnp.where(
            mind < 3.0e38, mind / jnp.maximum(d0, 1e-30), 1.0)

    @pl.when(nchunks > 0)
    def _():
        # chunk 0 via the cross-program head buffer (see blend_pallas
        # _fwd_kernel): predecessor prefetched it; first nonempty tile
        # cold-starts the chain
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

    acc_ref[:, O_T:O_T + 1] = state_ref[:, 1:2]
    # distortion totals for the backward (replaces its pass-1 walk)
    acc_ref[:, O_S1:O_S1 + 1] = state_ref[:, 2:3]
    acc_ref[:, O_S2:O_S2 + 1] = state_ref[:, 3:4]
    out_ref[0, :, :] = acc_ref[:, :]


def _bwd2_kernel(tiles_x, cmap_ref, nlive_ref, ranges_ref, attrs_ref,
                 fwd_ref, cot_ref, dattr_ref, state_ref):
    i = pl.program_id(0)
    t = cmap_ref[i]
    live = i < nlive_ref[0]
    k = i - ranges_ref[t] // CHUNK        # chunk index within the tile
    gidx = jax.lax.broadcasted_iota(jnp.int32, (PIX, CHUNK), 1)
    # every chunk writes its gradient block (zeros when dead)
    dattr_ref[:, :] = jnp.zeros((NUM_ATTRS2, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        first = jnp.logical_or(i == 0, cmap_ref[jnp.maximum(i - 1, 0)] != t)

        @pl.when(first)
        def _():
            # state cols: 0 D, 5 prefix_wbeta
            state_ref[:] = jnp.zeros((PIX, 8), jnp.float32)
            state_ref[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)

        @pl.when(jnp.max(state_ref[:, 0]) >= T_EPS)
        def _():
            px, py = _pixel_cols(t, tiles_x)
            dC = cot_ref[0, :, O_RGB:O_RGB + 3]          # (PIX, 3)
            dT = cot_ref[0, :, O_T:O_T + 1]
            dD = cot_ref[0, :, O_D:O_D + 1]
            dN = cot_ref[0, :, O_NRM:O_NRM + 3]
            ddist = cot_ref[0, :, O_DIST:O_DIST + 1]
            dmed = cot_ref[0, :, O_MED:O_MED + 1]
            dmednrm = cot_ref[0, :, O_MEDNRM:O_MEDNRM + 3]   # (PIX, 3)
            final_T = fwd_ref[0, :, O_T:O_T + 1]
            sel_pos = fwd_ref[0, :, O_SELPOS:O_SELPOS + 1]

            # Totals the CUDA-style first pass would rebuild, read from the
            # forward outputs instead: every base channel (rgb, depth,
            # normal) is linear in w so its total is the forward
            # accumulator contracted with its cotangent; S0 telescopes to
            # 1 - final_T; S1/S2 are stored in the spare output rows.
            S0 = 1.0 - final_T
            S1 = fwd_ref[0, :, O_S1:O_S1 + 1]
            S2 = fwd_ref[0, :, O_S2:O_S2 + 1]
            total_base = dD * fwd_ref[0, :, O_D:O_D + 1]
            for _c in range(3):
                total_base += dC[:, _c:_c + 1] * fwd_ref[0, :, O_RGB + _c:
                                                         O_RGB + _c + 1]
                total_base += dN[:, _c:_c + 1] * fwd_ref[0, :, O_NRM + _c:
                                                         O_NRM + _c + 1]
            total_wb = total_base + ddist * 2.0 * (S0 * S2 - S1 * S1)
            bgterm = final_T * dT

            dCN = jnp.concatenate([dC, dN], axis=1)       # (PIX, 6)
            A = attrs_ref[:, :]
            a, aux = _surfel_alpha(A, px, py)
            one_m = 1.0 - a
            pfx = _prefix_prod_excl_lanes(one_m)
            d_before = state_ref[:, 0:1] * pfx
            contrib = (a > 0.0) & (d_before * one_m >= T_EPS)
            w = jnp.where(contrib, a * d_before, 0.0)
            m = aux["m"]
            # u[p,i] for the rgb+normal channels as one (PIX,6)@(6,CHUNK)
            # MXU matmul; depth and distortion terms are per-(pixel,
            # instance) and stay elementwise
            base = aux["depth"] * dD + jax.lax.dot_general(
                dCN, A[A_RGB:A_NRM + 3, :], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            beta = base + ddist * (
                m * m * S0 + S2 - 2.0 * m * S1)
            wbeta = w * beta
            prefix_inc = state_ref[:, 5:6] + _prefix_sum_lanes(wbeta, False)
            suffix = total_wb - prefix_inc
            inv1ma = 1.0 / one_m
            da = jnp.where(contrib,
                           d_before * beta - (suffix + bgterm) * inv1ma, 0.0)
            unclamped = aux["raw"] < ALPHA_MAX
            da_eff = jnp.where(aux["ok"] & unclamped, da, 0.0)

            onehot = ((sel_pos >= 0.0)
                      & ((k * CHUNK + gidx).astype(jnp.float32) == sel_pos))
            dm_dd = M_COEF * NEAR_N / (aux["safe_depth"] ** 2)
            gdepth = jnp.where(contrib,
                               w * dD
                               + ddist * 2.0 * w * (m * S0 - S1) * dm_dd,
                               0.0)
            gdepth += jnp.where(onehot, dmed, 0.0)

            # alpha -> rho
            grho = da_eff * (-0.5) * aux["raw"]
            is3d = aux["is3d"]
            g2d = jnp.where(is3d, 0.0, grho)
            g3d = jnp.where(is3d, grho, 0.0)
            r = lambda j: A[j:j + 1, :]
            tw0, tw1 = r(A_TW), r(A_TW + 1)
            gs0 = g3d * 2.0 * aux["s0"] + jnp.where(is3d, gdepth * tw0, 0.0)
            gs1 = g3d * 2.0 * aux["s1"] + jnp.where(is3d, gdepth * tw1, 0.0)
            inv_pz = aux["rpz"]
            gp0 = gs0 * inv_pz
            gp1 = gs1 * inv_pz
            gp2 = -(aux["s0"] * gs0 + aux["s1"] * gs1) * inv_pz

            e0 = gdepth * jnp.where(is3d, aux["s0"], 0.0)
            e1 = gdepth * jnp.where(is3d, aux["s1"], 0.0)
            opterm = da_eff * aux["g_exp"]
            # ONE fused MXU contraction over pixels replaces all 21 sublane
            # reductions: lhs basis = [1, pxl, pyl, dC, dN] (PIX, 9) in the
            # tile-LOCAL frame (see blend_pallas._bwd_kernel for the
            # cancellation rationale), rhs = nine lane-concatenated blocks.
            # Block j of the (9, 9*CHUNK) result holds sum_p basis_r * X_j:
            #   gp0..gp2 -> rows 0-2 give the CA/CB/CC moments,
            #   g2d      -> rows 0-2 give the xy (low-pass mean) moments,
            #   e0,e1,gdepth,opterm -> row 0 gives the tw/op plain sums,
            #   w        -> rows 3-8 give the rgb/nrm channel rows.
            # (This variant was reverted in round 4 on a "Mosaic
            # miscompile" verdict from the train-step parity harness —
            # which was actually polluted by the bf16-matmul-default and
            # SSIM-fusion backward bugs, both since fixed; it is exact
            # under the now-trusted gate, benchmarks/tpu_parity.py.)
            ox = px[0:1, :]
            oy = py[0:1, :]
            pxl = px - ox
            pyl = py - oy
            basis = jnp.concatenate(
                [jnp.ones_like(pxl), pxl, pyl, dCN], axis=1)   # (PIX, 9)
            G = jnp.concatenate(
                [gp0, gp1, gp2, g2d, e0, e1, gdepth, opterm, w], axis=1)
            R = jax.lax.dot_general(
                basis, G, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # (9, 9*CHUNK)
            blk = lambda j: R[:, j * CHUNK:(j + 1) * CHUNK]
            Rgp = [blk(0), blk(1), blk(2)]
            Rg2 = blk(3)
            # xy rows: sum(g2d*4*dx) with dx = mean_x - px expands in the
            # local frame to 4*((mean_x - ox)*s0 - sum(pxl*g2d))
            mxa = r(A_XY) - ox
            mya = r(A_XY + 1) - oy
            sm = lambda v: jnp.sum(v, axis=0, keepdims=True)
            # median_normal is a SELECTION output (like median depth): its
            # cotangent routes to the selected instance's normal row
            # through the median onehot — a sparse sublane sum on top of
            # the fused contraction's w-weighted nrm rows
            mednrm_rows = jnp.concatenate(
                [sm(jnp.where(onehot, dmednrm[:, ci:ci + 1], 0.0))
                 for ci in range(3)], axis=0)              # (3, CHUNK)
            rows = (
                [4.0 * (mxa * Rg2[0:1] - Rg2[1:2]),
                 4.0 * (mya * Rg2[0:1] - Rg2[2:3])]
                + [Rgp[j][0:1] for j in range(3)]                   # CA
                + [-(ox * Rgp[j][0:1] + Rgp[j][1:2]) for j in range(3)]
                + [-(oy * Rgp[j][0:1] + Rgp[j][2:3]) for j in range(3)]
                + [blk(4)[0:1], blk(5)[0:1], blk(6)[0:1]]           # tw
                + [blk(7)[0:1]]                                     # op
                + [blk(8)[3:6]]                                     # rgb
                + [blk(8)[6:9] + mednrm_rows])                      # nrm
            dattr_ref[:, :] = jnp.concatenate(
                rows + [jnp.zeros((NUM_ATTRS2 - 21, CHUNK), jnp.float32)],
                axis=0)

            state_ref[:, 5:6] = prefix_inc[:, -1:]
            state_ref[:, 0:1] = state_ref[:, 0:1] * (pfx[:, -1:]
                                                     * one_m[:, -1:])


# ---------------------------------------------------------------------------
# wrappers + custom VJP
# ---------------------------------------------------------------------------

def _run_fwd2(attrs, ranges, tiles_x: int, tiles_y: int):
    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, PIX, OUT2_ROWS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ATTRS2, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_ATTRS2, CHUNK), jnp.float32),
            pltpu.VMEM((PIX, OUT2_ROWS), jnp.float32),
            pltpu.VMEM((PIX, 4), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd2_kernel, tiles_x, num_tiles),
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, OUT2_ROWS),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(ranges, attrs)


def _run_bwd2(attrs, ranges, cmap, nlive, fwd_out, cot,
              tiles_x: int, tiles_y: int):
    n_chunks = attrs.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((NUM_ATTRS2, CHUNK),
                         lambda i, cmap, nl, rg: (0, i)),
            pl.BlockSpec((1, PIX, OUT2_ROWS),
                         lambda i, cmap, nl, rg: (cmap[i], 0, 0)),
            pl.BlockSpec((1, PIX, OUT2_ROWS),
                         lambda i, cmap, nl, rg: (cmap[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((NUM_ATTRS2, CHUNK),
                               lambda i, cmap, nl, rg: (0, i)),
        scratch_shapes=[pltpu.VMEM((PIX, 8), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwd2_kernel, tiles_x),
        out_shape=jax.ShapeDtypeStruct(attrs.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(cmap, nlive, ranges, attrs, fwd_out, cot)


def _tiles_to_rows(out, tiles_x, tiles_y):
    """[num_tiles, PIX, OUT2_ROWS] -> [H, W, OUT2_ROWS]."""
    x = out.reshape(tiles_y, tiles_x, TILE, TILE, OUT2_ROWS)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(tiles_y * TILE, tiles_x * TILE, OUT2_ROWS)


def _rows_to_tiles(rows, tiles_x, tiles_y):
    H, W, _ = rows.shape
    x = rows.reshape(tiles_y, TILE, tiles_x, TILE, OUT2_ROWS)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(tiles_y * tiles_x, PIX, OUT2_ROWS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _blend2_core(attrs, ranges, cmap, nlive, tiles_x, tiles_y):
    out = _run_fwd2(attrs, ranges, tiles_x, tiles_y)
    return _tiles_to_rows(out, tiles_x, tiles_y)


def _blend2_core_fwd(attrs, ranges, cmap, nlive, tiles_x, tiles_y):
    out = _run_fwd2(attrs, ranges, tiles_x, tiles_y)
    return _tiles_to_rows(out, tiles_x, tiles_y), \
        (attrs, ranges, cmap, nlive, out)


def _blend2_core_bwd(tiles_x, tiles_y, res, g_rows):
    attrs, ranges, cmap, nlive, fwd_out = res
    # zero out cotangents of non-differentiable rows (sel_pos only: the
    # median-normal cotangent IS routed, via the median onehot)
    mask = np.ones((OUT2_ROWS,), np.float32)
    mask[O_SELPOS] = 0.0
    # S1/S2 are backward-plumbing outputs; their effect on the distortion
    # loss is already in the analytic dL/ddist chain
    mask[O_S1] = 0.0
    mask[O_S2] = 0.0
    cot = _rows_to_tiles(g_rows * jnp.asarray(mask), tiles_x, tiles_y)
    dattrs = _run_bwd2(attrs, ranges, cmap, nlive, fwd_out, cot,
                       tiles_x, tiles_y)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return dattrs, f0(ranges), f0(cmap), f0(nlive)


_blend2_core.defvjp(_blend2_core_fwd, _blend2_core_bwd)


def pack_instance_attrs_2d(mean2d, Tmat, normal, color, opacity,
                           binning: Binning):
    """Single packed [N, A] gather (see vanilla pack_instance_attrs)."""
    n = mean2d.shape[0]
    T9 = Tmat.reshape(n, 9)
    Tu, Tv, Tw = T9[:, 0:3], T9[:, 3:6], T9[:, 6:9]
    # per-gaussian cross-product invariants of the ray-splat intersection
    # (see the attr-layout comment); their VJP routes the kernel's
    # dCA/dCB/dCC back to the T matrix via XLA autodiff
    CA = jnp.cross(Tu, Tv)
    CB = jnp.cross(Tw, Tv)
    CC = jnp.cross(Tu, Tw)
    zeros = jnp.zeros((n, NUM_ATTRS2 - 21), jnp.float32)
    per_gauss = jnp.concatenate([
        mean2d, CA, CB, CC, Tw, opacity[:, None], color, normal,
        zeros], axis=1)
    gathered = gather_rows_auto(per_gauss, binning, 21)
    # zero filler / non-ellipse-hit lanes -> exact alpha=0 no-ops
    return (gathered * binning.hit[:, None]).T


class SurfelMaps:
    """Column-view helper over the blended output [H, W, OUT2_ROWS]."""

    def __init__(self, rows):
        self.color = rows[..., O_RGB:O_RGB + 3]
        self.final_T = rows[..., O_T]
        self.depth_exp = rows[..., O_D]
        self.normal = rows[..., O_NRM:O_NRM + 3]
        self.dist = rows[..., O_DIST]
        self.median_depth = rows[..., O_MED]
        self.median_normal = rows[..., O_MEDNRM:O_MEDNRM + 3]
        self.median_contrib = rows[..., O_SELPOS]   # sorted-inst idx, -1=none


def blend2d_pallas(mean2d, Tmat, normal, color, opacity, binning: Binning,
                   width: int, height: int) -> SurfelMaps:
    assert width % TILE == 0 and height % TILE == 0
    tiles_x, tiles_y = width // TILE, height // TILE
    attrs = pack_instance_attrs_2d(mean2d, Tmat, normal, color, opacity,
                                   binning)
    rows = _blend2_core(attrs, binning.tile_ranges, binning.chunk_map,
                        binning.n_live_chunks, tiles_x, tiles_y)
    return SurfelMaps(rows)
