"""Reference (pure-jnp) 2DGS surfel blend over sorted instances.

Defines the exact semantics for the Pallas surfel kernels, mirroring
diff-surfel-rasterization renderCUDA (forward.cu:261-446): per-pixel
ray-splat intersection via two homogeneous planes, min(rho3d, rho2d)
low-pass, and the auxiliary channels (expected depth, normal, median depth,
distortion). Differentiable through XLA for gradient tests.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gssr_tpu.ops.blend_ref import ALPHA_MAX, ALPHA_MIN, T_EPS
from gssr_tpu.ops.projection import TILE

NEAR_N = 0.2
FAR_N = 100.0
FILTER_INV_SQUARE = 2.0


class Blend2DOut(NamedTuple):
    color: jnp.ndarray        # [H,W,3] (no bg composite)
    final_T: jnp.ndarray      # [H,W]
    depth_exp: jnp.ndarray    # [H,W] sum w*depth
    normal: jnp.ndarray       # [H,W,3] sum w*normal (camera space)
    dist: jnp.ndarray         # [H,W] depth distortion
    median_depth: jnp.ndarray  # [H,W]
    median_normal: jnp.ndarray  # [H,W,3] normal of the median contributor
    median_contrib: jnp.ndarray  # [H,W] sorted-instance idx (-1 = none)


def blend2d_reference(mean2d, Tmat, normal, color, opacity, gauss_id, tile_of,
                      width: int, height: int):
    tiles_x = width // TILE
    ys, xs = jnp.mgrid[0:height, 0:width]
    pix_tile = (ys // TILE) * tiles_x + (xs // TILE)
    pxf = xs.astype(jnp.float32)
    pyf = ys.astype(jnp.float32)

    def step(carry, inst):
        (T, acc_c, acc_d, acc_n, dist, M1, M2, med, mednrm, medidx,
         done) = carry
        gid, tid, pos = inst
        Tu = Tmat[gid, 0]
        Tv = Tmat[gid, 1]
        Tw = Tmat[gid, 2]
        xy = mean2d[gid]
        nrm = normal[gid]
        col = color[gid]
        op = opacity[gid]

        in_tile = pix_tile == tid
        # homogeneous plane intersection (forward.cu:351-371)
        kx = pxf[..., None] * Tw - Tu                     # [H,W,3]
        ly = pyf[..., None] * Tw - Tv
        p = jnp.cross(kx, ly)
        pz_ok = p[..., 2] != 0.0
        pz = jnp.where(pz_ok, p[..., 2], 1.0)
        # clamp the intersection coords: degenerate splats give s ~ inf,
        # whose backward is 0-cotangent * inf = nan (alpha is 0 out there
        # anyway — rho > 1e4 is far past the 3-sigma cutoff)
        sx = jnp.clip(p[..., 0] / pz, -1e4, 1e4)
        sy = jnp.clip(p[..., 1] / pz, -1e4, 1e4)
        rho3d = sx * sx + sy * sy
        dx = xy[0] - pxf
        dy = xy[1] - pyf
        rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
        is3d = rho3d <= rho2d
        rho = jnp.minimum(rho3d, rho2d)
        depth = jnp.where(is3d, sx * Tw[0] + sy * Tw[1] + Tw[2], Tw[2])
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(-0.5 * rho))
        valid = (in_tile & pz_ok & (depth >= NEAR_N) & (alpha >= ALPHA_MIN))
        a = jnp.where(valid, alpha, 0.0)
        test_T = T * (1.0 - a)
        would_cut = valid & (test_T < T_EPS)
        contribute = valid & (~done) & (~would_cut)
        w = jnp.where(contribute, a * T, 0.0)

        m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / jnp.where(
            depth > 1e-6, depth, 1e-6))
        A_acc = 1.0 - T
        dist = dist + jnp.where(contribute,
                                (m * m * A_acc + M2 - 2.0 * m * M1) * w, 0.0)
        M1 = M1 + w * m
        M2 = M2 + w * m * m
        sel = contribute & (T > 0.5)
        med = jnp.where(sel, depth, med)
        mednrm = jnp.where(sel[..., None], nrm, mednrm)
        medidx = jnp.where(sel, pos.astype(jnp.float32), medidx)
        acc_d = acc_d + w * depth
        acc_n = acc_n + w[..., None] * nrm
        acc_c = acc_c + w[..., None] * col
        T = jnp.where(contribute, test_T, T)
        done = done | would_cut
        return (T, acc_c, acc_d, acc_n, dist, M1, M2, med, mednrm,
                medidx, done), None

    H, W = height, width
    init = (jnp.ones((H, W), jnp.float32),
            jnp.zeros((H, W, 3), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W, 3), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W, 3), jnp.float32),
            -jnp.ones((H, W), jnp.float32),
            jnp.zeros((H, W), bool))
    pos = jnp.arange(gauss_id.shape[0], dtype=jnp.int32)
    (T, acc_c, acc_d, acc_n, dist, _, _, med, mednrm, medidx, _), _ = \
        jax.lax.scan(step, init, (gauss_id, tile_of, pos))
    return Blend2DOut(color=acc_c, final_T=T, depth_exp=acc_d, normal=acc_n,
                      dist=dist, median_depth=med, median_normal=mednrm,
                      median_contrib=medidx)
