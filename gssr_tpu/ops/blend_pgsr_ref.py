"""Reference (pure-jnp) PGSR planar blend over sorted instances.

Defines the exact semantics for the Pallas planar kernels, mirroring
diff-plane-rasterization renderCUDA with render_geo=True
(cuda_rasterizer/forward.cu:280-405): color + 4 geometry channels blended
front-to-back, plus the per-gaussian out_observe counter.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gssr_tpu.ops.blend_ref import ALPHA_MAX, ALPHA_MIN, T_EPS
from gssr_tpu.ops.projection import TILE


class BlendPGSROut(NamedTuple):
    color: jnp.ndarray        # [H,W,3] (no bg)
    final_T: jnp.ndarray      # [H,W]
    normal: jnp.ndarray       # [H,W,3] blended camera-space normal
    distance: jnp.ndarray     # [H,W] blended plane distance
    observe: jnp.ndarray      # [N] per-gaussian pixel count with T>0.5


def blend_pgsr_reference(mean2d, conic, color, opacity, normal, distance,
                         gauss_id, tile_of, width: int, height: int):
    tiles_x = width // TILE
    N = mean2d.shape[0]
    ys, xs = jnp.mgrid[0:height, 0:width]
    pix_tile = (ys // TILE) * tiles_x + (xs // TILE)
    pxf = xs.astype(jnp.float32)
    pyf = ys.astype(jnp.float32)

    def step(carry, inst):
        T, acc_c, acc_n, acc_d, done = carry
        gid, tid = inst
        m2 = mean2d[gid]
        con = conic[gid]
        in_tile = pix_tile == tid
        dx = m2[0] - pxf
        dy = m2[1] - pyf
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, opacity[gid] * jnp.exp(power))
        valid = in_tile & (power <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(valid, alpha, 0.0)
        test_T = T * (1.0 - a)
        would_cut = valid & (test_T < T_EPS)
        contribute = valid & (~done) & (~would_cut)
        w = jnp.where(contribute, a * T, 0.0)
        acc_c = acc_c + w[..., None] * color[gid]
        acc_n = acc_n + w[..., None] * normal[gid]
        acc_d = acc_d + w * distance[gid]
        obs = jnp.sum(jnp.where(contribute & (T > 0.5), 1.0, 0.0))
        T = jnp.where(contribute, test_T, T)
        done = done | would_cut
        return (T, acc_c, acc_n, acc_d, done), obs

    H, W = height, width
    init = (jnp.ones((H, W), jnp.float32),
            jnp.zeros((H, W, 3), jnp.float32),
            jnp.zeros((H, W, 3), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), bool))
    (T, acc_c, acc_n, acc_d, _), obs_seq = jax.lax.scan(
        step, init, (gauss_id, tile_of))
    # scatter the per-instance observe counts outside the scan so the
    # scan transpose never sees a scatter (compile-time blowup otherwise)
    observe = jax.ops.segment_sum(
        jax.lax.stop_gradient(obs_seq), gauss_id, num_segments=N)
    return BlendPGSROut(color=acc_c, final_T=T, normal=acc_n,
                        distance=acc_d, observe=observe)
