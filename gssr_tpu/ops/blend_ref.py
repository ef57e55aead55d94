"""Reference (pure-jnp) front-to-back alpha blending over sorted instances.

Defines the exact blend semantics the Pallas kernels must reproduce —
mirroring the CUDA renderCUDA loop (diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:261-374): per-pixel conic evaluation, the
power>0 / alpha<1/255 skips, the 0.99 alpha clamp, and the T<1e-4
early-termination where the triggering gaussian is NOT blended.

This path is slow (one lax.scan step per instance) but fully differentiable
through XLA, so tests can check both images and gradients of the hand-written
VJP against it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gssr_tpu.ops.projection import TILE

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def blend_reference(mean2d, conic, color, opacity, gauss_id, tile_of,
                    width: int, height: int, bg):
    """Blend sorted instances into an image.

    Args:
      mean2d [N,2], conic [N,3], color [N,C], opacity [N]: per-gaussian attrs.
      gauss_id [I], tile_of [I]: sorted instance list (sentinel tile == out
        of range stops contributing automatically since no pixel matches).
      width/height: padded image size (multiples of TILE).
      bg: [C] background color.
    Returns (image [H,W,C], final_T [H,W]).
    """
    tiles_x = width // TILE
    C = color.shape[-1]

    ys, xs = jnp.mgrid[0:height, 0:width]
    pix_tile = (ys // TILE) * tiles_x + (xs // TILE)     # [H,W]
    pxf = xs.astype(jnp.float32)
    pyf = ys.astype(jnp.float32)

    def step(carry, inst):
        T, acc, done = carry
        gid, tid = inst
        m2 = mean2d[gid]
        con = conic[gid]
        col = color[gid]
        op = opacity[gid]

        in_tile = pix_tile == tid
        dx = m2[0] - pxf
        dy = m2[1] - pyf
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        valid = in_tile & (power <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(valid, alpha, 0.0)
        test_T = T * (1.0 - a)
        would_cut = valid & (test_T < T_EPS)
        contribute = valid & (~done) & (~would_cut)
        w = jnp.where(contribute, a * T, 0.0)
        acc = acc + w[..., None] * col
        T = jnp.where(contribute, test_T, T)
        done = done | would_cut
        return (T, acc, done), None

    T0 = jnp.ones((height, width), jnp.float32)
    acc0 = jnp.zeros((height, width, C), jnp.float32)
    done0 = jnp.zeros((height, width), bool)
    (T, acc, _), _ = jax.lax.scan(step, (T0, acc0, done0),
                                  (gauss_id, tile_of))
    image = acc + T[..., None] * bg
    return image, T
