"""2DGS (surfel) preprocess: splat->pixel homogeneous transform + AABB.

jnp re-design of diff-surfel-rasterization preprocess
(cuda_rasterizer/forward.cu:75-255): T = rows (Tu, Tv, Tw) of the 3x3 map
from splat UV-space to homogeneous pixel coords, camera-space normal with
dual-visible flip, conic-free AABB from T, and touched-tile rects.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gssr_tpu.ops.projection import NEAR_CULL, TILE, project_points, tile_rect
from gssr_tpu.utils.general import quat_to_rotmat

FILTER_SIZE = 0.707106          # sqrt(2)/2 low-pass radius (auxiliary.h)
FILTER_INV_SQUARE = 2.0
CUTOFF = 3.0


class Projected2D(NamedTuple):
    mean2d: jnp.ndarray     # [N,2] AABB center in pixels (low-pass center)
    Tmat: jnp.ndarray       # [N,3,3] rows (Tu, Tv, Tw)
    normal: jnp.ndarray     # [N,3] camera-space normal (dual-visible flipped)
    depth: jnp.ndarray      # [N] view-space z
    radius: jnp.ndarray     # [N] int32
    rect: jnp.ndarray       # [N,4] int32
    tiles_touched: jnp.ndarray  # [N] int32


def preprocess_2d(means3d, scales2, rotations, camera, width: int, height: int,
                  scaling_modifier: float = 1.0,
                  active_mask=None, opacity=None) -> Projected2D:
    tiles_x, tiles_y = width // TILE, height // TILE
    R = quat_to_rotmat(rotations)                       # [N,3,3]
    sx = scales2[..., 0:1] * scaling_modifier
    sy = scales2[..., 1:2] * scaling_modifier
    L0 = R[..., :, 0] * sx                              # [N,3]
    L1 = R[..., :, 1] * sy
    axis = R[..., :, 2]                                 # world normal axis

    p_view, _ = project_points(means3d, camera.w2c, camera.full_proj)
    depth = p_view[..., 2]
    visible = depth > NEAR_CULL
    if active_mask is not None:
        visible = visible & active_mask

    # pixel-projection rows: A = [W/2*P0 + (W-1)/2*P3; H/2*P1 + (H-1)/2*P3; P3]
    P = camera.full_proj
    A = jnp.stack([
        0.5 * width * P[0] + 0.5 * (width - 1) * P[3],
        0.5 * height * P[1] + 0.5 * (height - 1) * P[3],
        P[3],
    ], axis=0)                                          # [3,4]
    A3, A4 = A[:, :3], A[:, 3]
    cu = L0 @ A3.T                                      # [N,3] column Tu-part
    cv = L1 @ A3.T
    cw = means3d @ A3.T + A4
    # rows Tu/Tv/Tw of the 3x3 map: T[r] = (cu[r], cv[r], cw[r])
    Tmat = jnp.stack([cu, cv, cw], axis=-1)             # [N,3,3] (rows x cols)

    # camera-space normal + dual-visible flip (forward.cu:209-214)
    n_view = axis @ camera.w2c[:3, :3].T
    cos = -jnp.sum(p_view * n_view, axis=-1)
    visible = visible & (cos != 0.0)
    normal = n_view * jnp.sign(cos)[..., None]

    # AABB from T (compute_aabb, forward.cu:119-145)
    Tu, Tv, Tw = Tmat[..., 0, :], Tmat[..., 1, :], Tmat[..., 2, :]

    def conic_aabb(level, visible):
        """Dual-conic AABB of the {rho3d <= level^2} image: center
        (cx, cy) and half-extents (hx, hy) in pixels. `level` is [N] (or
        scalar) sigmas."""
        lvl2 = jnp.broadcast_to(jnp.asarray(level, jnp.float32) ** 2,
                                Tw.shape[:-1])
        tvec = jnp.stack([lvl2, lvl2, -jnp.ones_like(lvl2)], axis=-1)
        dval = jnp.sum(tvec * Tw * Tw, axis=-1)
        visible = visible & (dval != 0.0)
        # sanitize the divisor for culled gaussians: an inf `f` would
        # poison reverse-mode AD even under zero cotangents (where-grad
        # trap)
        d_safe = jnp.where(visible, dval, 1.0)
        f = tvec / d_safe[..., None]
        cx = jnp.sum(f * Tu * Tw, axis=-1)
        cy = jnp.sum(f * Tv * Tw, axis=-1)
        hx = jnp.sqrt(jnp.maximum(1e-4,
                                  cx * cx - jnp.sum(f * Tu * Tu, axis=-1)))
        hy = jnp.sqrt(jnp.maximum(1e-4,
                                  cy * cy - jnp.sum(f * Tv * Tv, axis=-1)))
        return cx, cy, hx, hy, visible

    # low-pass / rho2d center + densify-stats radius: the CUTOFF-level
    # box center, as in the CUDA reference
    cx, cy, hx, hy, visible = conic_aabb(CUTOFF, visible)
    mean2d = jnp.where(visible[..., None],
                       jnp.stack([cx, cy], axis=-1), 0.0)
    if opacity is None:
        rx3, ry3 = hx, hy
        s_fac = jnp.full(hx.shape, CUTOFF, jnp.float32)
        cxL, cyL = cx, cy
    else:
        # alpha >= 1/255 level set in sigmas (<= CUTOFF): everything
        # outside it is skipped by the blend kernel's alpha cut, so the
        # rect may shrink to that level. The splat->pixel map is
        # PROJECTIVE, so the level ellipse is NOT a concentric scaling of
        # the CUTOFF one (that approximation under-covered edge-on splats
        # and culled true contributors near tile borders) — recompute the
        # dual-conic AABB exactly at the level.
        from gssr_tpu.ops.projection import opacity_sigma_factor
        s_fac, visible = opacity_sigma_factor(opacity, visible)
        cxL, cyL, rx3, ry3, visible = conic_aabb(s_fac, visible)
    # union box of the rho3d level ellipse and the low-pass disk
    # (rho2d = FILTER_INV_SQUARE * dist^2 about mean2d)
    rlp = s_fac * FILTER_SIZE
    bx0 = jnp.minimum(cxL - rx3, cx - rlp)
    bx1 = jnp.maximum(cxL + rx3, cx + rlp)
    by0 = jnp.minimum(cyL - ry3, cy - rlp)
    by1 = jnp.maximum(cyL + ry3, cy + rlp)
    bcen = jnp.stack([0.5 * (bx0 + bx1), 0.5 * (by0 + by1)], axis=-1)
    rx = jnp.ceil(0.5 * (bx1 - bx0))
    ry = jnp.ceil(0.5 * (by1 - by0))
    radius_f = jnp.maximum(rx, ry)

    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    zero = jnp.zeros_like(rx)
    rect = tile_rect(bcen, jnp.where(visible, rx, zero), tiles_x, tiles_y,
                     jnp.where(visible, ry, zero))
    tiles = (rect[..., 2] - rect[..., 0]) * (rect[..., 3] - rect[..., 1])
    tiles = jnp.where(visible, tiles, 0).astype(jnp.int32)
    radius = jnp.where(tiles > 0, radius, 0)

    return Projected2D(mean2d=mean2d, Tmat=Tmat, normal=normal, depth=depth,
                       radius=radius, rect=rect, tiles_touched=tiles)
