"""Per-gaussian preprocess: project, EWA 2D covariance, radii, tile rects.

This is the jnp re-design of the reference CUDA preprocess
(diff-gaussian-rasterization/cuda_rasterizer/forward.cu:74-255): frustum
cull, perspective projection, cov3D -> cov2D via the EWA Jacobian with the
0.3 low-pass dilation, conic + 3-sigma radius, and touched-tile rects.

Everything is branch-free masked math over the fixed-capacity gaussian
arrays, so XLA can fuse it and autodiff it (the backward of this stage is
left entirely to XLA — only the blend stage has a hand-written VJP).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gssr_tpu.utils.general import build_covariance

TILE = 16          # tile edge in pixels, matches the CUDA BLOCK_X/BLOCK_Y
NEAR_CULL = 0.2    # view-space z cull threshold (auxiliary.h in_frustum)
COV2D_DILATE = 0.3  # low-pass filter added to cov2D diagonal


class Projected(NamedTuple):
    """Per-gaussian screen-space quantities (fixed capacity N)."""
    mean2d: jnp.ndarray     # [N,2] pixel coords
    conic: jnp.ndarray      # [N,3] inverse 2D covariance (xx, xy, yy)
    depth: jnp.ndarray      # [N] view-space z
    radius: jnp.ndarray     # [N] int32 screen radius, 0 => culled
    rect: jnp.ndarray       # [N,4] int32 tile rect (x0, y0, x1, y1), exclusive max
    tiles_touched: jnp.ndarray  # [N] int32
    cov2d: jnp.ndarray      # [N,3] 2D covariance (xx, xy, yy) pre-inversion
    tile_mask: jnp.ndarray = None  # [N] int32 intersect bits (see tile_intersect_mask)
    exact_tiles: jnp.ndarray = None  # [N] int32 exact valid-instance count
    # (mask popcount + beyond-window area) — the per-gaussian segment
    # lengths of the binning's valid instances, used for the sorted
    # segment-reduction backward (binning.seg_bounds)


MASK_TILES = 32  # rect tiles covered by the per-gaussian intersect bitmask


def tile_intersect_mask(mean2d, conic, rect, cutoff, visible):
    """Which of the first MASK_TILES rect tiles the alpha>=1/255 ellipse
    actually touches (row-major within the rect).

    The bbox rect conservatively covers the ellipse; its corner tiles often
    contain no pixel above the threshold, yet each costs a full binning
    instance. The minimum of the convex conic quadratic over a tile's
    pixel-center box is EXACT: zero if the mean lies inside, else the best
    of the four closed-form edge minima — so culling only removes tiles
    whose every pixel is below the kernel's alpha cut.
    Returns (mask [N] int32, exact_count [N] int32); rect tiles beyond
    MASK_TILES are counted as hits unconditionally.
    """
    x0, y0 = rect[..., 0], rect[..., 1]
    # empty rects (off-screen clamp) must stay empty — the reference's
    # getRect culls these too; only the divisor needs the >=1 guard
    area = (rect[..., 2] - x0) * (rect[..., 3] - y0)
    w = jnp.maximum(rect[..., 2] - x0, 1)
    mx, my = mean2d[..., 0], mean2d[..., 1]
    cxx, cxy, cyy = conic[..., 0], conic[..., 1], conic[..., 2]
    cxx_s = jnp.maximum(cxx, 1e-12)
    cyy_s = jnp.maximum(cyy, 1e-12)
    rx = cxy / cxx_s
    ry = cxy / cyy_s

    mask = jnp.zeros_like(x0)
    for p in range(MASK_TILES):
        tx = x0 + jnp.mod(p, w)
        ty = y0 + p // w
        bx0 = (tx * TILE).astype(jnp.float32)
        by0 = (ty * TILE).astype(jnp.float32)
        bx1 = bx0 + (TILE - 1)
        by1 = by0 + (TILE - 1)

        def q_of(px, py):
            dx = px - mx
            dy = py - my
            return 0.5 * (cxx * dx * dx + cyy * dy * dy) + cxy * dx * dy

        # exact min over the box: 0 inside, else best of the 4 edge minima
        q = jnp.minimum(
            jnp.minimum(
                q_of(bx0, jnp.clip(my - ry * (bx0 - mx), by0, by1)),
                q_of(bx1, jnp.clip(my - ry * (bx1 - mx), by0, by1))),
            jnp.minimum(
                q_of(jnp.clip(mx - rx * (by0 - my), bx0, bx1), by0),
                q_of(jnp.clip(mx - rx * (by1 - my), bx0, bx1), by1)))
        inside = (mx >= bx0) & (mx <= bx1) & (my >= by0) & (my <= by1)
        q = jnp.where(inside, 0.0, q)
        hit = (p < jnp.minimum(area, MASK_TILES)) & (q <= cutoff) & visible
        mask = mask | (hit.astype(jnp.int32) << p)
    pc = _popcount32(mask)
    count = pc + jnp.maximum(area - MASK_TILES, 0) * visible.astype(jnp.int32)
    return mask, count


def _popcount32(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def ndc_to_pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def project_points(means3d, w2c, full_proj, valid=None):
    """Transform means to view space and NDC->pixel-ready projective coords.

    `valid` replaces the homogeneous w of culled points with 1 before the
    division, so reverse-mode AD never sees an inf intermediate (zero
    cotangent x inf = nan otherwise).
    """
    ones = jnp.ones_like(means3d[..., :1])
    hom = jnp.concatenate([means3d, ones], axis=-1)
    p_view = hom @ w2c[:3, :].T                     # [N,3]
    p_hom = hom @ full_proj.T                       # [N,4]
    w = p_hom[..., 3:4] + 1e-7
    if valid is not None:
        w = jnp.where(valid[..., None], w, 1.0)
    p_proj = p_hom[..., :3] / w
    return p_view, p_proj


def compute_cov2d(means3d, cov3d, w2c, fx, fy, tan_fovx, tan_fovy,
                  valid=None):
    """EWA projection of the 3D covariance (forward.cu:74-113).

    cov3d: [N,6] packed (xx,xy,xz,yy,yz,zz). Returns [N,3] (xx,xy,yy) with
    the +0.3 dilation applied. `valid` sanitizes the view-space z of culled
    gaussians so no inf/nan leaks into reverse-mode AD (where-grad trap).
    """
    ones = jnp.ones_like(means3d[..., :1])
    t = jnp.concatenate([means3d, ones], axis=-1) @ w2c[:3, :].T
    tz = t[..., 2]
    if valid is not None:
        tz = jnp.where(valid, tz, 1.0)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    txtz = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    tytz = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows for x and y screen dims (the z row is zero)
    j00 = fx * inv_z
    j02 = -fx * txtz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tytz * inv_z2

    W = w2c[:3, :3]                                  # world->cam rotation
    # M = J @ W : rows m0/m1 as [N] component columns (structure-of-arrays
    # — batched [N,3,3] einsums lower to slow XLA loop fusions, see
    # general.build_covariance)
    m00 = j00 * W[0, 0] + j02 * W[2, 0]
    m01 = j00 * W[0, 1] + j02 * W[2, 1]
    m02 = j00 * W[0, 2] + j02 * W[2, 2]
    m10 = j11 * W[1, 0] + j12 * W[2, 0]
    m11 = j11 * W[1, 1] + j12 * W[2, 1]
    m12 = j11 * W[1, 2] + j12 * W[2, 2]

    c = cov3d
    c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
    c3, c4, c5 = c[..., 3], c[..., 4], c[..., 5]
    # s_r = m_r @ Sigma, then cov2d = s_r . m_r'
    s00 = m00 * c0 + m01 * c1 + m02 * c2
    s01 = m00 * c1 + m01 * c3 + m02 * c4
    s02 = m00 * c2 + m01 * c4 + m02 * c5
    s10 = m10 * c0 + m11 * c1 + m12 * c2
    s11 = m10 * c1 + m11 * c3 + m12 * c4
    s12 = m10 * c2 + m11 * c4 + m12 * c5
    cxx = s00 * m00 + s01 * m01 + s02 * m02 + COV2D_DILATE
    cxy = s00 * m10 + s01 * m11 + s02 * m12
    cyy = s10 * m10 + s11 * m11 + s12 * m12 + COV2D_DILATE
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def tile_rect(mean2d, radius_x, tiles_x, tiles_y, radius_y=None):
    """Touched-tile rect, exclusive max (auxiliary.h getRect). Accepts
    per-axis extents: the ellipse's axis-aligned bbox (+-s*sqrt(cov_xx),
    +-s*sqrt(cov_yy)) is strictly tighter than the reference's square
    my_radius rect while still covering the visible level set."""
    if radius_y is None:
        radius_y = radius_x
    x, y = mean2d[..., 0], mean2d[..., 1]
    rx = radius_x.astype(jnp.float32)
    ry = radius_y.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((x - rx) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - ry) / TILE), 0, tiles_y).astype(jnp.int32)
    # exclusive end = floor((x+r)/T) + 1: the boundary pixel at exactly
    # x+r can still pass the alpha >= 1/255 gate (the level set is
    # inclusive), and the CUDA-style (v + T - 1)/T int-cast idiom drops
    # that tile whenever v is fractional with frac(v) < 1
    x1 = jnp.clip(jnp.floor((x + rx) / TILE) + 1, 0, tiles_x).astype(
        jnp.int32)
    y1 = jnp.clip(jnp.floor((y + ry) / TILE) + 1, 0, tiles_y).astype(
        jnp.int32)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def opacity_sigma_factor(opacity, visible):
    """Extent in sigmas of the alpha >= 1/255 level set, capped at the
    reference's 3-sigma (forward.cu:336 my_radius). Everything outside is
    skipped by the blend kernels' alpha cut anyway, so shrinking the rect
    for low-opacity gaussians is exact — it only removes no-op instances."""
    op = jax.lax.stop_gradient(opacity.reshape(-1))
    s_fac = jnp.sqrt(2.0 * jnp.log(jnp.maximum(op * 255.0, 1.0 + 1e-6)))
    return jnp.minimum(s_fac, 3.0), visible & (op * 255.0 > 1.0)


def preprocess(means3d, scales, rotations, camera, width, height,
               cov3d=None, scaling_modifier: float = 1.0,
               active_mask=None, opacity=None) -> Projected:
    """Vanilla-3DGS preprocess. width/height are the *padded* image size
    (multiples of TILE). camera is a CameraArrays pytree. opacity (optional,
    activated [N]) tightens the tile rect to the visible level set."""
    tiles_x, tiles_y = width // TILE, height // TILE
    if cov3d is None:
        cov3d = build_covariance(scales, rotations, scaling_modifier)

    p_view, p_proj = project_points(means3d, camera.w2c, camera.full_proj)
    depth = p_view[..., 2]
    visible = depth > NEAR_CULL
    if active_mask is not None:
        visible = visible & active_mask
    near_ok = visible

    cov2d = compute_cov2d(means3d, cov3d, camera.w2c,
                          camera.fx, camera.fy,
                          camera.tan_fovx, camera.tan_fovy,
                          valid=near_ok)
    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] ** 2
    visible = visible & (det > 0.0)
    det_safe = jnp.where(visible, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cov2d[..., 2] * inv_det,
                       -cov2d[..., 1] * inv_det,
                       cov2d[..., 0] * inv_det], axis=-1)
    conic = jnp.where(visible[..., None], conic, 0.0)

    if opacity is None:
        s_fac = 3.0
    else:
        s_fac, visible = opacity_sigma_factor(opacity, visible)
    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(s_fac * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))
    # sanitize culled projections so reverse-mode AD never multiplies an
    # inf/nan intermediate by a zero cotangent
    p_proj = jnp.where(near_ok[..., None], p_proj, 0.0)
    mean2d = jnp.stack([ndc_to_pix(p_proj[..., 0], width),
                        ndc_to_pix(p_proj[..., 1], height)], axis=-1)

    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    # per-axis bbox of the visible level set (tighter than the square rect)
    rx = jnp.ceil(s_fac * jnp.sqrt(jnp.maximum(cov2d[..., 0], 1e-12)))
    ry = jnp.ceil(s_fac * jnp.sqrt(jnp.maximum(cov2d[..., 2], 1e-12)))
    zero = jnp.zeros_like(rx)
    rect = tile_rect(mean2d, jnp.where(visible, rx, zero), tiles_x, tiles_y,
                     jnp.where(visible, ry, zero))
    # exact per-tile ellipse intersection bits: rect tiles without any
    # pixel at alpha >= 1/255 become sentinel instances in binning (they
    # still allocate a slot — that keeps the expansion mapping trivial —
    # but they sort to the end, shrinking every per-tile blend range).
    # The test cutoff is the kernel's own uncapped alpha cut
    # (power <= ln(255*op)), NOT the 3-sigma rect cap, so the blend output
    # matches the rect-only enumeration exactly.
    if opacity is None:
        cutoff = 0.5 * 3.0 * 3.0
    else:
        cutoff = jnp.log(jnp.maximum(
            jax.lax.stop_gradient(opacity.reshape(-1)) * 255.0, 1.0 + 1e-6))
    mask, exact = tile_intersect_mask(
        jax.lax.stop_gradient(mean2d), jax.lax.stop_gradient(conic),
        rect, cutoff, visible)
    tiles = (rect[..., 2] - rect[..., 0]) * (rect[..., 3] - rect[..., 1])
    tiles = jnp.where(visible, tiles, 0).astype(jnp.int32)
    # zero the rect extent for culled gaussians so binning skips them
    radius = jnp.where(tiles > 0, radius, 0)
    exact = jnp.where(tiles > 0, exact, 0).astype(jnp.int32)

    return Projected(mean2d=mean2d, conic=conic, depth=depth, radius=radius,
                     rect=rect, tiles_touched=tiles, cov2d=cov2d,
                     tile_mask=mask, exact_tiles=exact)
