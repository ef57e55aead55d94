"""Differentiable planar (PGSR) rasterization — public op.

Replaces diff-plane-rasterization's autograd wrapper
(diff_plane_rasterization/__init__.py:21-106). Per-gaussian planar normals
(smallest scaling axis, camera-facing flip — reference pgsr_scene.py:244-257)
and plane distances are computed in jnp so XLA differentiates them; the
blend runs as the Pallas planar kernel; per-pixel plane depth
(forward.cu:403-405) is a jnp post-process of the blended maps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gssr_tpu.ops import sh as sh_ops
from gssr_tpu.ops.binning import bin_gaussians
from gssr_tpu.ops.projection import TILE, preprocess
from gssr_tpu.ops.rasterize import pad_to_tiles
from gssr_tpu.utils.general import quat_to_rotmat


class RenderPGSROutput(NamedTuple):
    image: jnp.ndarray           # [H,W,3] incl. bg composite
    final_T: jnp.ndarray         # [H,W]
    alpha: jnp.ndarray           # [H,W] 1 - T
    normal: jnp.ndarray          # [H,W,3] blended camera-space normal
    distance: jnp.ndarray        # [H,W] blended plane distance
    plane_depth: jnp.ndarray     # [H,W]
    observe: jnp.ndarray         # [N] out_observe counts
    radii: jnp.ndarray
    mean2d: jnp.ndarray
    num_rendered: jnp.ndarray
    overflow: jnp.ndarray


def gaussian_plane_normals(means3d, scales, rotations, campos):
    """Smallest-axis normal with camera-facing flip (pgsr_scene.get_normal)."""
    R = quat_to_rotmat(rotations)                  # [N,3,3]
    idx = jnp.argmin(scales, axis=-1)              # [N]
    normal = jnp.take_along_axis(
        R, idx[:, None, None].repeat(3, axis=1), axis=2)[..., 0]  # [N,3]
    to_cam = campos - means3d
    flip = jnp.sum(normal * to_cam, axis=-1) < 0.0
    return jnp.where(flip[:, None], -normal, normal)


def rasterize_pgsr(means3d, scales, rotations, opacity, camera,
                   width: int, height: int, bg,
                   sh_coeffs=None, sh_degree: int = 0, colors_precomp=None,
                   active_mask=None, scaling_modifier: float = 1.0,
                   instance_cap: int = 1 << 18, backend: str = "pallas",
                   mean2d_offset=None,
                   mean2d_abs_offset=None,
                   observe_offset=None,
                   band_axis=None, band_count: int = 1) -> RenderPGSROutput:
    """mean2d_abs_offset: [N,2] zeros; take d(loss)/d(it) to read the abs
    screen-gradient statistics (replaces means2D_abs retain_grad).
    observe_offset: [N,1] zeros; its gradient channel carries the
    per-gaussian out_observe counts computed by the backward kernel — on
    training steps this replaces the forward segment-sum (which XLA then
    dead-code-eliminates when `observe` goes unused)."""
    pw, ph = pad_to_tiles(width, height)
    proj = preprocess(means3d, scales, rotations, camera, pw, ph,
                      scaling_modifier=scaling_modifier,
                      active_mask=active_mask,
                      opacity=opacity.reshape(-1))
    if mean2d_offset is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)
    if mean2d_abs_offset is None:
        mean2d_abs_offset = jnp.zeros_like(proj.mean2d)
    if observe_offset is None:
        observe_offset = jnp.zeros_like(proj.mean2d[:, :1])

    if colors_precomp is not None:
        color = colors_precomp
    else:
        color = sh_ops.sh_to_color(sh_degree, sh_coeffs, means3d,
                                   camera.campos)

    # planar geometry (camera space) — pgsr_scene.py:295-302
    normal_w = gaussian_plane_normals(means3d, scales, rotations,
                                      camera.campos)
    normal_c = normal_w @ camera.w2c[:3, :3].T
    ones = jnp.ones_like(means3d[..., :1])
    pts_cam = jnp.concatenate([means3d, ones], -1) @ camera.w2c[:3, :].T
    distance = jnp.abs(jnp.sum(normal_c * pts_cam, axis=-1))

    if band_axis is None:
        tiles_yb, render_h = ph // TILE, ph
        rect, tiles, mask = proj.rect, proj.tiles_touched, proj.tile_mask
        mean2d_b = proj.mean2d
    else:
        from gssr_tpu.ops import band as band_ops
        assert (ph // TILE) % band_count == 0
        tiles_yb = (ph // TILE) // band_count
        render_h = tiles_yb * TILE
        ty0 = band_ops.band_ty0(band_axis, tiles_yb)
        rect, tiles, mask, _ = band_ops.clip_to_band(
            proj.rect, proj.tiles_touched, proj.tile_mask, ty0, tiles_yb)
        mean2d_b = band_ops.shift_mean2d(proj.mean2d, ty0)

    chunk = 1
    if backend == "pallas":
        from gssr_tpu.ops.blend_pgsr_pallas import CHUNK as chunk
    binning = bin_gaussians(
        jax.lax.stop_gradient(rect),
        jax.lax.stop_gradient(proj.depth),
        jax.lax.stop_gradient(tiles),
        pw // TILE, tiles_yb, instance_cap, chunk=chunk,
        tile_mask=mask)

    opacity = opacity.reshape(-1)
    N = means3d.shape[0]
    if backend == "pallas":
        from gssr_tpu.ops.blend_pgsr_pallas import blend_pgsr_pallas
        maps = blend_pgsr_pallas(mean2d_b, proj.conic, color, opacity,
                                 normal_c, distance, observe_offset,
                                 mean2d_abs_offset, binning, pw, render_h)
        obs_inst = maps.observe_inst[0, :]
        # filler / non-hit lanes get exact zeros from the kernel (their
        # attrs are hit-zeroed, so contrib is false); only slots past the
        # last padded range are uninitialized DMA memory, masked here
        in_range = (jnp.arange(obs_inst.shape[0], dtype=jnp.int32)
                    < binning.tile_ranges[-1])
        observe = jax.ops.segment_sum(
            jnp.where(in_range, obs_inst, 0.0),
            jnp.where(in_range, binning.gauss_id, N),
            num_segments=N + 1)[:N]
        color_map, final_T = maps.color, maps.final_T
        normal_map, dist_map = maps.normal, maps.distance
    elif backend == "reference":
        from gssr_tpu.ops.blend_pgsr_ref import blend_pgsr_reference
        # route the abs-offset gradient like the pallas path: constant-fold
        # zero contribution keeps the signature differentiable
        out = blend_pgsr_reference(
            mean2d_b + 0.0 * (mean2d_abs_offset + observe_offset),
            proj.conic, color,
            opacity, normal_c, distance, binning.gauss_id, binning.tile_of,
            pw, render_h)
        color_map, final_T = out.color, out.final_T
        normal_map, dist_map = out.normal, out.distance
        observe = out.observe
    else:
        raise ValueError(f"unknown backend {backend!r}")

    num_rendered, overflow = binning.num_rendered, binning.overflow
    if band_axis is not None:
        from gssr_tpu.ops import band as band_ops
        color_map = band_ops.gather_bands(color_map, band_axis)
        final_T = band_ops.gather_bands(final_T, band_axis)
        normal_map = band_ops.gather_bands(normal_map, band_axis)
        dist_map = band_ops.gather_bands(dist_map, band_axis)
        observe = jax.lax.psum(observe, band_axis)
        num_rendered, overflow = band_ops.merge_flags(
            num_rendered, overflow, band_axis)

    crop = lambda x: x[:height, :width]
    final_T = crop(final_T)
    image = crop(color_map) + final_T[..., None] * jnp.asarray(bg)
    normal_map = crop(normal_map)
    dist_map = crop(dist_map)

    # per-pixel plane depth from the blended maps (forward.cu:403-405)
    xs = (jnp.arange(width, dtype=jnp.float32) - camera.cx) / camera.fx
    ys = (jnp.arange(height, dtype=jnp.float32) - camera.cy) / camera.fy
    rx, ry = jnp.meshgrid(xs, ys)
    denom = -(normal_map[..., 0] * rx + normal_map[..., 1] * ry
              + normal_map[..., 2] + 1e-8)
    plane_depth = dist_map / denom

    return RenderPGSROutput(
        image=image, final_T=final_T, alpha=1.0 - final_T,
        normal=normal_map, distance=dist_map, plane_depth=plane_depth,
        observe=jax.lax.stop_gradient(observe),
        radii=proj.radius, mean2d=proj.mean2d,
        num_rendered=num_rendered, overflow=overflow)
