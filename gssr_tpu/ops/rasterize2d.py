"""Differentiable surfel (2DGS) rasterization — public op.

Replaces diff-surfel-rasterization's autograd wrapper
(diff_surfel_rasterization/__init__.py:86-98): returns color plus the
unpacked auxiliary maps the TwoDGSScene consumes (reference
gssr/scene/twodgs_scene.py:88-111) — alpha, world-space normal, expected /
median / mixed depth, distortion. The derived-map math (normal rotation,
depth normalization, depth_ratio mix) runs in jnp so XLA autodiffs it; only
the blend has a custom VJP.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gssr_tpu.ops import sh as sh_ops
from gssr_tpu.ops.binning import bin_gaussians
from gssr_tpu.ops.projection import TILE
from gssr_tpu.ops.projection2d import preprocess_2d
from gssr_tpu.ops.rasterize import pad_to_tiles


class Render2DOutput(NamedTuple):
    image: jnp.ndarray          # [H,W,3] with bg composite
    final_T: jnp.ndarray        # [H,W]
    alpha: jnp.ndarray          # [H,W]
    normal: jnp.ndarray         # [H,W,3] world-space blended normal
    depth_expected: jnp.ndarray  # [H,W] alpha-normalized expected depth
    median_depth: jnp.ndarray   # [H,W]
    surf_depth: jnp.ndarray     # [H,W] depth_ratio mix
    dist: jnp.ndarray           # [H,W] distortion map
    median_normal: jnp.ndarray  # [H,W,3] camera-space normal of the median
                                # contributor (reference allmap
                                # MIDNORMAL_OFFSET, auxiliary.h:29)
    median_contrib: jnp.ndarray  # [H,W] backend-ordered sorted-instance
                                 # index of the median contributor, -1 =
                                 # none (reference MIDIDX_OFFSET)
    radii: jnp.ndarray          # [N]
    mean2d: jnp.ndarray         # [N,2]
    num_rendered: jnp.ndarray
    overflow: jnp.ndarray


def rasterize_2d(means3d, scales2, rotations, opacity, camera,
                 width: int, height: int, bg,
                 sh_coeffs=None, sh_degree: int = 0, colors_precomp=None,
                 active_mask=None, scaling_modifier: float = 1.0,
                 instance_cap: int = 1 << 18, backend: str = "pallas",
                 depth_ratio: float = 0.0,
                 mean2d_offset=None,
                 band_axis=None, band_count: int = 1,
                 gauss_shard_axis=None) -> Render2DOutput:
    pw, ph = pad_to_tiles(width, height)
    proj = preprocess_2d(means3d, scales2, rotations, camera, pw, ph,
                         scaling_modifier=scaling_modifier,
                         active_mask=active_mask,
                         opacity=opacity.reshape(-1))
    if mean2d_offset is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        color = sh_ops.sh_to_color(sh_degree, sh_coeffs, means3d, camera.campos)

    opacity = opacity.reshape(-1)
    radii_local, mean2d_local = proj.radius, proj.mean2d
    if gauss_shard_axis is not None:
        # gaussian/anchor sharding (see ops/rasterize.py gauss_shard_axis
        # for the contract): the [N_local]-sized preprocess above ran on
        # this device's shard; gather only the compact per-splat screen
        # attributes into the replicated binning/blend. The downstream
        # loss must be replicated across the axis (gather_shards' slice
        # VJP); returned radii/mean2d stay SHARD-LOCAL for densify stats.
        from gssr_tpu.ops.rasterize import gather_shards
        assert band_axis is None, \
            "gaussian sharding and band sharding are mutually exclusive"
        ag = lambda x: gather_shards(x, gauss_shard_axis)
        proj = proj._replace(
            mean2d=ag(proj.mean2d), Tmat=ag(proj.Tmat),
            normal=ag(proj.normal), depth=ag(proj.depth),
            rect=ag(proj.rect), tiles_touched=ag(proj.tiles_touched))
        color = ag(color)
        opacity = ag(opacity)

    if band_axis is None:
        tiles_yb, render_h = ph // TILE, ph
        rect, tiles = proj.rect, proj.tiles_touched
        mean2d_b, Tmat_b = proj.mean2d, proj.Tmat
    else:
        from gssr_tpu.ops import band as band_ops
        assert (ph // TILE) % band_count == 0
        tiles_yb = (ph // TILE) // band_count
        render_h = tiles_yb * TILE
        ty0 = band_ops.band_ty0(band_axis, tiles_yb)
        rect, tiles, _, _ = band_ops.clip_to_band(
            proj.rect, proj.tiles_touched, None, ty0, tiles_yb)
        mean2d_b = band_ops.shift_mean2d(proj.mean2d, ty0)
        # the homogeneous splat->pixel map projects to GLOBAL pixel rows;
        # rebase its y row to band-local coords: y_local = y - ty0*TILE
        # <=> Tv_local = Tv - (ty0*TILE) * Tw
        dy = (ty0 * TILE).astype(jnp.float32)
        Tmat_b = proj.Tmat.at[..., 1, :].add(-dy * proj.Tmat[..., 2, :])

    chunk = 1
    if backend == "pallas":
        from gssr_tpu.ops.blend2d_pallas import CHUNK as chunk
    binning = bin_gaussians(
        jax.lax.stop_gradient(rect),
        jax.lax.stop_gradient(proj.depth),
        jax.lax.stop_gradient(tiles),
        pw // TILE, tiles_yb, instance_cap, chunk=chunk)

    if backend == "pallas":
        from gssr_tpu.ops.blend2d_pallas import blend2d_pallas
        maps = blend2d_pallas(mean2d_b, Tmat_b, proj.normal, color,
                              opacity, binning, pw, render_h)
    elif backend == "reference":
        from gssr_tpu.ops.blend2d_ref import blend2d_reference
        maps = blend2d_reference(mean2d_b, Tmat_b, proj.normal, color,
                                 opacity, binning.gauss_id, binning.tile_of,
                                 pw, render_h)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    num_rendered, overflow = binning.num_rendered, binning.overflow
    if band_axis is not None:
        from types import SimpleNamespace

        from gssr_tpu.ops import band as band_ops
        maps = SimpleNamespace(**{
            f: band_ops.gather_bands(getattr(maps, f), band_axis)
            for f in ("color", "final_T", "depth_exp", "normal", "dist",
                      "median_depth", "median_normal", "median_contrib")})
        num_rendered, overflow = band_ops.merge_flags(
            num_rendered, overflow, band_axis)

    crop = lambda x: x[:height, :width]
    final_T = crop(maps.final_T)
    alpha = 1.0 - final_T
    image = crop(maps.color) + final_T[..., None] * jnp.asarray(bg)
    # view -> world normal rotation (twodgs_scene.py:99-101)
    normal_world = crop(maps.normal) @ camera.w2c[:3, :3]
    alpha_safe = jnp.where(alpha > 1e-6, alpha, 1.0)
    depth_expected = jnp.where(alpha > 1e-6,
                               crop(maps.depth_exp) / alpha_safe, 0.0)
    median_depth = jnp.nan_to_num(crop(maps.median_depth), 0.0)
    surf_depth = (depth_expected * (1.0 - depth_ratio)
                  + depth_ratio * median_depth)
    return Render2DOutput(
        image=image, final_T=final_T, alpha=alpha, normal=normal_world,
        depth_expected=depth_expected, median_depth=median_depth,
        surf_depth=surf_depth, dist=crop(maps.dist),
        median_normal=crop(maps.median_normal),
        median_contrib=crop(maps.median_contrib),
        radii=radii_local, mean2d=mean2d_local,
        num_rendered=num_rendered, overflow=overflow)
