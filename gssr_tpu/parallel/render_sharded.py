"""Pixel-sharded rendering: one image split into horizontal tile bands
across a device mesh.

The second TPU scaling axis next to camera-batch DP (parallel/train_step):
the BASELINE north star calls for "tiles/pixels sharded across chips".
Gaussian state is replicated; every device projects all gaussians (cheap,
N-sized) but bins and blends only the tile rows of its own band (the
I-sized and pixel-sized work — the actual cost — divides by the mesh).
Band images are reassembled with an all-gather over ICI; per-gaussian
gradients are psum'd, which XLA overlaps with the backward.

The band split is exact: binning drops instances whose tile row falls
outside the band (their rect rows are clipped per device), and the blend
within a band is independent of other bands by construction (tile
independence of the rasterizer).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gssr_tpu.ops import sh as sh_ops
from gssr_tpu.ops.binning import bin_gaussians
from gssr_tpu.ops.projection import TILE, preprocess
from gssr_tpu.ops.rasterize import pad_to_tiles


def _clip_rect_to_band(rect, ty0: int, ty1: int):
    """Clip tile rects to band rows [ty0, ty1) and rebase to band-local
    row coordinates. Empty intersections produce zero-area rects."""
    y0 = jnp.clip(rect[:, 1], ty0, ty1) - ty0
    y1 = jnp.clip(rect[:, 3], ty0, ty1) - ty0
    return jnp.stack([rect[:, 0], y0, rect[:, 2], y1], axis=1)


def build_band_render(width: int, height: int, instance_cap: int,
                      sh_degree: int = 3, backend: str = "pallas",
                      devices: Optional[Sequence] = None):
    """Returns (render_fn, mesh): render_fn(means, scales, rots, opac, sh,
    camera, bg) -> image [H, W, 3] assembled from per-device bands.

    instance_cap is PER DEVICE (a band holds ~1/n of the instances).
    """
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    mesh = Mesh(np.asarray(devices), ("band",))
    pw, ph = pad_to_tiles(width, height)
    tiles_y = ph // TILE
    assert tiles_y % n_dev == 0, (
        f"tile rows {tiles_y} must divide the {n_dev}-device band mesh")
    band_ty = tiles_y // n_dev
    band_h = band_ty * TILE

    if backend == "pallas":
        from gssr_tpu.ops.blend_pallas import CHUNK as chunk
    else:
        chunk = 1

    def per_device(means, scales, rots, opac, sh, camera, bg):
        dev = jax.lax.axis_index("band")
        ty0 = dev * band_ty

        proj = preprocess(means, scales, rots, camera, pw, ph,
                          opacity=opac.reshape(-1))
        rect_band = _clip_rect_to_band(proj.rect, ty0, ty0 + band_ty)
        tiles = ((rect_band[:, 2] - rect_band[:, 0])
                 * (rect_band[:, 3] - rect_band[:, 1]))
        tiles = jnp.where(proj.radius > 0, tiles, 0).astype(jnp.int32)
        # the per-gaussian intersect mask indexes the FULL rect's tiles,
        # which no longer matches band-clipped enumeration — drop it (band
        # clipping is already the coarse cull; exactness is unaffected)
        binning = bin_gaussians(
            jax.lax.stop_gradient(rect_band),
            jax.lax.stop_gradient(proj.depth),
            jax.lax.stop_gradient(tiles),
            pw // TILE, band_ty, instance_cap, chunk=chunk)

        color = sh_ops.sh_to_color(sh_degree, sh, means, camera.campos)
        if backend == "pallas":
            from gssr_tpu.ops.blend_pallas import blend_pallas
            # band-local mean2d: shift y by the band origin in pixels
            mean2d_b = proj.mean2d - jnp.array([0.0, ty0 * TILE])
            img, final_T = blend_pallas(mean2d_b, proj.conic, color,
                                        opac.reshape(-1), binning,
                                        pw, band_h, jnp.asarray(bg))
        else:
            from gssr_tpu.ops.blend_ref import blend_reference
            mean2d_b = proj.mean2d - jnp.array([0.0, ty0 * TILE])
            img, final_T = blend_reference(mean2d_b, proj.conic, color,
                                           opac.reshape(-1),
                                           binning.gauss_id, binning.tile_of,
                                           pw, band_h, jnp.asarray(bg))
        return img[None]     # [1, band_h, pw, 3] -> concatenated on axis 0

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=P("band"),
        check_rep=False)

    @jax.jit
    def render_fn(means, scales, rots, opac, sh, camera, bg):
        bands = fn(means, scales, rots, opac, sh, camera, bg)
        img = bands.reshape(ph, pw, 3)
        return img[:height, :width]

    return render_fn, mesh


def build_band_train_step(gaussians, width: int, height: int,
                          instance_cap: int, sh_degree: int = 3,
                          backend: str = "pallas",
                          devices: Optional[Sequence] = None):
    """One camera per step, its pixels sharded across the mesh: each device
    renders + differentiates its band's L1 against the matching gt band,
    then per-gaussian grads are psum'd over ICI and a replicated Adam step
    applies them. Returns (step_fn, mesh): step_fn(state, camera, gt, step).
    """
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    mesh = Mesh(np.asarray(devices), ("band",))
    pw, ph = pad_to_tiles(width, height)
    tiles_y = ph // TILE
    assert tiles_y % n_dev == 0
    band_ty = tiles_y // n_dev
    band_h = band_ty * TILE

    if backend == "pallas":
        from gssr_tpu.ops.blend_pallas import CHUNK as chunk
    else:
        chunk = 1

    def band_image(params, camera, bg, ty0):
        g = gaussians
        means = params.xyz
        opac = g.get_opacity(params)[:, 0]
        proj = preprocess(means, g.get_scaling(params),
                          g.get_rotation(params), camera, pw, ph,
                          opacity=opac)
        rect_band = _clip_rect_to_band(proj.rect, ty0, ty0 + band_ty)
        tiles = ((rect_band[:, 2] - rect_band[:, 0])
                 * (rect_band[:, 3] - rect_band[:, 1]))
        tiles = jnp.where(proj.radius > 0, tiles, 0).astype(jnp.int32)
        binning = bin_gaussians(
            jax.lax.stop_gradient(rect_band),
            jax.lax.stop_gradient(proj.depth),
            jax.lax.stop_gradient(tiles),
            pw // TILE, band_ty, instance_cap, chunk=chunk)
        color = sh_ops.sh_to_color(sh_degree, g.get_features(params), means,
                                   camera.campos)
        mean2d_b = proj.mean2d - jnp.array([0.0, 1.0]) * (ty0 * TILE)
        if backend == "pallas":
            from gssr_tpu.ops.blend_pallas import blend_pallas
            img, _ = blend_pallas(mean2d_b, proj.conic, color, opac,
                                  binning, pw, band_h, jnp.asarray(bg))
        else:
            from gssr_tpu.ops.blend_ref import blend_reference
            img, _ = blend_reference(mean2d_b, proj.conic, color, opac,
                                     binning.gauss_id, binning.tile_of,
                                     pw, band_h, jnp.asarray(bg))
        return img

    def per_device(state, camera, gt_pad, step):
        dev = jax.lax.axis_index("band")
        ty0 = dev * band_ty
        gt_band = jax.lax.dynamic_slice(
            gt_pad, (ty0 * TILE, 0, 0), (band_h, pw, 3))
        g = gaussians
        bg = jnp.zeros(3, jnp.float32)

        def loss_fn(params):
            img = band_image(params, camera, bg, ty0)
            return jnp.sum(jnp.abs(img - gt_band)) / (height * width * 3)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.tree.map(lambda x: jax.lax.psum(x, "band"), grads)
        loss = jax.lax.psum(loss, "band")
        lrs = g.learning_rates(step)
        new_params, new_adam = g.adam_step(state.params, grads, state.adam,
                                           lrs)
        return (state._replace(params=new_params, adam=new_adam),
                {"loss": loss})

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(), P(), P(), P()),
                   out_specs=(P(), P()),
                   check_rep=False)

    @jax.jit
    def step_fn(state, camera, gt, step):
        gt_pad = jnp.pad(gt, ((0, ph - height), (0, pw - width), (0, 0)))
        return fn(state, camera, gt_pad, step)

    return step_fn, mesh
