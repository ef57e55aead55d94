"""Differentiable gaussian rasterization — the public op.

Replaces the reference's diff-gaussian-rasterization autograd.Function
(`GaussianRasterizer.__call__`, submodules/diff-gaussian-rasterization/
diff_gaussian_rasterization/__init__.py:44-155) with a TPU-native pipeline:

  preprocess (jnp, XLA autodiff)
    -> binning/sort (jnp, stop-gradient index math)
    -> per-instance gather (jnp; its VJP is the scatter-add back to gaussians)
    -> tile blend (Pallas custom-VJP kernel, or the jnp reference scan)

Gradient flow: XLA differentiates projection/SH/gather automatically; only
the blend carries a hand-written analytic VJP mirroring backward.cu:400-557.
Screen-space (mean2d) gradients needed for densification statistics are
returned explicitly instead of the reference's retain_grad zero-tensor trick.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gssr_tpu.ops import sh as sh_ops
from gssr_tpu.ops.binning import Binning, bin_gaussians
from gssr_tpu.ops.blend_ref import blend_reference
from gssr_tpu.ops.projection import TILE, Projected, preprocess


def pad_to_tiles(width: int, height: int):
    pw = (width + TILE - 1) // TILE * TILE
    ph = (height + TILE - 1) // TILE * TILE
    return pw, ph


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gather_shards(x, axis):
    """all_gather(tiled) over the gaussian-shard axis with a SLICE VJP.

    The built-in all_gather transpose is a psum_scatter, which SUMS the
    per-device cotangents — correct in general, but for gshard the loss
    (and hence the gathered array's cotangent) is replicated across the
    axis, where the sum over-counts by the axis size. (Measured: under
    shard_map check_vma=False the built-in transpose yields 1x or Dx
    depending on the surrounding graph.) Every gshard consumer satisfies
    the replicated-cotangent contract — the blend output feeds a
    full-frame loss computed identically on every device — so the exact
    VJP is each device slicing out its own shard's cotangent.
    """
    return jax.lax.all_gather(x, axis, axis=0, tiled=True)


def _gather_shards_fwd(x, axis):
    return gather_shards(x, axis), x.shape[0]


def _gather_shards_bwd(axis, shard_n, cot):
    i = jax.lax.axis_index(axis)
    return (jax.lax.dynamic_slice_in_dim(cot, i * shard_n, shard_n, 0),)


gather_shards.defvjp(_gather_shards_fwd, _gather_shards_bwd)


class RenderOutput(NamedTuple):
    image: jnp.ndarray          # [H,W,3]
    final_T: jnp.ndarray        # [H,W] transmittance after blending
    radii: jnp.ndarray          # [N] int32
    mean2d: jnp.ndarray         # [N,2] screen positions (differentiable)
    num_rendered: jnp.ndarray   # [] int32
    overflow: jnp.ndarray       # [] bool


def _blend_dispatch(mean2d, conic, color, opacity, binning: Binning,
                    width, height, bg, backend: str):
    """Gather per-instance attrs and run the selected blend backend."""
    if backend == "reference":
        return blend_reference(mean2d, conic, color, opacity,
                               binning.gauss_id, binning.tile_of,
                               width, height, bg)
    elif backend == "pallas":
        from gssr_tpu.ops.blend_pallas import blend_pallas
        return blend_pallas(mean2d, conic, color, opacity, binning,
                            width, height, bg)
    raise ValueError(f"unknown blend backend {backend!r}")


def rasterize(means3d, scales, rotations, opacity, camera,
              width: int, height: int, bg,
              sh_coeffs=None, sh_degree: int = 0, colors_precomp=None,
              active_mask=None, scaling_modifier: float = 1.0,
              instance_cap: int = 1 << 18,
              backend: str = "pallas",
              mean2d_offset=None,
              band_axis=None, band_count: int = 1,
              gauss_shard_axis=None) -> RenderOutput:
    """Render gaussians through one camera.

    Args:
      means3d [N,3], scales [N,3] (activated), rotations [N,4] quats,
      opacity [N] (activated, in [0,1]).
      sh_coeffs [N,K,3] or colors_precomp [N,3] — exactly one must be given.
      width/height: output image size (unpadded); rendering happens on the
        TILE-padded grid and is cropped.
      active_mask [N] bool: mask for fixed-capacity padding.
      instance_cap: static capacity of the duplicated instance buffer
        (PER DEVICE when band-sharded).
      band_axis/band_count: when set (inside shard_map), each device bins
        and blends only its horizontal tile-row band; the maps are
        all_gather'd back so outputs are full-frame (ops/band.py).
      gauss_shard_axis: when set (inside shard_map), the per-gaussian
        inputs are each device's 1/D shard of the model state: the N-sized
        preprocess + SH decode run shard-locally, and only the compact
        per-gaussian screen attributes (~16 floats vs the 60+ of raw
        state) are all_gather'd into the replicated binning/blend path
        (SURVEY §2.3(b) gaussian sharding — per-chip HBM then holds 1/D of
        params + Adam moments). CONTRACT: the loss downstream of this
        render must be computed identically on every device of the shard
        axis (a full-frame, replicated loss) — gather_shards' slice VJP
        assumes a replicated cotangent and silently over/under-counts for
        per-device losses; tests/test_parallel.py::test_gshard_grads_exact
        is the gate for any new gshard consumer. Returned radii/mean2d
        stay SHARD-LOCAL so densification statistics update locally.
        Mutually exclusive with band_axis.
    """
    pw, ph = pad_to_tiles(width, height)
    proj = preprocess(means3d, scales, rotations, camera, pw, ph,
                      scaling_modifier=scaling_modifier,
                      active_mask=active_mask,
                      opacity=opacity.reshape(-1))
    if mean2d_offset is not None:
        # zero-valued hook so callers can take d(loss)/d(mean2d) for
        # densification stats (replaces the reference's retain_grad trick,
        # vanilla_scene.py:114-118)
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        color = sh_ops.sh_to_color(sh_degree, sh_coeffs, means3d, camera.campos)

    opacity = opacity.reshape(-1)
    radii_local, mean2d_local = proj.radius, proj.mean2d
    if gauss_shard_axis is not None:
        assert band_axis is None, \
            "gaussian sharding and band sharding are mutually exclusive"
        ag = lambda x: (None if x is None
                        else gather_shards(x, gauss_shard_axis))
        proj = proj._replace(
            mean2d=ag(proj.mean2d), conic=ag(proj.conic),
            depth=ag(proj.depth), rect=ag(proj.rect),
            tiles_touched=ag(proj.tiles_touched),
            tile_mask=ag(proj.tile_mask))
        color = ag(color)
        opacity = ag(opacity)

    if band_axis is None:
        tiles_yb, render_h = ph // TILE, ph
        rect, tiles, mask = proj.rect, proj.tiles_touched, proj.tile_mask
        exact = proj.exact_tiles
        mean2d_b = proj.mean2d
    else:
        from gssr_tpu.ops import band as band_ops
        assert (ph // TILE) % band_count == 0, \
            f"tile rows {ph // TILE} must divide band_count {band_count}"
        tiles_yb = (ph // TILE) // band_count
        render_h = tiles_yb * TILE
        ty0 = band_ops.band_ty0(band_axis, tiles_yb)
        rect, tiles, mask, exact = band_ops.clip_to_band(
            proj.rect, proj.tiles_touched, proj.tile_mask, ty0, tiles_yb)
        mean2d_b = band_ops.shift_mean2d(proj.mean2d, ty0)

    if backend == "pallas":
        from gssr_tpu.ops.blend_pallas import CHUNK
        chunk = CHUNK
    else:
        chunk = 1
    binning = bin_gaussians(
        jax.lax.stop_gradient(rect),
        jax.lax.stop_gradient(proj.depth),
        jax.lax.stop_gradient(tiles),
        pw // TILE, tiles_yb, instance_cap, chunk=chunk,
        tile_mask=mask)

    image, final_T = _blend_dispatch(mean2d_b, proj.conic, color, opacity,
                                     binning, pw, render_h, jnp.asarray(bg),
                                     backend)
    num_rendered, overflow = binning.num_rendered, binning.overflow
    if band_axis is not None:
        from gssr_tpu.ops import band as band_ops
        image = band_ops.gather_bands(image, band_axis)
        final_T = band_ops.gather_bands(final_T, band_axis)
        num_rendered, overflow = band_ops.merge_flags(
            num_rendered, overflow, band_axis)
    image = image[:height, :width]
    final_T = final_T[:height, :width]
    return RenderOutput(image=image, final_T=final_T, radii=radii_local,
                        mean2d=mean2d_local, num_rendered=num_rendered,
                        overflow=overflow)
