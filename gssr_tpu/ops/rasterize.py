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
              mean2d_offset=None) -> RenderOutput:
    """Render gaussians through one camera.

    Args:
      means3d [N,3], scales [N,3] (activated), rotations [N,4] quats,
      opacity [N] (activated, in [0,1]).
      sh_coeffs [N,K,3] or colors_precomp [N,3] — exactly one must be given.
      width/height: output image size (unpadded); rendering happens on the
        TILE-padded grid and is cropped.
      active_mask [N] bool: mask for fixed-capacity padding.
      instance_cap: static capacity of the duplicated instance buffer.
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

    if backend == "pallas":
        from gssr_tpu.ops.blend_pallas import CHUNK
        chunk = CHUNK
    else:
        chunk = 1
    binning = bin_gaussians(
        jax.lax.stop_gradient(proj.rect),
        jax.lax.stop_gradient(proj.depth),
        jax.lax.stop_gradient(proj.tiles_touched),
        pw // TILE, ph // TILE, instance_cap, chunk=chunk,
        tile_mask=proj.tile_mask)

    opacity = opacity.reshape(-1)
    image, final_T = _blend_dispatch(proj.mean2d, proj.conic, color, opacity,
                                     binning, pw, ph, jnp.asarray(bg), backend)
    image = image[:height, :width]
    final_T = final_T[:height, :width]
    return RenderOutput(image=image, final_T=final_T, radii=proj.radius,
                        mean2d=proj.mean2d, num_rendered=binning.num_rendered,
                        overflow=binning.overflow)
