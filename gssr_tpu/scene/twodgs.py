"""2DGS scene: surfel rendering + normal/distortion regularization.

Parity: /root/reference/gssr/scene/twodgs_scene.py — same loss schedule
(normal after step 7000, distortion after 3000), depth_ratio surf-depth mix,
and the depth->pseudo-surface-normal consistency term.
"""
from __future__ import annotations

import dataclasses
from dataclasses import field

import jax
import jax.numpy as jnp

from gssr_tpu.models.twod import TwoDGaussianConfig, TwoDGaussians
from gssr_tpu.ops.rasterize2d import rasterize_2d
from gssr_tpu.scene.vanilla import VanillaScene, VanillaSceneConfig


@dataclasses.dataclass
class TwoDGSSceneConfig(VanillaSceneConfig):
    gaussians: TwoDGaussianConfig = field(default_factory=TwoDGaussianConfig)
    lambda_dist: float = 0.0
    lambda_normal: float = 0.05
    depth_ratio: float = 0.0


def surf_normal_from_depth(surf_depth, alpha, camera):
    """Unproject surf_depth to world points and finite-difference a pseudo
    surface normal (reference point_utils.depth_to_normal), scaled by
    detached alpha."""
    H, W = surf_depth.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    dir_cam = jnp.stack([(gx - camera.cx) / camera.fx,
                         (gy - camera.cy) / camera.fy,
                         jnp.ones_like(gx)], axis=-1)       # [H,W,3]
    R_c2w = camera.w2c[:3, :3].T
    dir_world = dir_cam @ R_c2w.T
    points = surf_depth[..., None] * dir_world + camera.campos
    dv = points[2:, 1:-1] - points[:-2, 1:-1]
    dh = points[1:-1, 2:] - points[1:-1, :-2]
    nrm = jnp.cross(dv, dh)
    # rsqrt(sum+eps): linalg.norm's gradient at an exactly-zero vector
    # (empty image regions) is nan
    nrm = nrm * jax.lax.rsqrt(
        jnp.sum(nrm * nrm, axis=-1, keepdims=True) + 1e-12)
    nrm = jnp.pad(nrm, ((1, 1), (1, 1), (0, 0)))
    return nrm * jax.lax.stop_gradient(alpha)[..., None]


def surfel_reg_losses(out, camera, step, lambda_normal, lambda_dist):
    """2DGS regularization terms with their step schedules
    (twodgs_scene.py:25-35)."""
    lam_n = jnp.where(step > 7000, lambda_normal, 0.0)
    lam_d = jnp.where(step > 3000, lambda_dist, 0.0)
    surf_normal = surf_normal_from_depth(out.surf_depth, out.alpha, camera)
    normal_error = 1.0 - jnp.sum(out.normal * surf_normal, axis=-1)
    return {"normal_loss": lam_n * jnp.mean(normal_error),
            "dist_loss": lam_d * jnp.mean(out.dist)}


class TwoDGSScene(VanillaScene):
    config: TwoDGSSceneConfig

    def make_gaussians(self):
        return TwoDGaussians(self.config.gaussians,
                             spatial_lr_scale=self.cameras_extent)

    def render_params(self, params, camera, sh_degree: int, active, bg,
                      mean2d_offset=None, band_axis=None,
                      band_count: int = 1, gauss_shard_axis=None):
        g = self.gaussians
        out = rasterize_2d(
            params.xyz, g.get_scaling(params), g.get_rotation(params),
            g.get_opacity(params)[:, 0], camera,
            self.width, self.height, bg,
            sh_coeffs=g.get_features(params), sh_degree=sh_degree,
            active_mask=active,
            scaling_modifier=self.config.scaling_modifier,
            instance_cap=self.config.instance_cap,
            backend=self.config.backend,
            depth_ratio=self.config.depth_ratio,
            mean2d_offset=mean2d_offset,
            band_axis=band_axis, band_count=band_count,
            gauss_shard_axis=gauss_shard_axis)
        return out

    def loss_terms(self, out, gt, camera_extra=None, step=None):
        terms = super().loss_terms(out, gt, step=step)
        terms.update(surfel_reg_losses(out, self._current_camera, step,
                                       self.config.lambda_normal,
                                       self.config.lambda_dist))
        return terms

    # the camera is needed inside loss_terms for the depth->normal
    # unprojection; VanillaScene's train step passes it via this hook
    def _train_step(self, sh_degree, state, camera, gt, bg, step, par=None):
        self._current_camera = camera
        return super()._train_step(sh_degree, state, camera, gt, bg, step,
                                   par=par)
