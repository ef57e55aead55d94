"""Scaffold-GS + 2DGS: neural gaussians rendered as surfels.

Parity: /root/reference/gssr/scene/scaffold_2dgs_scene.py — decode keeps
only the first two scales, renders via the surfel rasterizer, and combines
the 2DGS regularizers with the scaffold scaling loss.
"""
from __future__ import annotations

import dataclasses

from gssr_tpu.ops.rasterize2d import rasterize_2d
from gssr_tpu.scene.scaffold import ScaffoldScene, ScaffoldSceneConfig
from gssr_tpu.scene.twodgs import surfel_reg_losses


@dataclasses.dataclass
class Scaffold2DGSSceneConfig(ScaffoldSceneConfig):
    lambda_dist: float = 0.0
    lambda_normal: float = 0.05
    depth_ratio: float = 0.0


class Scaffold2DGSScene(ScaffoldScene):
    config: Scaffold2DGSSceneConfig

    def _rasterize_neural(self, ng, camera, bg, mean2d_offset, band=False,
                          gshard=False):
        return rasterize_2d(
            ng.xyz, ng.scaling[:, :2], ng.rotation, ng.opacity, camera,
            self.width, self.height, bg,
            colors_precomp=ng.color, active_mask=ng.mask,
            scaling_modifier=self.config.scaling_modifier,
            instance_cap=self.config.instance_cap,
            backend=self.config.backend,
            depth_ratio=self.config.depth_ratio,
            mean2d_offset=mean2d_offset,
            band_axis=self._axis if band else None,
            band_count=self._n_dev if band else 1,
            gauss_shard_axis=self._axis if gshard else None)

    def extra_losses(self, ng, out, step, camera):
        terms = surfel_reg_losses(out, camera, step,
                                  self.config.lambda_normal,
                                  self.config.lambda_dist)
        terms["scaling_loss"] = self.scaling_loss(ng, dims=2)
        return terms
