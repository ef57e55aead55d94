"""Octree-GS scene: LOD anchor masks + progressive coarse-to-fine.

Parity: /root/reference/gssr/scene/octree_scene.py — set_anchor_mask per
camera before decode, prefilter restricted to the LOD mask, optional
progressive-level opacity ramp. Builds on ScaffoldScene via the
anchor_level_gate hook.
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import field

import jax
import jax.numpy as jnp

from gssr_tpu.models.octree import (
    OctreeGaussianConfig,
    OctreeGaussians,
    OctreeState,
)
from gssr_tpu.scene.scaffold import ScaffoldScene, ScaffoldSceneConfig


@dataclasses.dataclass
class OctreeSceneConfig(ScaffoldSceneConfig):
    gaussians: OctreeGaussianConfig = field(
        default_factory=OctreeGaussianConfig)
    coarse_iter: int = 10000
    coarse_factor: float = 1.5


class OctreeScene(ScaffoldScene):
    config: OctreeSceneConfig

    def make_gaussians(self):
        return OctreeGaussians(
            self.config.gaussians, spatial_lr_scale=self.cameras_extent,
            num_cameras=len(self.dataloader.train_cameras))

    def init_state(self) -> OctreeState:
        pcd = self.dataloader.point_cloud
        state = self.gaussians.create_from_points(
            pcd.points, cameras=self.dataloader.train_cameras)
        self.gaussians.set_coarse_interval(self.config.coarse_iter,
                                           self.config.coarse_factor)
        return state

    def anchor_level_gate(self, state, camera, step, is_training=True):
        return self.gaussians.pred_int_level(state, camera.campos, step,
                                             is_training)

    def densify(self, state: OctreeState, step: int) -> OctreeState:
        cfg = self.config.gaussians
        if not cfg.update_anchor:
            return state
        if (cfg.densify_from_iter < step < cfg.densify_until_iter
                and step % cfg.densification_interval == 0):
            fn = self._jit_cache.get("densify")
            if fn is None:
                fn = jax.jit(self.gaussians.adjust_anchor_octree,
                             donate_argnums=(0,))
                self._jit_cache["densify"] = fn
            self.key, k = jax.random.split(self.key)
            state = fn(state, k, jnp.asarray(step, jnp.float32))
        return state
