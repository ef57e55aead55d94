"""Octree-GS + PGSR.

Parity: /root/reference/gssr/scene/octree_pgsr_scene.py — PGSR losses with
LOD anchors; the near camera gets its own anchor mask
(octree_pgsr_scene.py:26-46), which the ScaffoldPGSRScene step already does
through the anchor_level_gate hook.
"""
from __future__ import annotations

import dataclasses
from dataclasses import field

from gssr_tpu.models.octree import OctreeGaussianConfig
from gssr_tpu.scene.octree import OctreeScene, OctreeSceneConfig
from gssr_tpu.scene.scaffold_pgsr import (
    ScaffoldPGSRScene,
    ScaffoldPGSRSceneConfig,
)


@dataclasses.dataclass
class OctreePGSRSceneConfig(OctreeSceneConfig):
    lambda_normal: float = 0.015
    lambda_ncc: float = 0.15
    lambda_geo: float = 0.03
    patch_size: int = 3
    num_sample: int = 102400
    pixel_noise_threshold: float = 1.0
    num_multi_view: int = 5
    multi_view_from: int = 7000


class OctreePGSRScene(OctreeScene, ScaffoldPGSRScene):
    config: OctreePGSRSceneConfig
