"""2DGS surfel gaussian model: 2-axis scaling, in-plane splits.

Parity: /root/reference/gssr/gaussian/twod_gaussian.py — drops the z scale
(disks), samples split children only in the disk plane, and uses a higher
opacity cull threshold (0.05).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gssr_tpu.models.vanilla import VanillaGaussianConfig, VanillaGaussians


@dataclasses.dataclass(frozen=True)
class TwoDGaussianConfig(VanillaGaussianConfig):
    opacity_cull_threshold: float = 0.05


class TwoDGaussians(VanillaGaussians):
    scale_dim = 2

    def split_displacement(self, R, scaling, noise):
        # sample in the disk plane only (twod_gaussian.py:30-34: z std = 0)
        d = noise * scaling                       # [C,2]
        return (R[..., :, 0] * d[..., 0:1] + R[..., :, 1] * d[..., 1:2])
