"""Standalone multi-chip render/step builders over a device mesh.

The full multi-chip TRAINING integration lives in the scenes themselves
(`scene.setup_parallel("dp"|"band")`, used by the Trainer via
`--machine.parallel`): every method family's jitted train step runs under
shard_map with grads pmean'd over ICI, and in band mode the rasterizer
shards binning+blend by tile rows and all_gathers the maps (ops/band.py).

This module provides the render-only convenience for inference/eval
pipelines that want a banded render without building a scene.

Parity note: the reference has no working intra-job parallelism at all —
its train.py:78-80 refuses world_size > 1; SURVEY §2.3 maps this to the
TPU mesh axes implemented here.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def build_band_render(width: int, height: int, instance_cap: int,
                      sh_degree: int = 3, backend: str = "pallas",
                      devices: Optional[Sequence] = None):
    """Returns (render_fn, mesh): render_fn(means, scales, rots, opac, sh,
    camera, bg) -> image [H, W, 3]; each device bins and blends only its
    tile-row band (instance_cap is PER DEVICE), the bands ride an
    all_gather over ICI.
    """
    from gssr_tpu.ops.rasterize import rasterize

    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    mesh = Mesh(np.asarray(devices), ("band",))

    def per_device(means, scales, rots, opac, sh, camera, bg):
        out = rasterize(means, scales, rots, opac, camera, width, height,
                        bg, sh_coeffs=sh, sh_degree=sh_degree,
                        instance_cap=instance_cap, backend=backend,
                        band_axis="band", band_count=n_dev)
        return out.image

    fn = jax.shard_map(per_device, mesh=mesh,
                       in_specs=(P(),) * 7, out_specs=P(),
                       check_vma=False)
    return jax.jit(fn), mesh
