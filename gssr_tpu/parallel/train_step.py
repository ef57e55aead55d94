"""Multi-chip data-parallel training step (camera-batch DP over a mesh).

The reference has no working intra-job parallelism (train.py:78-80 refuses
world_size>1; SURVEY §2.3). This module provides the TPU-native scaling
axis: a jax.sharding.Mesh over chips, cameras sharded along "data", gaussian
state replicated, gradients and metrics psum'd over ICI inside shard_map —
XLA overlaps the all-reduce with the backward pass.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gssr_tpu.cameras import CameraArrays
from gssr_tpu.models.vanilla import DensifyStats, GaussianState
from gssr_tpu.ops.rasterize import rasterize
from gssr_tpu.ops.ssim import l1_loss, ssim


def build_dp_train_step(gaussians, width: int, height: int,
                        instance_cap: int, backend: str = "pallas",
                        lambda_dssim: float = 0.2,
                        devices: Optional[Sequence] = None,
                        sh_degree: int = 3):
    """Returns (step_fn, mesh): step_fn(state, camera_batch, gt_batch, step).

    camera_batch: CameraArrays with leading axis == mesh size.
    gt_batch: [n_dev, H, W, 3].
    The returned state is replicated (identical) across devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    mesh = Mesh(np.asarray(devices), ("data",))
    n_dev = len(devices)

    def per_device(state: GaussianState, cam_sl, gt_sl, step):
        cam = jax.tree.map(lambda x: x[0], cam_sl)     # this device's camera
        gt = gt_sl[0]
        g = gaussians

        def loss_fn(params, m2d_offset):
            out = rasterize(
                params.xyz, g.get_scaling(params), g.get_rotation(params),
                g.get_opacity(params)[:, 0], cam, width, height,
                jnp.zeros(3, jnp.float32),
                sh_coeffs=g.get_features(params), sh_degree=sh_degree,
                active_mask=state.active, instance_cap=instance_cap,
                backend=backend, mean2d_offset=m2d_offset)
            l1 = l1_loss(out.image, gt)
            s = ssim(out.image, gt)
            loss = (1 - lambda_dssim) * l1 + lambda_dssim * (1 - s)
            return loss, out

        zeros2d = jnp.zeros_like(state.params.xyz[:, :2])
        (loss, out), (pgrads, m2d_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, zeros2d)

        # gradient all-reduce over ICI
        pgrads = jax.tree.map(
            lambda x: jax.lax.pmean(x, "data"), pgrads)

        lrs = g.learning_rates(step)
        new_params, new_adam = g.adam_step(state.params, pgrads,
                                           state.adam, lrs)
        # densification stats: sum deltas, max radii across the batch
        local = g.update_stats(state.stats, out.radii, m2d_grad,
                               g.ndc_grad_scale(width, height))
        stats = DensifyStats(
            max_radii2d=jax.lax.pmax(local.max_radii2d, "data"),
            grad_accum=state.stats.grad_accum + jax.lax.psum(
                local.grad_accum - state.stats.grad_accum, "data"),
            denom=state.stats.denom + jax.lax.psum(
                local.denom - state.stats.denom, "data"))

        metrics = {"loss": jax.lax.pmean(loss, "data"),
                   "num_rendered": jax.lax.pmax(
                       out.num_rendered.astype(jnp.float32), "data")}
        new_state = state._replace(params=new_params, adam=new_adam,
                                   stats=stats)
        return new_state, metrics

    state_spec = P()        # replicated
    batch_spec = P("data")

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(state_spec, batch_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_rep=False)

    @jax.jit
    def step_fn(state, camera_batch: CameraArrays, gt_batch, step):
        return fn(state, camera_batch, gt_batch, step)

    return step_fn, mesh
