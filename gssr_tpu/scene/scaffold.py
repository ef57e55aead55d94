"""Scaffold-GS scene: anchor prefilter + neural-gaussian decode + render.

Parity: /root/reference/gssr/scene/scaffold_scene.py — anchor visibility
prefilter (the scaffold-filter CUDA extension becomes the vanilla jnp
preprocess radius test), view-dependent MLP decode, scaling regularization.
The decode + render + losses + Adam form one jitted step.
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import field
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gssr_tpu.configs.base import DataLoaderConfig
from gssr_tpu.dataio.dataset import ColmapDataLoader
from gssr_tpu.models.scaffold import (
    ScaffoldGaussianConfig,
    ScaffoldGaussians,
    ScaffoldState,
)
from gssr_tpu.ops.projection import preprocess
from gssr_tpu.ops.rasterize import pad_to_tiles, rasterize
from gssr_tpu.ops.ssim import l1_loss, psnr, ssim
from gssr_tpu.scene.vanilla import VanillaScene, VanillaSceneConfig


@dataclasses.dataclass
class ScaffoldSceneConfig(VanillaSceneConfig):
    gaussians: ScaffoldGaussianConfig = field(
        default_factory=ScaffoldGaussianConfig)
    lambda_scaling: float = 0.01


class ScaffoldScene(VanillaScene):
    config: ScaffoldSceneConfig

    def make_gaussians(self):
        return ScaffoldGaussians(
            self.config.gaussians, spatial_lr_scale=self.cameras_extent,
            num_cameras=len(self.dataloader.train_cameras))

    def init_state(self) -> ScaffoldState:
        pcd = self.dataloader.point_cloud
        return self.gaussians.create_from_points(pcd.points)

    # ------------------------------------------------------------------
    def prefilter_anchors(self, anchors, active, camera):
        """scaffold-filter visible_filter equivalent: run the vanilla
        preprocess on anchors (first 3 scaling cols) and test radius>0
        (scaffold_scene.py:122-155)."""
        pw, ph = pad_to_tiles(self.width, self.height)
        g = self.gaussians
        proj = preprocess(anchors.anchor, jnp.exp(anchors.scaling[:, :3]),
                          g.get_rotation(anchors), camera, pw, ph,
                          scaling_modifier=self.config.scaling_modifier,
                          active_mask=active)
        return proj.radius > 0

    def _gshard_capacity(self) -> int:
        # anchors + feat + offsets + Adam moments + stats are the HBM
        # consumer (reference scaffold_gaussian.py:96-160); they shard 1/D
        return self.state.anchors.anchor.shape[0]

    def decode_and_render(self, anchors, mlp, camera, cam_uid, visible,
                          active, bg, mean2d_offset=None,
                          level_scale_gate=None, band=False, gshard=False):
        g = self.gaussians
        ng = g.decode(anchors, mlp, camera.campos, cam_uid, visible, active,
                      level_scale_gate=level_scale_gate)
        out = self._rasterize_neural(ng, camera, bg, mean2d_offset,
                                     band=band, gshard=gshard)
        return ng, out

    def _rasterize_neural(self, ng, camera, bg, mean2d_offset, band=False,
                          gshard=False):
        return rasterize(
            ng.xyz, ng.scaling, ng.rotation, ng.opacity, camera,
            self.width, self.height, bg,
            colors_precomp=ng.color, active_mask=ng.mask,
            scaling_modifier=self.config.scaling_modifier,
            instance_cap=self.config.instance_cap,
            backend=self.config.backend,
            mean2d_offset=mean2d_offset,
            band_axis=self._axis if band else None,
            band_count=self._n_dev if band else 1,
            gauss_shard_axis=self._axis if gshard else None)

    def extra_losses(self, ng, out, step, camera) -> Dict[str, jnp.ndarray]:
        return {"scaling_loss": self.scaling_loss(ng)}

    def scaling_loss(self, ng, dims: int = 3):
        """lambda_scaling * mean over selected gaussians of prod(scaling)
        (scaffold_scene.py:182-185); masked mean replaces compaction.

        In gshard mode `ng` is this device's anchor shard, so the global
        masked mean psums the sum and the count over the shard axis —
        which also keeps the total loss replicated, as the rasterizer's
        gather_shards VJP contract requires. The psum rides under
        stop_gradient with the local summand re-added: psum's transpose is
        itself a psum, which would multiply the (replicated) cotangent by
        D; each device must receive exactly its own shard's gradient."""
        s = jnp.sum(jnp.where(ng.mask,
                              jnp.prod(ng.scaling[:, :dims], axis=-1), 0.0))
        cnt = jnp.sum(ng.mask.astype(jnp.float32))
        if self._pmode == "gshard":
            s = s + jax.lax.stop_gradient(
                jax.lax.psum(s, self._axis) - s)
            cnt = jax.lax.stop_gradient(jax.lax.psum(cnt, self._axis))
        return self.config.lambda_scaling * s / jnp.maximum(cnt, 1.0)

    def anchor_level_gate(self, state, camera, step, is_training=True):
        """Octree hook: per-anchor (visibility extra-mask, opacity gate)."""
        return None, None

    def bump_visible_budget(self) -> float:
        """Grow the compacted-decode anchor budget after a vb_overflow
        (visible anchors exceeded the static budget; the overflowing
        frame rendered with a truncated anchor set). Mirrors
        bump_instance_cap: raise the factor 1.5x (1.0 disables
        compaction) and retrace."""
        cfg = self.config.gaussians
        cfg.visible_budget_factor = min(cfg.visible_budget_factor * 1.5, 1.0)
        self._jit_cache.clear()
        return cfg.visible_budget_factor

    # ------------------------------------------------------------------
    def _train_step(self, sh_degree, state: ScaffoldState, camera, cam_uid,
                    gt, bg, step, par=None):
        g = self.gaussians
        cfg = self.config.gaussians
        band = par == "band"
        gshard = par == "gshard"
        extra_mask, gate = self.anchor_level_gate(state, camera, step)
        visible = self.prefilter_anchors(state.anchors, state.active, camera)
        if extra_mask is not None:
            visible = visible & extra_mask
        visible = jax.lax.stop_gradient(visible)

        K = cfg.n_offsets
        # inside the gshard shard_map body this is the LOCAL anchor shard,
        # so the decode budget, m2d hook and stats all stay shard-local
        CA = state.anchors.offset.shape[0]
        VBK = (g.visible_budget(CA) or CA) * K

        def loss_fn(anchors, mlp, m2d_offset):
            ng, out = self.decode_and_render(
                anchors, mlp, camera, cam_uid, visible, state.active, bg,
                mean2d_offset=m2d_offset, level_scale_gate=gate, band=band,
                gshard=gshard)
            lam = self.config.lambda_dssim
            terms = {
                "L1_loss": (1.0 - lam) * l1_loss(out.image, gt),
                "ssim_loss": lam * (1.0 - ssim(out.image, gt)),
            }
            terms.update(self.extra_losses(ng, out, step, camera))
            return sum(terms.values()), (out, ng, terms)

        zeros2d = jnp.zeros((VBK, 2), jnp.float32)
        (loss, (out, ng, terms)), (ga, gm, m2d_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.anchors, state.mlp, zeros2d)

        if gshard:
            # anchor grads are exact per shard (gather_shards slice VJP);
            # the replicated MLP saw only this shard's anchors, so its
            # total gradient is the SUM over shards
            gm = jax.tree.map(lambda x: jax.lax.psum(x, self._axis), gm)
        else:
            ga = self._pmerge_grads(ga)
            gm = self._pmerge_grads(gm)
        if band:
            m2d_grad = jax.lax.pmean(m2d_grad, self._axis)

        a_lrs, m_lrs = g.learning_rates(step)
        new_anchors, adam_a = g.adam_step(state.anchors, ga,
                                          state.adam_anchor, a_lrs)
        new_mlp, adam_m = g.adam_step(state.mlp, gm, state.adam_mlp, m_lrs)

        in_window = (step > cfg.start_stat) & (step < cfg.densify_until_iter)
        d_op, d_mask, d_radii, d_m2d = g.expand_stats_inputs(
            ng, out.radii, m2d_grad, CA)
        upd_stats = g.update_stats(state.stats, d_op, d_mask,
                                   d_radii, d_m2d, visible, state.active,
                                   g.ndc_grad_scale(self.width, self.height))
        if par == "dp":
            upd_stats = g.dp_merge_stats(state.stats, upd_stats, self._axis)
        stats = jax.tree.map(
            lambda new, old: jnp.where(in_window, new, old),
            upd_stats, state.stats)

        new_state = state._replace(anchors=new_anchors, mlp=new_mlp,
                                   adam_anchor=adam_a, adam_mlp=adam_m,
                                   stats=stats)
        metrics = dict(terms)
        metrics["loss"] = loss
        metrics["num_rendered"] = out.num_rendered
        metrics["overflow"] = out.overflow
        if ng.vb_overflow is not None:
            metrics["vb_overflow"] = ng.vb_overflow
        return new_state, self._pmerge_metrics(metrics)

    def _build_step_fn(self, sh_degree: int):
        par = self._pmode
        if par is None:
            return jax.jit(functools.partial(self._train_step, sh_degree),
                           donate_argnums=(0,))
        from jax.sharding import PartitionSpec as P
        cam_spec, gt_spec = self._shard_specs()

        if par == "dp":
            def body(state, cam_b, uid_b, gt_b, bg, step):
                cam = jax.tree.map(lambda x: x[0], cam_b)
                return self._train_step(sh_degree, state, cam, uid_b[0],
                                        gt_b[0], bg, step, par="dp")
        else:
            def body(state, cam, uid, gt, bg, step):
                return self._train_step(sh_degree, state, cam, uid,
                                        gt, bg, step, par=par)

        state_spec = P() if par != "gshard" else self._state_specs()
        fn = jax.shard_map(
            body, mesh=self._mesh,
            in_specs=(state_spec, cam_spec, cam_spec, gt_spec, P(), P()),
            out_specs=(state_spec, P()), check_vma=False)
        return jax.jit(fn, donate_argnums=(0,))

    def block_events(self):
        cfg = self.config.gaussians
        return ([cfg.densification_interval], [], [])

    def train_block(self, state, cameras, step0: int):
        K = len(cameras)
        fn = self._jit_cache.get(("block", K))
        if fn is None:
            fn = self._build_block_fn(K)
            self._jit_cache[("block", K)] = fn
        cam_stack, gts = self._batch_cameras(cameras)
        uids = jnp.asarray([c.uid for c in cameras])
        bgs = jnp.stack([self.get_background(step0 + i) for i in range(K)])
        steps = jnp.arange(step0, step0 + K, dtype=jnp.float32)
        return fn(state, cam_stack, uids, gts, bgs, steps)

    def _build_block_fn(self, K: int):
        def block(state, cams, uids, gts, bgs, steps):
            def body(st, x):
                cam, uid, gt, bg, step = x
                return self._train_step(0, st, cam, uid, gt, bg, step)

            return jax.lax.scan(body, state, (cams, uids, gts, bgs, steps))

        return jax.jit(block, donate_argnums=(0,))

    def train_step(self, state, camera, step: int):
        fn = self._jit_cache.get("train")
        if fn is None:
            fn = self._build_step_fn(0)
            self._jit_cache["train"] = fn
        bg = self.get_background(step)
        if self._pmode == "dp":
            cam_arrays, gt = self._batch_cameras(camera)
            uid = jnp.asarray([c.uid for c in camera])
        else:
            cam_arrays = camera.arrays()
            gt = self.gt_device(camera)
            uid = jnp.asarray(camera.uid)
        return fn(state, cam_arrays, uid, gt, bg,
                  jnp.asarray(step, jnp.float32))

    # ------------------------------------------------------------------
    def densify(self, state: ScaffoldState, step: int) -> ScaffoldState:
        cfg = self.config.gaussians
        if (cfg.densify_from_iter < step < cfg.densify_until_iter
                and step % cfg.densification_interval == 0):
            fn = self._jit_cache.get("densify")
            if fn is None:
                fn = jax.jit(functools.partial(
                    self.gaussians.adjust_anchor,
                    voxel_size=self.gaussians.voxel_size),
                    donate_argnums=(0,))
                self._jit_cache["densify"] = fn
            self.key, k = jax.random.split(self.key)
            state = fn(state, k)
        return state

    # ------------------------------------------------------------------
    def eval_render(self, state: ScaffoldState, camera, step: int):
        fn = self._jit_cache.get("eval")
        if fn is None:
            def _eval(st, cam, cam_uid, bg):
                extra_mask, gate = self.anchor_level_gate(
                    st, cam, jnp.asarray(0.0), is_training=False)
                visible = self.prefilter_anchors(st.anchors, st.active, cam)
                if extra_mask is not None:
                    visible = visible & extra_mask
                _, out = self.decode_and_render(
                    st.anchors, st.mlp, cam, cam_uid, visible, st.active, bg,
                    level_scale_gate=gate)
                return out
            fn = jax.jit(_eval)
            self._jit_cache["eval"] = fn
        return fn(state, camera.arrays(), jnp.asarray(camera.uid),
                  self.background)

    def save_gaussians(self, state: ScaffoldState, path: str):
        self.gaussians.save_ply(state, path)
        self.gaussians.save_mlp_checkpoints(
            state, path.replace(".ply", "_mlp.npz"))

    def load_gaussians(self, path: str) -> ScaffoldState:
        state = self.gaussians.load_ply(path)
        mlp_path = path.replace(".ply", "_mlp.npz")
        import os
        if os.path.exists(mlp_path):
            state = self.gaussians.load_mlp_checkpoints(state, mlp_path)
        return state
