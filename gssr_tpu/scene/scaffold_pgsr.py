"""Scaffold-GS + PGSR: neural gaussians rendered as planar splats.

Parity: /root/reference/gssr/scene/scaffold_pgsr_scene.py (MRO of PGSRScene
over ScaffoldScene): PGSR losses incl. the near-camera render, plus the
scaffold scaling loss; densification stays anchor-based (PGSR's abs-grad
machinery is unused by scaffold models, as in the reference).
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import field

import jax
import jax.numpy as jnp
import numpy as np

from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr
from gssr_tpu.ops.sampling import erode, image_grad_weight, rgb_to_gray
from gssr_tpu.ops.ssim import l1_loss, ssim
from gssr_tpu.scene.pgsr import PGSRScene, PGSRSceneConfig
from gssr_tpu.scene.scaffold import ScaffoldScene, ScaffoldSceneConfig


@dataclasses.dataclass
class ScaffoldPGSRSceneConfig(ScaffoldSceneConfig):
    lambda_normal: float = 0.015
    lambda_ncc: float = 0.15
    lambda_geo: float = 0.03
    patch_size: int = 3
    num_sample: int = 102400
    pixel_noise_threshold: float = 1.0
    num_multi_view: int = 5
    multi_view_from: int = 7000


class ScaffoldPGSRScene(ScaffoldScene):
    config: ScaffoldPGSRSceneConfig

    def __init__(self, config, source_dir, eval=False, seed=0,
                 dataloader=None):
        super().__init__(config, source_dir, eval, seed, dataloader)
        self._near_seed = seed ^ 0x9E3779B9
        self._near_draws = 0
        from gssr_tpu.dataio.view_selection import assign_near_ids
        try:
            assign_near_ids(self.dataloader.train_cameras, source_dir,
                            num_views=config.num_multi_view)
        except FileNotFoundError:
            pass

    # PGSR loss helpers reused from PGSRScene (unbound-style calls)
    depth_normal = PGSRScene.depth_normal
    _multi_view_losses = PGSRScene._multi_view_losses
    key_host_choice = PGSRScene.key_host_choice

    def aux_state(self):
        aux = super().aux_state()
        aux["near_draws"] = jnp.asarray(self._near_draws)
        return aux

    def restore_aux(self, aux):
        super().restore_aux(aux)
        if "near_draws" in aux:
            self._near_draws = int(aux["near_draws"])

    def _rasterize_neural(self, ng, camera, bg, mean2d_offset):
        return rasterize_pgsr(
            ng.xyz, ng.scaling, ng.rotation, ng.opacity, camera,
            self.width, self.height, bg,
            colors_precomp=ng.color, active_mask=ng.mask,
            scaling_modifier=self.config.scaling_modifier,
            instance_cap=self.config.instance_cap,
            backend=self.config.backend,
            mean2d_offset=mean2d_offset)

    # ------------------------------------------------------------------
    def _train_step(self, sh_degree, multi_view, state, camera, near_camera,
                    cam_uid, near_uid, gt, near_gray, bg, step, key):
        g = self.gaussians
        cfg = self.config
        gcfg = cfg.gaussians

        extra_mask, gate = self.anchor_level_gate(state, camera, step)
        visible = self.prefilter_anchors(state.anchors, state.active, camera)
        if extra_mask is not None:
            visible = visible & extra_mask
        visible = jax.lax.stop_gradient(visible)

        if multi_view:
            n_extra, n_gate = self.anchor_level_gate(state, near_camera, step)
            n_visible = self.prefilter_anchors(state.anchors, state.active,
                                               near_camera)
            if n_extra is not None:
                n_visible = n_visible & n_extra
            n_visible = jax.lax.stop_gradient(n_visible)

        K = gcfg.n_offsets
        CAK = state.anchors.offset.shape[0] * K

        def loss_fn(anchors, mlp, m2d_offset):
            ng, out = self.decode_and_render(
                anchors, mlp, camera, cam_uid, visible, state.active, bg,
                mean2d_offset=m2d_offset, level_scale_gate=gate)
            lam = cfg.lambda_dssim
            terms = {
                "L1_loss": (1.0 - lam) * l1_loss(out.image, gt),
                "ssim_loss": lam * (1.0 - ssim(out.image, gt)),
                "scaling_loss": self.scaling_loss(ng),
            }
            if multi_view:
                w_img = jnp.clip(1.0 - image_grad_weight(gt), 0.0, 1.0) ** 5
                w_img = erode(jax.lax.stop_gradient(w_img))
                dnormal = self.depth_normal(out.plane_depth, out.alpha,
                                            camera)
                terms["normal_loss"] = cfg.lambda_normal * jnp.mean(
                    w_img * jnp.sum(jnp.abs(dnormal - out.normal), axis=-1))
                _, near_out = self.decode_and_render(
                    anchors, mlp, near_camera, near_uid, n_visible,
                    state.active, bg, level_scale_gate=n_gate)
                geo, ncc_l = self._multi_view_losses(
                    out, near_out, camera, near_camera, rgb_to_gray(gt),
                    near_gray, key)
                terms["geo_loss"] = geo
                terms["ncc_loss"] = ncc_l
            return sum(terms.values()), (out, ng, terms)

        zeros2d = jnp.zeros((CAK, 2), jnp.float32)
        (loss, (out, ng, terms)), (ga, gm, m2d_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.anchors, state.mlp, zeros2d)

        a_lrs, m_lrs = g.learning_rates(step)
        new_anchors, adam_a = g.adam_step(state.anchors, ga,
                                          state.adam_anchor, a_lrs)
        new_mlp, adam_m = g.adam_step(state.mlp, gm, state.adam_mlp, m_lrs)
        in_window = (step > gcfg.start_stat) & (step < gcfg.densify_until_iter)
        upd_stats = g.update_stats(state.stats, ng.neural_opacity, ng.mask,
                                   out.radii, m2d_grad, visible, state.active,
                                   g.ndc_grad_scale(self.width, self.height))
        stats = jax.tree.map(lambda new, old: jnp.where(in_window, new, old),
                             upd_stats, state.stats)
        new_state = state._replace(anchors=new_anchors, mlp=new_mlp,
                                   adam_anchor=adam_a, adam_mlp=adam_m,
                                   stats=stats)
        metrics = dict(terms)
        metrics["loss"] = loss
        metrics["num_rendered"] = out.num_rendered
        metrics["overflow"] = out.overflow
        return new_state, metrics

    def train_step(self, state, camera, step: int):
        multi = (step > self.config.multi_view_from
                 and len(camera.near_ids) > 0)
        fn = self._jit_cache.get(("train", multi))
        if fn is None:
            fn = jax.jit(functools.partial(self._train_step, 0, multi),
                         donate_argnums=(0,))
            self._jit_cache[("train", multi)] = fn
        bg = self.get_background(step)
        gt = jnp.asarray(camera.image, jnp.float32)
        if multi:
            near = self.dataloader.train_cameras[
                self.key_host_choice(camera.near_ids)]
            near_arr = near.arrays()
            near_uid = jnp.asarray(near.uid)
            near_gray = jnp.asarray(
                np.asarray(rgb_to_gray(jnp.asarray(near.image))),
                jnp.float32)
        else:
            near_arr = camera.arrays()
            near_uid = jnp.asarray(camera.uid)
            near_gray = jnp.zeros((self.height, self.width), jnp.float32)
        self.key, k = jax.random.split(self.key)
        return fn(state, camera.arrays(), near_arr, jnp.asarray(camera.uid),
                  near_uid, gt, near_gray, bg,
                  jnp.asarray(step, jnp.float32), k)
