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

    supports_train_block = True

    def block_events(self):
        end_on, end_before, end_steps = super().block_events()
        return end_on, end_before, end_steps + [self.config.multi_view_from]

    def train_block(self, state, cameras, step0: int):
        K = len(cameras)
        multi = (step0 > self.config.multi_view_from
                 and all(len(c.near_ids) > 0 for c in cameras))
        fn = self._jit_cache.get(("block", multi, K))
        if fn is None:
            fn = self._build_block_fn_spgsr(multi, K)
            self._jit_cache[("block", multi, K)] = fn
        if multi:
            pairs = [PGSRScene._near_for(self, c) for c in cameras]
        else:
            zero_gray = jnp.zeros((self.height, self.width), jnp.float32)
            pairs = [(c, zero_gray) for c in cameras]
        cam_stack, gts = self._batch_cameras(cameras)
        near_stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                                  *[p[0].arrays() for p in pairs])
        ngrays = jnp.stack([p[1] for p in pairs])
        uids = jnp.asarray([c.uid for c in cameras])
        near_uids = jnp.asarray([p[0].uid for p in pairs])
        bgs = jnp.stack([self.get_background(step0 + i) for i in range(K)])
        steps = jnp.arange(step0, step0 + K, dtype=jnp.float32)
        # absolute-step key derivation — see PGSRScene.train_block
        keys = jax.vmap(functools.partial(jax.random.fold_in, self.key))(
            jnp.arange(step0, step0 + K, dtype=jnp.uint32))
        return fn(state, cam_stack, near_stack, uids, near_uids, gts,
                  ngrays, bgs, steps, keys)

    def _build_block_fn_spgsr(self, multi: bool, K: int):
        def block(state, cams, nears, uids, nuids, gts, ngrays, bgs,
                  steps, keys):
            def body(st, x):
                cam, near, uid, nuid, gt, ngray, bg, step, key = x
                return self._train_step(0, multi, st, cam, near, uid,
                                        nuid, gt, ngray, bg, step, key)

            return jax.lax.scan(
                body, state,
                (cams, nears, uids, nuids, gts, ngrays, bgs, steps, keys))

        return jax.jit(block, donate_argnums=(0,))
    config: ScaffoldPGSRSceneConfig

    def _gshard_capacity(self) -> int:
        raise NotImplementedError(
            "gshard is not wired through the PGSR multi-view step yet; "
            "use dp or band for the pgsr family")

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

    def _rasterize_neural(self, ng, camera, bg, mean2d_offset, band=False,
                          gshard=False):
        assert not gshard, "gshard is not wired through the PGSR payload"
        return rasterize_pgsr(
            ng.xyz, ng.scaling, ng.rotation, ng.opacity, camera,
            self.width, self.height, bg,
            colors_precomp=ng.color, active_mask=ng.mask,
            scaling_modifier=self.config.scaling_modifier,
            instance_cap=self.config.instance_cap,
            backend=self.config.backend,
            mean2d_offset=mean2d_offset,
            band_axis=self._axis if band else None,
            band_count=self._n_dev if band else 1)

    # ------------------------------------------------------------------
    def _train_step(self, sh_degree, multi_view, state, camera, near_camera,
                    cam_uid, near_uid, gt, near_gray, bg, step, key,
                    par=None):
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
        CA = state.anchors.offset.shape[0]
        VBK = (g.visible_budget(CA) or CA) * K
        band = par == "band"

        def loss_fn(anchors, mlp, m2d_offset):
            ng, out = self.decode_and_render(
                anchors, mlp, camera, cam_uid, visible, state.active, bg,
                mean2d_offset=m2d_offset, level_scale_gate=gate, band=band)
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
                    state.active, bg, level_scale_gate=n_gate, band=band)
                geo, ncc_l = self._multi_view_losses(
                    out, near_out, camera, near_camera, rgb_to_gray(gt),
                    near_gray, key)
                terms["geo_loss"] = geo
                terms["ncc_loss"] = ncc_l
            return sum(terms.values()), (out, ng, terms)

        zeros2d = jnp.zeros((VBK, 2), jnp.float32)
        (loss, (out, ng, terms)), (ga, gm, m2d_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.anchors, state.mlp, zeros2d)

        ga = self._pmerge_grads(ga)
        gm = self._pmerge_grads(gm)
        if band:
            m2d_grad = jax.lax.pmean(m2d_grad, self._axis)

        a_lrs, m_lrs = g.learning_rates(step)
        new_anchors, adam_a = g.adam_step(state.anchors, ga,
                                          state.adam_anchor, a_lrs)
        new_mlp, adam_m = g.adam_step(state.mlp, gm, state.adam_mlp, m_lrs)
        in_window = (step > gcfg.start_stat) & (step < gcfg.densify_until_iter)
        d_op, d_mask, d_radii, d_m2d = g.expand_stats_inputs(
            ng, out.radii, m2d_grad, CA)
        upd_stats = g.update_stats(state.stats, d_op, d_mask,
                                   d_radii, d_m2d, visible, state.active,
                                   g.ndc_grad_scale(self.width, self.height))
        if par == "dp":
            upd_stats = g.dp_merge_stats(state.stats, upd_stats, self._axis)
        stats = jax.tree.map(lambda new, old: jnp.where(in_window, new, old),
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

    def _build_step_fn_spgsr(self, multi: bool):
        par = self._pmode
        if par is None:
            return jax.jit(functools.partial(self._train_step, 0, multi),
                           donate_argnums=(0,))
        from jax.sharding import PartitionSpec as P
        cam_spec, gt_spec = self._shard_specs()

        if par == "dp":
            def body(state, cam_b, near_b, uid_b, nuid_b, gt_b, ngray_b,
                     bg, step, key):
                cam = jax.tree.map(lambda x: x[0], cam_b)
                near = jax.tree.map(lambda x: x[0], near_b)
                return self._train_step(
                    0, multi, state, cam, near, uid_b[0], nuid_b[0],
                    gt_b[0], ngray_b[0], bg, step, key, par="dp")
        else:
            def body(state, cam, near, uid, nuid, gt, ngray, bg, step, key):
                return self._train_step(
                    0, multi, state, cam, near, uid, nuid, gt, ngray,
                    bg, step, key, par="band")

        fn = jax.shard_map(
            body, mesh=self._mesh,
            in_specs=(P(), cam_spec, cam_spec, cam_spec, cam_spec,
                      gt_spec, gt_spec, P(), P(), P()),
            out_specs=(P(), P()), check_vma=False)
        return jax.jit(fn, donate_argnums=(0,))

    def train_step(self, state, camera, step: int):
        cams = camera if self._pmode == "dp" else [camera]
        multi = (step > self.config.multi_view_from
                 and all(len(c.near_ids) > 0 for c in cams))
        fn = self._jit_cache.get(("train", multi))
        if fn is None:
            fn = self._build_step_fn_spgsr(multi)
            self._jit_cache[("train", multi)] = fn
        bg = self.get_background(step)
        if multi:
            pairs = [PGSRScene._near_for(self, c) for c in cams]
            near_cams = [p[0] for p in pairs]
            near_grays = [p[1] for p in pairs]
        else:
            near_cams = cams
            near_grays = [jnp.zeros((self.height, self.width), jnp.float32)
                          for _ in cams]
        k = jax.random.fold_in(self.key, jnp.uint32(step))
        if self._pmode == "dp":
            cam_arrays, gt = self._batch_cameras(cams)
            near_arr = jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[c.arrays() for c in near_cams])
            near_gray = jnp.stack(near_grays)
            uid = jnp.asarray([c.uid for c in cams])
            near_uid = jnp.asarray([c.uid for c in near_cams])
        else:
            cam_arrays = camera.arrays()
            gt = self.gt_device(camera)
            near_arr = near_cams[0].arrays()
            near_gray = near_grays[0]
            uid = jnp.asarray(camera.uid)
            near_uid = jnp.asarray(near_cams[0].uid)
        return fn(state, cam_arrays, near_arr, uid, near_uid, gt,
                  near_gray, bg, jnp.asarray(step, jnp.float32), k)
