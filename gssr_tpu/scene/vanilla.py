"""Vanilla 3DGS scene: render + L1/DSSIM losses + jitted train step.

Parity: /root/reference/gssr/scene/vanilla_scene.py (losses, render wiring)
and the per-step protocol of engine/trainer.py:88-133. TPU re-design: the
whole step — render forward, losses, backward through the Pallas blend,
densification statistics, Adam update — is one jitted, donated function;
densification/opacity-reset are separate jitted ops on their schedule.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from dataclasses import field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gssr_tpu.cameras import Camera, CameraArrays
from gssr_tpu.configs.base import DataLoaderConfig
from gssr_tpu.dataio.dataset import ColmapDataLoader
from gssr_tpu.models.vanilla import (
    GaussianState,
    VanillaGaussianConfig,
    VanillaGaussians,
)
from gssr_tpu.ops.rasterize import rasterize
from gssr_tpu.ops.ssim import l1_loss, psnr, ssim


@dataclasses.dataclass
class VanillaSceneConfig:
    dataloader: DataLoaderConfig = field(default_factory=DataLoaderConfig)
    gaussians: VanillaGaussianConfig = field(
        default_factory=VanillaGaussianConfig)
    lambda_dssim: float = 0.2
    random_background: bool = False
    scaling_modifier: float = 1.0
    instance_cap: int = 1 << 20
    backend: str = "pallas"


class VanillaScene:
    config: VanillaSceneConfig

    def __init__(self, config: VanillaSceneConfig, source_dir: str,
                 eval: bool = False, seed: int = 0,
                 dataloader: Optional[ColmapDataLoader] = None):
        self.config = config
        self.dataloader = dataloader or ColmapDataLoader(
            config.dataloader, source_dir, eval, seed=seed)
        self.cameras_extent = self.dataloader.cameras_extent
        self.background = jnp.asarray(self.dataloader.background)
        self.gaussians = self.make_gaussians()
        self.state = self.init_state()
        cam0 = self.dataloader.train_cameras[0]
        self.width, self.height = cam0.width, cam0.height
        self.key = jax.random.PRNGKey(seed)
        self._jit_cache: Dict = {}
        # multi-chip mode: None (single device) | "dp" | "band"
        self._pmode: Optional[str] = None
        self._axis = "dev"
        self._mesh = None
        self._n_dev = 1

    # ------------------------------------------------------------------
    def setup_parallel(self, mode: str, devices=None):
        """Train across a chip mesh (SURVEY §2.3; the reference refuses
        world_size>1, train.py:78-80).

        mode "dp":   one camera per device, per-gaussian grads pmean'd
                     over ICI, densify stats delta-merged.
        mode "band": ONE camera, its tile rows banded across devices;
                     blended maps all_gather'd so every loss sees the full
                     frame (ops/band.py), grads pmean'd.
        mode "gshard": the GAUSSIAN STATE (params + Adam moments + stats)
                     is sharded 1/D per chip along the capacity axis
                     (SURVEY §2.3(b)); preprocess + SH decode run
                     shard-locally and only the compact screen attributes
                     are all_gather'd into the replicated binning/blend —
                     the scaling axis the reference lacks entirely and the
                     one that lifts the per-chip HBM bound on model size.
                     Gradients are exact: the all_gather VJP psum_scatters
                     each shard its own gaussians' cotangents.
        In dp/band modes state stays replicated, so densify/eval/
        checkpoint code is untouched; gshard shards it via the step's
        shard_map specs (densify runs under plain jit, where GSPMD
        handles the sharded state).
        """
        from jax.sharding import Mesh
        devices = list(devices if devices is not None else jax.devices())
        if mode == "band":
            from gssr_tpu.ops.rasterize import pad_to_tiles
            from gssr_tpu.ops.projection import TILE
            ph = pad_to_tiles(self.width, self.height)[1]
            if (ph // TILE) % len(devices) != 0:
                raise ValueError(
                    f"band mode needs the {ph // TILE} tile rows to divide "
                    f"evenly over {len(devices)} devices")
        elif mode == "gshard":
            cap = self._gshard_capacity()   # raises where unsupported
            if cap % len(devices) != 0:
                raise ValueError(
                    f"gshard needs capacity {cap} divisible by "
                    f"{len(devices)} devices")
        elif mode != "dp":
            raise ValueError(f"unknown parallel mode {mode!r}")
        self._mesh = Mesh(np.asarray(devices), (self._axis,))
        self._pmode = mode
        self._n_dev = len(devices)
        self._jit_cache.clear()

    def _gshard_capacity(self) -> int:
        """Capacity axis that gshard shards 1/D per chip; scenes that
        cannot shard their model raise NotImplementedError here."""
        return self.state.params.xyz.shape[0]

    def _pmerge_grads(self, grads):
        """Parameter-gradient all-reduce over the mesh (exact: see
        ops/band.py gradient story for the band case)."""
        if self._pmode is None:
            return grads
        return jax.tree.map(
            lambda x: jax.lax.pmean(x, self._axis), grads)

    def _pmerge_metrics(self, metrics):
        if self._pmode is None:
            return metrics
        ax = self._axis
        out = {}
        for k, v in metrics.items():
            v = jnp.asarray(v)
            if k in ("num_rendered", "overflow"):
                out[k] = jax.lax.pmax(v.astype(jnp.float32), ax)
            else:
                out[k] = jax.lax.pmean(v.astype(jnp.float32), ax)
        return out

    def _shard_specs(self):
        """(cam_spec, gt_spec) for the parallel step's shard_map."""
        from jax.sharding import PartitionSpec as P
        if self._pmode == "dp":
            return P(self._axis), P(self._axis)
        return P(), P()

    # ------------------------------------------------------------------
    def bump_instance_cap(self) -> int:
        """Grow the instance buffer 1.5x (128-aligned) after an overflow
        and drop compiled steps so the next one retraces with the new
        static capacity. Replaces the CUDA path's lazily resized binning
        buffers (rasterizer_impl.cu:155-194) for fixed-shape XLA."""
        new_cap = -(-int(self.config.instance_cap * 3 // 2) // 128) * 128
        self.config.instance_cap = new_cap
        self._jit_cache.clear()
        return new_cap

    # ------------------------------------------------------------------
    def make_gaussians(self) -> VanillaGaussians:
        return VanillaGaussians(self.config.gaussians,
                                spatial_lr_scale=self.cameras_extent)

    def init_state(self) -> GaussianState:
        pcd = self.dataloader.point_cloud
        return self.gaussians.create_from_points(pcd.points, pcd.colors)

    # ------------------------------------------------------------------
    def render_params(self, params, camera: CameraArrays, sh_degree: int,
                      active, bg, mean2d_offset=None,
                      band_axis=None, band_count: int = 1,
                      gauss_shard_axis=None):
        g = self.gaussians
        return rasterize(
            params.xyz, g.get_scaling(params), g.get_rotation(params),
            g.get_opacity(params)[:, 0], camera,
            self.width, self.height, bg,
            sh_coeffs=g.get_features(params), sh_degree=sh_degree,
            active_mask=active,
            scaling_modifier=self.config.scaling_modifier,
            instance_cap=self.config.instance_cap,
            backend=self.config.backend,
            mean2d_offset=mean2d_offset,
            band_axis=band_axis, band_count=band_count,
            gauss_shard_axis=gauss_shard_axis)

    def loss_terms(self, out, gt, camera_extra=None, step=None):
        """Method-specific losses; subclasses override/extend."""
        lam = self.config.lambda_dssim
        return {
            "L1_loss": (1.0 - lam) * l1_loss(out.image, gt),
            "ssim_loss": lam * (1.0 - ssim(out.image, gt)),
        }

    # ------------------------------------------------------------------
    def _train_step(self, sh_degree: int, state: GaussianState,
                    camera: CameraArrays, gt, bg, step, par=None):
        g = self.gaussians
        band = par == "band"
        gshard = par == "gshard"

        def loss_fn(params, m2d_offset):
            out = self.render_params(
                params, camera, sh_degree, state.active, bg,
                mean2d_offset=m2d_offset,
                band_axis=self._axis if band else None,
                band_count=self._n_dev if band else 1,
                gauss_shard_axis=self._axis if gshard else None)
            terms = self.loss_terms(out, gt, step=step)
            return sum(terms.values()), (out, terms)

        zeros2d = jnp.zeros_like(state.params.xyz[:, :2])
        (loss, (out, terms)), (pgrads, m2d_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, zeros2d)

        if not gshard:
            # gshard grads are already exact per shard (all_gather VJP)
            pgrads = self._pmerge_grads(pgrads)
        if band:
            # band-partial screen grads x n_band (all_gather VJP) -> exact
            m2d_grad = jax.lax.pmean(m2d_grad, self._axis)

        lrs = g.learning_rates(step)
        new_params, new_adam = g.adam_step(state.params, pgrads,
                                           state.adam, lrs)
        new_stats = g.update_stats(state.stats, out.radii, m2d_grad,
                                   g.ndc_grad_scale(self.width, self.height))
        if par == "dp":
            # each device accumulated its own camera's stats delta
            new_stats = g.dp_merge_stats(state.stats, new_stats, self._axis)
        new_state = state._replace(params=new_params, adam=new_adam,
                                   stats=new_stats)
        metrics = dict(terms)
        metrics["loss"] = loss
        metrics["num_rendered"] = out.num_rendered
        metrics["overflow"] = out.overflow
        return new_state, self._pmerge_metrics(metrics)

    def _build_step_fn(self, sh_degree: int):
        """jitted (and, in a parallel mode, shard_map'd) train step."""
        par = self._pmode
        if par is None:
            return jax.jit(functools.partial(self._train_step, sh_degree),
                           donate_argnums=(0,))
        from jax.sharding import PartitionSpec as P
        cam_spec, gt_spec = self._shard_specs()

        if par == "dp":
            def body(state, cam_b, gt_b, bg, step):
                cam = jax.tree.map(lambda x: x[0], cam_b)
                return self._train_step(sh_degree, state, cam, gt_b[0],
                                        bg, step, par="dp")
        else:
            def body(state, cam, gt, bg, step):
                return self._train_step(sh_degree, state, cam, gt,
                                        bg, step, par=par)

        state_spec = P() if par != "gshard" else self._state_specs()
        fn = jax.shard_map(
            body, mesh=self._mesh,
            in_specs=(state_spec, cam_spec, gt_spec, P(), P()),
            out_specs=(state_spec, P()), check_vma=False)
        return jax.jit(fn, donate_argnums=(0,))

    def _state_specs(self):
        """Per-leaf PartitionSpecs sharding every capacity-axis array of
        the state over the mesh (gshard mode); scalars stay replicated."""
        from jax.sharding import PartitionSpec as P
        cap = self._gshard_capacity()

        def spec(x):
            return (P(self._axis)
                    if getattr(x, "ndim", 0) >= 1 and x.shape[0] == cap
                    else P())

        return jax.tree.map(spec, self.state)

    def gt_device(self, camera):
        """Per-camera GT frame as a cached DEVICE array (bounded LRU).
        Re-uploading the decoded frame every step costs a full host->device
        transfer per iteration — measured 660 ms of a 784 ms train step at
        1600x1056 through the tunneled chip. The reference keeps all GT on
        the GPU up front (cameras/utils.py data_device); a bounded LRU
        gives the same steady-state behavior without pinning every frame
        of a large scene in HBM."""
        if not hasattr(self, "_gt_cache"):
            from collections import OrderedDict
            self._gt_cache = OrderedDict()
            self._gt_cache_frames = int(os.environ.get(
                "GSSR_GT_CACHE_FRAMES", "64"))
        # key by (uid, shape): a uid re-served at a different resolution
        # scale must not return the stale frame
        key = (camera.uid, np.shape(camera.image))
        v = self._gt_cache.pop(key, None)
        if v is None:
            v = jnp.asarray(camera.image, jnp.float32)
        self._gt_cache[key] = v                 # move-to-back LRU
        while len(self._gt_cache) > self._gt_cache_frames:
            self._gt_cache.popitem(last=False)
        return v

    def _batch_cameras(self, cameras):
        cam_arrays = jax.tree.map(lambda *xs: jnp.stack(xs),
                                  *[c.arrays() for c in cameras])
        gts = jnp.stack([self.gt_device(c) for c in cameras])
        return cam_arrays, gts

    def train_step(self, state: GaussianState, camera, step: int):
        """Python-side wrapper: picks the static SH degree, feeds arrays.
        In dp mode `camera` is a list of n_dev cameras."""
        sh_degree = self.gaussians.active_sh_degree(step)
        fn = self._jit_cache.get(("train", sh_degree))
        if fn is None:
            fn = self._build_step_fn(sh_degree)
            self._jit_cache[("train", sh_degree)] = fn
        bg = self.get_background(step)
        if self._pmode == "dp":
            cam_arrays, gt = self._batch_cameras(camera)
        else:
            cam_arrays = camera.arrays()
            gt = self.gt_device(camera)
        return fn(state, cam_arrays, gt, bg,
                  jnp.asarray(step, jnp.float32))

    # ---- K-step scan blocks --------------------------------------------
    # Every single-step dispatch through a remote/tunneled chip ships
    # fresh host inputs (camera pytree, bg, step scalar) and pays a round
    # trip — measured as the dominant cost of the real train step in this
    # environment (docs/tpu-perf-notes.md, round 4). A block runs K
    # consecutive steps inside ONE jitted lax.scan over device-stacked
    # per-step inputs, amortizing the dispatch toll K-fold. The trainer
    # sizes blocks so schedule boundaries (densify, opacity reset, SH
    # ramp, eval/save) land exactly on block ends.
    supports_train_block = True

    def block_events(self):
        """(end_on_intervals, end_before_intervals, end_on_steps) bounding
        scan blocks. Densify/opacity-reset fire AFTER their step, so a
        block may END ON a multiple; the SH degree changes AT a multiple,
        so a block must end BEFORE it; end_on_steps are absolute one-off
        boundaries a block may end on but not cross (e.g. PGSR's
        multi_view_from)."""
        cfg = self.config.gaussians
        return ([cfg.densification_interval, cfg.opacity_reset_interval],
                [self.gaussians.config.oneup_sh_interval], [])

    def train_block(self, state, cameras, step0: int):
        """Run len(cameras) consecutive train steps in one dispatch.
        Single-device mode only; the caller guarantees no block_events()
        boundary lies inside. Returns (state, stacked metrics [K])."""
        K = len(cameras)
        sh_degree = self.gaussians.active_sh_degree(step0)
        fn = self._jit_cache.get(("block", sh_degree, K))
        if fn is None:
            fn = self._build_block_fn(sh_degree, K)
            self._jit_cache[("block", sh_degree, K)] = fn
        return fn(state, *self._block_xs(cameras, step0))

    def _block_xs(self, cameras, step0):
        cam_stack, gts = self._batch_cameras(cameras)
        bgs = jnp.stack([self.get_background(step0 + i)
                         for i in range(len(cameras))])
        steps = jnp.arange(step0, step0 + len(cameras), dtype=jnp.float32)
        return (cam_stack, gts, bgs, steps)

    def _build_block_fn(self, sh_degree: int, K: int):
        def block(state, cams, gts, bgs, steps):
            def body(st, x):
                cam, gt, bg, step = x
                return self._train_step(sh_degree, st, cam, gt, bg, step)

            return jax.lax.scan(body, state, (cams, gts, bgs, steps))

        return jax.jit(block, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def aux_state(self):
        """Scene-side state that must ride in checkpoints beyond the
        GaussianState pytree (reference capture(): trainer.py:155-168).
        Subclasses extend (PGSR adds extra_stats)."""
        return {"key": self.key,
                "sampler_draws": jnp.asarray(self.dataloader.draws)}

    def restore_aux(self, aux):
        if "key" in aux:
            self.key = jnp.asarray(aux["key"])
        if "sampler_draws" in aux:
            self.dataloader.restore_sampler(int(aux["sampler_draws"]))

    def get_training_callbacks(self, trainer):
        """Host-side before/after-iteration hooks (callbacks.py parity).
        Per-step schedules (LR, SH degree) live inside the jitted step, so
        the default is empty; users/subclasses may register their own."""
        return []

    def get_background(self, step):
        if self.config.random_background:
            self.key, k = jax.random.split(self.key)
            return jax.random.uniform(k, (3,))
        return self.background

    # ------------------------------------------------------------------
    def densify(self, state: GaussianState, step: int) -> GaussianState:
        cfg = self.config.gaussians
        if step >= cfg.densify_until_iter:
            return state
        if step > cfg.densify_from_iter and \
                step % cfg.densification_interval == 0:
            fn = self._jit_cache.get("densify")
            if fn is None:
                fn = jax.jit(self.gaussians.densify_and_prune,
                             donate_argnums=(0,))
                self._jit_cache["densify"] = fn
            self.key, k = jax.random.split(self.key)
            use_size_prune = jnp.asarray(
                step > cfg.opacity_reset_interval)
            state = fn(state, k, use_size_prune)
        if step % cfg.opacity_reset_interval == 0:
            fn = self._jit_cache.get("reset_opacity")
            if fn is None:
                fn = jax.jit(self.gaussians.reset_opacity, donate_argnums=(0,))
                self._jit_cache["reset_opacity"] = fn
            state = fn(state)
        return state

    # ------------------------------------------------------------------
    def eval_render(self, state: GaussianState, camera: Camera, step: int):
        sh_degree = self.gaussians.active_sh_degree(step)
        fn = self._jit_cache.get(("eval", sh_degree))
        if fn is None:
            def _eval(params, active, cam, bg):
                return self.render_params(params, cam, sh_degree, active, bg)
            fn = jax.jit(_eval)
            self._jit_cache[("eval", sh_degree)] = fn
        return fn(state.params, state.active, camera.arrays(), self.background)

    def evaluate(self, state: GaussianState, step: int) -> Dict[str, float]:
        cams = self.dataloader.test_cameras or self.dataloader.train_cameras[:8]
        l1s, psnrs = [], []
        for cam in cams:
            out = self.eval_render(state, cam, step)
            gt = jnp.asarray(cam.image, jnp.float32)
            l1s.append(float(l1_loss(out.image, gt)))
            psnrs.append(float(psnr(out.image, gt)))
        return {"eval_l1": float(np.mean(l1s)),
                "eval_psnr": float(np.mean(psnrs))}

    def save_gaussians(self, state: GaussianState, path: str):
        self.gaussians.save_ply(state, path)

    def load_gaussians(self, path: str) -> GaussianState:
        return self.gaussians.load_ply(path)
