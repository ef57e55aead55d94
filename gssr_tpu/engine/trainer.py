"""Training loop.

Parity: /root/reference/gssr/engine/trainer.py:35-211 — same schedule
surface (test/save/checkpoint iterations, gaussian + checkpoint persistence,
TensorBoard scalars, resume). TPU re-design: the hot loop calls the scene's
jitted train step and only syncs metrics to host every `log_interval` steps,
keeping the device queue full; checkpoints are numpy pytree snapshots
instead of torch pickles.
"""
from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from gssr_tpu.configs.base import Config
from gssr_tpu.engine.callbacks import TrainingCallbackLocation


def _flatten_state(state):
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


class Trainer:
    def __init__(self, config: Config, scene=None):
        self.config = config
        base_dir = config.get_base_dir()
        base_dir.mkdir(parents=True, exist_ok=True)
        self.gaussian_dir = config.get_gaussian_dir()
        self.ckpt_dir = config.get_checkpoint_dir()
        self.log_dir = base_dir / config.relative_log_dir
        self.writer = None
        if config.writer == "tensorboard":
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(str(self.log_dir))
            except Exception:
                self.writer = None
        self.scene = scene
        self.start_step = 0

    def setup(self):
        if self.scene is None:
            from gssr_tpu.configs.methods import build_scene
            self.scene = build_scene(self.config)
        m = self.config.machine
        mode = getattr(m, "parallel", "none")
        if mode and mode != "none":
            n = m.num_devices or len(jax.devices())
            self.scene.setup_parallel(mode, devices=jax.devices()[:n])
            print(f"multi-chip: mode={mode} over {n} devices")
        t = self.config.trainer
        if t.load_gaussian_dir is not None:
            self._load_gaussians()
        if t.load_ckpt_dir is not None:
            self._load_checkpoint()

    # ------------------------------------------------------------------
    def train(self):
        scene = self.scene
        tcfg = self.config.trainer
        state = scene.state
        log_interval = max(1, tcfg.log_interval)
        t0 = time.time()
        ema_loss = None
        mpix_acc = 0.0
        callbacks = list(getattr(scene, "get_training_callbacks",
                                 lambda t: [])(self) or [])
        prev_overflow = None    # device flag from the previous step
        prev_vb_overflow = None

        blocks_on = (getattr(tcfg, "scan_block", 1) > 1 and not callbacks
                     and getattr(scene, "_pmode", None) is None
                     and getattr(scene, "supports_train_block", False))

        step = self.start_step + 1
        while step <= tcfg.iterations:
            K = self._block_len(scene, tcfg, step) if blocks_on else 1
            if K > 1:
                # K-step scan block: one dispatch, stacked metrics [K]
                cams = [scene.dataloader.next_train() for _ in range(K)]
                mpix_acc += sum(c.width * c.height for c in cams) / 1e6
                state, ms = scene.train_block(state, cams, step)
                last = step + K - 1
                ms = {k: np.asarray(v) for k, v in ms.items()}
                if ms.get("overflow") is not None and ms["overflow"].any():
                    new_cap = scene.bump_instance_cap()
                    print(f"[warn] instance buffer overflow inside block "
                          f"[{step},{last}]; auto-bumped instance_cap to "
                          f"{new_cap} (next block recompiles)")
                if ms.get("vb_overflow") is not None \
                        and ms["vb_overflow"].any():
                    new_f = scene.bump_visible_budget()
                    print(f"[warn] visible-anchor budget overflow inside "
                          f"block [{step},{last}]; auto-bumped "
                          f"visible_budget_factor to {new_f:.3g}")
                for i in range(K):
                    s = step + i
                    if s % log_interval == 0:
                        m = {k: float(v[i]) for k, v in ms.items()}
                        loss = m.get("loss", 0.0)
                        ema_loss = loss if ema_loss is None else \
                            0.6 * ema_loss + 0.4 * loss
                        if self.writer is not None:
                            for k, v in m.items():
                                self.writer.add_scalar(f"train/{k}", v, s)
                metrics = {k: v[-1] for k, v in ms.items()}
                step = last
            else:
                if tcfg.profile_dir and tcfg.profile_steps \
                        and step == tcfg.profile_steps[0]:
                    import jax.profiler
                    jax.profiler.start_trace(tcfg.profile_dir)
                for cb in callbacks:
                    cb.run_callback_at_location(
                        step, TrainingCallbackLocation.BEFORE_TRAIN_ITERATION)
                if getattr(scene, "_pmode", None) == "dp":
                    # one camera per device; each step consumes n_dev cams
                    camera = [scene.dataloader.next_train()
                              for _ in range(scene._n_dev)]
                    mpix_acc += sum(c.width * c.height for c in camera) / 1e6
                else:
                    camera = scene.dataloader.next_train()
                    mpix_acc += camera.width * camera.height / 1e6
                state, metrics = scene.train_step(state, camera, step)
                # Overflow is checked EVERY step, one step delayed: we
                # sync on the previous step's flag while the current step
                # is already enqueued, so the device queue never drains.
                # (The reference resizes its binning buffers lazily inside
                # the CUDA launch.)
                if prev_overflow is not None and bool(prev_overflow):
                    new_cap = scene.bump_instance_cap()
                    print(f"[warn] instance buffer overflow at step "
                          f"{step - 1}; auto-bumped instance_cap to "
                          f"{new_cap} (next step recompiles)")
                prev_overflow = metrics.get("overflow")
                if prev_vb_overflow is not None and bool(prev_vb_overflow):
                    new_f = scene.bump_visible_budget()
                    print(f"[warn] visible-anchor budget overflow at step "
                          f"{step - 1}; auto-bumped visible_budget_factor "
                          f"to {new_f:.3g} (next step recompiles)")
                prev_vb_overflow = metrics.get("vb_overflow")
                if tcfg.profile_dir and len(tcfg.profile_steps) > 1 \
                        and step == tcfg.profile_steps[1]:
                    import jax
                    import jax.profiler
                    jax.block_until_ready(state)
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {tcfg.profile_dir}")

                if step % log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    loss = m.get("loss", 0.0)
                    ema_loss = loss if ema_loss is None else \
                        0.6 * ema_loss + 0.4 * loss
                    if self.writer is not None:
                        for k, v in m.items():
                            self.writer.add_scalar(f"train/{k}", v, step)

            if step % (log_interval * 50) == 0:
                dt = max(time.time() - t0, 1e-9)
                ips = (step - self.start_step) / dt
                mpix_s = mpix_acc / dt
                print(f"step {step:6d}  loss "
                      f"{-1.0 if ema_loss is None else ema_loss:.4f}  "
                      f"n_active {int(state.n_active)}  {ips:.1f} it/s  "
                      f"{mpix_s:.2f} Mpix/s")
                if self.writer is not None:
                    self.writer.add_scalar("perf/mpix_per_s", mpix_s, step)

            if step in tcfg.test_iterations:
                ev = scene.evaluate(state, step)
                print(f"[eval {step}] " + "  ".join(
                    f"{k}={v:.4f}" for k, v in ev.items()))
                if self.writer is not None:
                    for k, v in ev.items():
                        self.writer.add_scalar(f"eval/{k}", v, step)

            if step in tcfg.save_iterations:
                self.save_gaussians(state, step)

            state = scene.densify(state, step)

            if step in tcfg.checkpoint_iterations:
                self.save_checkpoint(state, step)

            for cb in callbacks:
                cb.run_callback_at_location(
                    step, TrainingCallbackLocation.AFTER_TRAIN_ITERATION)
            step += 1

        scene.state = state
        return state

    @staticmethod
    def _block_len(scene, tcfg, step: int) -> int:
        """Longest scan block starting at `step` that ends on or before
        every schedule boundary: densify/opacity-reset multiples and
        eval/save/checkpoint steps may be the block's LAST step (their
        host work runs after it); an SH-degree change must start a new
        block; profiling steps force the per-step path."""
        lens = [max(1, int(tcfg.scan_block)), tcfg.iterations - step + 1]
        end_on, end_before, end_on_steps = scene.block_events()
        for iv in end_on:
            if iv and iv > 0:
                m = (step + iv - 1) // iv * iv
                lens.append(m - step + 1)
        for iv in end_before:
            if iv and iv > 0:
                m = step // iv * iv
                m = m + iv if m <= step else m
                lens.append(m - step)
        for sched in (tcfg.test_iterations, tcfg.save_iterations,
                      tcfg.checkpoint_iterations, end_on_steps):
            for s in sched:
                if s >= step:
                    lens.append(s - step + 1)
        if tcfg.profile_dir:
            for s in tcfg.profile_steps:
                if s >= step:
                    lens.append(s - step)
        return max(1, min(lens))

    # ------------------------------------------------------------------
    def save_gaussians(self, state, step: int):
        d = self.gaussian_dir / f"iteration_{step}"
        d.mkdir(parents=True, exist_ok=True)
        self.scene.save_gaussians(state, str(d / "point_cloud.ply"))
        print(f"saved gaussians to {d}")

    def save_checkpoint(self, state, step: int):
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        leaves, _ = _flatten_state(state)
        path = self.ckpt_dir / f"ckpt_{step:07d}.npz"
        # scene-side auxiliary state (PRNG key, PGSR extra_stats, ...)
        # rides along so kill-and-resume reproduces the full trajectory
        aux_leaves, _ = _flatten_state(self.scene.aux_state())
        np.savez(path, step=step,
                 **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
                 **{f"aux_{i}": np.asarray(l)
                    for i, l in enumerate(aux_leaves)})
        if self.config.trainer.save_only_latest_checkpoint:
            for p in sorted(self.ckpt_dir.glob("ckpt_*.npz"))[:-1]:
                p.unlink()
        print(f"saved checkpoint {path}")

    def _load_checkpoint(self):
        t = self.config.trainer
        d = Path(t.load_ckpt_dir)
        if t.load_ckpt_step is not None:
            path = d / f"ckpt_{t.load_ckpt_step:07d}.npz"
        else:
            cands = sorted(d.glob("ckpt_*.npz"))
            assert cands, f"no checkpoints in {d}"
            path = cands[-1]
        data = np.load(path)
        self.start_step = int(data["step"])
        _, treedef = _flatten_state(self.scene.state)
        n = len([k for k in data.files if k.startswith("leaf_")])
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        self.scene.state = jax.tree.unflatten(treedef, leaves)
        n_aux = len([k for k in data.files if k.startswith("aux_")])
        if n_aux:
            _, aux_def = _flatten_state(self.scene.aux_state())
            self.scene.restore_aux(jax.tree.unflatten(
                aux_def, [data[f"aux_{i}"] for i in range(n_aux)]))
        print(f"resumed from {path} at step {self.start_step}")

    def _load_gaussians(self):
        t = self.config.trainer
        d = Path(t.load_gaussian_dir)
        step = t.load_gaussian_step
        if step is None:
            iters = [int(p.name.split("_")[-1])
                     for p in d.glob("iteration_*")]
            assert iters, f"no saved gaussians in {d}"
            step = max(iters)
        path = d / f"iteration_{step}" / "point_cloud.ply"
        self.scene.state = self.scene.load_gaussians(str(path))
        print(f"loaded gaussians from {path}")
