#!/usr/bin/env python
"""BASELINE config #5 harness: multi-chip train-step scaling for ANY
method family over a device mesh, through the real scene stack
(`scene.setup_parallel`, the same path `train.py --machine.parallel`
uses).

Modes:
  dp    one camera per device, grads pmean'd over ICI
  band  one camera, tile rows sharded across devices (ops/band.py)
  none  single-device reference point

On a real multi-chip slice this measures aggregate Mpix/s and scaling
efficiency vs the single-chip bench. Off-slice it runs on a virtual CPU
mesh (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
GSSR_TPU_INTERPRET=1) to validate the sharded step; CPU numbers are not
meaningful throughput.

Usage:
  python benchmarks/bench_scaling.py --method octree-2dgs --mode band
  python benchmarks/bench_scaling.py --method 3dgs --mode dp --iters 20
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.common import BASELINE_MPIX_S


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="3dgs")
    ap.add_argument("--mode", default="dp", choices=["dp", "band", "none"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--width", type=int,
                    default=int(os.environ.get("GSSR_BENCH_W", 1600)))
    ap.add_argument("--height", type=int,
                    default=int(os.environ.get("GSSR_BENCH_H", 1024)))
    ap.add_argument("--cap", type=int, default=3 << 20,
                    help="instance cap (per device in band mode)")
    ap.add_argument("--capacity", type=int, default=200_000,
                    help="gaussian/anchor capacity")
    ap.add_argument("--n-pts", type=int, default=50_000)
    ap.add_argument("--scene-dir", default=None)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize pins the axon TPU plugin over the env var; honor
        # an explicit CPU request (virtual-mesh validation runs)
        jax.config.update("jax_platforms", "cpu")
    n_dev = len(jax.devices())

    scene_dir = args.scene_dir
    if not scene_dir:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from synthetic import write_synthetic_colmap_scene
        scene_dir = tempfile.mkdtemp(prefix="bench_scaling_")
        # GT image content is irrelevant for throughput; keep the GT
        # render cheap by building the scene small-res, then lying about
        # camera size below via the config's resolution handling
        write_synthetic_colmap_scene(
            scene_dir, n_cams=max(8, n_dev), n_pts=args.n_pts,
            width=args.width, height=args.height, gt_mode="noise")

    from gssr_tpu.configs.methods import build_scene, get_method_config
    config = get_method_config(args.method)
    config.source_path = scene_dir
    config.scene.instance_cap = args.cap
    config.scene.backend = os.environ.get("GSSR_BENCH_BACKEND", "pallas")
    g = config.scene.gaussians
    overrides = dict(capacity=args.capacity)
    if hasattr(g, "n_offsets"):
        overrides.update(appearance_dim=0)
    config.scene.gaussians = dataclasses.replace(g, **overrides)

    scene = build_scene(config)
    if args.mode != "none":
        scene.setup_parallel(args.mode, devices=jax.devices())
    state = scene.init_state()

    cams = scene.dataloader.train_cameras
    if args.mode == "dp":
        cam_arg = [cams[i % len(cams)] for i in range(n_dev)]
    else:
        cam_arg = cams[0]

    # warmup / compile
    state, metrics = scene.train_step(state, cam_arg, 1)
    state, metrics = scene.train_step(state, cam_arg, 2)
    jax.block_until_ready(metrics)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = scene.train_step(state, cam_arg, i + 3)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    w, h = scene.width, scene.height
    frames = n_dev if args.mode == "dp" else 1
    agg = frames * (w * h / 1e6) / dt
    print(json.dumps({
        "metric": f"{args.mode}_train_step_aggregate_mpix_per_s",
        "value": round(agg, 3),
        "unit": f"Mpix/s aggregate ({n_dev} dev, {args.method})",
        "vs_baseline": round(agg / BASELINE_MPIX_S, 3),
        "detail": {"method": args.method, "mode": args.mode,
                   "n_devices": n_dev, "W": w, "H": h,
                   "frames_per_step": frames,
                   "step_ms": round(dt * 1e3, 2),
                   "loss": float(metrics["loss"]),
                   "platform": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
