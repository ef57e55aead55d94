#!/usr/bin/env python
"""BASELINE config #5 harness: data-parallel train-step scaling over a
device mesh (camera-batch DP, grads psum'd over ICI).

On a real multi-chip slice this measures aggregate Mpix/s and scaling
efficiency vs the single-chip bench. Off-slice it can be exercised on a
virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8 GSSR_TPU_INTERPRET=1)
to validate the sharded step; CPU numbers are not meaningful throughput.

Usage: python benchmarks/bench_scaling.py [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import math
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.common import BASELINE_MPIX_S, make_camera


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n-gauss", type=int, default=200_000)
    ap.add_argument("--cap", type=int, default=3 << 20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gssr_tpu.models.vanilla import VanillaGaussianConfig, VanillaGaussians
    from gssr_tpu.parallel.train_step import build_dp_train_step
    from gssr_tpu.cameras import CameraArrays

    from benchmarks.common import W, H
    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, (args.n_gauss, 3)) * np.array([1.5, 1.0, 1.0])
    cols = rng.uniform(0, 1, (args.n_gauss, 3))
    g = VanillaGaussians(VanillaGaussianConfig(capacity=args.n_gauss), 2.0)
    state = g.create_from_points(pts, cols)

    cams = [make_camera(i, yaw=0.15 * i) for i in range(n_dev)]
    cam_batch = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[c.arrays() for c in cams])
    gt_batch = jnp.asarray(rng.uniform(0, 1, (n_dev, H, W, 3)), jnp.float32)

    step_fn, mesh = build_dp_train_step(
        g, W, H, args.cap, backend=os.environ.get("GSSR_BENCH_BACKEND",
                                                  "pallas"))
    state, metrics = step_fn(state, cam_batch, gt_batch, 1)
    jax.block_until_ready(metrics)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step_fn(state, cam_batch, gt_batch, i + 2)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    agg = n_dev * (W * H / 1e6) / dt
    print(json.dumps({
        "metric": "dp_train_step_aggregate_mpix_per_s",
        "value": round(agg, 3),
        "unit": f"Mpix/s aggregate ({n_dev} dev)",
        "vs_baseline": round(agg / BASELINE_MPIX_S, 3),
        "detail": {"n_devices": n_dev, "W": W, "H": H,
                   "per_device_mpix_s": round(agg / n_dev, 3),
                   "step_ms": round(dt * 1e3, 2),
                   "loss": float(metrics["loss"]),
                   "platform": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
