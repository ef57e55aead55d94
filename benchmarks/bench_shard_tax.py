#!/usr/bin/env python
"""Sharding tax on real hardware (VERDICT r4 item 8).

Multi-chip hardware is not reachable from this host, but the OVERHEAD of
the sharded step — shard_map tracing, collective ops on a 1-long axis,
band clipping / gather plumbing, the gshard all_gather — is measurable on
ONE chip by running each parallel mode over a 1-device mesh and comparing
against the unsharded step. This bounds the fixed cost a real N-chip mesh
would pay on top of compute.

Usage: python benchmarks/bench_shard_tax.py [--method 3dgs] [--steps 12]
Writes a row per mode: {mode, step_ms, tax_vs_none}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def bench_mode(method, scene_dir, mode, steps):
    import dataclasses
    import jax
    from gssr_tpu.configs.methods import build_scene, get_method_config

    config = get_method_config(method)
    config.source_path = scene_dir
    cfg = config.scene
    cfg.instance_cap = int(os.environ.get("GSSR_BENCH_CAP", 2_555_904))
    cfg.backend = "pallas"
    if hasattr(cfg.gaussians, "n_offsets"):
        cfg.gaussians = dataclasses.replace(cfg.gaussians, capacity=65536)
    scene = build_scene(config)
    if mode != "none":
        scene.setup_parallel(mode, devices=jax.devices()[:1])
    state = scene.state
    cams = scene.dataloader.train_cameras
    wrap = (lambda c: [c]) if mode == "dp" else (lambda c: c)

    step0 = 8000
    state, _ = scene.train_step(state, wrap(cams[0]), step0)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = scene.train_step(state, wrap(cams[i % len(cams)]),
                                    step0 + 1 + i)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    return (time.perf_counter() - t0) / steps


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize pins the axon plugin over the env var
        import jax
        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="3dgs")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--tag", default="r5")
    ap.add_argument("--modes", default=None,
                    help="comma list; default none,dp,band[,gshard]. Each "
                         "mode pays a full remote train-step compile "
                         "(~10-15 min on the tunneled chip) — scope this "
                         "when the chip schedule is tight")
    args = ap.parse_args()

    import tempfile
    from synthetic import write_synthetic_colmap_scene
    from benchmarks.common import W, H

    scene_dir = tempfile.mkdtemp(prefix="bench_tax_")
    write_synthetic_colmap_scene(
        scene_dir, n_cams=4, n_pts=int(os.environ.get("GSSR_BENCH_PTS",
                                                      200_000)),
        width=W, height=H, gt_mode="noise")

    modes = ["none", "dp", "band"]
    if args.method in ("3dgs", "2dgs", "scaffold-gs", "octree-gs",
                       "scaffold-2dgs", "octree-2dgs"):
        modes.append("gshard")
    if args.modes:
        modes = args.modes.split(",")
        assert modes[0] == "none", "first mode must be the unsharded base"
    rows = {}
    for mode in modes:
        dt = bench_mode(args.method, scene_dir, mode, args.steps)
        rows[mode] = round(dt * 1e3, 2)
        base = rows["none"]
        print(json.dumps({"metric": f"{args.method}_shardtax_{mode}",
                          "value": rows[mode], "unit": "ms/step",
                          "tax_vs_none": round(rows[mode] / base, 3)}),
              flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", f"shard_tax_{args.tag}.json")
    with open(out, "w") as f:
        json.dump({"method": args.method, "W": W, "H": H,
                   "step_ms": rows}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
