#!/usr/bin/env python
"""Harvest a partial convergence JSON from a still-running (or killed)
train.py via its TensorBoard event file.

The convergence harness (benchmarks/convergence.py) writes its JSON only
after train.py exits; a run that hits the round's wall-clock budget would
otherwise leave no committed evidence. This reads eval/eval_psnr and
train/* scalars straight from the run dir and writes the same curve
schema with a "truncated": true marker.

Usage: python benchmarks/harvest_partial.py <run_dir_glob> <out.json>
  e.g. harvest_partial.py '/tmp/conv5k/octree-2dgs/scene/octree-2dgs/*' \
       benchmarks/results/convergence_r5-long.json
"""
from __future__ import annotations

import glob
import json
import sys


def main():
    run_glob, out = sys.argv[1], sys.argv[2]
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    d = sorted(glob.glob(run_glob))[-1]
    ea = EventAccumulator(d + "/logs")
    ea.Reload()
    tags = ea.Tags()["scalars"]
    curve = []
    if "eval/eval_psnr" in tags:
        l1 = {e.step: e.value for e in ea.Scalars("eval/eval_l1")} \
            if "eval/eval_l1" in tags else {}
        for e in ea.Scalars("eval/eval_psnr"):
            curve.append({"step": e.step,
                          "l1": round(l1.get(e.step, float("nan")), 4),
                          "psnr": round(e.value, 4)})
    result = {
        "run_dir": d,
        "truncated": True,
        "note": "harvested from TB events before train.py completion "
                "(round wall-clock budget); n_active telemetry is in the "
                "trainer stdout, unavailable until process exit",
        "curve": curve,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out} ({len(curve)} eval points, "
          f"last {curve[-1] if curve else None})")


if __name__ == "__main__":
    main()
