#!/usr/bin/env python
"""Run every per-family rasterize bench and collect one JSON table.

Writes benchmarks/results/perf_r{round}.json with the Mpix/s of each
payload (vanilla / 2DGS / PGSR / scaffold decode / octree-2dgs composite)
on the current chip — VERDICT r2 item 2 (the reference ships a CUDA
rasterizer per method; this records that every payload, not just the
headline vanilla one, is fast).

Each bench runs in a SUBPROCESS so a failure (e.g. instance-cap overflow)
is recorded instead of killing the sweep, and so the single-client TPU
tunnel is released between benches.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

BENCHES = [
    ("vanilla", [sys.executable, os.path.join(HERE, "..", "bench.py")]),
    ("2dgs", [sys.executable, os.path.join(HERE, "bench_2dgs.py")]),
    ("pgsr", [sys.executable, os.path.join(HERE, "bench_pgsr.py")]),
    ("scaffold", [sys.executable, os.path.join(HERE, "bench_scaffold.py")]),
    ("octree-2dgs", [sys.executable,
                     os.path.join(HERE, "bench_octree2dgs.py")]),
    # the REAL jitted train step (losses + Adam + stats) under the K-step
    # scan-block dispatch path; prints one metric line per method
    ("train_step", [sys.executable,
                    os.path.join(HERE, "bench_train_step.py")]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        HERE, "results", "perf_r3.json"))
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()

    table = {}
    for name, cmd in BENCHES:
        print(f"=== {name}: {' '.join(cmd)}", flush=True)
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout)
            lines = []
            for ln in res.stdout.strip().splitlines():
                ln = ln.strip()
                if ln.startswith("{") and '"metric"' in ln:
                    lines.append(json.loads(ln))
            if not lines:
                table[name] = {"error": (res.stdout[-400:] +
                                         res.stderr[-400:])}
            elif len(lines) == 1:
                table[name] = lines[0]
            else:
                table[name] = {l["metric"]: l for l in lines}
        except subprocess.TimeoutExpired:
            table[name] = {"error": f"timeout after {args.timeout}s"}
        print(json.dumps(table[name]), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
