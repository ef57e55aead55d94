#!/usr/bin/env python
"""Per-op stage attribution from ONE compiled step via jax.profiler.

Through the axon tunnel every distinct jit costs minutes of remote compile
(and the persistent cache cannot serialize executables), so subset-jit
profiling is ruinously slow. Instead: compile the full step once, trace a
few executions, and aggregate XLA-op durations from the xplane proto.

Usage:
    from benchmarks.xprof import profile_op_table
    table = profile_op_table(step, args, iters=3)   # [(name, total_ms)]
"""
from __future__ import annotations

import glob
import gzip
import os
import tempfile


def _xplane_op_durations(xspace_path):
    """Aggregate TPU op durations (us) by event name from an xplane proto.

    Parses the serialized XSpace with a local protoc-built mirror of the
    (stable) xplane schema — the installed tensorboard_plugin_profile ships
    no python bindings for it.
    Returns {name: total_duration_us} from the device plane's line events.
    """
    from benchmarks._xplane import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(xspace_path, "rb") as f:
        xspace.ParseFromString(f.read())
    out = {}
    for plane in xspace.planes:
        # device planes: '/device:TPU:0' etc.; skip host threads
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        metas = {m.id: m.name for m in plane.event_metadata.values()} \
            if hasattr(plane.event_metadata, "values") else {}
        if not metas:
            metas = {mid: m.name for mid, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = metas.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e6  # ps -> us
                out[name] = out.get(name, 0.0) + dur
    return out


def profile_op_table(step, args, iters: int = 3, top: int = 40,
                     readback=None):
    """Run `step(*args)` iters times under the profiler; return the
    aggregated per-op-name device time table, descending."""
    import jax
    if readback is None:
        readback = lambda o: jax.block_until_ready(o)
    out = step(*args)           # compile outside the trace
    readback(out)
    tmp = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            out = step(*args)
        readback(out)
    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                      recursive=True)
    durs = {}
    for p in paths:
        for k, v in _xplane_op_durations(p).items():
            durs[k] = durs.get(k, 0.0) + v
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
    return [(name, us / 1e3 / iters) for name, us in rows]   # ms per iter


def print_table(rows, title=""):
    if title:
        print(f"== {title} ==", flush=True)
    for name, ms in rows:
        print(f"{ms:9.3f} ms  {name[:110]}", flush=True)
