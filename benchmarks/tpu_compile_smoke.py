#!/usr/bin/env python
"""TPU-compile smoke: lower + compile every Pallas rasterizer for a real
TPU target at small shapes, without a full bench run.

Mosaic rejects constructs that interpret mode happily executes (e.g.
jnp.where over bool vectors -> i1 trunci), so CPU CI cannot catch TPU
compile regressions — this script can, in ~a minute once the compile
cache is warm. Run it on any machine with TPU access after touching
ops/*.py:

    python benchmarks/tpu_compile_smoke.py

Exit code 0 = all kernels compile (fwd + bwd); nonzero prints the Mosaic
error. VERDICT r1 'weak' item 3.
"""
from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"no TPU backend (have {jax.default_backend()}); "
              "run this on a TPU machine")
        return 2

    from gssr_tpu.cameras import Camera
    from gssr_tpu.ops.rasterize import rasterize
    from gssr_tpu.ops.rasterize2d import rasterize_2d
    from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr

    W, H, N, CAP = 128, 64, 512, 65536
    rng = np.random.default_rng(0)
    cam = Camera(uid=0, colmap_id=0, image_name="smoke", R=np.eye(3),
                 T=np.array([0.0, 0.0, 4.0]), fovx=math.radians(70),
                 fovy=math.radians(50), width=W, height=H).arrays()
    means = jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-4, -2.5, (N, 3))), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, (N,)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    def compile_one(name, loss_fn, argnums):
        t0 = time.time()
        jax.jit(jax.grad(loss_fn, argnums=argnums)).lower(
            means, scales, rots, opac).compile()
        print(f"  {name}: compiled fwd+bwd in {time.time() - t0:.1f}s")

    failures = []
    try:
        compile_one("vanilla (blend_pallas)", lambda m, s, r, o: jnp.sum(
            rasterize(m, s, r, o, cam, W, H, bg, colors_precomp=cols,
                      instance_cap=CAP, backend="pallas").image),
            (0, 1, 2, 3))
    except Exception as e:                                  # noqa: BLE001
        failures.append(("vanilla", e))
    try:
        compile_one("2dgs (blend2d_pallas)", lambda m, s, r, o: jnp.sum(
            rasterize_2d(m, s[:, :2], r, o, cam, W, H, bg,
                         colors_precomp=cols, instance_cap=CAP,
                         backend="pallas").image), (0, 1, 2, 3))
    except Exception as e:                                  # noqa: BLE001
        failures.append(("2dgs", e))
    try:
        compile_one("pgsr (blend_pgsr_pallas)", lambda m, s, r, o: jnp.sum(
            rasterize_pgsr(m, s, r, o, cam, W, H, bg, colors_precomp=cols,
                           instance_cap=CAP, backend="pallas").image)
            + jnp.sum(rasterize_pgsr(m, s, r, o, cam, W, H, bg,
                                     colors_precomp=cols, instance_cap=CAP,
                                     backend="pallas").plane_depth),
            (0, 1, 2, 3))
    except Exception as e:                                  # noqa: BLE001
        failures.append(("pgsr", e))

    if failures:
        for name, e in failures:
            print(f"FAIL {name}: {e}")
        return 1
    print("all pallas kernels compile for TPU")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
