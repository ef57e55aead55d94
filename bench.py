#!/usr/bin/env python
"""Headline bench: vanilla-3DGS rasterize fwd+bwd Mpix/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline constant: the reference CUDA stack trains 3DGS 30k iterations on a
~1 Mpix building-scale scene in 39-41 min (reference README results table,
see BASELINE.md) => ~12.8 full train steps/s ~= 12.8 Mpix/s through the
rasterizer fwd+bwd on its (unstated) GPU. vs_baseline is measured Mpix/s
over that number.
"""
from __future__ import annotations

import json
import math
import time

import numpy as np

BASELINE_MPIX_S = 12.8


def main():
    import jax
    import jax.numpy as jnp
    from gssr_tpu.cameras import Camera
    from gssr_tpu.ops.rasterize import rasterize

    W, H = 1600, 1056
    N = 200_000
    # tight instance capacity: every binning/pack/scatter op scales
    # linearly with CAP, so size it to the workload (trainer auto-bumps on
    # overflow; here the workload pads to ~2.65M chunk-aligned instances)
    CAP = 2_555_904

    rng = np.random.default_rng(0)
    cam = Camera(uid=0, colmap_id=0, image_name="bench",
                 R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
                 fovx=math.radians(70), fovy=math.radians(50),
                 width=W, height=H)

    # mix of small splats clustered in view
    means = jnp.asarray(rng.uniform(-3, 3, (N, 3)) * np.array([1.5, 1.0, 1.0]),
                        jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-4.5, -2.5, (N, 3))), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, (N,)), jnp.float32)
    sh = jnp.asarray(rng.normal(0, 0.3, (N, 16, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    camarr = cam.arrays()

    def loss_fn(means, scales, rots, opac, sh):
        out = rasterize(means, scales, rots, opac, camarr, W, H, bg,
                        sh_coeffs=sh, sh_degree=3,
                        instance_cap=CAP, backend="pallas")
        return jnp.mean(jnp.abs(out.image - tgt)), (out.num_rendered,
                                                    out.overflow)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True))

    (loss, (nrend, ovf)), grads = step(means, scales, rots, opac, sh)
    jax.block_until_ready(grads)
    assert not bool(ovf), "instance_cap overflow — raise CAP"
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        (loss, (nrend, ovf)), grads = step(means, scales, rots, opac, sh)
    # force a real device round-trip (block_until_ready alone is unreliable
    # through the axon tunnel)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / n_iters

    mpix_s = (W * H / 1e6) / dt
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_mpix_per_s",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
        "detail": {"W": W, "H": H, "N": N,
                   "num_rendered": int(nrend),
                   "step_ms": round(dt * 1e3, 2),
                   "loss": float(loss)},
    }))


if __name__ == "__main__":
    main()
