#!/usr/bin/env python
"""BASELINE config #2: 2DGS surfel rasterize fwd+bwd with the full aux-loss
head (depth distortion + depth->normal consistency), one chip.

Reference workload: diff-surfel-rasterization through TwoDGSScene
(reference gssr/scene/twodgs_scene.py:22-127).
"""
from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from benchmarks.common import W, H, make_camera, make_cloud, time_step, emit


def main():
    import jax
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize2d import rasterize_2d
    from gssr_tpu.scene.twodgs import surfel_reg_losses

    # tight: the workload pads to ~1.9M chunk-aligned instances
    CAP = 1_966_080
    cloud = make_cloud()
    cam = make_camera()
    camarr = cam.arrays()
    scales2 = cloud["scales"][:, :2]

    def loss_fn(means, scales2, rots, opac, sh):
        out = rasterize_2d(means, scales2, rots, opac, camarr, W, H,
                           jnp.zeros(3, jnp.float32), sh_coeffs=sh,
                           sh_degree=3, instance_cap=CAP, backend="pallas",
                           depth_ratio=0.0)
        l1 = jnp.mean(jnp.abs(out.image - cloud["tgt"]))
        reg = surfel_reg_losses(out, camarr, 8000, 0.05, 100.0)
        return l1 + sum(reg.values()), out.num_rendered

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True))
    args = (cloud["means"], scales2, cloud["rots"], cloud["opac"],
            cloud["sh"])
    dt = time_step(step, args,
                   readback=lambda o: float(o[0][0]))
    (loss, nrend), _ = step(*args)
    emit("surfel_fwd_bwd_mpix_per_s", (W * H / 1e6) / dt,
         {"W": W, "H": H, "num_rendered": int(nrend),
          "step_ms": round(dt * 1e3, 2), "loss": float(loss)})


if __name__ == "__main__":
    main()
