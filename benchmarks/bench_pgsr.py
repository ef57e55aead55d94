#!/usr/bin/env python
"""BASELINE config #4: PGSR planar rasterize + multi-view geometric
regularization, fwd+bwd, one chip.

Reference workload: diff-plane-rasterization with render_geo + PGSRScene's
single-view normal loss and two-camera multi-view reprojection/NCC losses
(reference gssr/scene/pgsr_scene.py:108-224,295-314).
"""
from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from benchmarks.common import W, H, make_camera, make_cloud, time_step, emit


def main():
    import jax
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr
    from gssr_tpu.ops.sampling import image_grad_weight
    from gssr_tpu.scene.pgsr import PGSRScene, PGSRSceneConfig

    class _Shim:  # unbound-method receiver carrying only the config
        config = PGSRSceneConfig()
    shim = _Shim()

    # tight: ~2.45M padded instances per render
    CAP = 2_555_904
    cloud = make_cloud()
    cam = make_camera(0)
    cam2 = make_camera(1, yaw=0.12)
    camarr, camarr2 = cam.arrays(), cam2.arrays()
    gray = jnp.mean(cloud["tgt"], axis=-1)
    bg = jnp.zeros(3, jnp.float32)
    key = jax.random.PRNGKey(0)

    def render(camx, means, scales, rots, opac, sh):
        return rasterize_pgsr(means, scales, rots, opac, camx, W, H, bg,
                              sh_coeffs=sh, sh_degree=3, instance_cap=CAP,
                              backend="pallas")

    def loss_fn(means, scales, rots, opac, sh):
        out = render(camarr, means, scales, rots, opac, sh)
        l1 = jnp.mean(jnp.abs(out.image - cloud["tgt"]))
        # single-view geometry: depth->normal consistency, image-grad weight
        dn = PGSRScene.depth_normal(shim, out.plane_depth, out.alpha, camarr)
        w_img = jnp.clip(1.0 - image_grad_weight(cloud["tgt"]), 0.0, 1.0) ** 5
        sv = jnp.mean(w_img * jnp.sum(jnp.abs(dn - out.normal), axis=-1))
        # multi-view: second camera render + reprojection/NCC losses
        out2 = render(camarr2, means, scales, rots, opac, sh)
        geo, ncc = PGSRScene._multi_view_losses(shim, out, out2, camarr,
                                                camarr2, gray, gray, key)
        return l1 + 0.015 * sv + geo + ncc, out.num_rendered

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True))
    args = (cloud["means"], cloud["scales"], cloud["rots"], cloud["opac"],
            cloud["sh"])
    dt = time_step(step, args, readback=lambda o: float(o[0][0]))
    (loss, nrend), _ = step(*args)
    # two full renders per step -> 2x pixels pushed through the rasterizer
    emit("pgsr_multiview_fwd_bwd_mpix_per_s", 2 * (W * H / 1e6) / dt,
         {"W": W, "H": H, "renders_per_step": 2,
          "num_rendered": int(nrend), "step_ms": round(dt * 1e3, 2),
          "loss": float(loss)}, family="pgsr")


if __name__ == "__main__":
    main()
