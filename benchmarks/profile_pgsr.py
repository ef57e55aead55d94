#!/usr/bin/env python
"""Stage decomposition of the PGSR bench step (VERDICT r3 weakness #6).

Times nested subsets of benchmarks/bench_pgsr.py's step so each stage's
marginal cost is the difference between consecutive rows.
"""
from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from benchmarks.common import W, H, make_camera, make_cloud, time_step


def main():
    import jax
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr
    from gssr_tpu.ops.sampling import image_grad_weight
    from gssr_tpu.scene.pgsr import PGSRScene, PGSRSceneConfig

    class _Shim:
        config = PGSRSceneConfig()
    shim = _Shim()

    CAP = 2_555_904
    cloud = make_cloud()
    cam = make_camera(0)
    cam2 = make_camera(1, yaw=0.12)
    camarr, camarr2 = cam.arrays(), cam2.arrays()
    gray = jnp.mean(cloud["tgt"], axis=-1)
    bg = jnp.zeros(3, jnp.float32)
    key = jax.random.PRNGKey(0)
    args = (cloud["means"], cloud["scales"], cloud["rots"], cloud["opac"],
            cloud["sh"])

    def render(camx, means, scales, rots, opac, sh):
        return rasterize_pgsr(means, scales, rots, opac, camx, W, H, bg,
                              sh_coeffs=sh, sh_degree=3, instance_cap=CAP,
                              backend="pallas")

    def report(name, fn, grad=True, readback=None):
        if grad:
            step = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2, 3, 4),
                                              has_aux=True))
            rb = readback or (lambda o: float(o[0][0]))
        else:
            step = jax.jit(fn)
            rb = readback or (lambda o: float(jax.tree_util.tree_leaves(o)[0]
                                              .ravel()[0]))
        dt = time_step(step, args, iters=10, readback=rb)
        print(f"{name:42s} {dt * 1e3:8.2f} ms")
        return dt

    # forward only, one render
    def f_fwd1(*a):
        out = render(camarr, *a)
        return out.image.sum()
    report("fwd render x1 (no grad)", f_fwd1, grad=False,
           readback=lambda o: float(o))

    # L1-only, one render, fwd+bwd
    def f_l1_1(*a):
        out = render(camarr, *a)
        return jnp.mean(jnp.abs(out.image - cloud["tgt"])), out.num_rendered
    report("L1 fwd+bwd x1 render", f_l1_1)

    # L1-only, two renders
    def f_l1_2(*a):
        out = render(camarr, *a)
        out2 = render(camarr2, *a)
        l1 = (jnp.mean(jnp.abs(out.image - cloud["tgt"]))
              + 0.0 * jnp.mean(out2.image))
        return l1, out.num_rendered
    report("L1 fwd+bwd x2 renders", f_l1_2)

    # + single-view normal loss
    def f_sv(*a):
        out = render(camarr, *a)
        out2 = render(camarr2, *a)
        l1 = (jnp.mean(jnp.abs(out.image - cloud["tgt"]))
              + 0.0 * jnp.mean(out2.image))
        dn = PGSRScene.depth_normal(shim, out.plane_depth, out.alpha, camarr)
        w_img = jnp.clip(1.0 - image_grad_weight(cloud["tgt"]), 0.0, 1.0) ** 5
        sv = jnp.mean(w_img * jnp.sum(jnp.abs(dn - out.normal), axis=-1))
        return l1 + 0.015 * sv, out.num_rendered
    report("+ single-view normal loss", f_sv)

    # + geo loss only
    def f_geo(*a):
        out = render(camarr, *a)
        out2 = render(camarr2, *a)
        l1 = jnp.mean(jnp.abs(out.image - cloud["tgt"]))
        dn = PGSRScene.depth_normal(shim, out.plane_depth, out.alpha, camarr)
        w_img = jnp.clip(1.0 - image_grad_weight(cloud["tgt"]), 0.0, 1.0) ** 5
        sv = jnp.mean(w_img * jnp.sum(jnp.abs(dn - out.normal), axis=-1))
        geo, ncc = PGSRScene._multi_view_losses(shim, out, out2, camarr,
                                                camarr2, gray, gray, key)
        return l1 + 0.015 * sv + geo + 0.0 * ncc, out.num_rendered
    report("+ geo loss (ncc zeroed)", f_geo)

    # full (== bench)
    def f_full(*a):
        out = render(camarr, *a)
        out2 = render(camarr2, *a)
        l1 = jnp.mean(jnp.abs(out.image - cloud["tgt"]))
        dn = PGSRScene.depth_normal(shim, out.plane_depth, out.alpha, camarr)
        w_img = jnp.clip(1.0 - image_grad_weight(cloud["tgt"]), 0.0, 1.0) ** 5
        sv = jnp.mean(w_img * jnp.sum(jnp.abs(dn - out.normal), axis=-1))
        geo, ncc = PGSRScene._multi_view_losses(shim, out, out2, camarr,
                                                camarr2, gray, gray, key)
        return l1 + 0.015 * sv + geo + ncc, out.num_rendered
    report("full bench step", f_full)


if __name__ == "__main__":
    main()
