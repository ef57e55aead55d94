#!/usr/bin/env python
"""Stage decomposition of the 2DGS bench step (VERDICT r3 weakness #6).

Nested subsets of benchmarks/bench_2dgs.py's step; marginal stage cost is
the difference between consecutive rows.
"""
from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import W, H, make_camera, make_cloud, time_step


def main():
    import jax
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize2d import rasterize_2d
    from gssr_tpu.ops.projection2d import preprocess_2d
    from gssr_tpu.ops.binning import bin_gaussians
    from gssr_tpu.ops.projection import TILE
    from gssr_tpu.scene.twodgs import surfel_reg_losses

    CAP = 1_966_080
    cloud = make_cloud()
    cam = make_camera()
    camarr = cam.arrays()
    scales2 = cloud["scales"][:, :2]
    args = (cloud["means"], scales2, cloud["rots"], cloud["opac"],
            cloud["sh"])

    def render(*a):
        return rasterize_2d(a[0], a[1], a[2], a[3], camarr, W, H,
                            jnp.zeros(3, jnp.float32), sh_coeffs=a[4],
                            sh_degree=3, instance_cap=CAP, backend="pallas",
                            depth_ratio=0.0)

    def report(name, fn, grad=True):
        if grad:
            step = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2, 3, 4),
                                              has_aux=True))
            rb = lambda o: float(o[0][0])
        else:
            step = jax.jit(fn)
            rb = lambda o: float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        dt = time_step(step, args, iters=10, readback=rb)
        print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    # projection + binning only (no blend)
    def f_bin(*a):
        pw, ph = 1600, 1056
        proj = preprocess_2d(a[0], a[1], a[2], camarr, pw, ph,
                             opacity=a[3].reshape(-1))
        b = bin_gaussians(jax.lax.stop_gradient(proj.rect),
                          jax.lax.stop_gradient(proj.depth),
                          jax.lax.stop_gradient(proj.tiles_touched),
                          pw // TILE, ph // TILE, CAP, chunk=128)
        return (jnp.sum(b.gauss_id) + jnp.sum(proj.mean2d)
                + jnp.sum(b.hit)).astype(jnp.float32)
    report("preprocess2d + binning (no grad)", f_bin, grad=False)

    # forward render only
    def f_fwd(*a):
        out = render(*a)
        return out.image.sum() + out.dist.sum() + out.normal.sum()
    report("fwd render (no grad)", f_fwd, grad=False)

    # L1 only fwd+bwd
    def f_l1(*a):
        out = render(*a)
        return jnp.mean(jnp.abs(out.image - cloud["tgt"])), out.num_rendered
    report("L1 fwd+bwd", f_l1)

    # full bench step
    def f_full(*a):
        out = render(*a)
        l1 = jnp.mean(jnp.abs(out.image - cloud["tgt"]))
        reg = surfel_reg_losses(out, camarr, 8000, 0.05, 100.0)
        return l1 + sum(reg.values()), out.num_rendered
    report("+ surfel reg losses (full bench)", f_full)


if __name__ == "__main__":
    main()
