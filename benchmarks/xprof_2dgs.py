#!/usr/bin/env python
"""Op-level profile of the full 2DGS bench step (one compile + xplane)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.common import W, H, make_camera, make_cloud
from benchmarks.xprof import profile_op_table, print_table


def main():
    import jax
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize2d import rasterize_2d
    from gssr_tpu.scene.twodgs import surfel_reg_losses

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
    rows = profile_op_table(step, args, iters=3, top=40,
                            readback=lambda o: float(o[0][0]))
    print_table(rows, "2dgs full step per-op (ms/iter)")


if __name__ == "__main__":
    main()
