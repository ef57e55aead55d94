#!/usr/bin/env python
"""Op-level profile of the full PGSR bench step (one compile + xplane)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.common import W, H, make_camera, make_cloud
from benchmarks.xprof import profile_op_table, print_table


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
    cam, cam2 = make_camera(0), make_camera(1, yaw=0.12)
    camarr, camarr2 = cam.arrays(), cam2.arrays()
    gray = jnp.mean(cloud["tgt"], axis=-1)
    bg = jnp.zeros(3, jnp.float32)
    key = jax.random.PRNGKey(0)

    def render(camx, *a):
        return rasterize_pgsr(a[0], a[1], a[2], a[3], camx, W, H, bg,
                              sh_coeffs=a[4], sh_degree=3, instance_cap=CAP,
                              backend="pallas")

    def loss_fn(*a):
        out = render(camarr, *a)
        l1 = jnp.mean(jnp.abs(out.image - cloud["tgt"]))
        dn = PGSRScene.depth_normal(shim, out.plane_depth, out.alpha, camarr)
        w_img = jnp.clip(1.0 - image_grad_weight(cloud["tgt"]), 0.0, 1.0) ** 5
        sv = jnp.mean(w_img * jnp.sum(jnp.abs(dn - out.normal), axis=-1))
        out2 = render(camarr2, *a)
        geo, ncc = PGSRScene._multi_view_losses(shim, out, out2, camarr,
                                                camarr2, gray, gray, key)
        return l1 + 0.015 * sv + geo + ncc, out.num_rendered

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True))
    args = (cloud["means"], cloud["scales"], cloud["rots"], cloud["opac"],
            cloud["sh"])
    rows = profile_op_table(step, args, iters=3, top=45,
                            readback=lambda o: float(o[0][0]))
    print_table(rows, "pgsr full step per-op (ms/iter)")


if __name__ == "__main__":
    main()
