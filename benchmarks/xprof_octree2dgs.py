#!/usr/bin/env python
"""Op-level profile of the octree-2dgs bench step (one compile + xplane)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.common import W, H, make_camera, make_cloud
from benchmarks.xprof import profile_op_table, print_table


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gssr_tpu.models.octree import OctreeGaussianConfig, OctreeGaussians
    from gssr_tpu.ops.rasterize2d import rasterize_2d
    from gssr_tpu.ops.projection import preprocess
    from gssr_tpu.ops.rasterize import pad_to_tiles
    from gssr_tpu.scene.twodgs import surfel_reg_losses

    CAP = 2_359_296
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, (60_000, 3)) * np.array([1.5, 1.0, 1.0])
    cams = [make_camera(i, dist=3.0 + i * 0.5, yaw=0.3 * i)
            for i in range(4)]
    cfg = OctreeGaussianConfig()
    g = OctreeGaussians(cfg, spatial_lr_scale=2.0, num_cameras=4)
    state = g.create_from_points(pts, cameras=cams, capacity=1 << 18)
    g.set_coarse_interval(1, 1.0)
    cam = cams[0]
    camarr = cam.arrays()
    tgt = make_cloud()["tgt"]
    bg = jnp.zeros(3, jnp.float32)
    pw, ph = pad_to_tiles(W, H)
    step_c = jnp.asarray(20000.0, jnp.float32)

    def loss_fn(anchors, mlp, state_rest):
        st = state._replace(anchors=anchors, mlp=mlp)
        extra_mask, gate = g.pred_int_level(st, camarr.campos, step_c, True)
        active = st.active & (extra_mask if extra_mask is not None
                              else True)
        proj = preprocess(anchors.anchor, jnp.exp(anchors.scaling[:, :3]),
                          g.get_rotation(anchors), camarr, pw, ph,
                          active_mask=active)
        visible = proj.radius > 0
        ng = g.decode(anchors, mlp, camarr.campos, 0, visible, active,
                      level_scale_gate=gate)
        out = rasterize_2d(ng.xyz, ng.scaling[:, :2], ng.rotation,
                           ng.opacity, camarr, W, H, bg,
                           colors_precomp=ng.color, active_mask=ng.mask,
                           instance_cap=CAP, backend="pallas",
                           depth_ratio=0.0)
        l1 = jnp.mean(jnp.abs(out.image - tgt))
        reg = surfel_reg_losses(out, camarr, 8000, 0.05, 100.0)
        return l1 + sum(reg.values()), out.num_rendered

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1),
                                      has_aux=True))
    args = (state.anchors, state.mlp, 0)
    rows = profile_op_table(step, args, iters=3, top=40,
                            readback=lambda o: float(o[0][0]))
    print_table(rows, "octree-2dgs full step per-op (ms/iter)")


if __name__ == "__main__":
    main()
