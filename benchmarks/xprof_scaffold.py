#!/usr/bin/env python
"""Op-level profile of the scaffold bench step (one compile + xplane)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.common import W, H, make_camera, make_cloud
from benchmarks.xprof import profile_op_table, print_table


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gssr_tpu.models.scaffold import (ScaffoldGaussianConfig,
                                          ScaffoldGaussians)
    from gssr_tpu.ops.rasterize import rasterize, pad_to_tiles
    from gssr_tpu.ops.projection import preprocess

    CAP = 3_932_160
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, (60_000, 3)) * np.array([1.5, 1.0, 1.0])
    cfg = ScaffoldGaussianConfig(voxel_size=0.02)
    g = ScaffoldGaussians(cfg, spatial_lr_scale=2.0, num_cameras=4)
    state = g.create_from_points(pts, capacity=1 << 16)
    cam = make_camera()
    camarr = cam.arrays()
    tgt = make_cloud()["tgt"]
    bg = jnp.zeros(3, jnp.float32)
    pw, ph = pad_to_tiles(W, H)

    def loss_fn(anchors, mlp, active):
        proj = preprocess(anchors.anchor, jnp.exp(anchors.scaling[:, :3]),
                          g.get_rotation(anchors), camarr, pw, ph,
                          active_mask=active)
        visible = proj.radius > 0
        ng = g.decode(anchors, mlp, camarr.campos, 0, visible, active)
        out = rasterize(ng.xyz, ng.scaling, ng.rotation, ng.opacity, camarr,
                        W, H, bg, colors_precomp=ng.color,
                        active_mask=ng.mask, instance_cap=CAP,
                        backend="pallas")
        return jnp.mean(jnp.abs(out.image - tgt)), out.num_rendered

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True))
    args = (state.anchors, state.mlp, state.active)
    rows = profile_op_table(step, args, iters=3, top=40,
                            readback=lambda o: float(o[0][0]))
    print_table(rows, "scaffold full step per-op (ms/iter)")


if __name__ == "__main__":
    main()
