#!/usr/bin/env python
"""BASELINE config #3: Scaffold-GS anchor prefilter + neural-gaussian MLP
decode + rasterize, fwd+bwd, one chip.

Reference workload: scaffold-filter visible_filter + ScaffoldScene
generate_neural_gaussians + diff-gaussian-rasterization (reference
gssr/scene/scaffold_scene.py:27-155).
"""
from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from benchmarks.common import W, H, make_camera, make_cloud, time_step, emit


def main():
    import jax
    import jax.numpy as jnp
    from gssr_tpu.models.scaffold import (ScaffoldGaussianConfig,
                                          ScaffoldGaussians)
    from gssr_tpu.ops.rasterize import rasterize, pad_to_tiles
    from gssr_tpu.ops.projection import preprocess

    # tight: the default workload pads to ~3.8M chunk-aligned instances.
    # GSSR_BENCH_ANCHORS/GSSR_BENCH_CAP rescale the stream — e.g. 27000 /
    # 1966080 approximates the ~0.9 instances/pixel operating point that
    # REAL trained anchor models run at (benchmarks/instance_analysis.py),
    # vs this synthetic default's ~2.0/pixel
    CAP = int(os.environ.get("GSSR_BENCH_CAP", 3_932_160))
    n_anchor_pts = int(os.environ.get("GSSR_BENCH_ANCHORS", 60_000))
    rng = np.random.default_rng(0)
    # anchors x 10 offsets -> neural gaussians
    pts = rng.uniform(-3, 3, (n_anchor_pts, 3)) * np.array([1.5, 1.0, 1.0])
    cfg = ScaffoldGaussianConfig(voxel_size=0.02)
    g = ScaffoldGaussians(cfg, spatial_lr_scale=2.0, num_cameras=4)
    # snug anchor capacity: every decode/pack op scales with CA*K
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
    dt = time_step(step, args, readback=lambda o: float(o[0][0]))
    (loss, nrend), _ = step(*args)
    emit("scaffold_decode_render_mpix_per_s", (W * H / 1e6) / dt,
         {"W": W, "H": H, "n_anchors": int(state.n_active),
          "num_rendered": int(nrend), "step_ms": round(dt * 1e3, 2),
          "loss": float(loss)}, family="scaffold")


if __name__ == "__main__":
    main()
