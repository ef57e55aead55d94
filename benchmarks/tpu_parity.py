#!/usr/bin/env python
"""On-chip composed train-step gradient parity gate.

Round 4's defect class — every isolated stage exact, the COMPOSED compiled
backward corrupt — is only catchable by differentiating the full
decode->prefilter->render->loss composition on the real chip and comparing
against the CPU/interpret path. This script is the committed regression
gate for that class (root cause was TPU's default bf16 matmul precision on
the XLA-level geometry matmuls; fixed by the package-level
jax_default_matmul_precision=highest — see gssr_tpu/__init__.py and
benchmarks/fd_probe.py).

For each method it builds the scene, takes the composed loss gradient wrt
all trainable leaves (params or anchors+mlp) at a real camera/GT pair, and
reports per-leaf cosine + relative magnitude between the compiled-TPU and
interpret-CPU executions. PASS requires cos >= 0.999 on every leaf.

Usage:
  python benchmarks/tpu_parity.py --scene-dir /tmp/conv_r5/scene \
      --methods 3dgs,2dgs,octree-2dgs [--tag r5]
(The scene dir is a COLMAP scene, e.g. built by benchmarks/convergence.py.)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "axon,cpu"
os.environ.pop("GSSR_TPU_INTERPRET", None)

import jax
import jax.numpy as jnp
import numpy as np

ANCHOR_CAPACITY = 65536
VANILLA_CAPACITY = 262144
INSTANCE_CAP = 1_572_864


def build_scene(method, scene_dir):
    import dataclasses
    from gssr_tpu.configs.methods import get_method_config
    from gssr_tpu.configs.methods import build_scene as _build
    cfg = get_method_config(method)
    cfg.source_path = scene_dir
    cfg.scene.instance_cap = INSTANCE_CAP
    cap = (ANCHOR_CAPACITY if hasattr(cfg.scene.gaussians, "n_offsets")
           else VANILLA_CAPACITY)
    cfg.scene.gaussians = dataclasses.replace(cfg.scene.gaussians,
                                              capacity=cap)
    return _build(cfg)


def make_loss(scene, cam_arrays, uid, gt, step):
    """Mirror the scene's _train_step loss composition (scene/vanilla.py
    _train_step, scene/scaffold.py _train_step) as a pure function of the
    trainable leaves."""
    bg = jnp.zeros(3, jnp.float32)
    state = scene.state
    if hasattr(scene, "prefilter_anchors"):      # scaffold/octree family
        from gssr_tpu.ops.ssim import l1_loss, ssim

        def loss(diff):
            anchors, mlp = diff
            extra_mask, gate = scene.anchor_level_gate(
                state._replace(anchors=anchors), cam_arrays, step)
            visible = scene.prefilter_anchors(anchors, state.active,
                                              cam_arrays)
            if extra_mask is not None:
                visible = visible & extra_mask
            visible = jax.lax.stop_gradient(visible)
            ng, out = scene.decode_and_render(
                anchors, mlp, cam_arrays, uid, visible, state.active, bg,
                level_scale_gate=gate)
            lam = scene.config.lambda_dssim
            terms = {
                "L1": (1.0 - lam) * l1_loss(out.image, gt),
                "ssim": lam * (1.0 - ssim(out.image, gt)),
            }
            terms.update(scene.extra_losses(ng, out, step, cam_arrays))
            return sum(terms.values())

        diff0 = (state.anchors, state.mlp)
    else:                                        # vanilla/2dgs/pgsr family
        sh_degree = scene.gaussians.active_sh_degree(step)
        scene._current_camera = cam_arrays       # TwoDGSScene loss hook

        def loss(params):
            out = scene.render_params(params, cam_arrays, sh_degree,
                                      state.active, bg)
            terms = scene.loss_terms(out, gt, step=step)
            return sum(terms.values())

        diff0 = state.params
    return loss, diff0


def leafdict(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat}


def run_leg(loss, diff0, device, interpret):
    if interpret:
        os.environ["GSSR_TPU_INTERPRET"] = "1"
    else:
        os.environ.pop("GSSR_TPU_INTERPRET", None)
    with jax.default_device(device):
        # fresh closure per leg: the interpret flag is read at trace time
        fn = jax.jit(jax.value_and_grad(lambda d: loss(d)))
        L, g = jax.block_until_ready(fn(jax.device_put(diff0, device)))
    os.environ.pop("GSSR_TPU_INTERPRET", None)
    return float(L), jax.device_get(g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene-dir", required=True)
    ap.add_argument("--methods", default="3dgs,2dgs,octree-2dgs")
    ap.add_argument("--step", type=int, default=500)
    ap.add_argument("--cam", type=int, default=0)
    ap.add_argument("--min-cos", type=float, default=0.999)
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    assert tpu.platform != "cpu", "no TPU visible — this gate needs the chip"

    results = {"step": args.step, "methods": {}}
    ok_all = True
    for method in args.methods.split(","):
        print(f"=== {method} ===")
        scene = build_scene(method, args.scene_dir)
        cam = scene.dataloader.train_cameras[args.cam]
        cam_arrays = cam.arrays()
        gt = jnp.asarray(cam.image, jnp.float32)
        uid = jnp.asarray(cam.uid)
        loss, diff0 = make_loss(scene, cam_arrays, uid, gt, args.step)
        diff0 = jax.device_get(diff0)

        L_cpu, g_cpu = run_leg(loss, diff0, cpu, interpret=True)
        L_tpu, g_tpu = run_leg(loss, diff0, tpu, interpret=False)
        dL = abs(L_tpu - L_cpu)
        print(f"  L cpu={L_cpu:.7f} tpu={L_tpu:.7f} (|dL|={dL:.2e})")
        rows, ok = {}, dL < 1e-4 * max(1.0, abs(L_cpu))
        gc, gv = leafdict(g_cpu), leafdict(g_tpu)
        for k in sorted(gc):
            a = gc[k].ravel().astype(np.float64)
            b = gv[k].ravel().astype(np.float64)
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if na < 1e-12 and nb < 1e-12:
                rows[k] = {"cos": 1.0, "norm_cpu": float(na),
                           "norm_tpu": float(nb)}
                continue
            cos = float(a @ b / (na * nb + 1e-30))
            rows[k] = {"cos": round(cos, 6), "norm_cpu": float(na),
                       "norm_tpu": float(nb)}
            good = cos >= args.min_cos and 0.5 < (nb + 1e-30) / (na + 1e-30) < 2.0
            ok = ok and good
            print(f"    {k:32s} cos={cos:+.6f} "
                  f"|cpu|={na:.3e} |tpu|={nb:.3e}"
                  + ("" if good else "   <-- FAIL"))
        results["methods"][method] = {"ok": bool(ok), "L_cpu": L_cpu,
                                      "L_tpu": L_tpu, "leaves": rows}
        print(f"  {'PASS' if ok else 'FAIL'}")
        ok_all = ok_all and ok

    if args.tag:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results", f"tpu_parity_{args.tag}.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", out)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
