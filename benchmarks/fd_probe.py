"""FD discriminator + precision A/B for the composed-backward corruption.

Round-4 left one open defect (docs/known-issues.md): every isolated stage
passes TPU-vs-interpret parity, yet the COMPOSED 2dgs/anchor backward is
corrupted at scale (means cos 0.65 at 400x304, garbage at octree scale).
This probe discriminates the remaining hypotheses in one run on the chip:

  1. reproduce: cos(g_tpu, g_cpu) per parameter leaf at 400x304;
  2. precision: same gradient with jax.default_matmul_precision('highest')
     -- the XLA-level matmuls in projection2d/project_points default to
     bf16 on TPU but f32 on CPU, a composition-only divergence invisible
     to the bit-identical-input kernel A/B tests of round 4;
  3. FD: directional derivatives of the COMPILED loss along normalize(g_cpu)
     and normalize(g_tpu - g_cpu). If FD_tpu matches <g_cpu,v> but not
     <g_tpu,v>, the compiled backward mis-differentiates the compiled
     forward; if FD_tpu matches <g_tpu,v>, the compiled FORWARD itself is
     a different (wrong) function in the neighborhood.

Usage: python benchmarks/fd_probe.py [--w 400] [--h 304] [--n 20000]
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "axon,cpu"
os.environ.pop("GSSR_TPU_INTERPRET", None)

import jax
import jax.numpy as jnp
import numpy as np


def make_camera(W, H):
    from gssr_tpu.cameras import Camera
    R = np.eye(3)
    return Camera(uid=0, colmap_id=0, image_name="probe",
                  R=R, T=np.array([0.0, 0.0, 4.0]),
                  fovx=math.radians(70), fovy=math.radians(55),
                  width=W, height=H)


def build_inputs(W, H, N, seed=0):
    rng = np.random.default_rng(seed)
    x = dict(
        means=jnp.asarray(rng.uniform(-3, 3, (N, 3))
                          * np.array([1.5, 1.0, 1.0]), jnp.float32),
        scales2=jnp.asarray(np.exp(rng.uniform(-4.5, -2.5, (N, 2))),
                            jnp.float32),
        rots=jnp.asarray(rng.normal(size=(N, 4)), jnp.float32),
        opac=jnp.asarray(rng.uniform(0.2, 0.9, (N,)), jnp.float32),
        colors=jnp.asarray(rng.uniform(0.05, 0.95, (N, 3)), jnp.float32),
    )
    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    return x, tgt


def make_loss(cam_arrays, W, H, tgt, cap):
    from gssr_tpu.ops.rasterize2d import rasterize_2d

    def loss(x):
        out = rasterize_2d(
            x["means"], x["scales2"], x["rots"], x["opac"], cam_arrays,
            W, H, jnp.zeros(3, jnp.float32),
            colors_precomp=x["colors"], instance_cap=cap,
            backend="pallas", depth_ratio=0.0)
        l = jnp.mean(jnp.abs(out.image - tgt))
        l += 0.01 * jnp.mean(out.dist)
        l += 0.01 * jnp.mean(jnp.abs(out.normal))
        l += 0.001 * jnp.mean(out.depth_expected)
        return l, out.num_rendered

    return loss


def flat(tree):
    return jnp.concatenate([jnp.ravel(l) for l in
                            jax.tree_util.tree_leaves(tree)])


def cosd(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb + 1e-30)), float(na), float(nb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=400)
    ap.add_argument("--h", type=int, default=304)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--cap", type=int, default=1 << 18)
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args()
    W, H, N = args.w, args.h, args.n

    cam = make_camera(W, H)
    x, tgt = build_inputs(W, H, N)
    cam_arrays = cam.arrays()

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    # ---- CPU / interpret reference gradient ----
    os.environ["GSSR_TPU_INTERPRET"] = "1"
    with jax.default_device(cpu):
        loss_cpu = make_loss(cam_arrays, W, H, tgt, args.cap)
        gfn = jax.jit(jax.value_and_grad(lambda x: loss_cpu(x)[0]))
        L_cpu, g_cpu = gfn(jax.device_put(x, cpu))
        (L_cpu, g_cpu) = jax.block_until_ready((L_cpu, g_cpu))
        nr = jax.jit(lambda x: loss_cpu(x)[1])(jax.device_put(x, cpu))
        print(f"[cpu ] L = {float(L_cpu):.8f}  num_rendered={int(nr)}")
    os.environ.pop("GSSR_TPU_INTERPRET", None)
    g_cpu = jax.device_get(g_cpu)

    # ---- TPU compiled gradient, default + highest precision ----
    xt = jax.device_put(x, tpu)
    tgt_t = jax.device_put(tgt, tpu)
    results = {}
    for tag, prec in [("default", None), ("highest", "highest")]:
        loss_t = make_loss(cam_arrays, W, H, tgt_t, args.cap)
        ctx = (jax.default_matmul_precision(prec) if prec
               else _nullcontext())
        with ctx:
            gfn_t = jax.jit(jax.value_and_grad(lambda x: loss_t(x)[0]))
            L_t, g_t = jax.block_until_ready(gfn_t(xt))
        g_t = jax.device_get(g_t)
        print(f"[tpu/{tag}] L = {float(L_t):.8f}  "
              f"dL vs cpu = {float(L_t) - float(L_cpu):+.3e}")
        for k in sorted(g_t):
            c, na, nb = cosd(np.ravel(g_t[k]), np.ravel(g_cpu[k]))
            print(f"    {k:8s} cos={c:+.6f}  |tpu|={na:.4e} |cpu|={nb:.4e}")
        results[tag] = (float(L_t), g_t, gfn_t, loss_t)

    # ---- FD discriminator on the default-precision compiled loss ----
    L_t, g_t, gfn_t, loss_t = results["default"]
    lfn = jax.jit(lambda x: loss_t(x)[0])
    gt_f = flat(g_t)
    gc_f = flat(g_cpu)
    leaves_t, tdef = jax.tree_util.tree_flatten(x)

    def unflat(v):
        out, off = [], 0
        for l in leaves_t:
            out.append(v[off:off + l.size].reshape(l.shape))
            off += l.size
        return jax.tree_util.tree_unflatten(tdef, out)

    xf = flat(x)
    dirs = {
        "g_cpu": np.asarray(gc_f) / (np.linalg.norm(gc_f) + 1e-30),
        "g_tpu": np.asarray(gt_f) / (np.linalg.norm(gt_f) + 1e-30),
        "diff": None,
    }
    d = np.asarray(gt_f, np.float64) - np.asarray(gc_f, np.float64)
    dirs["diff"] = (d / (np.linalg.norm(d) + 1e-30)).astype(np.float32)

    print("\nFD probe (compiled loss on TPU, central differences):")
    print(f"{'dir':6s} {'eps':>8s} {'FD_tpu':>14s} {'<g_tpu,v>':>14s} "
          f"{'<g_cpu,v>':>14s}")
    for name, v in dirs.items():
        v = jnp.asarray(v, jnp.float32)
        p_t = float(np.asarray(gt_f, np.float64) @ np.asarray(v, np.float64))
        p_c = float(np.asarray(gc_f, np.float64) @ np.asarray(v, np.float64))
        for eps in (1e-3, 3e-3, 1e-2):
            lp = float(lfn(jax.device_put(unflat(xf + eps * v), tpu)))
            lm = float(lfn(jax.device_put(unflat(xf - eps * v), tpu)))
            fd = (lp - lm) / (2 * eps)
            print(f"{name:6s} {eps:8.0e} {fd:+14.6e} {p_t:+14.6e} "
                  f"{p_c:+14.6e}")


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
