#!/usr/bin/env python
"""Convergence run: train real methods for thousands of steps on a
structured synthetic scene and record step-vs-PSNR curves.

The environment has no real capture datasets (zero egress), so ground
truth is a *structured* gaussian scene (checkered ground plane + textured
spheres + a box, ~36k primitives) rendered with the pallas rasterizer
from 54 poses. Training starts from a sparse noisy subset of the GT
means, so densification has real work to do (the init covers <10% of the
primitives). This validates the full optimization stack — losses, Adam,
clone/split/prune schedules, capacity growth — over horizons 100x longer
than the unit tests, the gap VERDICT.md round 1 flagged.

Drives the REAL CLI (train.py subprocess per method), parses its eval
lines, and writes benchmarks/results/convergence_<tag>.json.

Usage: python benchmarks/convergence.py [--methods 3dgs,octree-2dgs]
           [--iters 8000] [--out-root /tmp/conv] [--tag r2]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 400, 304        # 25 x 19 tiles
INSTANCE_CAP = 1_572_864


def make_structured_scene(rng):
    """Ground plane + 3 spheres + a box, surfaced with small gaussians.

    Returns (means [N,3], colors [N,3], scales [N], normals-ish axes)."""
    means, cols, scales = [], [], []

    # checkered ground plane at y=+0.9 (cameras look down slightly)
    n_side = 110
    xs = np.linspace(-2.6, 2.6, n_side)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    gy = np.full_like(gx, 0.9)
    p = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    check = ((np.floor(gx * 2) + np.floor(gz * 2)) % 2).reshape(-1)
    c = np.where(check[:, None] > 0.5,
                 np.array([[0.85, 0.8, 0.7]]), np.array([[0.25, 0.3, 0.4]]))
    means.append(p + rng.normal(0, 0.004, p.shape))
    cols.append(c)
    scales.append(np.full(len(p), 0.030))

    def sphere(center, radius, n, color_fn):
        i = np.arange(n)
        phi = math.pi * (3.0 - math.sqrt(5.0)) * i   # fibonacci sphere
        y = 1 - 2 * (i + 0.5) / n
        r = np.sqrt(1 - y * y)
        d = np.stack([np.cos(phi) * r, y, np.sin(phi) * r], -1)
        p = center + radius * d
        means.append(p)
        cols.append(color_fn(d))
        scales.append(np.full(n, radius * 3.2 / math.sqrt(n)))

    sphere(np.array([0.0, 0.25, 0.0]), 0.65, 6000,
           lambda d: 0.5 + 0.45 * np.stack([np.sin(9 * d[:, 0]),
                                            np.sin(9 * d[:, 1]),
                                            np.sin(9 * d[:, 2])], -1))
    sphere(np.array([-1.3, 0.45, 0.8]), 0.45, 3500,
           lambda d: np.where((np.floor(6 * np.arccos(d[:, 1]) /
                                        math.pi) % 2)[:, None] > 0.5,
                              np.array([[0.9, 0.35, 0.2]]),
                              np.array([[0.95, 0.9, 0.85]])))
    sphere(np.array([1.2, 0.55, -0.7]), 0.35, 2500,
           lambda d: 0.5 + 0.5 * np.stack([d[:, 0] * 0, d[:, 1],
                                           -d[:, 1]], -1) * 0.8)

    # axis-aligned box
    n_face = 900
    for axis in range(3):
        for sgn in (-1.0, 1.0):
            uv = rng.uniform(-0.35, 0.35, (n_face, 2))
            p = np.zeros((n_face, 3))
            other = [a for a in range(3) if a != axis]
            p[:, other[0]] = uv[:, 0]
            p[:, other[1]] = uv[:, 1]
            p[:, axis] = 0.35 * sgn
            p += np.array([0.9, 0.5, 1.1])
            means.append(p)
            stripe = (np.floor((uv[:, 0] + uv[:, 1]) * 7) % 2)[:, None]
            cols.append(np.where(stripe > 0.5, np.array([[0.2, 0.7, 0.3]]),
                                 np.array([[0.95, 0.85, 0.3]])))
            scales.append(np.full(n_face, 0.032))

    means = np.concatenate(means)
    cols = np.clip(np.concatenate(cols), 0.0, 1.0)
    scales = np.concatenate(scales)
    return means, cols, scales


def orbit_cameras(n, width, height, seed=0):
    from gssr_tpu.cameras import Camera
    rng = np.random.default_rng(seed)
    cams = []
    for i in range(n):
        ang = 2 * math.pi * i / n * 3.0          # 3 loops
        radius = 3.6 + 0.6 * math.sin(i * 0.7)
        elev = 0.8 + 0.8 * (i % 5) / 4.0          # heights above scene
        pos = np.array([radius * math.sin(ang), -elev,
                        -radius * math.cos(ang)])
        target = np.array([0.0, 0.45, 0.0])
        fwd = target - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R_w2c = np.stack([right, true_up, fwd])
        t = -R_w2c @ pos
        cams.append(Camera(uid=i, colmap_id=i, image_name=f"cam{i:03d}",
                           R=R_w2c.T, T=t, fovx=math.radians(62),
                           fovy=math.radians(62 * height / width),
                           width=width, height=height))
    return cams


GT_SUB = 1
N_CAMS = 54


def build_scene_dir(root, seed=0):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from gssr_tpu.dataio.colmap import (ColmapCamera, ColmapImage,
                                        ColmapPoint3D, rotmat_to_qvec,
                                        write_model)
    from gssr_tpu.ops.rasterize import rasterize

    rng = np.random.default_rng(seed)
    means, cols, scales = make_structured_scene(rng)
    if GT_SUB > 1:   # CPU smoke: sparser surface, fatter splats
        means, cols = means[::GT_SUB], cols[::GT_SUB]
        scales = scales[::GT_SUB] * math.sqrt(GT_SUB)
    n = len(means)
    print(f"GT scene: {n} gaussians")
    cams = orbit_cameras(N_CAMS, WIDTH, HEIGHT, seed)

    m = jnp.asarray(means, jnp.float32)
    s = jnp.asarray(np.stack([scales] * 3, -1), jnp.float32)
    q = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
    op = jnp.full((n,), 0.92, jnp.float32)
    cl = jnp.asarray(cols, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    @jax.jit
    def render(cam_arrays):
        return rasterize(m, s, q, op, cam_arrays, WIDTH, HEIGHT, bg,
                         colors_precomp=cl, backend="pallas",
                         instance_cap=INSTANCE_CAP).image

    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    fx = cams[0].fx
    ccams = {1: ColmapCamera(1, "PINHOLE", WIDTH, HEIGHT,
                             np.array([fx, cams[0].fy, WIDTH / 2,
                                       HEIGHT / 2]))}
    # sparse init: 8% of GT means, jittered — densification must recover
    # the rest
    sel = rng.choice(n, size=max(n // 12, 512), replace=False)
    pts = means[sel] + rng.normal(0, 0.02, (len(sel), 3))
    pcols = cols[sel]

    images = {}
    t0 = time.time()
    for i, c in enumerate(cams):
        img = np.asarray(render(c.arrays()))
        img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        name = f"{c.image_name}.png"
        Image.fromarray(img8).save(os.path.join(root, "images", name))
        qvec = rotmat_to_qvec(c.R.T)
        pids = np.arange(1, len(pts) + 1, dtype=np.int64)
        images[i + 1] = ColmapImage(i + 1, qvec, c.T, 1, name,
                                    np.zeros((len(pts), 2)), pids)
    print(f"rendered {len(cams)} GT views in {time.time() - t0:.1f}s")
    pts3d = {j + 1: ColmapPoint3D(
        j + 1, pts[j], (pcols[j] * 255).astype(np.uint8), 0.1,
        np.arange(1, len(cams) + 1, dtype=np.int32),
        np.full(len(cams), j, dtype=np.int32)) for j in range(len(pts))}
    write_model(ccams, images, pts3d, os.path.join(root, "sparse/0"))


SURFACE_METHODS = {"2dgs", "octree-2dgs", "scaffold-2dgs",
                   "pgsr", "scaffold-pgsr", "octree-pgsr"}


def eval_mesh(method, out_root, gt_pts):
    """Extract a TSDF mesh from the trained run and score it against the
    GT surface samples (the structured scene's gaussian means ARE surface
    samples of the plane/spheres/box) — makes the north-star 'matching
    mesh F1' measurable end to end."""
    import glob as _glob
    cfgs = sorted(_glob.glob(os.path.join(out_root, method, "**/config.yml"),
                             recursive=True), key=os.path.getmtime)
    if not cfgs:
        return {"error": "no config.yml found"}
    cfg = cfgs[-1]
    cmd = [sys.executable, "extract_mesh.py", "--load-config", cfg,
           "--skip-images", "--voxel-size", "0.02", "--sdf-trunc", "0.08",
           "--depth-trunc", "8.0", "--num-cluster", "0"]
    print("  $", " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        return {"error": f"extract_mesh rc={proc.returncode}"}
    meshes = sorted(_glob.glob(os.path.join(os.path.dirname(cfg),
                                            "mesh_*/fused_mesh.ply")),
                    key=os.path.getmtime)
    if not meshes:
        return {"error": "no fused_mesh.ply produced"}
    from gssr_tpu.utils.mesh_eval import (point_cloud_metrics,
                                          sample_points_on_mesh)
    from gssr_tpu.utils.mesh_extract import read_mesh_ply
    pv, pf = read_mesh_ply(meshes[-1])
    pred = sample_points_on_mesh(pv, pf, 200_000, 0)
    m = point_cloud_metrics(pred, gt_pts, taus=(0.03, 0.05))
    m["mesh_verts"] = int(len(pv))
    m["mesh_path"] = meshes[-1]
    return m


METHOD_ARGS = {
    "3dgs": ["--scene.gaussians.capacity", "262144"],
    "2dgs": ["--scene.gaussians.capacity", "262144"],
    # multi-view losses activate at half the run (default 7000 would never
    # trigger inside a 2.4k-iter convergence window)
    "pgsr": ["--scene.gaussians.capacity", "262144",
             "--scene.multi-view-from", "1200"],
    "scaffold-gs": ["--scene.gaussians.capacity", "65536"],
    "octree-gs": ["--scene.gaussians.capacity", "65536"],
    "scaffold-2dgs": ["--scene.gaussians.capacity", "65536"],
    "octree-2dgs": ["--scene.gaussians.capacity", "65536"],
    "scaffold-pgsr": ["--scene.gaussians.capacity", "65536"],
    "octree-pgsr": ["--scene.gaussians.capacity", "65536"],
}


def run_method(method, scene_dir, out_root, iters, log_interval=100):
    estep = max(50, iters // 16 // 50 * 50)
    evals = list(range(estep, iters + 1, estep))
    cmd = [sys.executable, "train.py", method,
           "--source-path", scene_dir,
           "--output-path", os.path.join(out_root, method),
           "--eval", "true",
           "--trainer.iterations", str(iters),
           "--trainer.test-iterations", ",".join(map(str, evals)),
           "--trainer.save-iterations", str(iters),
           # n_active prints every 50*log_interval steps — pass 10 for
           # dense densification telemetry on long-horizon runs
           "--trainer.log-interval", str(log_interval),
           "--scene.instance-cap", str(INSTANCE_CAP),
           "--scene.gaussians.densify-until-iter", str(iters // 2),
           "--scene.gaussians.position-lr-max-steps", str(iters),
           ] + METHOD_ARGS.get(method, [])
    print("  $", " ".join(cmd))
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    wall = time.time() - t0
    curve = []
    growth = []      # densification telemetry: n_active over the run
    for line in proc.stdout.splitlines():
        mo = re.match(r"\[eval (\d+)\] eval_l1=([\d.]+)\s+eval_psnr=([\d.]+)",
                      line)
        if mo:
            curve.append({"step": int(mo.group(1)),
                          "l1": float(mo.group(2)),
                          "psnr": float(mo.group(3))})
        mo = re.match(r"step\s+(\d+)\s+loss\s+[\d.+-]+\s+n_active\s+(\d+)",
                      line)
        if mo:
            growth.append({"step": int(mo.group(1)),
                           "n_active": int(mo.group(2))})
    if proc.returncode != 0:
        print(proc.stdout[-3000:])
        print(proc.stderr[-3000:])
    return {"method": method, "iters": iters, "wall_s": round(wall, 1),
            "curve": curve, "n_active_curve": growth,
            "final_gaussians": _saved_gaussian_count(out_root, method),
            "returncode": proc.returncode}


def _saved_gaussian_count(out_root, method):
    """Vertex count of the newest saved PLY — densification evidence."""
    import glob as _glob
    plys = sorted(_glob.glob(os.path.join(
        out_root, method, "**/point_cloud/iteration_*/point_cloud.ply"),
        recursive=True), key=os.path.getmtime)
    if not plys:
        return None
    with open(plys[-1], "rb") as f:
        for _ in range(32):
            line = f.readline().decode("ascii", "ignore")
            if line.startswith("element vertex"):
                return int(line.split()[-1])
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="3dgs,octree-2dgs")
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--out-root", default="/tmp/conv")
    ap.add_argument("--tag", default="r2")
    ap.add_argument("--scene-dir", default=None,
                    help="reuse an already-built scene dir")
    ap.add_argument("--size", default=None, metavar="WxH",
                    help="override render size (e.g. 96x64 for CPU smoke)")
    ap.add_argument("--instance-cap", type=int, default=1_572_864)
    ap.add_argument("--gt-sub", type=int, default=1,
                    help="subsample GT scene by this factor (CPU smoke)")
    ap.add_argument("--n-cams", type=int, default=54)
    ap.add_argument("--skip-mesh", action="store_true",
                    help="skip the TSDF mesh scoring pass (long-horizon "
                         "runs near a wall-clock budget)")
    ap.add_argument("--log-interval", type=int, default=100)
    args = ap.parse_args()
    global WIDTH, HEIGHT, INSTANCE_CAP, GT_SUB, N_CAMS
    if args.size:
        WIDTH, HEIGHT = (int(v) for v in args.size.split("x"))
    INSTANCE_CAP = args.instance_cap
    GT_SUB = args.gt_sub
    N_CAMS = args.n_cams

    scene_dir = args.scene_dir or os.path.join(args.out_root, "scene")
    if not os.path.exists(os.path.join(scene_dir, "sparse/0/points3D.bin")):
        build_scene_dir(scene_dir)

    results = {"width": WIDTH, "height": HEIGHT, "scene": "structured-v1",
               "runs": []}
    gt_pts = make_structured_scene(np.random.default_rng(0))[0]
    for method in args.methods.split(","):
        print(f"=== {method} ({args.iters} iters) ===")
        r = run_method(method, scene_dir, args.out_root, args.iters,
                       log_interval=args.log_interval)
        if r["returncode"] == 0 and method in SURFACE_METHODS \
                and not args.skip_mesh:
            r["mesh"] = eval_mesh(method, args.out_root, gt_pts)
            if "chamfer" in r["mesh"]:
                print(f"  mesh: chamfer {r['mesh']['chamfer']:.4f} "
                      f"f1@0.05 {r['mesh']['f1@0.05']:.3f}")
        results["runs"].append(r)
        if r["curve"]:
            last = r["curve"][-1]
            print(f"  final: step {last['step']} psnr {last['psnr']:.2f} "
                  f"({r['wall_s']}s wall)")
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir,
                               f"convergence_{args.tag}.json"), "w") as f:
            json.dump(results, f, indent=1)
    print("results written")


if __name__ == "__main__":
    main()
