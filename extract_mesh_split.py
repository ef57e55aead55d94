#!/usr/bin/env python
"""Merge-extract a mesh from per-tile trained runs.

Parity: /root/reference/extract_mesh_split.py — per tile, render only the
cameras inside the tile's box.txt; accumulate rgb/depth/alpha across tiles;
one global TSDF fusion at the end.
"""
from __future__ import annotations

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize can pin a TPU plugin over the env var — honor an
    # explicit CPU request (smoke/CI runs on the virtual mesh)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import argparse
import glob
import os
from pathlib import Path

import numpy as np


def load_box(tile_dir: str):
    with open(os.path.join(tile_dir, "box.txt")) as f:
        f.readline()
        vals = [float(v) for v in f.readline().split()]
    return vals  # mx, Mx, my, My


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-path", required=True,
                    help="partitioned scene root containing tile_*/")
    ap.add_argument("--runs-root", required=True,
                    help="output root that contains per-tile run dirs "
                         "(as produced by train_split.py)")
    ap.add_argument("--method", required=True)
    ap.add_argument("--voxel-size", type=float, default=0.01)
    ap.add_argument("--sdf-trunc", type=float, default=0.04)
    ap.add_argument("--depth-trunc", type=float, default=10.0)
    ap.add_argument("--num-cluster", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--eval-gt", default=None, metavar="GT_MESH_PLY",
                    help="ground-truth mesh to evaluate F1/chamfer against")
    ap.add_argument("--eval-tau", type=float, nargs="+", default=[0.05])
    args = ap.parse_args()

    from extract_mesh import eval_setup
    from gssr_tpu.utils.mesh_extract import GaussianExtractor, write_mesh_ply
    from gssr_tpu.utils.mtet import keep_largest_clusters
    from gssr_tpu.utils.tsdf import integrate_jit, make_volume
    import jax.numpy as jnp

    tiles = sorted(glob.glob(os.path.join(args.source_path, "tile_*")))
    assert tiles, "no tiles found"

    all_cams, all_rgb, all_depth, all_alpha = [], [], [], []
    for tile_dir in tiles:
        name = os.path.basename(tile_dir)
        pattern = os.path.join(args.runs_root, "*", name, args.method,
                               "*", "config.yml")
        cfgs = sorted(glob.glob(pattern)) or sorted(glob.glob(
            os.path.join(args.runs_root, name, args.method, "*",
                         "config.yml")))
        if not cfgs:
            print(f"[warn] no run found for {name}, skipping")
            continue
        _, scene, _, _ = eval_setup(cfgs[-1])
        mx, Mx, my, My = load_box(tile_dir)
        cams = [c for c in scene.dataloader.train_cameras
                if mx <= c.campos[0] <= Mx and my <= c.campos[1] <= My]
        print(f"{name}: {len(cams)} in-box cameras")
        ex = GaussianExtractor(scene, scene.state)
        ex.reconstruction(cams)
        all_cams += ex.cameras
        all_rgb += ex.rgbmaps
        all_depth += ex.depthmaps
        all_alpha += ex.alphamaps

    assert all_cams, "nothing rendered"
    centers = np.stack([c.campos for c in all_cams])
    center = centers.mean(axis=0)
    half = args.depth_trunc * 0.5
    dims = min(int(np.ceil(2 * half / args.voxel_size)), 768)
    vol = make_volume(center - half, (dims,) * 3, args.voxel_size,
                      args.sdf_trunc)
    for cam, depth, rgb, alpha in zip(all_cams, all_depth, all_rgb,
                                      all_alpha):
        vol = integrate_jit(vol, jnp.asarray(depth), jnp.asarray(rgb),
                            jnp.asarray(cam.w2c), jnp.asarray(cam.fx),
                            jnp.asarray(cam.fy), jnp.asarray(cam.cx),
                            jnp.asarray(cam.cy),
                            depth_trunc=float(args.depth_trunc),
                            alpha=jnp.asarray(alpha))
    from gssr_tpu.utils.tsdf import extract_mesh
    verts, faces, colors = extract_mesh(vol)
    if args.num_cluster > 0 and len(faces):
        verts, faces, colors = keep_largest_clusters(
            verts, faces, args.num_cluster, vert_attrs=np.asarray(colors))
    out = args.out or os.path.join(args.runs_root, "fused_mesh.ply")
    write_mesh_ply(out, np.asarray(verts), np.asarray(faces),
                   np.asarray(colors))
    print(f"saved {out} ({len(verts)} verts, {len(faces)} faces)")

    if args.eval_gt:
        import json
        from gssr_tpu.utils.mesh_eval import eval_mesh_files
        metrics = eval_mesh_files(out, args.eval_gt, taus=args.eval_tau)
        with open(os.path.join(os.path.dirname(out) or ".",
                               "mesh_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print("mesh eval vs", args.eval_gt)
        for k, v in metrics.items():
            print(f"  {k}: {v:.5f}")


if __name__ == "__main__":
    main()
