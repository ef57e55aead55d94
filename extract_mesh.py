#!/usr/bin/env python
"""Extract a TSDF-fused mesh from a trained scene.

Parity: /root/reference/extract_mesh.py. Usage:
    python extract_mesh.py --load-config <run_dir>/config.yml \
        [--iteration N] [--unbounded] [--voxel-size V] [--depth-trunc D]
"""
from __future__ import annotations

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize can pin a TPU plugin over the env var — honor an
    # explicit CPU request (smoke/CI runs on the virtual mesh)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import argparse
import os
from pathlib import Path

import numpy as np


def eval_setup(config_path: str, iteration=None):
    """yaml -> Config -> scene + load saved gaussians
    (reference extract_mesh.eval_setup, :19-60)."""
    from gssr_tpu.configs.base import load_config_yaml
    from gssr_tpu.configs.methods import build_scene
    config = load_config_yaml(config_path)
    # artifacts live next to the config file regardless of output_path
    run_dir = Path(config_path).parent
    scene = build_scene(config)
    gdir = run_dir / config.trainer.relative_gaussian_dir
    iters = [int(p.name.split("_")[-1]) for p in gdir.glob("iteration_*")]
    assert iters, f"no saved gaussians under {gdir}"
    it = iteration or max(iters)
    ply = gdir / f"iteration_{it}" / "point_cloud.ply"
    scene.state = scene.load_gaussians(str(ply))
    return config, scene, run_dir, it


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-config", required=True)
    ap.add_argument("--iteration", type=int, default=None)
    ap.add_argument("--voxel-size", type=float, default=0.004)
    ap.add_argument("--sdf-trunc", type=float, default=0.02)
    ap.add_argument("--depth-trunc", type=float, default=3.0)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--unbounded", action="store_true")
    ap.add_argument("--num-cluster", type=int, default=1)
    ap.add_argument("--alpha-thres", type=float, default=0.5)
    ap.add_argument("--skip-images", action="store_true")
    ap.add_argument("--render-video", action="store_true",
                    help="render an elliptical fly-through mp4 "
                         "(reference extract_mesh.py:107-113)")
    ap.add_argument("--video-frames", type=int, default=120)
    ap.add_argument("--skip-mesh", action="store_true",
                    help="only export images/video (reference skip_mesh)")
    ap.add_argument("--export-test", action="store_true",
                    help="also render+export the eval split "
                         "(reference extract_mesh.py:101-106)")
    ap.add_argument("--eval-gt", default=None, metavar="GT_MESH_PLY",
                    help="ground-truth mesh to evaluate F1/chamfer against")
    ap.add_argument("--eval-tau", type=float, nargs="+", default=[0.05],
                    help="F-score distance threshold(s)")
    args = ap.parse_args()

    from gssr_tpu.utils.mesh_extract import GaussianExtractor, write_mesh_ply
    from gssr_tpu.utils.mtet import keep_largest_clusters

    config, scene, run_dir, it = eval_setup(args.load_config, args.iteration)
    out_dir = run_dir / f"mesh_{it}"
    out_dir.mkdir(parents=True, exist_ok=True)

    extractor = GaussianExtractor(scene, scene.state)
    print(f"rendering {len(scene.dataloader.train_cameras)} cameras ...")
    extractor.reconstruction(scene.dataloader.train_cameras)
    if not args.skip_images:
        extractor.export_images(str(out_dir))

    if args.export_test and scene.dataloader.test_cameras:
        test_ex = GaussianExtractor(scene, scene.state)
        print(f"rendering {len(scene.dataloader.test_cameras)} "
              "test cameras ...")
        test_ex.reconstruction(scene.dataloader.test_cameras)
        test_dir = out_dir / "test"
        test_dir.mkdir(exist_ok=True)
        test_ex.export_images(str(test_dir))

    if args.render_video:
        from gssr_tpu.utils.render_paths import (create_video,
                                                 generate_ellipse_path)
        traj = generate_ellipse_path(scene.dataloader.train_cameras,
                                     n_frames=args.video_frames)
        print(f"rendering {len(traj)} fly-through frames ...")
        frames = [np.asarray(
            scene.eval_render(scene.state, c, step=10 ** 9).image)
            for c in traj]
        vpath = out_dir / "render_traj.mp4"
        create_video(frames, str(vpath))
        print(f"saved {vpath} ({len(frames)} frames)")

    if args.skip_mesh:
        return
    if args.unbounded:
        verts, faces, colors = extractor.extract_mesh_unbounded(
            args.resolution, alpha_thres=args.alpha_thres)
    else:
        verts, faces, colors = extractor.extract_mesh_bounded(
            voxel_size=args.voxel_size, sdf_trunc=args.sdf_trunc,
            depth_trunc=args.depth_trunc, alpha_thres=args.alpha_thres)
    print(f"raw mesh: {len(verts)} verts, {len(faces)} faces")
    if args.num_cluster > 0 and len(faces):
        verts, faces, colors = keep_largest_clusters(
            verts, faces, args.num_cluster, vert_attrs=np.asarray(colors))
    mesh_path = out_dir / "fused_mesh.ply"
    write_mesh_ply(str(mesh_path), np.asarray(verts), np.asarray(faces),
                   np.asarray(colors))
    print(f"saved {mesh_path} ({len(verts)} verts, {len(faces)} faces)")

    if args.eval_gt:
        import json
        from gssr_tpu.utils.mesh_eval import eval_mesh_files
        metrics = eval_mesh_files(str(mesh_path), args.eval_gt,
                                  taus=args.eval_tau)
        with open(out_dir / "mesh_metrics.json", "w") as f:
            json.dump(metrics, f, indent=2)
        print("mesh eval vs", args.eval_gt)
        for k, v in metrics.items():
            print(f"  {k}: {v:.5f}")


if __name__ == "__main__":
    main()
