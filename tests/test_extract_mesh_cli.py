"""extract_mesh.py CLI: train a tiny 2dgs run, fuse a TSDF mesh.

Covers the eval_setup yaml->scene->PLY reload path, bounded TSDF fusion
and mesh writing through the real CLI (reference extract_mesh.py)."""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_then_extract_mesh(tmp_path):
    from synthetic import write_synthetic_colmap_scene
    scene = tmp_path / "scene"
    write_synthetic_colmap_scene(str(scene), n_cams=6, n_pts=96,
                                 width=48, height=32)

    p = subprocess.run(
        [sys.executable, "train.py", "2dgs",
         "--source-path", str(scene),
         "--output-path", str(tmp_path / "out"),
         "--trainer.iterations", "30",
         "--trainer.test-iterations", "30",
         "--trainer.save-iterations", "30",
         "--scene.instance-cap", "16384",
         "--scene.gaussians.capacity", "512"],
        capture_output=True, text=True, cwd=REPO)
    assert p.returncode == 0, p.stderr[-2000:]

    cfgs = glob.glob(str(tmp_path / "out" / "**" / "config.yml"),
                     recursive=True)
    assert cfgs
    p2 = subprocess.run(
        [sys.executable, "extract_mesh.py", "--load-config", cfgs[0],
         "--skip-images", "--voxel-size", "0.08", "--sdf-trunc", "0.3",
         "--depth-trunc", "8.0", "--num-cluster", "0"],
        capture_output=True, text=True, cwd=REPO)
    assert p2.returncode == 0, p2.stderr[-2000:]

    meshes = glob.glob(str(tmp_path / "out" / "**" / "fused_mesh.ply"),
                       recursive=True)
    assert meshes
    from gssr_tpu.utils.mesh_extract import read_mesh_ply
    verts, faces = read_mesh_ply(meshes[0])
    assert len(verts) > 0 and len(faces) > 0
