"""North-star workflow e2e: split_scene -> train_split -> extract_mesh_split.

The BASELINE config #5 shape (VastGaussian-partitioned training with a
global TSDF merge), at miniature scale through the real CLIs."""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args):
    p = subprocess.run([sys.executable, script] + args,
                       capture_output=True, text=True, cwd=REPO)
    assert p.returncode == 0, f"{script}: {p.stderr[-2500:]}"
    return p


@pytest.mark.slow
def test_split_train_merge(tmp_path):
    from synthetic import write_synthetic_colmap_scene
    scene = tmp_path / "scene"
    write_synthetic_colmap_scene(str(scene), n_cams=10, n_pts=128,
                                 width=48, height=32)

    _run("split_scene.py", ["--source-path", str(scene),
                            "--num-col", "2", "--num-row", "1",
                            "--visibility-threshold", "0.0"])
    tiles = sorted(glob.glob(str(scene / "tile_*")))
    assert len(tiles) == 2
    for t in tiles:
        assert os.path.exists(os.path.join(t, "box.txt"))
        assert os.path.exists(os.path.join(t, "sparse/0/points3D.bin"))

    runs = tmp_path / "runs"
    _run("train_split.py", ["2dgs",
                            "--source-path", str(scene),
                            "--output-path", str(runs),
                            "--trainer.iterations", "25",
                            "--trainer.test-iterations", "25",
                            "--trainer.save-iterations", "25",
                            "--scene.instance-cap", "16384",
                            "--scene.gaussians.capacity", "512"])

    out = tmp_path / "merged.ply"
    _run("extract_mesh_split.py", ["--source-path", str(scene),
                                   "--runs-root", str(runs),
                                   "--method", "2dgs",
                                   "--voxel-size", "0.08",
                                   "--sdf-trunc", "0.3",
                                   "--depth-trunc", "8.0",
                                   "--num-cluster", "0",
                                   "--out", str(out)])
    assert out.exists()
    from gssr_tpu.utils.mesh_extract import read_mesh_ply
    verts, faces = read_mesh_ply(str(out))
    assert len(verts) > 0 and len(faces) > 0
