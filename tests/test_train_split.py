"""train_split.py: rank striping + DONE-marker resume (CLI surface).

Reference train_split.py trains tiles strictly sequentially and always
retrains on rerun; the striping and skip logic are this repo's extensions
(SURVEY §2.3 / §5)."""
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO):
    return subprocess.run([sys.executable, "train_split.py", "3dgs"] + args,
                          capture_output=True, text=True, cwd=cwd)


@pytest.mark.slow
def test_rank_striping_and_done_skip(tmp_path):
    from synthetic import write_synthetic_colmap_scene
    base = tmp_path / "scene"
    write_synthetic_colmap_scene(str(base / "tile_0000"), n_cams=4,
                                 n_pts=64, width=32, height=32)
    for t in ("tile_0001", "tile_0002"):
        shutil.copytree(base / "tile_0000", base / t)

    common = ["--source-path", str(base),
              "--output-path", str(tmp_path / "runs"),
              "--trainer.iterations", "4",
              "--trainer.test-iterations", "4",
              "--trainer.save-iterations", "4",
              "--scene.instance-cap", "8192",
              "--scene.gaussians.capacity", "256"]

    # host 0 of 2 trains tiles 0 and 2 only
    p = _run(common + ["--machine.num-hosts", "2",
                       "--machine.host-rank", "0"])
    assert p.returncode == 0, p.stderr[-2000:]
    assert "trained 2 tiles (skipped 0 done) on host 0/2" in p.stdout
    runs = tmp_path / "runs" / "scene"
    assert (runs / "tile_0000").exists()
    assert not (runs / "tile_0001").exists()
    assert (runs / "tile_0002").exists()

    # rerun same rank: both tiles now carry DONE markers -> skipped
    p2 = _run(common + ["--machine.num-hosts", "2",
                        "--machine.host-rank", "0"])
    assert p2.returncode == 0, p2.stderr[-2000:]
    assert "trained 0 tiles (skipped 2 done) on host 0/2" in p2.stdout

    # host 1 picks up the remaining tile
    p3 = _run(common + ["--machine.num-hosts", "2",
                        "--machine.host-rank", "1"])
    assert p3.returncode == 0, p3.stderr[-2000:]
    assert "trained 1 tiles (skipped 0 done) on host 1/2" in p3.stdout
    assert (runs / "tile_0001").exists()
