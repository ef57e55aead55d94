"""Fly-through path generation + video writer (render_utils parity).

Reference: gssr/utils/render_utils.py:121-268 (generate_path,
create_videos), consumed by extract_mesh.py --render-video."""
import math
import os

import numpy as np

from gssr_tpu.cameras import Camera
from gssr_tpu.utils.render_paths import create_video, generate_ellipse_path


def ring(n=12, radius=4.0, height=-1.0):
    cams = []
    for i in range(n):
        ang = 2 * math.pi * i / n
        pos = np.array([radius * math.sin(ang), height,
                        -radius * math.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R_w2c = np.stack([right, true_up, fwd])
        cams.append(Camera(uid=i, colmap_id=i, image_name=f"c{i}",
                           R=R_w2c.T, T=-R_w2c @ pos,
                           fovx=math.radians(60), fovy=math.radians(45),
                           width=64, height=48))
    return cams


def test_ellipse_path_geometry():
    cams = ring()
    traj = generate_ellipse_path(cams, n_frames=30)
    assert len(traj) == 30
    # shares intrinsics with the input cameras
    assert traj[0].width == 64 and traj[0].height == 48
    assert abs(traj[0].fovx - cams[0].fovx) < 1e-9

    # all path cameras stay within the capture region's scale and keep a
    # right-handed orthonormal rotation
    ring_r = 4.0
    for c in traj[::5]:
        pos = -c.R @ c.T                     # camera center (c2w translation)
        assert np.linalg.norm(pos) < ring_r * 2.5
        RtR = c.R.T @ c.R
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-8)
        assert np.linalg.det(c.R) > 0.9

    # the view directions sweep the full circle (not a degenerate path)
    dirs = np.stack([(-c.R @ c.T) for c in traj])
    spread = dirs.max(0) - dirs.min(0)
    assert np.sum(spread > 1.0) >= 2


def test_create_video_writes_output(tmp_path):
    frames = [np.full((32, 48, 3), v, np.float32) for v in (0.1, 0.5, 0.9)]
    out = tmp_path / "v.mp4"
    create_video(frames, str(out), fps=5)
    # either the mp4 or the png-frames fallback must exist and be non-empty
    if out.exists():
        assert out.stat().st_size > 0
    else:
        d = tmp_path / "v_frames"
        assert len(list(d.iterdir())) == 3
