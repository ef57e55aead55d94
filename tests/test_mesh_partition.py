"""Mesh pipeline (marching tetrahedra, TSDF) + VastGaussian partitioner."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def test_marching_tetrahedra_sphere():
    from gssr_tpu.utils.mtet import marching_tetrahedra
    n = 48
    lin = np.linspace(-1.2, 1.2, n)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - 1.0
    sp = lin[1] - lin[0]
    verts, faces = marching_tetrahedra(sdf, spacing=(sp,) * 3,
                                       origin=(-1.2, -1.2, -1.2))
    assert len(verts) > 500 and len(faces) > 500
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 1.0) < 0.02
    assert r.std() < 0.02
    # faces index valid vertices
    assert faces.max() < len(verts) and faces.min() >= 0


def test_marching_tetrahedra_blocked_matches():
    from gssr_tpu.utils.mtet import (marching_tetrahedra,
                                     marching_tetrahedra_blocked)
    rng = np.random.default_rng(0)
    sdf = rng.normal(size=(20, 20, 20))
    def area(v, f):
        a = v[f[:, 1]] - v[f[:, 0]]
        b = v[f[:, 2]] - v[f[:, 0]]
        return 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()

    v1, f1 = marching_tetrahedra(sdf)
    v2, f2 = marching_tetrahedra_blocked(sdf, block=7)
    # identical surface area (welding may differ across block borders)
    assert np.isclose(area(v1, f1), area(v2, f2), rtol=1e-6)


def test_keep_largest_clusters():
    from gssr_tpu.utils.mtet import keep_largest_clusters
    # two disconnected triangles + a larger fan
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [5, 5, 5], [6, 5, 5], [5, 6, 5], [6, 6, 5]],
                     dtype=np.float64)
    faces = np.array([[0, 1, 2], [3, 4, 5], [4, 6, 5]], dtype=np.int64)
    v, f = keep_largest_clusters(verts, faces, num_keep=1)
    assert len(f) == 2   # the 2-face fan survives


def test_tsdf_fusion_plane():
    import jax.numpy as jnp
    from gssr_tpu.utils.tsdf import extract_mesh, integrate_jit, make_volume
    import math
    from gssr_tpu.cameras import Camera
    # camera at z=-2 looking +z at a wall at z=0
    cam = Camera(uid=0, colmap_id=0, image_name="c", R=np.eye(3),
                 T=np.array([0.0, 0.0, 2.0]), fovx=math.radians(60),
                 fovy=math.radians(60), width=64, height=64)
    depth = jnp.full((64, 64), 2.0)
    rgb = jnp.full((64, 64, 3), 0.5)
    alpha = jnp.ones((64, 64))
    vol = make_volume(origin=(-1.0, -1.0, -1.0), dims=(64, 64, 64),
                      voxel_size=2.0 / 64, sdf_trunc=0.1)
    vol = integrate_jit(vol, depth, rgb, jnp.asarray(cam.w2c),
                        jnp.asarray(cam.fx), jnp.asarray(cam.fy),
                        jnp.asarray(cam.cx), jnp.asarray(cam.cy),
                        depth_trunc=5.0, alpha=alpha)
    verts, faces, colors = extract_mesh(vol)
    assert len(faces) > 100
    # surface near z=0 plane
    assert abs(np.median(verts[:, 2])) < 0.05
    # vertex colors fused from the constant-0.5 rgb frames
    assert colors.shape == (len(verts), 3)
    assert np.allclose(np.median(colors, axis=0), 0.5, atol=0.05)


def test_partitioner(tmp_path):
    from synthetic import write_synthetic_colmap_scene
    from gssr_tpu.utils.partition import split_scene
    write_synthetic_colmap_scene(str(tmp_path), n_cams=8, n_pts=64,
                                 width=32, height=32)
    tiles = split_scene(str(tmp_path), str(tmp_path / "out"),
                        num_col=2, num_row=1, visibility_threshold=0.3)
    assert len(tiles) == 2
    from gssr_tpu.dataio import colmap
    total = 0
    for t in tiles:
        cams, imgs, pts = colmap.read_model(os.path.join(t, "sparse/0"))
        assert len(imgs) > 0 and len(pts) > 0
        assert os.path.exists(os.path.join(t, "box.txt"))
        assert os.listdir(os.path.join(t, "images"))
        total += len(imgs)
    assert total >= 8  # overlap allowed


def test_mesh_ply_roundtrip(tmp_path):
    from gssr_tpu.utils.mesh_extract import read_mesh_ply, write_mesh_ply
    v = np.random.default_rng(0).normal(size=(10, 3))
    f = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int64)
    p = str(tmp_path / "m.ply")
    write_mesh_ply(p, v, f)
    v2, f2 = read_mesh_ply(p)
    assert np.allclose(v2, v, atol=1e-6)
    assert (f2 == f).all()


def _icosphere_mesh(radius=1.0, n=40, center=(0.0, 0.0, 0.0)):
    """Sphere mesh via marching tetrahedra on an SDF grid."""
    from gssr_tpu.utils.mtet import marching_tetrahedra
    lin = np.linspace(-1.3 * radius, 1.3 * radius, n)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - radius
    sp = lin[1] - lin[0]
    v, f = marching_tetrahedra(sdf, spacing=(sp,) * 3,
                               origin=(lin[0],) * 3)
    return v + np.asarray(center), f


def test_mesh_eval_identical_mesh_perfect_f1():
    from gssr_tpu.utils.mesh_eval import mesh_metrics
    v, f = _icosphere_mesh()
    m = mesh_metrics(v, f, v, f, n_points=20000, taus=(0.05,))
    assert m["f1@0.05"] > 0.999
    # chamfer floor is inter-sample spacing (~sqrt(area/n)), not zero
    assert m["chamfer"] < 0.05


def test_mesh_eval_offset_mesh_known_distance():
    # translate the sphere by 0.3: nearest-surface distance is bounded by
    # the offset, F1 at tau=0.05 collapses, F1 at tau=0.4 recovers
    from gssr_tpu.utils.mesh_eval import mesh_metrics
    v, f = _icosphere_mesh()
    v2, f2 = _icosphere_mesh(center=(0.3, 0.0, 0.0))
    m = mesh_metrics(v2, f2, v, f, n_points=20000, taus=(0.05, 0.4))
    assert m["f1@0.05"] < 0.6
    assert m["f1@0.4"] > 0.999
    assert 0.05 < m["chamfer"] < 0.6
    # accuracy/completeness symmetric for a pure translation
    assert abs(m["accuracy_mean"] - m["completeness_mean"]) < 0.02


def test_mesh_eval_files_roundtrip(tmp_path):
    from gssr_tpu.utils.mesh_extract import write_mesh_ply
    from gssr_tpu.utils.mesh_eval import eval_mesh_files
    v, f = _icosphere_mesh(n=24)
    p1 = str(tmp_path / "pred.ply")
    p2 = str(tmp_path / "gt.ply")
    write_mesh_ply(p1, v, f)
    write_mesh_ply(p2, v + 0.01, f)
    m = eval_mesh_files(p1, p2, n_points=5000, taus=(0.1,))
    assert m["f1@0.1"] > 0.99


def test_mesh_eval_degenerate_inputs():
    from gssr_tpu.utils.mesh_eval import (point_cloud_metrics,
                                          sample_points_on_mesh)
    # empty mesh -> no samples; metrics defined (inf / 0) not crashing
    pts = sample_points_on_mesh(np.zeros((0, 3)), np.zeros((0, 3), int), 100)
    assert pts.shape == (0, 3)
    m = point_cloud_metrics(pts, np.random.default_rng(0).random((50, 3)))
    assert m["f1@0.05"] == 0.0
    # all-degenerate faces fall back to vertex sampling
    v = np.random.default_rng(1).random((10, 3))
    f = np.tile(np.arange(1)[:, None], (4, 3))  # zero-area triangles
    pts = sample_points_on_mesh(v, f, 64)
    assert pts.shape == (64, 3)


def test_unbounded_fuse_bilinear_oracle():
    """_fuse_points must sample depth/rgb bilinearly (reference
    grid_sample, mesh_utils.py:203-204), not nearest-neighbor."""
    import math
    import jax.numpy as jnp
    from gssr_tpu.cameras import Camera
    from gssr_tpu.utils.mesh_extract import GaussianExtractor

    W = H = 16
    cam = Camera(uid=0, colmap_id=0, image_name="c", R=np.eye(3),
                 T=np.array([0.0, 0.0, 2.0]), fovx=math.radians(60),
                 fovy=math.radians(60), width=W, height=H)
    depth = np.full((H, W), 2.0, np.float32)
    # strong horizontal color gradient: bilinear vs nearest differ by
    # ~half a step at half-pixel projections
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[..., 0] = np.arange(W, dtype=np.float32)[None, :] / (W - 1)
    alpha = np.ones((H, W), np.float32)

    ex = GaussianExtractor.__new__(GaussianExtractor)
    ex.cameras = [cam]
    ex.depthmaps = [depth]
    ex.rgbmaps = [rgb]
    ex.alphamaps = [alpha]

    # world points on the wall (z=0 plane) that project at exact
    # half-pixel u coordinates
    fx, cx = cam.fx, cam.cx
    us = np.array([3.5, 7.5, 11.5])
    xs = (us - cx) / fx * 2.0                 # z_cam = 2.0
    pts = np.stack([xs, np.zeros(3), np.zeros(3)], axis=1)
    center = jnp.zeros(3, jnp.float32)
    tsdf, cols, w = ex._fuse_points(
        jnp.asarray(pts, jnp.float32), center, 10.0, 0.5,
        alpha_thres=0.5, with_rgb=True)
    assert np.all(np.asarray(w) > 0)
    # sdf = depth - z ~ 0 on the wall
    assert np.allclose(np.asarray(tsdf), 0.0, atol=1e-3)
    expect = (np.floor(us) + 0.5) / (W - 1)   # exact bilinear midpoint
    got = np.asarray(cols)[:, 0]
    assert np.allclose(got, expect, atol=1e-4), (got, expect)
    # nearest-neighbor would land on a grid value, ~1/(2(W-1)) away
    nearest = np.round(us) / (W - 1)
    assert np.all(np.abs(got - nearest) > 1e-3)
