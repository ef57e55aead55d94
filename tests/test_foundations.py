"""Foundations: SH, matrices, COLMAP/PLY round-trips, camera model."""
import numpy as np
import pytest

import jax.numpy as jnp


def test_sh_dc_only():
    from gssr_tpu.ops.sh import C0, eval_sh, rgb_to_sh, sh_to_rgb
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    sh = rgb_to_sh(rgb)
    assert np.allclose(sh_to_rgb(sh), rgb, atol=1e-6)
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    coeffs = jnp.zeros((1, 16, 3)).at[:, 0].set(sh)
    out = eval_sh(3, coeffs, dirs)
    assert np.allclose(out, rgb - 0.5, atol=1e-6)


def test_sh_rotation_invariant_dc():
    # degree-0 must be direction independent; higher degrees must not be
    from gssr_tpu.ops.sh import eval_sh
    rng = np.random.default_rng(1)
    coeffs = jnp.asarray(rng.normal(size=(5, 16, 3)), jnp.float32)
    d1 = jnp.array([[0.0, 0.0, 1.0]] * 5)
    d2 = jnp.array([[1.0, 0.0, 0.0]] * 5)
    assert np.allclose(eval_sh(0, coeffs, d1), eval_sh(0, coeffs, d2))
    assert not np.allclose(eval_sh(3, coeffs, d1), eval_sh(3, coeffs, d2))


def test_projection_matrix_maps_frustum():
    from gssr_tpu.utils.graphics import projection_matrix
    import math
    fovx = fovy = math.radians(60)
    P = projection_matrix(0.01, 100.0, fovx, fovy)
    # a point on the +x frustum edge at depth z maps to ndc x=1
    z = 10.0
    x = z * math.tan(fovx / 2)
    p = P @ np.array([x, 0, z, 1.0])
    assert abs(p[0] / p[3] - 1.0) < 1e-5
    # near plane maps to ndc z=0, far to 1
    pn = P @ np.array([0, 0, 0.01, 1.0])
    pf = P @ np.array([0, 0, 100.0, 1.0])
    assert abs(pn[2] / pn[3]) < 1e-4
    assert abs(pf[2] / pf[3] - 1.0) < 1e-5


def test_quat_rotmat_roundtrip():
    from gssr_tpu.utils.general import quat_to_rotmat, rotmat_to_quat
    rng = np.random.default_rng(2)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-6)
    q2 = rotmat_to_quat(R)
    assert np.allclose(q, q2, atol=1e-6)


def test_camera_matrices():
    from gssr_tpu.cameras import Camera
    import math
    R = np.eye(3)
    T = np.array([0.0, 0.0, 2.0])  # camera at world z=-2 looking +z
    cam = Camera(uid=0, colmap_id=0, image_name="c", R=R, T=T,
                 fovx=math.radians(60), fovy=math.radians(60),
                 width=64, height=64)
    assert np.allclose(cam.campos, [0, 0, -2], atol=1e-5)
    # world origin is at depth 2 in view space
    p = cam.w2c @ np.array([0, 0, 0, 1.0])
    assert np.allclose(p[:3], [0, 0, 2], atol=1e-5)
    # it projects to the image center
    h = cam.full_proj @ np.array([0, 0, 0, 1.0])
    assert np.allclose(h[:2] / h[3], [0, 0], atol=1e-5)


def test_colmap_roundtrip(tmp_path):
    from gssr_tpu.dataio import colmap
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                   np.array([500.0, 500.0, 320.0, 240.0]))}
    q = np.array([1.0, 0.0, 0.0, 0.0])
    imgs = {1: colmap.ColmapImage(1, q, np.array([0.0, 1.0, 2.0]), 1,
                                  "img1.png",
                                  np.array([[1.0, 2.0], [3.0, 4.0]]),
                                  np.array([7, -1], dtype=np.int64))}
    pts = {7: colmap.ColmapPoint3D(7, np.array([0.1, 0.2, 0.3]),
                                   np.array([10, 20, 30], dtype=np.uint8),
                                   0.5, np.array([1], dtype=np.int32),
                                   np.array([0], dtype=np.int32))}
    colmap.write_model(cams, imgs, pts, str(tmp_path))
    c2, i2, p2 = colmap.read_model(str(tmp_path))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    assert np.allclose(c2[1].params, cams[1].params)
    assert i2[1].name == "img1.png"
    assert np.allclose(i2[1].qvec, q)
    assert np.allclose(i2[1].xys, imgs[1].xys)
    assert list(i2[1].point3D_ids) == [7, -1]
    assert np.allclose(p2[7].xyz, pts[7].xyz)
    assert list(p2[7].rgb) == [10, 20, 30]


def test_ply_roundtrip(tmp_path):
    from gssr_tpu.dataio.ply import read_ply, write_ply
    cols = {"x": np.arange(5, dtype=np.float32),
            "opacity": np.linspace(0, 1, 5).astype(np.float32),
            "red": np.arange(5, dtype=np.uint8)}
    p = str(tmp_path / "t.ply")
    write_ply(p, cols)
    back = read_ply(p)
    for k in cols:
        assert np.allclose(back[k], cols[k])


def test_expon_lr_schedule():
    from gssr_tpu.utils.general import expon_lr
    lr0 = expon_lr(0, 1e-2, 1e-4, max_steps=100)
    lr_end = expon_lr(100, 1e-2, 1e-4, max_steps=100)
    assert np.isclose(float(lr0), 1e-2, rtol=1e-5)
    assert np.isclose(float(lr_end), 1e-4, rtol=1e-5)
    mid = float(expon_lr(50, 1e-2, 1e-4, max_steps=100))
    assert np.isclose(mid, 1e-3, rtol=1e-4)  # log-linear midpoint


def test_densify_grad_ndc_convention():
    """Accumulated mean2D grad norms must be in the reference's NDC scale:
    pixel grads x [0.5*W, 0.5*H] (backward.cu:460-461), so that
    densify_grad_threshold=0.0002 triggers as in the CUDA build."""
    import jax.numpy as jnp
    from gssr_tpu.models.vanilla import DensifyStats, VanillaGaussians

    W, H = 1600, 1200
    scale = VanillaGaussians.ndc_grad_scale(W, H)
    assert np.allclose(np.asarray(scale), [800.0, 600.0])

    stats = DensifyStats(jnp.zeros(4), jnp.zeros(4), jnp.zeros(4))
    radii = jnp.asarray([5, 0, 5, 5], jnp.int32)
    g = jnp.ones((4, 2), jnp.float32) * 1e-3   # pixel-space grads
    out = VanillaGaussians.update_stats(stats, radii, g, scale)
    # |(0.8, 0.6)| = 1.0 for visible rows
    assert np.allclose(np.asarray(out.grad_accum),
                       [1.0, 0.0, 1.0, 1.0], atol=1e-5)
    assert np.allclose(np.asarray(out.denom), [1, 0, 1, 1])


def test_lazy_image_protocol(tmp_path):
    """LazyImage: __array__ consumers see the pixels; the LRU stays
    bounded (dataset.py LazyImage, for UAV-scale scenes)."""
    import numpy as np
    from PIL import Image
    from gssr_tpu.dataio.dataset import LazyImage

    paths = []
    for i in range(5):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(np.full((8, 6, 3), 40 * i, np.uint8)).save(p)
        paths.append(str(p))

    LazyImage._cache = None
    LazyImage.cache_frames = 2
    lazies = [LazyImage(p, (6, 8)) for p in paths]
    for i, l in enumerate(lazies):
        arr = np.asarray(l)
        assert arr.shape == (8, 6, 3)
        assert abs(arr[0, 0, 0] - 40 * i / 255.0) < 1e-6
        assert len(LazyImage._cache) <= 2
    import jax.numpy as jnp
    j = jnp.asarray(lazies[3], jnp.float32)
    assert j.shape == (8, 6, 3)
    assert l.shape == (8, 6, 3)
