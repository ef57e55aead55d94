"""Synthetic scene builder shared by end-to-end tests and benches."""
import math
import os

import numpy as np

from gssr_tpu.cameras import Camera
from gssr_tpu.dataio.colmap import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    rotmat_to_qvec,
    write_model,
)


def ring_cameras(n_cams=8, radius=4.0, width=64, height=64, fov_deg=60.0):
    """Cameras on a ring looking at the origin."""
    cams = []
    for i in range(n_cams):
        ang = 2 * math.pi * i / n_cams
        pos = np.array([radius * math.sin(ang), 0.0, -radius * math.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)                  # toward origin
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R_w2c = np.stack([right, true_up, fwd])           # rows
        t = -R_w2c @ pos
        cams.append(Camera(
            uid=i, colmap_id=i, image_name=f"cam{i:03d}",
            R=R_w2c.T, T=t, fovx=math.radians(fov_deg),
            fovy=math.radians(fov_deg), width=width, height=height))
    return cams


def random_point_cloud(rng, n=256, extent=1.0):
    pts = rng.uniform(-extent, extent, size=(n, 3))
    cols = rng.uniform(0.1, 0.9, size=(n, 3))
    return pts, cols


def render_gt_images(cams, pts, cols, backend="reference", cap=4096):
    """Render a fixed gaussian scene as 'ground truth' for fitting tests."""
    import jax.numpy as jnp
    import functools
    import jax
    from gssr_tpu.ops.rasterize import rasterize
    n = len(pts)
    means = jnp.asarray(pts, jnp.float32)
    scales = jnp.full((n, 3), math.log(0.08), jnp.float32)
    w, h = cams[0].width, cams[0].height

    @jax.jit
    def render(cam_arrays):
        return rasterize(
            means, jnp.exp(scales),
            jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
            jnp.full((n,), 0.8, jnp.float32), cam_arrays, w, h,
            jnp.zeros(3, jnp.float32),
            colors_precomp=jnp.asarray(cols, jnp.float32),
            backend=backend, instance_cap=cap).image

    for c in cams:
        c.image = np.asarray(render(c.arrays()))
    return cams


def write_synthetic_colmap_scene(root, n_cams=6, n_pts=128, width=64,
                                 height=64, seed=0, gt_mode="render"):
    """Materialize a COLMAP-format scene on disk (for dataloader tests).

    gt_mode "render": GT images are a rasterized gaussian scene (fitting
    tests). "noise": random pixels — image content doesn't matter (e.g.
    throughput benches at large resolutions, where the reference-backend
    GT render would dominate setup time)."""
    rng = np.random.default_rng(seed)
    cams = ring_cameras(n_cams, width=width, height=height)
    pts, cols = random_point_cloud(rng, n_pts)
    if gt_mode == "noise":
        for c in cams:
            c.image = rng.uniform(0, 1, (height, width, 3)).astype(
                np.float32)
    else:
        cams = render_gt_images(cams, pts, cols)

    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    from PIL import Image
    fx = cams[0].fx
    ccams = {1: ColmapCamera(1, "PINHOLE", width, height,
                             np.array([fx, cams[0].fy, width / 2, height / 2]))}
    images = {}
    for i, c in enumerate(cams):
        img8 = (np.clip(c.image, 0, 1) * 255).astype(np.uint8)
        name = f"{c.image_name}.png"
        Image.fromarray(img8).save(os.path.join(root, "images", name))
        qvec = rotmat_to_qvec(c.R.T)
        # every camera tracks every point (synthetic covisibility)
        pids = np.arange(1, len(pts) + 1, dtype=np.int64)
        images[i + 1] = ColmapImage(i + 1, qvec, c.T, 1, name,
                                    np.zeros((len(pts), 2)), pids)
    pts3d = {i + 1: ColmapPoint3D(
        i + 1, pts[i], (cols[i] * 255).astype(np.uint8), 0.1,
        np.arange(1, n_cams + 1, dtype=np.int32),
        np.full(n_cams, i, dtype=np.int32))
        for i in range(len(pts))}
    write_model(ccams, images, pts3d, os.path.join(root, "sparse/0"))
    return cams, pts, cols
