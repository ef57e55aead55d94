"""Reference-rasterizer semantics: analytic single/multi-gaussian checks."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gssr_tpu.cameras import Camera


def make_camera(w=64, h=64, fov_deg=60.0):
    return Camera(uid=0, colmap_id=0, image_name="t",
                  R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
                  fovx=math.radians(fov_deg), fovy=math.radians(fov_deg),
                  width=w, height=h)


import functools


@functools.lru_cache(maxsize=32)
def _render_fn(w, h, masked):
    from gssr_tpu.ops.rasterize import rasterize

    @functools.partial(jax.jit, static_argnums=())
    def fn(means, scales, rots, opac, colors, cam_arrays, bg, active):
        return rasterize(means, scales, rots, opac, cam_arrays, w, h, bg,
                         colors_precomp=colors, backend="reference",
                         active_mask=active if masked else None,
                         instance_cap=1024)
    return fn


def render(means, scales, rots, opac, colors, cam, w=64, h=64,
           bg=(0.0, 0.0, 0.0), active_mask=None):
    means = jnp.asarray(means, jnp.float32)
    active = (jnp.ones(means.shape[0], bool) if active_mask is None
              else active_mask)
    return _render_fn(w, h, active_mask is not None)(
        means, jnp.asarray(scales, jnp.float32),
        jnp.asarray(rots, jnp.float32), jnp.asarray(opac, jnp.float32),
        jnp.asarray(colors, jnp.float32), cam.arrays(),
        jnp.asarray(bg, jnp.float32), active)


def test_single_gaussian_center():
    cam = make_camera()
    out = render(means=[[0.0, 0.0, 0.0]], scales=[[0.3, 0.3, 0.3]],
                 rots=[[1.0, 0, 0, 0]], opac=[0.9], colors=[[1.0, 0.0, 0.0]],
                 cam=cam)
    img = np.asarray(out.image)
    # peak at image center, red channel only
    cy, cx = 32, 32
    assert img[cy, cx, 0] > 0.5
    assert img[cy, cx, 1] == 0.0
    assert int(out.radii[0]) > 0
    # radially symmetric-ish falloff
    assert img[cy, cx, 0] > img[cy, cx + 10, 0] > img[cy, cx + 20, 0]
    assert np.isclose(img[cy, cx + 10, 0], img[cy + 10, cx, 0], atol=1e-3)


def test_background_composites():
    cam = make_camera()
    out = render(means=[[0.0, 0.0, 0.0]], scales=[[0.1, 0.1, 0.1]],
                 rots=[[1.0, 0, 0, 0]], opac=[0.5], colors=[[0.0, 1.0, 0.0]],
                 cam=cam, bg=(0.0, 0.0, 1.0))
    img = np.asarray(out.image)
    corner = img[0, 0]
    assert np.allclose(corner, [0, 0, 1], atol=1e-5)   # pure background
    center = img[32, 32]
    assert center[2] < 1.0 and center[1] > 0.0         # blended


def test_depth_ordering_front_occludes():
    cam = make_camera()
    # nearly opaque red in front of green at same screen position
    out = render(means=[[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]],
                 scales=[[0.3, 0.3, 0.3]] * 2, rots=[[1.0, 0, 0, 0]] * 2,
                 opac=[0.99, 0.99],
                 colors=[[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], cam=cam)
    img = np.asarray(out.image)
    # the red one is at z=-1 (closer to camera at z=-4) and must dominate
    assert img[32, 32, 0] > img[32, 32, 1]


def test_behind_camera_culled():
    cam = make_camera()
    out = render(means=[[0.0, 0.0, -10.0]], scales=[[0.3, 0.3, 0.3]],
                 rots=[[1.0, 0, 0, 0]], opac=[0.9], colors=[[1.0, 0, 0]],
                 cam=cam)
    assert int(out.radii[0]) == 0
    assert np.allclose(np.asarray(out.image), 0.0)


def test_active_mask_hides():
    cam = make_camera()
    out = render(means=[[0.0, 0.0, 0.0]], scales=[[0.3, 0.3, 0.3]],
                 rots=[[1.0, 0, 0, 0]], opac=[0.9], colors=[[1, 0, 0]],
                 cam=cam, active_mask=jnp.array([False]))
    assert np.allclose(np.asarray(out.image), 0.0)


def test_anisotropic_rotation():
    cam = make_camera()
    # elongated gaussian along x, then rotated 90deg about z -> along y
    s = [[0.8, 0.05, 0.05]]
    q_id = [[1.0, 0, 0, 0]]
    q_z90 = [[math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)]]
    img_x = np.asarray(render([[0, 0, 0]], s, q_id, [0.9], [[1, 1, 1]], cam).image)
    img_y = np.asarray(render([[0, 0, 0]], s, q_z90, [0.9], [[1, 1, 1]], cam).image)
    assert img_x[32, 32 + 14, 0] > 0.1 and img_x[32 + 14, 32, 0] < 0.05
    assert np.allclose(img_x[32, 32 + 14, 0], img_y[32 + 14, 32, 0], atol=2e-2)


def test_gradients_flow():
    cam = make_camera(w=32, h=32)

    def loss_fn(means, colors, opac):
        out = render(means, [[0.2, 0.2, 0.2]], [[1.0, 0, 0, 0]], opac,
                     colors, cam, w=32, h=32)
        return jnp.sum(out.image ** 2)

    g = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.8, 0.2, 0.1]]),
        jnp.array([0.7]))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert float(jnp.abs(g[1]).sum()) > 0   # color grad nonzero
    assert float(jnp.abs(g[2]).sum()) > 0   # opacity grad nonzero
