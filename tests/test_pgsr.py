"""PGSR planar rasterizer: pallas (interpret) vs jnp reference."""
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gssr_tpu.cameras import Camera


def make_camera(w=32, h=16, fov_deg=60.0):
    return Camera(uid=0, colmap_id=0, image_name="t",
                  R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
                  fovx=math.radians(fov_deg), fovy=math.radians(fov_deg),
                  width=w, height=h)


def random_scene(rng, n):
    means = rng.uniform(-1.5, 1.5, size=(n, 3))
    scales = rng.uniform(0.02, 0.3, size=(n, 3))
    rots = rng.normal(size=(n, 4))
    opac = rng.uniform(0.2, 1.0, size=n)
    colors = rng.uniform(0, 1, size=(n, 3))
    return tuple(jnp.asarray(v, jnp.float32)
                 for v in (means, scales, rots, opac, colors))


@functools.lru_cache(maxsize=8)
def _render_fn(backend, w, h):
    from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr

    @jax.jit
    def fn(means, scales, rots, opac, colors, cam_arrays, bg):
        return rasterize_pgsr(means, scales, rots, opac, cam_arrays, w, h,
                              bg, colors_precomp=colors, backend=backend,
                              instance_cap=512)
    return fn


def render(backend, scene, cam, w=32, h=16, bg=(0.05, 0.1, 0.15)):
    return _render_fn(backend, w, h)(
        *scene, cam.arrays(), jnp.asarray(bg, jnp.float32))


@pytest.mark.parametrize("n", [1, 32])
def test_forward_matches_reference(rng, n):
    cam = make_camera()
    scene = random_scene(rng, n)
    ref = render("reference", scene, cam)
    pal = render("pallas", scene, cam)
    for field in ("image", "final_T", "normal", "distance", "plane_depth",
                  "observe"):
        a = np.asarray(getattr(ref, field))
        b = np.asarray(getattr(pal, field))
        np.testing.assert_allclose(b, a, atol=3e-4, rtol=2e-3,
                                   err_msg=field)


def test_gradients_and_absgrads(rng):
    cam = make_camera(w=16, h=16)
    scene = random_scene(rng, 12)
    tgt = jnp.asarray(rng.uniform(0, 1, size=(16, 16, 3)), jnp.float32)

    def loss(backend, means, scales, rots, opac, colors, m2d_abs):
        from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr
        out = rasterize_pgsr(means, scales, rots, opac, cam.arrays(), 16, 16,
                             jnp.zeros(3), colors_precomp=colors,
                             backend=backend, instance_cap=512,
                             mean2d_abs_offset=m2d_abs)
        return (jnp.mean((out.image - tgt) ** 2)
                + 0.05 * jnp.mean(out.normal ** 2)
                + 0.01 * jnp.mean(out.distance)
                + 0.01 * jnp.mean(out.final_T))

    zeros = jnp.zeros((12, 2), jnp.float32)
    g_ref = jax.jit(jax.grad(functools.partial(loss, "reference"),
                             argnums=(0, 1, 2, 3, 4)))(*scene, zeros)
    g_pal = jax.jit(jax.grad(functools.partial(loss, "pallas"),
                             argnums=(0, 1, 2, 3, 4, 5)))(*scene, zeros)
    names = ["means", "scales", "rots", "opac", "colors"]
    for nm, a, b in zip(names, g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), nm
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3,
                                   err_msg=nm)
    # abs grads: nonnegative, and >= |mean2d grad| per gaussian
    absg = np.asarray(g_pal[5])
    assert (absg >= -1e-6).all()
    assert absg.sum() > 0


def test_plane_depth_flat_plane(rng):
    # gaussians forming a fronto-parallel plane at z=0 (camera at z=-4):
    # plane_depth over covered pixels should approach 4
    n = 64
    xs = np.linspace(-1, 1, 8)
    px, py = np.meshgrid(xs, xs)
    means = np.stack([px.ravel(), py.ravel(), np.zeros(n)], axis=1)
    scene = (jnp.asarray(means, jnp.float32),
             jnp.full((n, 3), 0.18, jnp.float32)
             .at[:, 2].set(0.01),                     # thin in z
             jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
             jnp.full((n,), 0.95, jnp.float32),
             jnp.full((n, 3), 0.7, jnp.float32))
    cam = make_camera(w=32, h=32)
    out = render("reference", scene, cam, w=32, h=32)
    center = np.asarray(out.plane_depth)[14:18, 14:18]
    assert np.allclose(center, 4.0, atol=0.2), center
    assert np.asarray(out.observe).sum() > 0

def test_observe_gradient_channel_matches_forward(rng):
    """The backward's observe side-channel equals the forward out_observe."""
    import jax
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr
    cam = make_camera(w=32, h=32)
    scene = random_scene(rng, 24)
    means, scales, rots, opac, colors = scene
    tgt = jnp.asarray(rng.uniform(0, 1, size=(32, 32, 3)), jnp.float32)

    def loss(obs_off):
        out = rasterize_pgsr(means, scales, rots, opac, cam.arrays(), 32, 32,
                             jnp.zeros(3), colors_precomp=colors,
                             backend="pallas", instance_cap=2048,
                             observe_offset=obs_off)
        return jnp.mean((out.image - tgt) ** 2), out.observe

    obs0 = jnp.zeros((means.shape[0], 1), jnp.float32)
    (_, fwd_obs), obs_g = jax.value_and_grad(loss, has_aux=True)(obs0)
    np.testing.assert_allclose(np.asarray(obs_g[:, 0]), np.asarray(fwd_obs),
                               atol=1e-5)
