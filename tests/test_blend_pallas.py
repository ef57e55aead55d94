"""Pallas blend kernels (interpret mode) vs the jnp reference blend."""
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
    opac = rng.uniform(0.1, 1.0, size=n)
    colors = rng.uniform(0, 1, size=(n, 3))
    return (jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
            jnp.asarray(rots, jnp.float32), jnp.asarray(opac, jnp.float32),
            jnp.asarray(colors, jnp.float32))


import functools


@functools.lru_cache(maxsize=32)
def _render_fn(backend, w, h, cap):
    from gssr_tpu.ops.rasterize import rasterize

    @jax.jit
    def fn(means, scales, rots, opac, colors, cam_arrays, bg):
        return rasterize(means, scales, rots, opac, cam_arrays, w, h, bg,
                         colors_precomp=colors, backend=backend,
                         instance_cap=cap)
    return fn


def render(backend, scene, cam, w, h, bg=(0.1, 0.2, 0.3), cap=512):
    means, scales, rots, opac, colors = scene
    return _render_fn(backend, w, h, cap)(
        means, scales, rots, opac, colors, cam.arrays(),
        jnp.asarray(bg, jnp.float32))


@pytest.mark.parametrize("n", [1, 48])
def test_forward_matches_reference(rng, n):
    cam = make_camera(w=32, h=16)
    scene = random_scene(rng, n)
    ref = render("reference", scene, cam, 32, 16)
    pal = render("pallas", scene, cam, 32, 16)
    np.testing.assert_allclose(np.asarray(pal.image), np.asarray(ref.image),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pal.final_T), np.asarray(ref.final_T),
                               atol=1e-5, rtol=1e-4)


def test_gradients_match_reference(rng):
    cam = make_camera(w=16, h=16)
    scene = random_scene(rng, 24)
    tgt = jnp.asarray(rng.uniform(0, 1, size=(16, 16, 3)), jnp.float32)

    def loss(backend, means, scales, rots, opac, colors):
        out = render(backend, (means, scales, rots, opac, colors), cam, 16, 16)
        return jnp.mean((out.image - tgt) ** 2) + 0.1 * jnp.mean(out.final_T)

    g_ref = jax.jit(jax.grad(lambda *a: loss("reference", *a),
                             argnums=(0, 1, 2, 3, 4)))(*scene)
    g_pal = jax.jit(jax.grad(lambda *a: loss("pallas", *a),
                             argnums=(0, 1, 2, 3, 4)))(*scene)
    names = ["means", "scales", "rots", "opac", "colors"]
    for nm, a, b in zip(names, g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), nm
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=2e-3, err_msg=nm)


def test_early_termination_dense_overdraw(rng):
    # many nearly-opaque gaussians stacked at the same spot: T collapses,
    # early-stop paths must agree between backends
    cam = make_camera(w=16, h=16)
    n = 48
    means = np.tile([[0.0, 0.0, 0.0]], (n, 1)) + rng.normal(0, 0.02, (n, 3))
    means[:, 2] = np.linspace(-1, 1, n)
    scene = (jnp.asarray(means, jnp.float32),
             jnp.full((n, 3), 0.25, jnp.float32),
             jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
             jnp.full((n,), 0.95, jnp.float32),
             jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32))
    ref = render("reference", scene, cam, 16, 16)
    pal = render("pallas", scene, cam, 16, 16)
    np.testing.assert_allclose(np.asarray(pal.image), np.asarray(ref.image),
                               atol=1e-4, rtol=1e-3)


def test_segred_reduction_matches_scatter(rng):
    """gather_rows_segred's sorted-segment VJP must equal the scatter-add
    VJP exactly (same per-gaussian sums, f32-deterministic)."""
    import jax
    from gssr_tpu.ops.rasterize import rasterize

    # many gaussians + small instance cap => gather_rows_auto picks the
    # sorted-segment strategy (n*180 > cap*(C+1)*1.45)
    n = 4096
    cam = make_camera(w=48, h=32)
    means = jnp.asarray(np.random.default_rng(7).uniform(-1.5, 1.5, (n, 3)),
                        jnp.float32)
    scales = jnp.full((n, 3), 0.03, jnp.float32)
    rots = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
    opac = jnp.full((n,), 0.5, jnp.float32)
    colors = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (n, 3)),
                         jnp.float32)
    camarr = cam.arrays()
    tgt = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (32, 48, 3)),
                      jnp.float32)

    from gssr_tpu.ops import blend_pallas as BP

    def loss(force, *p):
        if force is not None:
            orig = BP.gather_rows_auto

            def forced(per_gauss, binning, n_used):
                if force == "scatter":
                    return BP.gather_rows(per_gauss, binning.gauss_id,
                                          n_used)
                return BP.gather_rows_segred(
                    per_gauss, binning.gauss_id, binning.gid_reduce,
                    binning.seg_bounds, n_used)
            BP.gather_rows_auto = forced
        try:
            out = rasterize(p[0], p[1], p[2], p[3], camarr, 48, 32,
                            jnp.zeros(3), colors_precomp=p[4],
                            instance_cap=8192, backend="pallas")
            return jnp.mean(jnp.abs(out.image - tgt))
        finally:
            if force is not None:
                BP.gather_rows_auto = orig

    args = (means, scales, rots, opac, colors)
    g_sc = jax.jit(jax.grad(lambda *p: loss("scatter", *p),
                            argnums=(0, 3, 4)))(*args)
    g_sg = jax.jit(jax.grad(lambda *p: loss("segred", *p),
                            argnums=(0, 3, 4)))(*args)
    for a, b in zip(g_sc, g_sg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
    assert float(jnp.max(jnp.abs(g_sc[0]))) > 0  # gradients are non-trivial
