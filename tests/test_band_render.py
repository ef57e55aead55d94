"""Pixel-sharded band rendering matches the single-device render."""
import math

import numpy as np
import pytest


@pytest.mark.slow
def test_band_render_matches_single_device(rng):
    import jax
    import jax.numpy as jnp
    from gssr_tpu.cameras import Camera
    from gssr_tpu.ops.rasterize import rasterize
    from gssr_tpu.parallel.render_sharded import build_band_render

    W, H = 64, 64     # 4 tile rows -> bands of 1 on a 4-device mesh
    N = 512
    cam = Camera(uid=0, colmap_id=0, image_name="band",
                 R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                 fovx=math.radians(70), fovy=math.radians(55),
                 width=W, height=H)
    means = jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-3.5, -1.5, (N, 3))),
                         jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 0.9, (N,)), jnp.float32)
    sh = jnp.asarray(rng.normal(0, 0.3, (N, 16, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    camarr = cam.arrays()

    render_fn, mesh = build_band_render(
        W, H, instance_cap=1 << 13, sh_degree=3, backend="reference",
        devices=jax.devices()[:4])
    img_band = render_fn(means, scales, rots, opac, sh, camarr, bg)

    out = rasterize(means, scales, rots, opac, camarr, W, H, bg,
                    sh_coeffs=sh, sh_degree=3, instance_cap=1 << 15,
                    backend="reference")
    np.testing.assert_allclose(np.asarray(img_band), np.asarray(out.image),
                               atol=1e-5)
