"""Independent per-pixel numpy blend oracle for all three payloads.

The pallas/jnp backends share this repo's vectorized formulation (chunked
prefix products, fused binning); round-1 VERDICT flagged that they were
only tested against each other. This oracle is a *scalar sequential*
transcription of the CUDA loop semantics — front-to-back per-gaussian
blending in depth order with the T<1e-4 stop, alpha clamp and 1/255 gate
(diff-gaussian-rasterization forward.cu:261-374, diff-surfel
forward.cu:308-446, diff-plane forward.cu:280-405) — sharing no blend or
binning code with the implementation under test.

Culling independence: every opacity is <= 0.3, so any splat the 3-sigma
tile culling drops satisfies alpha < 0.3*exp(-4.5) < 1/255 and is dropped
by the alpha gate too. The oracle therefore blends EVERY visible splat at
every pixel without reimplementing binning.
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from gssr_tpu.cameras import Camera

W, H = 48, 32
T_EPS = 1e-4
A_MIN = 1.0 / 255.0
A_MAX = 0.99
NEAR2D, FAR2D = 0.2, 100.0
M_COEF = FAR2D / (FAR2D - NEAR2D)


def make_camera():
    return Camera(uid=0, colmap_id=0, image_name="o",
                  R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
                  fovx=math.radians(60), fovy=math.radians(45),
                  width=W, height=H)


def px_py():
    py, px = np.mgrid[0:H, 0:W].astype(np.float64)
    return px, py


def seq_blend(alpha_maps, chan_maps, depths_sorted=None, with_dist=False):
    """Sequential front-to-back blend, one gaussian at a time (the CUDA
    per-pixel loop). alpha_maps: [G,H,W] already gated (0 where the CUDA
    loop would `continue`). chan_maps: [G,H,W,C]. Returns (acc [H,W,C],
    Tb [H,W], extras dict)."""
    G = alpha_maps.shape[0]
    D = np.ones((H, W))           # all-instance transmittance (stop test)
    Tb = np.ones((H, W))          # blended-only transmittance (final_T)
    acc = np.zeros(chan_maps.shape[1:])
    M1 = np.zeros((H, W))
    M2 = np.zeros((H, W))
    dist = np.zeros((H, W))
    med_depth = np.zeros((H, W))
    for g in range(G):
        a = alpha_maps[g]
        d_inc = D * (1.0 - a)
        contrib = (a > 0) & (d_inc >= T_EPS)
        w = np.where(contrib, a * D, 0.0)
        acc += w[..., None] * chan_maps[g]
        if with_dist:
            m = M_COEF * (1.0 - NEAR2D / np.maximum(depths_sorted[g], 1e-6))
            A_bef = 1.0 - D
            dist += w * (m * m * A_bef + M2 - 2.0 * m * M1)
            M1 += w * m
            M2 += w * m * m
            sel = contrib & (D > 0.5)
            med_depth = np.where(sel, depths_sorted[g], med_depth)
        Tb = np.where(contrib, Tb * (1.0 - a), Tb)
        D = d_inc
    return acc, Tb, dict(dist=dist, med_depth=med_depth)


def scene_3d(rng, n=24):
    means = rng.uniform(-1.5, 1.5, (n, 3))
    scales = np.exp(rng.uniform(-2.5, -0.8, (n, 3)))
    rots = rng.normal(size=(n, 4))
    opac = rng.uniform(0.05, 0.30, n)         # culling-independence bound
    colors = rng.uniform(0, 1, (n, 3))
    return means, scales, rots, opac, colors


def to_j(*arrs):
    return tuple(jnp.asarray(a, jnp.float32) for a in arrs)


@pytest.mark.parametrize("backend", ["pallas", "reference"])
def test_vanilla_oracle(rng, backend):
    from gssr_tpu.ops.projection import preprocess
    from gssr_tpu.ops.rasterize import rasterize

    means, scales, rots, opac, colors = scene_3d(rng)
    jm, js, jr, jo, jc = to_j(means, scales, rots, opac, colors)
    cam = make_camera()
    bg = np.array([0.1, 0.2, 0.3])

    out = rasterize(jm, js, jr, jo, cam.arrays(), W, H,
                    jnp.asarray(bg, jnp.float32), colors_precomp=jc,
                    instance_cap=8192, backend=backend)
    proj = preprocess(jm, js, jr, cam.arrays(), W, H, opacity=jo)

    keep = np.asarray(proj.tiles_touched) > 0
    order = np.argsort(np.asarray(proj.depth, np.float64)[keep])
    m2d = np.asarray(proj.mean2d, np.float64)[keep][order]
    con = np.asarray(proj.conic, np.float64)[keep][order]
    op = opac[keep][order]
    col = colors[keep][order]

    px, py = px_py()
    dx = m2d[:, 0, None, None] - px
    dy = m2d[:, 1, None, None] - py
    power = (-0.5 * (con[:, 0, None, None] * dx * dx
                     + con[:, 2, None, None] * dy * dy)
             - con[:, 1, None, None] * dx * dy)
    alpha = np.minimum(A_MAX, op[:, None, None] * np.exp(power))
    ok = (power <= 0.0) & (alpha >= A_MIN)
    acc, Tb, _ = seq_blend(np.where(ok, alpha, 0.0),
                           np.broadcast_to(col[:, None, None, :],
                                           (len(op), H, W, 3)))
    img = acc + Tb[..., None] * bg

    np.testing.assert_allclose(np.asarray(out.image), img,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.final_T), Tb,
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("backend", ["pallas", "reference"])
def test_2dgs_oracle(rng, backend):
    from gssr_tpu.ops.projection2d import preprocess_2d
    from gssr_tpu.ops.rasterize2d import rasterize_2d

    n = 24
    means = rng.uniform(-1.5, 1.5, (n, 3))
    scales2 = rng.uniform(0.08, 0.45, (n, 2))
    rots = rng.normal(size=(n, 4))
    opac = rng.uniform(0.05, 0.30, n)
    colors = rng.uniform(0, 1, (n, 3))
    jm, js, jr, jo, jc = to_j(means, scales2, rots, opac, colors)
    cam = make_camera()
    bg = np.array([0.05, 0.1, 0.15])

    out = rasterize_2d(jm, js, jr, jo, cam.arrays(), W, H,
                       jnp.asarray(bg, jnp.float32), colors_precomp=jc,
                       instance_cap=8192, backend=backend, depth_ratio=0.3)
    proj = preprocess_2d(jm, js, jr, cam.arrays(), W, H, opacity=jo)

    keep = np.asarray(proj.tiles_touched) > 0
    order = np.argsort(np.asarray(proj.depth, np.float64)[keep])
    m2d = np.asarray(proj.mean2d, np.float64)[keep][order]
    Tm = np.asarray(proj.Tmat, np.float64)[keep][order]   # rows Tu,Tv,Tw
    nrm = np.asarray(proj.normal, np.float64)[keep][order]
    op = opac[keep][order]
    col = colors[keep][order]
    G = len(op)

    px, py = px_py()
    # original k/l cross-product formulation (the kernel now hoists the
    # per-gaussian cross products — deliberately NOT reused here)
    Tu, Tv, Tw = Tm[:, 0], Tm[:, 1], Tm[:, 2]            # [G,3]
    k = px[None, ..., None] * Tw[:, None, None, :] - Tu[:, None, None, :]
    l = py[None, ..., None] * Tw[:, None, None, :] - Tv[:, None, None, :]
    p = np.cross(k, l)                                   # [G,H,W,3]
    pz_ok = p[..., 2] != 0.0
    pz = np.where(pz_ok, p[..., 2], 1.0)
    s0 = np.clip(p[..., 0] / pz, -1e4, 1e4)
    s1 = np.clip(p[..., 1] / pz, -1e4, 1e4)
    rho3d = s0 * s0 + s1 * s1
    rho2d = 2.0 * ((m2d[:, 0, None, None] - px) ** 2
                   + (m2d[:, 1, None, None] - py) ** 2)
    is3d = rho3d <= rho2d
    rho = np.minimum(rho3d, rho2d)
    depth = np.where(is3d,
                     s0 * Tw[:, 0, None, None] + s1 * Tw[:, 1, None, None]
                     + Tw[:, 2, None, None],
                     Tw[:, 2, None, None] * np.ones_like(s0))
    alpha = np.minimum(A_MAX, op[:, None, None] * np.exp(-0.5 * rho))
    ok = pz_ok & (depth >= NEAR2D) & (alpha >= A_MIN)

    chans = np.concatenate(
        [np.broadcast_to(col[:, None, None, :], (G, H, W, 3)),
         np.broadcast_to(nrm[:, None, None, :], (G, H, W, 3)),
         depth[..., None]], axis=-1)
    acc, Tb, ex = seq_blend(np.where(ok, alpha, 0.0), chans,
                            depths_sorted=depth, with_dist=True)

    img = acc[..., 0:3] + Tb[..., None] * bg
    alpha_px = 1.0 - Tb
    normal_world = acc[..., 3:6] @ np.asarray(cam.arrays().w2c)[:3, :3]
    a_safe = np.where(alpha_px > 1e-6, alpha_px, 1.0)
    depth_exp = np.where(alpha_px > 1e-6, acc[..., 6] / a_safe, 0.0)
    surf = depth_exp * 0.7 + 0.3 * ex["med_depth"]

    np.testing.assert_allclose(np.asarray(out.image), img,
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.final_T), Tb,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.normal), normal_world,
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.depth_expected), depth_exp,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.median_depth),
                               ex["med_depth"], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.surf_depth), surf,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.dist), ex["dist"],
                               atol=1e-3, rtol=2e-3)


@pytest.mark.parametrize("backend", ["pallas", "reference"])
def test_pgsr_oracle(rng, backend):
    from gssr_tpu.ops.projection import preprocess
    from gssr_tpu.ops.rasterize_pgsr import (gaussian_plane_normals,
                                             rasterize_pgsr)

    means, scales, rots, opac, colors = scene_3d(rng)
    jm, js, jr, jo, jc = to_j(means, scales, rots, opac, colors)
    cam = make_camera()
    bg = np.array([0.0, 0.0, 0.0])

    out = rasterize_pgsr(jm, js, jr, jo, cam.arrays(), W, H,
                         jnp.asarray(bg, jnp.float32), colors_precomp=jc,
                         instance_cap=8192, backend=backend)
    proj = preprocess(jm, js, jr, cam.arrays(), W, H, opacity=jo)
    camarr = cam.arrays()
    normal_w = gaussian_plane_normals(jm, js, jr, camarr.campos)
    w2c = np.asarray(camarr.w2c, np.float64)
    normal_c = np.asarray(normal_w, np.float64) @ w2c[:3, :3].T
    pts_cam = np.concatenate([means, np.ones((len(means), 1))], -1) \
        @ w2c[:3, :].T
    distance = np.abs(np.sum(normal_c * pts_cam, axis=-1))

    keep = np.asarray(proj.tiles_touched) > 0
    order = np.argsort(np.asarray(proj.depth, np.float64)[keep])
    m2d = np.asarray(proj.mean2d, np.float64)[keep][order]
    con = np.asarray(proj.conic, np.float64)[keep][order]
    op = opac[keep][order]
    G = len(op)
    chans = np.concatenate([colors[keep][order], normal_c[keep][order],
                            distance[keep][order][:, None]], axis=-1)

    px, py = px_py()
    dx = m2d[:, 0, None, None] - px
    dy = m2d[:, 1, None, None] - py
    power = (-0.5 * (con[:, 0, None, None] * dx * dx
                     + con[:, 2, None, None] * dy * dy)
             - con[:, 1, None, None] * dx * dy)
    alpha = np.minimum(A_MAX, op[:, None, None] * np.exp(power))
    ok = (power <= 0.0) & (alpha >= A_MIN)
    acc, Tb, _ = seq_blend(np.where(ok, alpha, 0.0),
                           np.broadcast_to(chans[:, None, None, :],
                                           (G, H, W, 7)))

    np.testing.assert_allclose(np.asarray(out.image), acc[..., 0:3],
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.final_T), Tb,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.normal), acc[..., 3:6],
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.distance), acc[..., 6],
                               atol=3e-4, rtol=1e-3)


def test_ssim_custom_vjp_matches_fd(rng):
    """The SSIM blur's self-adjoint custom VJP (and the fusion-barrier
    formulation) must equal finite differences: the blur operator with a
    symmetric kernel and SAME padding is its own transpose."""
    import jax
    import jax.numpy as jnp
    from gssr_tpu.ops.ssim import ssim

    a = jnp.asarray(rng.uniform(0.2, 0.8, (24, 28, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0.2, 0.8, (24, 28, 3)), jnp.float32)
    g = jax.jit(jax.grad(lambda x: 1.0 - ssim(x, b)))(a)
    v = rng.normal(size=a.shape).astype(np.float32)
    v /= np.linalg.norm(v)
    eps = 3e-3
    f = jax.jit(lambda x: 1.0 - ssim(x, b))
    fd = (float(f(a + eps * v)) - float(f(a - eps * v))) / (2 * eps)
    dot = float(np.asarray(g).ravel() @ v.ravel())
    assert abs(fd - dot) < 5e-4 * max(1.0, abs(fd)), (fd, dot)
