"""Finite-difference ground truth for the rasterizer gradients.

VERDICT r1 item 4: the Pallas kernels were only ever compared against the
repo's own jnp reference backend; nothing checked either against an
independent oracle. Central differences are that oracle: for every payload
(vanilla / 2DGS / PGSR) the analytic directional derivative g.v must match
(f(x+eps v) - f(x-eps v)) / 2eps, through the FULL pipeline — projection,
SH, binning index math (stop-gradient), and the custom-VJP blend.
Reference semantics: diff-gaussian-rasterization backward.cu:400-557,
diff-surfel backward.cu:144-448.

Adversarial numeric cases: alpha clamped at 0.99, transmittance crossing
the 1e-4 stop mid-tile, instance-cap overflow, empty tiles.
"""
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def _camera(W=48, H=32):
    from gssr_tpu.cameras import Camera
    return Camera(uid=0, colmap_id=0, image_name="fd",
                  R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                  fovx=math.radians(70), fovy=math.radians(55),
                  width=W, height=H).arrays()


def _cloud(rng, n=24, spread=1.5, scale_rng=(-3.0, -1.8), op=(0.25, 0.85)):
    import jax.numpy as jnp
    return dict(
        means=jnp.asarray(rng.uniform(-spread, spread, (n, 3)), jnp.float32),
        scales=jnp.asarray(np.exp(rng.uniform(*scale_rng, (n, 3))),
                           jnp.float32),
        rots=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        opac=jnp.asarray(rng.uniform(*op, (n,)), jnp.float32),
        col=jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)), jnp.float32),
    )


def directional_check(loss_fn, args, rng, eps=1e-3, rtol=3e-2,
                      per_arg=3, atol=1e-3, min_pass=0.8,
                      arg_idxs=None):
    """Per-element central differences against the analytic gradient.

    The implemented loss (like the CUDA reference's) carries tiny genuine
    jumps: a pixel crossing the alpha>=1/255 cut or a rect gaining a tile
    row appears/disappears discretely (~0.2% of the loss each, dense along
    random directions — measured one per ~7e-4 units). Joint-direction FD
    is therefore hopeless, but single-element perturbations move one
    gaussian by ~1e-2 px and rarely cross a boundary. Checking the
    largest-gradient elements of EVERY argument with a majority vote makes
    the oracle robust to stray crossings while still failing hard on any
    systematic VJP bug (which breaks every element of an argument).
    """
    import jax

    grads = jax.jit(jax.grad(loss_fn, argnums=tuple(range(len(args)))))(
        *args)
    if arg_idxs is None:
        arg_idxs = range(len(args))
    total, passed = 0, 0
    per_arg_fail = []
    for ai in arg_idxs:
        a, g = args[ai], grads[ai]
        flat = np.asarray(a).ravel()
        gf = np.asarray(g).ravel()
        idxs = np.argsort(-np.abs(gf))[:per_arg]
        arg_pass = 0
        for i in idxs:
            ana = float(gf[i])
            # dual-eps retry: a discrete tile/cut boundary inside ONE
            # eps-interval is common; inside both is rare
            ok = False
            for e in (eps, 0.35 * eps):
                d = np.zeros_like(flat)
                d[i] = e
                dd = np.reshape(d, np.asarray(a).shape)
                ap = list(args)
                ap[ai] = a + dd
                am = list(args)
                am[ai] = a - dd
                num = (float(loss_fn(*ap)) - float(loss_fn(*am))) / (2 * e)
                if abs(ana - num) <= rtol * max(abs(ana), abs(num)) + atol:
                    ok = True
                    break
            total += 1
            passed += ok
            arg_pass += ok
        if len(idxs) and arg_pass == 0:
            per_arg_fail.append(ai)
    assert not per_arg_fail, \
        f"systematic gradient mismatch in argument(s) {per_arg_fail}"
    assert passed >= min_pass * total, \
        f"only {passed}/{total} finite-difference checks passed"


@pytest.fixture
def wimg():
    rng = np.random.default_rng(7)
    import jax.numpy as jnp
    return jnp.asarray(rng.normal(size=(32, 48, 3)), jnp.float32)


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_fd_vanilla(backend, wimg):
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize import rasterize
    rng = np.random.default_rng(0)
    cam = _camera()
    c = _cloud(rng)
    bg = jnp.zeros(3, jnp.float32)
    # SH color path included: [n, 4, 3] degree-1 coefficients
    sh = jnp.asarray(rng.normal(0, 0.3, (24, 4, 3)), jnp.float32)

    def loss(means, scales, rots, opac, sh):
        out = rasterize(means, scales, rots, opac, cam, 48, 32, bg,
                        sh_coeffs=sh, sh_degree=1, instance_cap=2048,
                        backend=backend)
        return jnp.sum(out.image * wimg)

    directional_check(loss, (c["means"], c["scales"], c["rots"],
                             c["opac"], sh), rng)


def test_fd_2dgs(wimg):
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize2d import rasterize_2d
    rng = np.random.default_rng(1)
    cam = _camera()
    c = _cloud(rng)
    bg = jnp.zeros(3, jnp.float32)

    def loss(means, scales, rots, opac, col):
        out = rasterize_2d(means, scales[:, :2], rots, opac, cam, 48, 32,
                           bg, colors_precomp=col, instance_cap=2048,
                           backend="reference")
        return (jnp.sum(out.image * wimg) + 0.1 * jnp.sum(out.surf_depth)
                + 0.1 * jnp.sum(out.dist)
                + 0.05 * jnp.sum(out.normal * wimg))

    directional_check(loss, (c["means"], c["scales"], c["rots"],
                             c["opac"], c["col"]), rng, rtol=3e-2)


def test_fd_pgsr(wimg):
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr
    rng = np.random.default_rng(2)
    cam = _camera()
    c = _cloud(rng)
    # the planar normal picks argmin(scales): make axis 2 clearly smallest
    # so finite differences never flip the (intentionally discrete,
    # pgsr_scene.get_normal-parity) axis choice
    c["scales"] = c["scales"].at[:, 2].multiply(0.25)
    bg = jnp.zeros(3, jnp.float32)

    def loss(means, scales, rots, opac, col):
        out = rasterize_pgsr(means, scales, rots, opac, cam, 48, 32, bg,
                             colors_precomp=col, instance_cap=2048,
                             backend="reference")
        return (jnp.sum(out.image * wimg)
                + 0.05 * jnp.sum(out.normal * wimg)
                + 0.02 * jnp.sum(out.distance))

    directional_check(loss, (c["means"], c["scales"], c["rots"],
                             c["opac"], c["col"]), rng, rtol=3e-2)


# ---------------- adversarial numeric cases --------------------------------

@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_fd_alpha_clamp(backend, wimg):
    """Splats whose peak alpha saturates the 0.99 clamp: the clamp zeroes
    the gradient exactly where alpha is clipped (backward.cu handles this
    by the alpha<=0.99 test); finite differences must agree."""
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize import rasterize
    rng = np.random.default_rng(3)
    cam = _camera()
    c = _cloud(rng, n=8, spread=0.5, scale_rng=(-1.2, -0.8), op=(0.995, 1.0))
    bg = jnp.zeros(3, jnp.float32)

    def loss(means, scales, rots, opac, col):
        out = rasterize(means, scales, rots, opac, cam, 48, 32, bg,
                        colors_precomp=col, instance_cap=2048,
                        backend=backend)
        return jnp.sum(out.image * wimg)

    # geometry args excluded: 30px splats have long alpha-cut rings, so
    # every geometric perturbation crosses several pixel-flip boundaries.
    # Opacity FD exercises the clamp directly (clamped pixels contribute
    # zero, ring pixels full), color FD the blend weights.
    directional_check(loss, (c["means"], c["scales"], c["rots"],
                             c["opac"], c["col"]), rng, rtol=3e-2,
                      arg_idxs=(3, 4))


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_fd_transmittance_stop(backend, wimg):
    """A deep stack of near-opaque splats drives T through the 1e-4 stop
    mid-chunk; later splats must get (near-)zero gradients and the
    directional derivative must still match."""
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize import rasterize
    rng = np.random.default_rng(4)
    n = 24
    means = np.stack([rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
                      np.linspace(0.0, 1.0, n)], axis=1)
    c = dict(
        means=jnp.asarray(means, jnp.float32),
        scales=jnp.asarray(np.exp(rng.uniform(-1.5, -1.0, (n, 3))),
                           jnp.float32),
        rots=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        opac=jnp.asarray(rng.uniform(0.90, 0.985, n), jnp.float32),
        col=jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)), jnp.float32))
    cam = _camera()
    bg = jnp.zeros(3, jnp.float32)

    def loss(means, scales, rots, opac, col):
        out = rasterize(means, scales, rots, opac, cam, 48, 32, bg,
                        colors_precomp=col, instance_cap=4096,
                        backend=backend)
        return jnp.sum(out.image * wimg)

    # color FD is an exact oracle for the T-stop bookkeeping: the color
    # gradient IS sum(T_i * alpha_i * w) over surviving blend steps, and
    # color never moves any discrete boundary. Opacity FD adds the
    # d(alpha)/d(op) chain through the saturated stack.
    directional_check(loss, (c["means"], c["scales"], c["rots"],
                             c["opac"], c["col"]), rng, rtol=4e-2,
                      arg_idxs=(3, 4))

    # property: splats BEHIND the saturation depth get (near-)zero
    # gradient; the front of the stack dominates
    import jax
    g_col = jax.grad(loss, argnums=4)(c["means"], c["scales"], c["rots"],
                                      c["opac"], c["col"])
    gn = np.abs(np.asarray(g_col)).sum(axis=1)
    front, back = gn[:8].sum(), gn[-8:].sum()
    assert back < 0.05 * front, (front, back)


def test_fd_empty_tiles(wimg):
    """Most of the frame has zero instances; grads must be exact (and the
    empty-tile kernel ranges exactly no-ops)."""
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize import rasterize
    rng = np.random.default_rng(5)
    c = _cloud(rng, n=6, spread=0.15)     # tight cluster -> corner
    means = c["means"] + jnp.asarray([1.0, 0.7, 0.0])
    cam = _camera()
    bg = jnp.zeros(3, jnp.float32)

    def loss(means, scales, rots, opac, col):
        out = rasterize(means, scales, rots, opac, cam, 48, 32, bg,
                        colors_precomp=col, instance_cap=1024,
                        backend="reference")
        return jnp.sum(out.image * wimg)

    directional_check(loss, (means, c["scales"], c["rots"],
                             c["opac"], c["col"]), rng)


def test_overflow_flags_and_finite_grads(wimg):
    """instance_cap overflow: the flag must be set and gradients stay
    finite (truncated render, never NaN)."""
    import jax
    import jax.numpy as jnp
    from gssr_tpu.ops.rasterize import rasterize
    rng = np.random.default_rng(6)
    c = _cloud(rng, n=64, scale_rng=(-1.5, -1.0))
    cam = _camera()
    bg = jnp.zeros(3, jnp.float32)

    def loss(means):
        out = rasterize(means, c["scales"], c["rots"], c["opac"], cam,
                        48, 32, bg, colors_precomp=c["col"],
                        instance_cap=128, backend="reference")
        return jnp.sum(out.image * wimg), out.overflow

    (l, over), g = jax.value_and_grad(loss, has_aux=True)(c["means"])
    assert bool(over)
    assert np.isfinite(float(l))
    assert np.isfinite(np.asarray(g)).all()
