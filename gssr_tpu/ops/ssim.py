"""SSIM in jnp (11x11 gaussian window, sigma 1.5).

Parity: the inline SSIM in the reference VanillaScene
(gssr/scene/vanilla_scene.py:32-61) — same window, constants C1/C2, and
same-padding depthwise convolution, so loss values match.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def _conv_same(img, w4):
    """Depthwise 2D conv with same padding. img: [H,W,C], w4: [1,1,k,k].

    Channels ride the conv batch dim, so one [1,1,k,k] filter serves any C.
    """
    x = img.transpose(2, 0, 1)[:, None]           # [C,1,H,W]
    y = jax.lax.conv_general_dilated(
        x, w4, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y[:, 0].transpose(1, 2, 0)


@jax.custom_vjp
def _blur_self_adjoint(img, w4):
    return _conv_same(img, w4)


def _blur_fwd(img, w4):
    return _conv_same(img, w4), w4


def _blur_bwd(w4, cot):
    # A stride-1 SAME-padding stencil with a SYMMETRIC kernel is a
    # self-adjoint linear operator (A^T = A, boundary truncation
    # included), so the VJP is the same blur applied to the cotangent —
    # one forward-direction conv instead of XLA's transposed-conv
    # lowering, and verified exact TPU-vs-CPU in isolation.
    return _conv_same(cot, w4), jnp.zeros_like(w4)


_blur_self_adjoint.defvjp(_blur_fwd, _blur_bwd)


def _filter(img, window):
    k = window.shape[0]
    w4 = jnp.asarray(window).reshape(1, 1, k, k)
    return _blur_self_adjoint(img, w4)


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over the image. img1/img2: [H,W,C] in [0,1]."""
    window = _gaussian_window(window_size)
    # feature_group_count needs channels in the channel dim; reuse batch trick
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    mu1 = _filter(img1, window)
    mu2 = _filter(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter(img2 * img2, window) - mu2_sq
    sigma12 = _filter(img1 * img2, window) - mu1_mu2
    num = (2 * mu1_mu2 + C1) * (2 * sigma12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    # The barrier breaks XLA's fusion of the blur chains into the
    # division's backward: without it the axon TPU stack MISCOMPILES the
    # fused gradient (grad norms 1e6 x the CPU value at 400x304, cos ~0,
    # while every sub-expression's gradient and all forward values are
    # exact). Measured: num/den grads exact in isolation, mean(num/den)
    # garbage, barrier restores exactness to 1e-7. This was a root cause
    # of the round-3/4 anchor-family training collapse on the chip
    # (every method's loss contains SSIM), alongside the bf16 matmul
    # default fixed in gssr_tpu/__init__.py.
    num, den = jax.lax.optimization_barrier((num, den))
    return jnp.mean(num / den)


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def psnr(a, b):
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(mse + 1e-12)
