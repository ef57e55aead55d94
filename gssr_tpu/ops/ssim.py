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


def _filter(img, window):
    """Depthwise 2D conv with same padding. img: [H,W,C].

    Channels ride the conv batch dim, so one [1,1,k,k] filter serves any C.
    """
    k = window.shape[0]
    x = img.transpose(2, 0, 1)[:, None]           # [C,1,H,W]
    w = jnp.asarray(window).reshape(1, 1, k, k)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y[:, 0].transpose(1, 2, 0)


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
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def psnr(a, b):
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(mse + 1e-12)
