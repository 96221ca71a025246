"""SSIM with an 11x11 Gaussian window (pure JAX, depthwise convs).

Exact functional parity with the reference's `calc_ssim`
(reference external.py:90-133): sigma=1.5 separable window, zero padding of
window_size//2, per-channel (grouped) convolution, c1=0.01^2, c2=0.03^2.
Images are channels-last (H, W, C) in this framework.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise 2D blur of (H, W, C) with zero padding."""
    c = img.shape[-1]
    pad = win.shape[0] // 2
    x = img[None]  # NHWC
    kh = jnp.tile(win.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1 (grouped)
    kw = jnp.tile(win.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x[0]


@partial(jax.jit, static_argnames=("window_size", "size_average"))
def calc_ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
              sigma: float = 1.5, size_average: bool = True) -> jnp.ndarray:
    """SSIM between (H, W, C) images in [0, 1]."""
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    blur = lambda x: _depthwise_blur(x, win)
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map) if size_average else jnp.mean(ssim_map,
                                                            axis=(0, 1))


def dssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(1 - SSIM), the structural term of the reference's image loss."""
    return 1.0 - calc_ssim(img1, img2)
