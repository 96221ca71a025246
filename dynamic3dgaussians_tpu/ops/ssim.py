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


def _blur_chw(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable zero-padded blur of (C, H, W) via shifted adds.

    TPU note: (H, W, C) convolutions pad the tiny channel dim onto 128
    lanes (~40x wasted bandwidth); channel-major shifted static slices keep
    W on the lanes and fuse into a handful of packed VPU passes.
    """
    n = win.shape[0]
    pad = n // 2
    h, w = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    y = sum(win[t] * xp[:, t:t + h, :] for t in range(n))
    yp = jnp.pad(y, ((0, 0), (0, 0), (pad, pad)))
    return sum(win[t] * yp[:, :, t:t + w] for t in range(n))


def _depthwise_blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise 2D blur of (H, W, C) with zero padding."""
    return _blur_chw(img.transpose(2, 0, 1), win).transpose(1, 2, 0)


@partial(jax.jit, static_argnames=("window_size", "size_average"))
def calc_ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
              sigma: float = 1.5, size_average: bool = True) -> jnp.ndarray:
    """SSIM between (H, W, C) images in [0, 1]."""
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    a = img1.transpose(2, 0, 1)   # channel-major: one relayout in,
    b = img2.transpose(2, 0, 1)   # all blur/elementwise passes packed
    blur = lambda x: _blur_chw(x, win)
    mu1, mu2 = blur(a), blur(b)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(a * a) - mu1_sq
    sigma2_sq = blur(b * b) - mu2_sq
    sigma12 = blur(a * b) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map) if size_average else jnp.mean(ssim_map,
                                                            axis=(1, 2))


def dssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(1 - SSIM), the structural term of the reference's image loss."""
    return 1.0 - calc_ssim(img1, img2)
