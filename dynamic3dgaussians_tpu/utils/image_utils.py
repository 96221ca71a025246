"""Image-space utilities: feature-PCA visualization, edges, normals, colormaps.

Capability parity with reference utils/image_utils.py (SURVEY.md P10) and
colormap.py (P11):
  * feature_pca_vis: project a (H, W, F) rendered feature map to RGB via PCA
    (image_utils.py:27-60; used by the feature-field sanity checks)
  * sobel edges (image_utils.py:86-106)
  * depth -> normal map via cross products of image-space depth gradients
    (image_utils.py:108-135)
  * render-mode postprocessing for the network viewer (image_utils.py:137-161)
  * the 256-entry label color palette (colormap.py) generated procedurally
    (Pascal-VOC style bit-shuffle, identical values).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def feature_pca(feature_map: jnp.ndarray, n_components: int = 3,
                basis: Optional[jnp.ndarray] = None):
    """(H, W, F) features -> (H, W, 3) RGB in [0,1] via PCA.

    Returns (rgb, basis) so the same basis can be reused across frames
    (the reference fits one global PCA, get_features.py:276-320).
    """
    h, w, f = feature_map.shape
    x = feature_map.reshape(-1, f)
    mean = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mean
    if basis is None:
        _, _, vt = jnp.linalg.svd(xc, full_matrices=False)
        basis = vt[:n_components].T                      # (F, 3)
    proj = xc @ basis
    lo = jnp.percentile(proj, 1.0, axis=0, keepdims=True)
    hi = jnp.percentile(proj, 99.0, axis=0, keepdims=True)
    rgb = jnp.clip((proj - lo) / jnp.maximum(hi - lo, 1e-9), 0, 1)
    return rgb.reshape(h, w, n_components), basis


def sobel_edges(img: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude of a (H, W) or (H, W, C) image (grayscaled)."""
    if img.ndim == 3:
        img = jnp.mean(img, axis=-1)
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    pad = jnp.pad(img, 1, mode="edge")
    def conv(k):
        out = jnp.zeros_like(img)
        for dy in range(3):
            for dx in range(3):
                out = out + k[dy, dx] * pad[dy:dy + img.shape[0],
                                            dx:dx + img.shape[1]]
        return out
    gx, gy = conv(kx), conv(ky)
    return jnp.sqrt(gx * gx + gy * gy + 1e-12)


def depth_to_normal(depth: jnp.ndarray, fx: float, fy: float) -> jnp.ndarray:
    """(H, W) view-space depth -> (H, W, 3) unit normals in view space."""
    h, w = depth.shape
    dzdx = (jnp.roll(depth, -1, 1) - jnp.roll(depth, 1, 1)) * 0.5
    dzdy = (jnp.roll(depth, -1, 0) - jnp.roll(depth, 1, 0)) * 0.5
    z = jnp.maximum(depth, 1e-6)
    nx = -dzdx * fx / z
    ny = -dzdy * fy / z
    nz = jnp.ones_like(z)
    n = jnp.stack([nx, ny, nz], axis=-1)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)


def label_colormap(n: int = 256) -> np.ndarray:
    """(n, 3) uint8 Pascal-VOC-style palette (reference colormap.py values)."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def render_net_image(out, render_mode: str = "RGB", fx: float = 500.0,
                     fy: float = 500.0):
    """Viewer render-mode postprocessing (image_utils.py:137-161).

    `out` is a RenderOutput; returns a (H, W, 3) float image in [0, 1].
    """
    import jax.numpy as jnp
    mode = render_mode.lower()
    if mode.startswith("depth"):
        from dynamic3dgaussians_tpu.viz.render import colormap_depth
        return jnp.asarray(
            colormap_depth(np.asarray(out.depth), np.asarray(out.alpha))
        ).astype(jnp.float32) / 255.0
    if mode.startswith("alpha"):
        return jnp.repeat(out.alpha[..., None], 3, axis=-1)
    if mode.startswith("edge"):
        e = sobel_edges(out.rgb)
        e = e / jnp.maximum(e.max(), 1e-9)
        return jnp.repeat(e[..., None], 3, axis=-1)
    if mode.startswith("normal"):
        safe = out.depth / jnp.maximum(out.alpha, 1e-6)
        return depth_to_normal(safe, fx, fy) * 0.5 + 0.5
    if mode.startswith("feature") and out.extra is not None:
        rgb, _ = feature_pca(out.extra)
        return rgb
    if mode.startswith("seg") and out.extra is not None:
        return jnp.clip(out.extra[..., :3], 0, 1)
    return jnp.clip(out.rgb, 0, 1)
