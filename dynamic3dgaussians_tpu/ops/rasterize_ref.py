"""Oracle renderer: globally depth-sorted, all-gaussians-vs-all-pixels.

The correctness reference for the tiled and Pallas renderers (SURVEY.md §7
step 2): no tiling, no capacity limits, exact depth ordering — just a scan
over depth-sorted chunks of gaussians using the shared compositing math.
O(N * H * W): use for tests and small scenes only.

Differentiable by plain autodiff (chunk bodies are rematerialized).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dynamic3dgaussians_tpu.ops import compositing
from dynamic3dgaussians_tpu.ops.camera import Camera
from dynamic3dgaussians_tpu.ops.projection import Projected, tile_rect


def render_primitives_reference(
        cam: Camera,
        proj: Projected,
        colors: jnp.ndarray,
        opacity: jnp.ndarray,
        bg: Optional[jnp.ndarray] = None,
        chunk: int = 256,
        tile_h: int = 16,
        tile_w: int = 16):
    """Composite projected primitives over the full image.

    Args:
      cam: Camera (height/width static).
      proj: Projected primitives from `projection.project`.
      colors: (N, C) linear channels (RGB / seg / features concatenated).
      opacity: (N,) activated opacities.
      bg: (C,) background, default zeros.
      tile_h/tile_w: tile grid used for the support cutoff. The CUDA
        reference only composites a gaussian into pixels of tiles its 3-sigma
        rect touches (forward.cu:246-250); the gaussian tail past 3 sigma can
        still exceed the 1/255 alpha threshold, so this cutoff is *visible*
        semantics that all implementations must share.

    Returns:
      dict with channels (H, W, C), depth (H, W), alpha (H, W).
    """
    n = proj.mean2d.shape[0]
    n_chan = colors.shape[-1]
    h, w = cam.height, cam.width
    if bg is None:
        bg = jnp.zeros((n_chan,), jnp.float32)

    # Global front-to-back order: invalid gaussians sort to the back with
    # zero alpha. jnp.argsort is stable, matching the reference's stable
    # radix sort tie-breaking (rasterizer_impl.cu:306-314).
    sort_depth = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth)

    pad = (-n) % chunk
    n_pad = n + pad
    order = jnp.pad(order, (0, pad))  # pad slots alias gaussian 0 ...
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    depth = proj.depth[order]
    op = opacity[order]
    vals = compositing.pack_values(colors[order], depth)
    # ... so mask them out explicitly.
    valid = proj.valid[order] & (jnp.arange(n_pad) < n)
    grid_h, grid_w = -(-h // tile_h), -(-w // tile_w)
    tx0, ty0, tx1, ty1, _ = tile_rect(proj, tile_h, tile_w, grid_h, grid_w)
    rect_min = jnp.stack([tx0, ty0], axis=-1)[order]
    rect_max = jnp.stack([tx1, ty1], axis=-1)[order]

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    px, py = px.reshape(-1), py.reshape(-1)
    n_pix = h * w
    pix_tx = (px // tile_w).astype(jnp.int32)
    pix_ty = (py // tile_h).astype(jnp.int32)

    def body(carry, idx):
        T, acc = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk, 0)
        alpha = compositing.chunk_alpha(sl(mean2d), sl(conic), sl(op),
                                        sl(valid), px, py)
        rmin, rmax = sl(rect_min), sl(rect_max)
        in_rect = ((pix_tx[None, :] >= rmin[:, 0:1])
                   & (pix_tx[None, :] < rmax[:, 0:1])
                   & (pix_ty[None, :] >= rmin[:, 1:2])
                   & (pix_ty[None, :] < rmax[:, 1:2]))
        alpha = jnp.where(in_rect, alpha, 0.0)
        T, acc = compositing.composite_chunk(T, acc, alpha, sl(vals))
        return (T, acc), None

    T0 = jnp.ones((n_pix,), jnp.float32)
    acc0 = jnp.zeros((n_pix, n_chan + 2), jnp.float32)
    (T, acc), _ = jax.lax.scan(jax.checkpoint(body), (T0, acc0),
                               jnp.arange(n_pad // chunk))
    channels, depth_img, alpha_img = compositing.finalize(T, acc, bg)
    return {
        "channels": channels.reshape(h, w, n_chan),
        "depth": depth_img.reshape(h, w),
        "alpha": alpha_img.reshape(h, w),
    }
