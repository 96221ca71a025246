"""Front-to-back alpha compositing as chunked MXU matmuls (pure XLA).

TPU-native equivalent of the reference's per-pixel sequential compositing loop
(…/cuda_rasterizer/forward.cu:274-442). Instead of one CUDA thread walking the
sorted gaussian list per pixel, we process depth-ordered *chunks* of G
gaussians against P pixels at once:

  alpha[g, p]   = min(0.99, opacity_g * exp(power_{g,p}))   (forward.cu:355-366)
  Tw[g, p]      = prod_{j<g} (1 - alpha[j, p])   exclusive cumprod over chunk
  w[g, p]       = alpha * Tw * T_in[p]
  acc[p, :]    += w.T @ values[g, :]              <- 128xP matmul on the MXU
  T_out[p]      = T_in[p] * prod_g (1 - alpha[g, p])

The per-gaussian "values" row carries RGB, segmentation, semantic-feature
channels, the view depth and a constant 1 (for accumulated alpha), so a single
pass produces every output the reference needs two full render calls plus
fixed-function accumulators for (README.md:88-89 2x overhead; forward.cu
out_color/out_depth/out_feature_map). The `out_alpha` channel implements the
semantics the reference *intended* but never stored (SURVEY.md §2.4).

Skip rules match the CUDA kernel: power clamped to <= 0, alpha < 1/255
dropped, alpha capped at 0.99. The reference's early termination at
T < 1e-4 (forward.cu:367-371) is an optimization whose contribution bound is
1e-4 in every channel; we omit it in the XLA path (tolerances in tests cover
it) and keep it in the Pallas kernel where it saves real work.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99


def chunk_alpha(mean2d: jnp.ndarray, conic: jnp.ndarray, opacity: jnp.ndarray,
                valid: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray
                ) -> jnp.ndarray:
    """Per-(gaussian, pixel) alpha for one chunk.

    Args:
      mean2d: (G, 2) projected centers, pixel coords.
      conic: (G, 3) inverse-covariance upper triangle (a, b, c).
      opacity: (G,) sigmoid-activated opacities.
      valid: (G,) bool contribution mask.
      px, py: (P,) pixel coordinates (integer centers, as floats).

    Returns:
      (G, P) alpha with the reference's clamp/skip rules applied.
    """
    dx = mean2d[:, 0:1] - px[None, :]
    dy = mean2d[:, 1:2] - py[None, :]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    power = jnp.minimum(power, 0.0)
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * jnp.exp(power))
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    return jnp.where(valid[:, None], alpha, 0.0)


def composite_chunk(T_in: jnp.ndarray, acc_in: jnp.ndarray,
                    alpha: jnp.ndarray, values: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold one depth-ordered chunk into the running composite.

    Args:
      T_in: (P,) incoming transmittance.
      acc_in: (P, C) accumulated premultiplied channels.
      alpha: (G, P) chunk alphas (depth-ordered along G).
      values: (G, C) per-gaussian channel rows.

    Returns:
      (T_out, acc_out). The alpha->weight conversion uses an exclusive
      cumulative product over the chunk axis; the channel accumulation is a
      (P, G) @ (G, C) matmul that XLA places on the MXU.
    """
    one_minus = 1.0 - alpha
    cp = jnp.cumprod(one_minus, axis=0)
    Tw_excl = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
    w = alpha * Tw_excl * T_in[None, :]
    acc_out = acc_in + jax.lax.dot_general(
        w, values, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    T_out = T_in * cp[-1]
    return T_out, acc_out


def pack_values(colors: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Stack the linear channel rows: [colors..., view_z, 1].

    The trailing 1 accumulates sum(alpha*T) = the correct out_alpha.
    Depth accumulates sum(z * alpha * T), the reference's unnormalized depth
    (forward.cu:378-379).
    """
    ones = jnp.ones_like(depth)
    return jnp.concatenate([colors, depth[:, None], ones[:, None]], axis=-1)


def finalize(T: jnp.ndarray, acc: jnp.ndarray, bg: jnp.ndarray):
    """Split the accumulator and apply background: C + T_final * bg.

    Mirrors forward.cu:397-407 (bg applied to color channels only; depth and
    alpha get none; the reference's OOB bg read on feature channels —
    SURVEY.md §2.4 — is fixed to zero background here unless bg covers them).

    Returns (channels (P, C), depth (P,), alpha (P,)).
    """
    n_chan = acc.shape[-1] - 2
    channels = acc[:, :n_chan] + T[:, None] * bg[None, :n_chan]
    return channels, acc[:, n_chan], acc[:, n_chan + 1]
