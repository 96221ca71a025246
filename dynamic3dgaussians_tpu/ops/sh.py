"""Spherical-harmonics color evaluation, degrees 0-3 (pure JAX).

Capability parity with the reference SH path:
  - CUDA `computeColorFromSH` (…/cuda_rasterizer/forward.cu:20-71) and the
    python fallback `eval_sh` (reference utils/sh_utils.py:60-117).
  - RGB<->SH deg-0 conversion (reference helpers.py:8-14).

The reference clamps the final color at 0 and adds 0.5; with JAX autodiff the
`maximum` op replaces the reference's manual `clamped` bookkeeping.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] -> DC SH coefficient (helpers.py:9-10)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """DC SH coefficient -> RGB (helpers.py:13-14)."""
    return sh * C0 + 0.5


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors.

    Args:
      deg: SH degree in [0, 3] (static).
      sh: (..., K, 3) coefficients with K >= (deg+1)^2.
      dirs: (..., 3) unit view directions (gaussian center - camera center).

    Returns:
      (..., 3) raw SH value (no +0.5 offset, matching utils/sh_utils.py).
    """
    assert 0 <= deg <= 3
    result = C0 * sh[..., 0, :]
    if deg >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (result
                  - C1 * y * sh[..., 1, :]
                  + C1 * z * sh[..., 2, :]
                  - C1 * x * sh[..., 3, :])
        if deg >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + C2[0] * xy * sh[..., 4, :]
                      + C2[1] * yz * sh[..., 5, :]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                      + C2[3] * xz * sh[..., 7, :]
                      + C2[4] * (xx - yy) * sh[..., 8, :])
            if deg >= 3:
                result = (result
                          + C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
                          + C3[1] * xy * z * sh[..., 10, :]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
                          + C3[5] * z * (xx - yy) * sh[..., 14, :]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :])
    return result


def sh_to_color(deg: int, sh: jnp.ndarray, means3d: jnp.ndarray,
                cam_center: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB exactly as the rasterizer does (forward.cu:20-71).

    Args:
      deg: active SH degree (static).
      sh: (N, K, 3) coefficients.
      means3d: (N, 3) gaussian centers (world).
      cam_center: (3,) camera center (world).
    """
    dirs = means3d - cam_center[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)
