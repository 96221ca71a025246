"""Quaternion and rotation utilities (pure JAX, fully vectorized).

Capability parity with the reference's quaternion helpers:
  - quat_mult            (reference helpers.py:126-133)
  - quat_to_rotmat       (reference external.py:61-78 `build_rotation`)
  - cont_6d_to_rotmat    (reference motion_utils.py 6D-continuous rotations)

Convention: quaternions are (w, x, y, z), arrays shaped (..., 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis (torch.nn.functional.normalize equiv).

    NaN-safe at q == 0 (capacity-padding rows): rsqrt of a clamped sum keeps
    both the value and the VJP finite, where sqrt-then-divide would emit
    inf * 0 = NaN cotangents.
    """
    sumsq = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(jnp.maximum(sumsq, eps * eps))


def quat_mult(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (..., 4) wxyz quaternions."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (inverse rotation for unit quats)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_rotmat(q: jnp.ndarray, normalized: bool = False) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Matches the standard form used by the reference (external.py:61-78).
    """
    if not normalized:
        q = normalize(q)
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    R = quat_to_rotmat(q)
    return jnp.einsum("...ij,...j->...i", R, v)


def cont_6d_to_rotmat(d6: jnp.ndarray) -> jnp.ndarray:
    """6D continuous rotation representation -> (..., 3, 3) rotation matrix.

    Gram–Schmidt on the two column vectors (Zhou et al., CVPR'19); capability
    parity with the motion-basis rotations of reference motion_utils.py.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]

    def unit(v):
        # NaN-safe at v == 0 (capacity-padding rows): rsqrt of a clamped
        # sum-of-squares keeps value AND cotangent finite; norm-then-divide
        # backprops sqrt'(0) = inf through the unselected max branch.
        sumsq = jnp.sum(v * v, axis=-1, keepdims=True)
        return v * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-24))

    b1 = unit(a1)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = unit(a2p)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_cont_6d(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of cont_6d_to_rotmat: take the first two columns."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz unit quaternion.

    Branch-free (jnp.where over the four Shepperd cases) so it vmaps/jits.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate quaternions from each diagonal-dominance case
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22
    sw = safe_sqrt(tw) * 2
    sx = safe_sqrt(tx) * 2
    sy = safe_sqrt(ty) * 2
    sz = safe_sqrt(tz) * 2
    qw = jnp.stack([0.25 * sw, (m21 - m12) / sw,
                    (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    qx = jnp.stack([(m21 - m12) / sx, 0.25 * sx,
                    (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    qy = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy,
                    0.25 * sy, (m12 + m21) / sy], axis=-1)
    qz = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz,
                    (m12 + m21) / sz, 0.25 * sz], axis=-1)

    cases = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(cases, axis=-1)[..., None]
    q = jnp.where(best == 0, qw,
                  jnp.where(best == 1, qx,
                            jnp.where(best == 2, qy, qz)))
    return normalize(q)
