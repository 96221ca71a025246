"""SE(3) motion bases with per-gaussian coefficients (Shape-of-Motion style).

Capability parity with reference motion_utils.py (SURVEY.md §2.2 P4):
  * MotionBases.compute_transforms (motion_utils.py:47-58): per-basis
    per-frame (rots (K, F, 6), transls (K, F, 3)); blending per-gaussian
    coefficients then 6D-continuous -> rotation matrices.
  * coefficient init from feature clustering (motion_utils.py:57-162):
    spectral clustering of DINOv2 features in the reference; here k-means on
    features (scipy/sklearn-free) with coefs = 10 * exp(-dist_to_centers).

Functional pytree instead of an nn.Module: params = {"rots", "transls"}.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dynamic3dgaussians_tpu.ops.quat import cont_6d_to_rotmat, rotmat_to_cont_6d


def init_motion_bases(num_bases: int, num_frames: int,
                      key: jax.Array) -> Dict[str, jnp.ndarray]:
    """Identity-ish bases: rots near the identity 6D rep, zero translations."""
    ident6 = rotmat_to_cont_6d(jnp.eye(3))
    rots = jnp.tile(ident6, (num_bases, num_frames, 1))
    rots = rots + 0.01 * jax.random.normal(key, rots.shape)
    transls = jnp.zeros((num_bases, num_frames, 3))
    return {"rots": rots, "transls": transls}


def compute_transforms(bases: Dict[str, jnp.ndarray], ts: jnp.ndarray,
                       coefs: jnp.ndarray) -> jnp.ndarray:
    """Blend bases at frames `ts` with per-gaussian `coefs`.

    Args:
      bases: {"rots": (K, F, 6), "transls": (K, F, 3)}.
      ts: (B,) int frame indices.
      coefs: (G, K) per-gaussian basis coefficients.

    Returns:
      (G, B, 3, 4) rigid transforms (motion_utils.py:47-58 semantics:
      coefficients blend the 6D rotation representations *before* the
      Gram-Schmidt orthogonalization).
    """
    transls = jnp.einsum("gk,kbi->gbi", coefs, bases["transls"][:, ts])
    rots6 = jnp.einsum("gk,kbi->gbi", coefs, bases["rots"][:, ts])
    rotmats = cont_6d_to_rotmat(rots6)                     # (G, B, 3, 3)
    return jnp.concatenate([rotmats, transls[..., None]], axis=-1)


def apply_transforms(transforms: jnp.ndarray,
                     points: jnp.ndarray) -> jnp.ndarray:
    """(G, B, 3, 4) transforms x (G, 3) points -> (G, B, 3) moved points."""
    R = transforms[..., :3]
    t = transforms[..., 3]
    return jnp.einsum("gbij,gj->gbi", R, points) + t


def kmeans(x: jnp.ndarray, k: int, key: jax.Array, iters: int = 20
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain k-means (replaces the reference's sklearn SpectralClustering as
    the coefficient-init clustering; motion_utils.py:57-162)."""
    n = x.shape[0]
    init = jax.random.choice(key, n, (k,), replace=False)
    centers = x[init]

    def step(centers, _):
        d2 = jnp.sum((x[:, None] - centers[None]) ** 2, axis=-1)  # (N, K)
        assign = jnp.argmin(d2, axis=-1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)        # (N, K)
        counts = jnp.maximum(one_hot.sum(0), 1.0)
        new_centers = (one_hot.T @ x) / counts[:, None]
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    d2 = jnp.sum((x[:, None] - centers[None]) ** 2, axis=-1)
    return centers, jnp.argmin(d2, axis=-1)


def coefs_from_features(features: jnp.ndarray, num_bases: int,
                        key: jax.Array, scale: float = 10.0) -> jnp.ndarray:
    """coefs = softmax-ish 10*exp(-dist to cluster centers)
    (motion_utils.py:150-162 semantics)."""
    centers, _ = kmeans(features, num_bases, key)
    d = jnp.linalg.norm(features[:, None] - centers[None], axis=-1)
    return scale * jnp.exp(-d)
