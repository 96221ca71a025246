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


def spectral_cluster(features: jnp.ndarray, k: int, key: jax.Array,
                     sample: int = 2048, kmeans_iters: int = 25
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spectral clustering on cosine similarity (motion_utils.py:57-162).

    The reference runs sklearn SpectralClustering(K=49) on the cosine
    similarity of per-gaussian DINOv2 features; this is the same pipeline in
    JAX: normalized graph Laplacian of the (sampled) cosine-affinity matrix,
    top-k eigenvectors, k-means in the spectral embedding, then assignment of
    ALL points to the nearest spectral center through the Nystrom-style
    feature->embedding map.

    Returns (centers (k, D) in FEATURE space, labels (N,)). Centers in
    feature space keep `coefs_from_features`-style distance maps usable.
    """
    n = features.shape[0]
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-8)
    if n > sample:
        idx = jax.random.choice(key, n, (sample,), replace=False)
        fs = f[idx]
    else:
        fs = f
    m = fs.shape[0]
    # cosine affinity shifted to [0, 1]
    a = (fs @ fs.T + 1.0) * 0.5
    d = jnp.sum(a, axis=-1)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-8))
    lap = jnp.eye(m) - dinv[:, None] * a * dinv[None, :]
    eigval, eigvec = jnp.linalg.eigh(lap)          # ascending
    emb = eigvec[:, :k]                            # smallest-k eigenvectors
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                            1e-8)
    centers_emb, labels_s = kmeans(emb, k, key, iters=kmeans_iters)
    # map every (possibly unsampled) point into the embedding via its
    # affinity to the sampled set (Nystrom extension), then assign
    a_all = (f @ fs.T + 1.0) * 0.5                 # (N, m)
    emb_all = a_all @ emb / jnp.maximum(
        jnp.sum(a_all, axis=-1, keepdims=True), 1e-8)
    emb_all = emb_all / jnp.maximum(
        jnp.linalg.norm(emb_all, axis=-1, keepdims=True), 1e-8)
    d2 = jnp.sum((emb_all[:, None] - centers_emb[None]) ** 2, axis=-1)
    labels = jnp.argmin(d2, axis=-1)
    one_hot = jax.nn.one_hot(labels, k, dtype=f.dtype)
    counts = jnp.maximum(one_hot.sum(0), 1.0)
    centers_feat = (one_hot.T @ features) / counts[:, None]
    return centers_feat, labels


def coefs_from_feature_clusters(features: jnp.ndarray, num_bases: int,
                                key: jax.Array, scale: float = 10.0,
                                method: str = "spectral") -> jnp.ndarray:
    """Reference feature_bases coefficient init (motion_utils.py:150-162):
    cluster features (spectral or k-means), coefs = scale*exp(-dist2centers).
    """
    if method == "spectral":
        centers, _ = spectral_cluster(features, num_bases, key)
    else:
        centers, _ = kmeans(features, num_bases, key)
    d = jnp.linalg.norm(features[:, None] - centers[None], axis=-1)
    return scale * jnp.exp(-d)
