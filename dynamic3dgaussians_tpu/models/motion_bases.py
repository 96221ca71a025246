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


def solve_procrustes_batched(src: jnp.ndarray, dst: jnp.ndarray,
                             weights: jnp.ndarray):
    """Weighted SE(3) Kabsch solve, batched over leading axes.

    Args:
      src: (..., P, 3) canonical points.
      dst: (..., P, 3) target points.
      weights: (..., P) nonnegative weights.

    Returns (R (..., 3, 3), t (..., 3), wsum (...,)): the rigid transform
    minimizing sum_i w_i ||R src_i + t - dst_i||^2 (dyn_som.py
    solve_procrustes with enforce_se3=True, vectorized instead of the
    reference's per-cluster/per-frame python loop).
    """
    wsum = jnp.sum(weights, axis=-1)
    wn = weights / jnp.maximum(wsum, 1e-12)[..., None]
    mu_s = jnp.einsum("...p,...pi->...i", wn, src)
    mu_d = jnp.einsum("...p,...pi->...i", wn, dst)
    cov = jnp.einsum("...p,...pi,...pj->...ij", wn,
                     dst - mu_d[..., None, :], src - mu_s[..., None, :])
    U, _, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t, wsum


def velocity_direction_features(tracks_xyz: jnp.ndarray,
                                cano_t: int) -> jnp.ndarray:
    """Per-track clustering features: [canonical xyz, mean velocity dir].

    dyn_som.py samples initial basis centers by clustering velocity
    directions; position keeps spatially-coherent clusters.
    """
    v = tracks_xyz[:, 1:] - tracks_xyz[:, :-1]            # (N, F-1, 3)
    vm = jnp.mean(v, axis=1)
    vdir = vm / jnp.maximum(jnp.linalg.norm(vm, axis=-1, keepdims=True),
                            1e-8)
    return jnp.concatenate([tracks_xyz[:, cano_t], vdir], axis=-1)


def init_motion_params_with_procrustes(
        tracks_xyz: jnp.ndarray, num_bases: int, cano_t: int,
        key: jax.Array, visibles: jnp.ndarray | None = None,
        confidences: jnp.ndarray | None = None,
        min_mean_weight: float = 0.1, outlier_quantile: float = 0.95):
    """Motion-basis init from 3D tracks (dyn_som.py init_motion_params_...).

    Static-shape reformulation of the reference scratchpad: outliers are
    zero-WEIGHTED instead of filtered (95% distance quantile from the
    median center + never-visible tracks); clusters come from k-means on
    [canonical position, mean velocity direction]; every (basis, frame)
    weighted-Procrustes SE(3) solve runs in ONE batched SVD instead of
    nested python loops; frames whose weight mass is below
    `min_mean_weight * mean` inherit the previous frame's transform via a
    scan from cano_t outward (the reference's skip list). 6D rotations, so
    the reference's quaternion double-cover sign fix is unnecessary.

    Args:
      tracks_xyz: (N, F, 3) 3D tracks.
      visibles / confidences: optional (N, F) masks/weights.

    Returns:
      (bases {"rots" (K,F,6), "transls" (K,F,3)}, coefs (N, K),
       valid (N,) bool)
    """
    n, f, _ = tracks_xyz.shape
    vis = jnp.ones((n, f), bool) if visibles is None else visibles
    conf = jnp.ones((n, f)) if confidences is None else confidences

    cano = tracks_xyz[:, cano_t]                         # (N, 3)
    center = jnp.median(cano, axis=0)
    dists = jnp.linalg.norm(cano - center, axis=-1)
    thresh = jnp.quantile(dists, outlier_quantile)
    valid = (dists < thresh) & jnp.any(vis, axis=1)

    feats = velocity_direction_features(tracks_xyz, cano_t)
    centers, labels = kmeans(jnp.where(valid[:, None], feats,
                                       feats.mean(0)), num_bases, key)
    # coefs from distance to cluster centers in position space
    # (dyn_som.py: motion_coefs = 10 * exp(-dists2centers))
    d2c = jnp.linalg.norm(cano[:, None] - centers[None, :, :3], axis=-1)
    coefs = 10.0 * jnp.exp(-d2c)

    onehot = jax.nn.one_hot(labels, num_bases, dtype=jnp.float32)  # (N, K)
    onehot = onehot * valid[:, None].astype(jnp.float32)
    # per (track, frame) procrustes weight vs the canonical frame
    wf = (vis[:, cano_t:cano_t + 1] & vis).astype(jnp.float32) * \
        0.5 * (conf[:, cano_t:cano_t + 1] + conf)         # (N, F)
    W = jnp.einsum("nk,nf->kfn", onehot, wf)              # (K, F, N)

    src = jnp.broadcast_to(cano[None, None], (num_bases, f, n, 3))
    dst = jnp.broadcast_to(tracks_xyz.transpose(1, 0, 2)[None],
                           (num_bases, f, n, 3))
    R, t, wsum = solve_procrustes_batched(src, dst, W)    # (K,F,3,3),(K,F,3)

    rots6 = rotmat_to_cont_6d(R)                          # (K, F, 6)
    ident6 = rotmat_to_cont_6d(jnp.eye(3))
    # low-weight frames inherit the previous frame, scanning outward from
    # cano_t in both directions
    ok = wsum > min_mean_weight * jnp.maximum(
        jnp.mean(wsum, axis=1, keepdims=True), 1e-12)     # (K, F)

    def sweep(order):
        def step(carry, xs):
            r_prev, t_prev = carry
            r_i, t_i, ok_i = xs
            r = jnp.where(ok_i[:, None], r_i, r_prev)
            tt = jnp.where(ok_i[:, None], t_i, t_prev)
            return (r, tt), (r, tt)
        init = (jnp.broadcast_to(ident6, (num_bases, 6)),
                jnp.zeros((num_bases, 3)))
        xs = (rots6[:, order].transpose(1, 0, 2),
              t[:, order].transpose(1, 0, 2),
              ok[:, order].transpose(1, 0))
        _, (r_seq, t_seq) = jax.lax.scan(step, init, xs)
        return r_seq.transpose(1, 0, 2), t_seq.transpose(1, 0, 2), order

    fwd_order = jnp.arange(cano_t, f)
    bwd_order = jnp.arange(cano_t, -1, -1)
    r_fwd, t_fwd, _ = sweep(fwd_order)
    r_bwd, t_bwd, _ = sweep(bwd_order)
    rots_out = jnp.zeros((num_bases, f, 6)).at[:, fwd_order].set(r_fwd) \
        .at[:, bwd_order].set(r_bwd)
    t_out = jnp.zeros((num_bases, f, 3)).at[:, fwd_order].set(t_fwd) \
        .at[:, bwd_order].set(t_bwd)
    return {"rots": rots_out, "transls": t_out}, coefs, valid
