"""Dense 6-DOF tracking from persistent dynamic gaussians.

The headline capability of the reference ("Tracking by Persistent Dynamic
View Synthesis", README.md:1-11): because the SAME gaussians persist across
timesteps with per-timestep means/rotations, any query point tracks through
time by attaching it to its neighboring gaussians at t=0 and replaying their
rigid motion. The reference repo ships only the trajectory visualizer
(visualize_org.py:81-106) — its quantitative tracking eval was "to be
released" (README.md:74-78); this module implements the full pipeline:

  * attach: k nearest fg gaussians at t=0, weights exp(-d^2 / sigma^2),
    query offset expressed in each gaussian's LOCAL frame
  * replay: x_q(t) = sum_i w_i [ mu_i(t) + R_i(t) R_i(0)^T (x_q(0)-mu_i(0)) ]
    (per-gaussian rigid transforms; the same math as the rigidity loss)
  * rotation track: the weighted relative rotation of the attached gaussians
    (blended in quaternion space) -> full 6-DOF trajectories
  * 2D tracks by projecting through any camera; PCK-ready
    (eval.metrics.pck)

Pure JAX over the stacked params.npz layout; O(T * Q * k).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dynamic3dgaussians_tpu.ops import quat
from dynamic3dgaussians_tpu.ops.camera import Camera


def _as_stacked(stacked: Dict) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray]:
    means = jnp.asarray(stacked["means3D"])          # (T, N, 3)
    rots = jnp.asarray(stacked["unnorm_rotations"])  # (T, N, 4)
    seg = jnp.asarray(stacked["seg_colors"])
    if seg.ndim == 3:
        seg = seg[0]
    is_fg = seg[:, 0] > 0.5
    return means, quat.normalize(rots), is_fg


def attach_queries(means0: jnp.ndarray, rots0: jnp.ndarray,
                   is_fg: jnp.ndarray, queries: jnp.ndarray,
                   k: int = 8, sigma: Optional[float] = None):
    """Attach (Q, 3) query points to their k nearest fg gaussians at t=0.

    Returns (indices (Q, k), weights (Q, k), local offsets (Q, k, 3)).
    """
    d2 = jnp.sum((queries[:, None, :] - means0[None, :, :]) ** 2, -1)
    d2 = jnp.where(is_fg[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)                 # (Q, k)
    dk2 = -neg
    if sigma is None:
        # adaptive: the median neighbor distance per query
        sig2 = jnp.maximum(jnp.median(dk2, axis=1, keepdims=True), 1e-12)
    else:
        sig2 = jnp.float32(sigma) ** 2
    w = jnp.exp(-dk2 / (2.0 * sig2))
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    mu = means0[idx]                                  # (Q, k, 3)
    R0 = quat.quat_to_rotmat(rots0[idx], normalized=True)  # (Q, k, 3, 3)
    local = jnp.einsum("qkij,qki->qkj", R0, queries[:, None, :] - mu)
    return idx, w, local


def track_points_3d(stacked: Dict, queries: jnp.ndarray, k: int = 8,
                    sigma: Optional[float] = None) -> jnp.ndarray:
    """(T, Q, 3) world-space trajectories of (Q, 3) query points at t=0."""
    means, rots, is_fg = _as_stacked(stacked)
    idx, w, local = attach_queries(means[0], rots[0], is_fg, queries,
                                   k=k, sigma=sigma)

    def at_t(mu_t, rot_t):
        R = quat.quat_to_rotmat(rot_t[idx], normalized=True)
        cand = mu_t[idx] + jnp.einsum("qkij,qkj->qki", R, local)
        return jnp.sum(w[..., None] * cand, axis=1)

    return jax.vmap(at_t)(means, rots)


def track_rotations(stacked: Dict, queries: jnp.ndarray, k: int = 8,
                    sigma: Optional[float] = None) -> jnp.ndarray:
    """(T, Q, 4) unit quaternions: blended relative rotation per query
    (the 6-DOF part; relative quats as in visualize_org.py:91-106)."""
    means, rots, is_fg = _as_stacked(stacked)
    idx, w, _ = attach_queries(means[0], rots[0], is_fg, queries,
                               k=k, sigma=sigma)
    inv0 = quat.conjugate(rots[0][idx])               # (Q, k, 4)

    def at_t(rot_t):
        rel = quat.quat_mult(rot_t[idx], inv0)        # (Q, k, 4)
        # hemisphere-align to the top-weighted neighbor, then weighted mean
        ref = rel[:, :1, :]
        sign = jnp.where(jnp.sum(rel * ref, -1, keepdims=True) < 0, -1.0, 1.0)
        q = jnp.sum(w[..., None] * rel * sign, axis=1)
        return quat.normalize(q)

    return jax.vmap(at_t)(rots)


def project_tracks(tracks_3d: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """(T, Q, 3) world tracks -> (T, Q, 2) pixel tracks through `cam`."""
    V = cam.w2c
    p = tracks_3d @ V[:3, :3].T + V[:3, 3]
    z = jnp.maximum(p[..., 2], 1e-8)
    u = p[..., 0] / z * cam.fx + cam.cx
    v = p[..., 1] / z * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject_queries(px: jnp.ndarray, depth: jnp.ndarray,
                      alpha: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """(Q, 2) pixel queries + rendered depth/alpha at t=0 -> (Q, 3) world.

    Uses the un-premultiplied rendered depth at the query pixel (the
    tracking-from-pixels entry point; depth is sum z*alpha*T so divide by
    accumulated alpha)."""
    xi = jnp.clip(px[:, 0].astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(px[:, 1].astype(jnp.int32), 0, cam.height - 1)
    z = depth[yi, xi] / jnp.maximum(alpha[yi, xi], 1e-6)
    x = (px[:, 0] - cam.cx) / cam.fx * z
    y = (px[:, 1] - cam.cy) / cam.fy * z
    p_cam = jnp.stack([x, y, z], axis=-1)
    c2w = jnp.linalg.inv(cam.w2c)
    return p_cam @ c2w[:3, :3].T + c2w[:3, 3]


def track_pixels(stacked: Dict, cam: Camera, px_queries: jnp.ndarray,
                 k: int = 8, render_config=None,
                 method: str = "auto") -> jnp.ndarray:
    """End-to-end: (Q, 2) t=0 pixels -> (T, Q, 2) pixel tracks in `cam`.

    Renders t=0 once for the depth lift, then replays gaussian motion.
    Evaluate against GT keypoints with eval.metrics.pck.
    """
    from dynamic3dgaussians_tpu.viz.render import params_at_t, render_frame

    out = render_frame(params_at_t({k_: v for k_, v in stacked.items()}, 0),
                       cam, config=render_config, method=method)
    q3 = unproject_queries(px_queries, out.depth, out.alpha, cam)
    tracks = track_points_3d(stacked, q3, k=k)
    return project_tracks(tracks, cam)
