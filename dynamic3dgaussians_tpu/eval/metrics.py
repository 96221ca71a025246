"""Evaluation metrics: masked PSNR/SSIM, PCK tracking, mask IoU, pose errors.

Capability parity with reference metrics.py (SURVEY.md §2.2 P5):
  * compute_psnr with optional mask            (metrics.py:14-43)
  * mSSIM — masked SSIM                        (metrics.py:334-424)
  * PCK — 2D keypoint transfer accuracy        (metrics.py:489-520)
  * MaskIoU                                    (metrics.py:523-552)
  * ATE / RPE translation+rotation pose errors (metrics.py:46-79)
  * depth abs-rel                              (metrics.py:131-213 simplified
    to direct depth comparison; the reference's point-cloud reprojection
    variant needs its specific dataset plumbing)

mLPIPS (metrics.py:427-486) requires pretrained AlexNet features; this
zero-egress build exposes `lpips` with a pluggable feature extractor and
raises a clear error if none is provided.

Images are channels-last (H, W, C) float in [0, 1].
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.ops.ssim import calc_ssim


def masked_psnr(pred, gt, mask: Optional[jnp.ndarray] = None,
                max_val: float = 1.0) -> jnp.ndarray:
    """PSNR over (optionally masked) pixels (metrics.py:14-43)."""
    se = (pred - gt) ** 2
    if mask is not None:
        m = mask[..., None] if mask.ndim == se.ndim - 1 else mask
        mse = jnp.sum(se * m) / jnp.maximum(jnp.sum(
            jnp.broadcast_to(m, se.shape)), 1.0)
    else:
        mse = jnp.mean(se)
    return 20.0 * jnp.log10(max_val / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def masked_ssim(pred, gt, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SSIM; with a mask, pixels outside are replaced by gt (so they score 1)
    and the mean is taken over masked pixels only (mSSIM semantics)."""
    if mask is None:
        return calc_ssim(pred, gt)
    m = mask[..., None].astype(pred.dtype)
    pred_m = pred * m + gt * (1 - m)
    # per-pixel ssim map mean over the mask
    from dynamic3dgaussians_tpu.ops import ssim as ssim_mod
    win = jnp.asarray(ssim_mod._gaussian_window(11, 1.5))
    blur = lambda x: ssim_mod._depthwise_blur(x, win)
    mu1, mu2 = blur(pred_m), blur(gt)
    s1 = blur(pred_m * pred_m) - mu1 ** 2
    s2 = blur(gt * gt) - mu2 ** 2
    s12 = blur(pred_m * gt) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    # mean over masked pixels and channels (m is (H, W, 1))
    n_chan = pred.shape[-1]
    return jnp.sum(smap * m) / jnp.maximum(jnp.sum(m) * n_chan, 1.0)


def pck(pred_kps, gt_kps, img_wh, ratio: float = 0.05,
        reduce: str = "mean") -> jnp.ndarray:
    """Percentage of correct keypoints @ ratio * max(W, H) (metrics.py:489-520).

    pred_kps/gt_kps: (..., K, 2) pixel coordinates.
    """
    thresh = ratio * max(img_wh)
    dist = jnp.linalg.norm(pred_kps - gt_kps, axis=-1)
    correct = (dist < thresh).astype(jnp.float32)
    return jnp.mean(correct) if reduce == "mean" else correct


def mask_iou(pred_mask, gt_mask, thresh: float = 0.5) -> jnp.ndarray:
    """Binary mask IoU (metrics.py:523-552)."""
    p = pred_mask > thresh
    g = gt_mask > thresh
    inter = jnp.sum(p & g)
    union = jnp.sum(p | g)
    return inter / jnp.maximum(union, 1)


def depth_abs_rel(pred_depth, gt_depth, mask=None) -> jnp.ndarray:
    """mean |pred - gt| / gt over valid (gt > 0) pixels."""
    valid = gt_depth > 1e-6
    if mask is not None:
        valid = valid & (mask > 0.5)
    rel = jnp.abs(pred_depth - gt_depth) / jnp.maximum(gt_depth, 1e-6)
    return jnp.sum(jnp.where(valid, rel, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


# ---------- pose metrics (numpy; offline eval) ----------

def ate(pred_c2w: np.ndarray, gt_c2w: np.ndarray) -> float:
    """Absolute trajectory error after Umeyama-free translation alignment
    (reference metrics.py:46-57 aligns by mean)."""
    p = pred_c2w[:, :3, 3]
    g = gt_c2w[:, :3, 3]
    p = p - p.mean(0)
    g = g - g.mean(0)
    return float(np.sqrt(((p - g) ** 2).sum(-1).mean()))


def rpe(pred_c2w: np.ndarray, gt_c2w: np.ndarray):
    """Relative pose errors (translation, rotation deg) between consecutive
    frames (reference metrics.py:60-79)."""
    def rel(seq):
        return np.linalg.inv(seq[:-1]) @ seq[1:]
    dp = rel(pred_c2w)
    dg = rel(gt_c2w)
    err = np.linalg.inv(dg) @ dp
    t_err = np.linalg.norm(err[:, :3, 3], axis=-1)
    cos = (np.trace(err[:, :3, :3], axis1=1, axis2=2) - 1) / 2
    r_err = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    return float(t_err.mean()), float(r_err.mean())


def lpips(pred, gt, feature_fn: Optional[Callable] = None) -> jnp.ndarray:
    """LPIPS-style perceptual distance given a feature extractor.

    The reference uses torchmetrics AlexNet LPIPS (metrics.py:427-486); this
    environment has no pretrained weights, so callers must supply
    `feature_fn(img) -> list of (H', W', C') feature maps`.
    """
    if feature_fn is None:
        raise ValueError(
            "lpips needs a feature_fn (no pretrained AlexNet in this "
            "environment); e.g. a flax CNN or DINOv2 wrapper")
    fp, fg = feature_fn(pred), feature_fn(gt)
    dists = []
    for a, b in zip(fp, fg):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        dists.append(jnp.mean(jnp.sum((a - b) ** 2, axis=-1)))
    return jnp.mean(jnp.stack(dists))


def unproject_image(depth: jnp.ndarray, k: jnp.ndarray,
                    c2w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Lift a (H, W) depth map to (H, W, 3) points (metrics.py:131-170).

    `depth` is view-space z; `k` the (3, 3) intrinsics; optional `c2w` maps
    the rays to world space.
    """
    h, w = depth.shape
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    x = (px - k[0, 2]) / k[0, 0] * depth
    y = (py - k[1, 2]) / k[1, 1] * depth
    pts = jnp.stack([x, y, depth], axis=-1)
    if c2w is not None:
        pts = pts @ c2w[:3, :3].T + c2w[:3, 3]
    return pts


def reproject_points(pts_world: jnp.ndarray, k: jnp.ndarray,
                     w2c: jnp.ndarray):
    """World points -> (pixel xy, view z) under another camera
    (metrics.py:172-195)."""
    pv = pts_world @ w2c[:3, :3].T + w2c[:3, 3]
    z = jnp.maximum(pv[..., 2], 1e-8)
    u = pv[..., 0] / z * k[0, 0] + k[0, 2]
    v = pv[..., 1] / z * k[1, 1] + k[1, 2]
    return jnp.stack([u, v], axis=-1), pv[..., 2]


def depth_abs_rel_reprojected(pred_depth: jnp.ndarray,
                              gt_depth: jnp.ndarray,
                              k: jnp.ndarray,
                              mask: Optional[jnp.ndarray] = None
                              ) -> jnp.ndarray:
    """Reference-style depth abs-rel through point-cloud reprojection
    (metrics.py:131-213): unproject the prediction, reproject into the SAME
    camera (identity relative pose for monocular eval) and compare the view-z
    against GT where GT is valid."""
    pts = unproject_image(pred_depth, k)
    _, z = reproject_points(pts, k, jnp.eye(4))
    return depth_abs_rel(z, gt_depth, mask)
