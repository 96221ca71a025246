"""Optical-flow priors: warp/composition math and flow-consistency losses.

Capability parity with the reference's flow-prior prototypes (SURVEY.md P14):
  * flow warping / composition over interpolated pseudo-views
    (ideaII.py:260-380): `compose_flows`, `accumulate_flows`,
    `flow_consistency_loss`
  * trimmed-MSE robust loss (ideaII.py:379-385): `trimmed_mse`
  * backward-warp of an image by a flow field (flow_sanity_check.py math):
    `warp_image`
  * DynIBaR-style flow npz readers (prior_utils.py:22-50): `load_flow_npz`
  * flow from scene motion: `render_flow` projects per-gaussian 3D motion to
    a 2D flow image by rendering the screen-space displacement as channels —
    the TPU-native way to get dense model flow in ONE render pass (the
    reference instead re-renders interpolated pseudo-views and runs RAFT).

The reference computes "real-pair" flow with torchvision RAFT-large; that is
an offline prior here — any `flow_fn(im0, im1) -> (H, W, 2)` can be plugged
in (RAFT via torch-cpu, or precomputed npz files).

All flows are (H, W, 2) in pixels, flow[y, x] = (dx, dy) mapping frame A
pixel (x, y) to frame B pixel (x + dx, y + dy).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _grid(h: int, w: int) -> jnp.ndarray:
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([px, py], axis=-1)                       # (H, W, 2)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) `img` at float pixel `coords` (..., 2) = (x, y).

    Out-of-bounds coordinates clamp to the border (the reference's
    grid_sample(padding_mode='border') behavior).
    """
    h, w = img.shape[:2]
    x = jnp.clip(coords[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def warp_image(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp: out[p] = img[p + flow[p]] (flow_sanity_check.py math)."""
    h, w = flow.shape[:2]
    return bilinear_sample(img, _grid(h, w) + flow)


def compose_flows(flow_ab: jnp.ndarray, flow_bc: jnp.ndarray) -> jnp.ndarray:
    """Compose a->b with b->c: f_ac(p) = f_ab(p) + f_bc(p + f_ab(p)).

    The accumulation step of the pseudo-view flow chain (ideaII.py:300-340).
    """
    h, w = flow_ab.shape[:2]
    warped_bc = bilinear_sample(flow_bc, _grid(h, w) + flow_ab)
    return flow_ab + warped_bc


def accumulate_flows(flows: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Chain a sequence of stepwise flows into one long-range flow."""
    total = flows[0]
    for f in flows[1:]:
        total = compose_flows(total, f)
    return total


def trimmed_mse(err: jnp.ndarray, trim: float = 0.1) -> jnp.ndarray:
    """Mean of squared errors excluding the `trim` fraction largest
    (ideaII.py:379-385 robust loss)."""
    se = (err * err).reshape(-1)
    k = int(se.shape[0] * (1.0 - trim))
    k = max(k, 1)
    neg_top, _ = jax.lax.top_k(-se, k)  # k smallest
    return jnp.mean(-neg_top)


def flow_consistency_loss(model_flow: jnp.ndarray, prior_flow: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          trim: float = 0.1) -> jnp.ndarray:
    """Trimmed MSE between model-induced flow and a flow prior
    (the ideaII.py:260-380 objective, with the RAFT pair flow as prior)."""
    err = jnp.linalg.norm(model_flow - prior_flow, axis=-1)
    if mask is not None:
        err = err * mask
    return trimmed_mse(err, trim)


def render_flow(cam, means_t0: jnp.ndarray, means_t1: jnp.ndarray,
                colors_dummy: jnp.ndarray, opacity: jnp.ndarray,
                scales: jnp.ndarray, rotations: jnp.ndarray,
                config=None, method: str = "auto") -> jnp.ndarray:
    """Dense model flow via ONE render: splat per-gaussian screen motion.

    Projects each gaussian at t0 and t1 with the SAME camera, composites the
    per-gaussian screen displacement as a 2-channel image at the t0
    configuration, and un-premultiplies by alpha. O(1) renders vs the
    reference's K interpolated pseudo-views + RAFT per pair.
    """
    from dynamic3dgaussians_tpu.ops.projection import project
    from dynamic3dgaussians_tpu.ops.rasterize import render

    p0 = project(means_t0, scales, rotations, cam)
    p1 = project(means_t1, scales, rotations, cam)
    disp = jnp.stack([p1.x2d - p0.x2d, p1.y2d - p0.y2d], axis=-1)
    out = render(cam, means_t0, colors_dummy, opacity, scales, rotations,
                 extra_channels=disp, config=config, method=method)
    return out.extra / jnp.maximum(out.alpha[..., None], 1e-6)


def load_flow_npz(flow_dir: str, frame_a: int, frame_b: int) -> np.ndarray:
    """DynIBaR-layout flow reader (prior_utils.py:22-50): files named
    {a:05d}_{'fwd'|'bwd'}.npz with key 'flow' (+ optional 'mask')."""
    kind = "fwd" if frame_b > frame_a else "bwd"
    path = os.path.join(flow_dir, f"{frame_a:05d}_{kind}.npz")
    data = np.load(path)
    flow = data["flow"].astype(np.float32)
    if flow.shape[0] == 2:  # channel-first on disk
        flow = flow.transpose(1, 2, 0)
    return flow


def make_torch_raft_flow_fn() -> Callable:
    """Optional RAFT-large flow via torchvision (reference ideaII.py:20-40).

    Returns flow_fn(im0, im1) -> (H, W, 2) numpy. Requires torchvision with
    pretrained weights on disk; raises a clear error otherwise (this
    zero-egress environment cannot download them).
    """
    try:
        import torch
        from torchvision.models.optical_flow import (Raft_Large_Weights,
                                                     raft_large)
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(f"torchvision RAFT unavailable: {e}")
    model = raft_large(weights=Raft_Large_Weights.DEFAULT).eval()

    def flow_fn(im0: np.ndarray, im1: np.ndarray) -> np.ndarray:
        t = lambda im: torch.from_numpy(
            np.asarray(im, np.float32)).permute(2, 0, 1)[None] * 2 - 1
        with torch.no_grad():
            pred = model(t(im0), t(im1))[-1][0]
        return pred.permute(1, 2, 0).numpy()

    return flow_fn
