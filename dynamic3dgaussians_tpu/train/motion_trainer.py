"""Motion-basis training: whole-sequence optimization via SE(3) bases.

Capability parity with the reference's motion-bases path (SURVEY.md §2.3
dyn_train.py): instead of re-optimizing gaussian positions per timestep, a
canonical gaussian set is driven through blended SE(3) basis transforms
(`bases.compute_transforms` -> per-frame positions einsum, dyn_train.py:
426-431), with per-gaussian coefficients initialized by feature clustering
(dyn_train.py:392-403). Background gaussians (label == 0) stay static via
the grad-gating `label` mechanism (dyn_train.py:279, SURVEY.md §2.4).

One jitted step optimizes {canonical params, bases, coefs} jointly from a
randomly sampled (frame, camera) pair.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.models import gaussians as G
from dynamic3dgaussians_tpu.models import motion_bases as MB
from dynamic3dgaussians_tpu.ops import quat
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from dynamic3dgaussians_tpu.train import losses as L
from dynamic3dgaussians_tpu.train import optim
from dynamic3dgaussians_tpu.train.config import TrainConfig
from dynamic3dgaussians_tpu.train.trainer import raster_config

MOTION_LRS = {"rots": 1.6e-4, "transls": 1.6e-4, "coefs": 1e-2}


def posed_gaussians(params: Dict, t: jnp.ndarray) -> Dict:
    """Canonical gaussians posed at frame t via the motion bases.

    Foreground (label > 0.5) gaussians move; background stays canonical.
    """
    tf = MB.compute_transforms(
        {"rots": params["motion_rots"], "transls": params["motion_transls"]},
        jnp.atleast_1d(t), params["motion_coefs"])[:, 0]     # (G, 3, 4)
    moved = jnp.einsum("gij,gj->gi", tf[..., :3],
                       params["means3D"]) + tf[..., 3]
    q_delta = quat.rotmat_to_quat(tf[..., :3])
    rot = quat.normalize(params["unnorm_rotations"])
    moved_rot = quat.quat_mult(q_delta, rot)
    is_fg = (params["label"] > 0.5)[:, None]
    return {
        "means3D": jnp.where(is_fg, moved, params["means3D"]),
        "rotations": jnp.where(is_fg, moved_rot, rot),
    }


def make_motion_step(cfg: TrainConfig, rcfg: RasterConfig):
    def loss_fn(params, batch, variables, t):
        posed = posed_gaussians(params, t)
        alive = variables["alive"]
        opacity = jnp.where(alive, jax.nn.sigmoid(
            params["logit_opacities"][:, 0]), 0.0)
        out = render(batch["camera"], posed["means3D"],
                     params["rgb_colors"], opacity,
                     jnp.exp(params["log_scales"]), posed["rotations"],
                     extra_channels=params["seg_colors"], config=rcfg)
        losses = {"im": L.image_loss(out.rgb, batch["im"]),
                  "seg": L.image_loss(out.extra, batch["seg"])}
        if "gt_depth" in batch:
            losses["depth"] = L.depth_pearson_loss(out.depth,
                                                   batch["gt_depth"])
        w = cfg.loss_weights
        total = sum(jnp.float32(w.get(k, 1.0)) * v for k, v in losses.items())
        return total, {"losses": losses, "psnr": L.psnr(
            jnp.clip(out.rgb, 0, 1), batch["im"])}

    @jax.jit
    def step(params, opt_state, variables, batch, t, lrs):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, variables, t)
        alive = variables["alive"]
        grads = {k: (v if k in G.CAMERA_KEYS or k.startswith("motion_")
                     else jnp.where(alive.reshape(
                         (-1,) + (1,) * (v.ndim - 1)), v, 0.0))
                 for k, v in grads.items()}
        params, opt_state = optim.step(params, grads, opt_state, lrs)
        return params, opt_state, {"loss": loss, "psnr": aux["psnr"]}

    return step


def train_motion(dataset: List[List[Dict]], cfg: TrainConfig,
                 pt_cld: np.ndarray, w2c_stack: np.ndarray,
                 num_bases: int = 10, num_iters: int = 2000,
                 features: Optional[np.ndarray] = None,
                 tracks_3d: Optional[np.ndarray] = None,
                 cano_t: int = 0,
                 callbacks: Optional[Dict] = None):
    """Whole-sequence motion-basis optimization (dyn_train.py capability).

    Args:
      dataset: dataset[t] = camera datapoints per frame.
      features: optional (N, F) per-gaussian features for coefficient init
        (DINOv2 in the reference); falls back to positions.
      tracks_3d: optional (M, T, 3) 3D tracks — switches initialization to
        the Shape-of-Motion weighted-Procrustes solve (dyn_som.py):
        bases start at each cluster's rigid SE(3) trajectory instead of
        identity, and coefficients come from distance to the velocity
        clusters (mapped to the gaussians by nearest canonical track).
    """
    callbacks = callbacks or {}
    num_frames = len(dataset)
    rng = np.random.RandomState(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    params, variables = G.init_params(
        pt_cld, w2c_stack,
        capacity=cfg.capacity or G.round_capacity(pt_cld.shape[0]))
    cap = variables["alive"].shape[0]
    params["label"] = jnp.pad(
        jnp.asarray(pt_cld[:, 6] > 0.5, jnp.float32),
        (0, cap - pt_cld.shape[0]))

    k1, k2 = jax.random.split(key)
    if tracks_3d is not None:
        assert tracks_3d.shape[1] == num_frames, (
            f"tracks have {tracks_3d.shape[1]} frames, dataset {num_frames}")
        bases, track_coefs, _ = MB.init_motion_params_with_procrustes(
            jnp.asarray(tracks_3d, jnp.float32), num_bases, cano_t, k1)
        # map per-track coefs to gaussians via the nearest canonical track
        pts = jnp.asarray(pt_cld[:, :3], jnp.float32)
        t_cano = jnp.asarray(tracks_3d[:, cano_t], jnp.float32)
        d2 = jnp.sum((pts[:, None] - t_cano[None]) ** 2, axis=-1)
        coefs = track_coefs[jnp.argmin(d2, axis=-1)]
    else:
        bases = MB.init_motion_bases(num_bases, num_frames, k1)
        feats = jnp.asarray(
            features if features is not None else pt_cld[:, :3], jnp.float32)
        coefs = MB.coefs_from_features(feats, num_bases, k2)
    coefs = jnp.pad(coefs, ((0, cap - coefs.shape[0]), (0, 0)))
    params["motion_rots"] = bases["rots"]
    params["motion_transls"] = bases["transls"]
    params["motion_coefs"] = coefs

    opt_state = optim.init(params)
    lrs = {}
    for k in params:
        if k == "motion_rots":
            lrs[k] = jnp.float32(MOTION_LRS["rots"])
        elif k == "motion_transls":
            lrs[k] = jnp.float32(MOTION_LRS["transls"])
        elif k == "motion_coefs":
            lrs[k] = jnp.float32(MOTION_LRS["coefs"])
        elif k == "means3D":
            lrs[k] = jnp.float32(cfg.lrs["means3D"]
                                 * float(variables["scene_radius"]))
        else:
            lrs[k] = jnp.float32(cfg.lrs.get(k, 0.0))

    step = make_motion_step(cfg, raster_config(cfg))
    for i in range(num_iters):
        t = rng.randint(num_frames)
        batch = dataset[t][rng.randint(len(dataset[t]))]
        params, opt_state, metrics = step(params, opt_state, variables,
                                          batch, jnp.int32(t), lrs)
        if "on_step" in callbacks and i % cfg.report_every == 0:
            callbacks["on_step"](0, i, metrics)
    return params, variables


def reverse_window_schedule(num_frames: int, step: int = 3,
                            window: int = 6):
    """The dyn_train.py frame schedule (dyn_train.py:422-450): anchors walk
    the sequence in reverse with stride `step`; each anchor trains on the
    window of frames [anchor, anchor + window) clipped to the sequence.

    Yields (anchor_frame, [window frames])."""
    for anchor in range(num_frames - 1, -1, -step):
        frames = [f for f in range(anchor, min(anchor + window, num_frames))]
        yield anchor, frames


def train_motion_windowed(dataset, cfg: TrainConfig, pt_cld, w2c_stack,
                          num_bases: int = 10,
                          iters_per_window: int = 500,
                          window_step: int = 3, window: int = 6,
                          features=None, callbacks=None):
    """Windowed reverse-schedule variant of train_motion (dyn_train.py's
    training order: later frames first, each window jointly optimized)."""
    callbacks = callbacks or {}
    rng = np.random.RandomState(cfg.seed)
    num_frames = len(dataset)
    # reuse train_motion's initialization by running it for 0 iterations
    params, variables = train_motion(dataset, cfg, pt_cld, w2c_stack,
                                     num_bases=num_bases, num_iters=0,
                                     features=features)
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(MOTION_LRS.get(k.replace("motion_", ""),
                                         cfg.lrs.get(k, 0.0)))
           for k in params}
    lrs["means3D"] = jnp.float32(cfg.lrs["means3D"]
                                 * float(variables["scene_radius"]))
    step_fn = make_motion_step(cfg, raster_config(cfg))
    it = 0
    for anchor, frames in reverse_window_schedule(num_frames, window_step,
                                                  window):
        for _ in range(iters_per_window):
            t = frames[rng.randint(len(frames))]
            batch = dataset[t][rng.randint(len(dataset[t]))]
            params, opt_state, metrics = step_fn(params, opt_state,
                                                 variables, batch,
                                                 jnp.int32(t), lrs)
            if "on_step" in callbacks and it % cfg.report_every == 0:
                callbacks["on_step"](anchor, it, metrics)
            it += 1
    return params, variables
