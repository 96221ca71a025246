"""Ego + static dual-dataset trainer (the reference's train.py ego variant).

Capability parity with /root/reference/train.py:160-241 + 392-443:

  * per step, ONE random ego-camera frame drives the primary image loss,
    masked by the composed (triangular | antimask) validity mask with the
    reference's rot90 compositing (train.py:167-178);
  * EVERY static (GoPro) frame is re-rendered each step as a held-out loss:
    mean masked image loss + 0.01 * L1 depth loss (train.py:186-241
    held_stat_loss);
  * per-camera affine color correction exp(cam_m)*im + cam_c on both paths
    (train.py:161);
  * t > 0 adds the standard physics losses through the canonical machinery.

TPU-first shape: the static dataset is STACKED once and vmapped inside the
jitted step (the reference python-loops renders per static camera every
iteration); the mask composition and rot90 happen on device as part of the
same XLA program, so one step = one program launch.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.models import gaussians as G
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from dynamic3dgaussians_tpu.train import densify as densify_mod
from dynamic3dgaussians_tpu.train import losses as L
from dynamic3dgaussians_tpu.train import optim
from dynamic3dgaussians_tpu.train.config import TrainConfig
from dynamic3dgaussians_tpu.train.trainer import (
    densify_with_growth, initialize_per_timestep,
    initialize_post_first_timestep, params_to_cpu, raster_config)


def _render_rgb_depth(params, probe, cam, variables, rcfg):
    act = G.activated(params, variables["alive"])
    out = render(cam, act["means3d"], act["colors"], act["opacity"],
                 act["scales"], act["rotations"],
                 extra_channels=params["seg_colors"],
                 mean2d_probe_ndc=probe, config=rcfg)
    return out


def _masked_frame_loss(out, params, batch, *, rot90: bool):
    """Masked image loss of one frame (train.py:167-184 semantics).

    batch: {im (H,W,3), cam_id (), mask (H,W) in {0,1}}; `rot90` statically
    selects the ego antimask path where the rendered image is rotated by -90
    degrees before masking against the (already-rotated) GT.
    """
    im = L.apply_cam_correction(out.rgb, params["cam_m"][batch["cam_id"]],
                                params["cam_c"][batch["cam_id"]])
    if rot90:
        # torch.rot90(im, k=-1, dims=(1,2)) on CHW == jnp.rot90(hwc, k=-1)
        # on the spatial axes.
        im = jnp.rot90(im, k=-1, axes=(0, 1))
    return L.masked_image_loss(im, batch["im"], batch["mask"])


def make_ego_step(cfg: TrainConfig, rcfg: RasterConfig, *,
                  rot90_ego: bool, stat_depth_weight: float = 0.01):
    """Build the jitted dual-dataset step."""

    def loss_fn(params, probe, ego_batch, stat_batch, variables, is_initial):
        losses = {}
        out = _render_rgb_depth(params, probe, ego_batch["camera"],
                                variables, rcfg)
        losses["im"] = _masked_frame_loss(out, params, ego_batch,
                                          rot90=rot90_ego)

        if stat_batch is not None:
            def one_stat(b):
                o = _render_rgb_depth(params, probe, b["camera"], variables,
                                      rcfg)
                img_l = _masked_frame_loss(o, params, b, rot90=False)
                d_l = L.depth_l1_loss(o.depth, b["gt_depth"], alpha=o.alpha,
                                      mask=b["mask"])
                return img_l, d_l
            img_ls, d_ls = jax.vmap(one_stat)(stat_batch)
            losses["stat_im"] = jnp.mean(img_ls)
            losses["depth"] = jnp.mean(d_ls)

        if not is_initial:
            act = G.activated(params, variables["alive"])
            is_fg = params["seg_colors"][:, 0] > 0.5
            losses.update(L.physics_losses(
                act["means3d"], act["rotations"], params["rgb_colors"],
                variables, is_fg, variables["alive"]))

        # stat_im defaults to the im weight; the reference folds its 0.01
        # depth factor inside held_stat_loss — here it is an explicit weight.
        w = dict(cfg.loss_weights)
        w.setdefault("stat_im", w.get("im", 1.0))
        w["depth"] = stat_depth_weight
        total = sum(jnp.float32(w.get(k, 0.0)) * v
                    for k, v in losses.items())
        aux = {"losses": losses, "radii": out.radii,
               "psnr": L.psnr(jnp.clip(out.rgb, 0, 1), ego_batch["im"])
               if not rot90_ego else jnp.float32(0.0)}
        return total, aux

    @functools.partial(jax.jit, static_argnames=("is_initial", "has_stat"))
    def step(params, opt_state, variables, ego_batch, stat_batch, lrs,
             is_initial: bool, has_stat: bool):
        probe = jnp.zeros((variables["alive"].shape[0], 2), jnp.float32)
        (loss, aux), (gp, gprobe) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                params, probe, ego_batch,
                stat_batch if has_stat else None, variables, is_initial)
        alive = variables["alive"]
        gp = {k: (v if k in G.CAMERA_KEYS else jnp.where(
            alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0))
            for k, v in gp.items()}
        new_params, new_opt = optim.step(params, gp, opt_state, lrs)
        new_vars = densify_mod.accumulate_stats(variables, gprobe,
                                                aux["radii"])
        metrics = {"loss": loss, **{f"loss_{k}": v
                                    for k, v in aux["losses"].items()}}
        return new_params, new_opt, new_vars, metrics

    return step


def _stack_stat(stat_frames: List[Dict]):
    """Stack the static dataset once for the vmapped held-out loss; frames
    must share H, W (reference cmu_bike GoPros do)."""
    if not stat_frames:
        return None
    filled = []
    for f in stat_frames:
        f = dict(f)
        h, w = f["im"].shape[:2]
        f.setdefault("mask", jnp.ones((h, w), jnp.float32))
        f.setdefault("gt_depth", jnp.zeros((h, w), jnp.float32))
        filled.append(f)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *filled)


def train_ego(ego_dataset, stat_dataset, cfg: TrainConfig,
              pt_cld: np.ndarray, w2c_stack: np.ndarray, *,
              rot90_ego: bool = False, stat_depth_weight: float = 0.01,
              callbacks: Optional[Dict] = None):
    """Dual-dataset dynamic optimization (train.py:392-443 skeleton).

    Args:
      ego_dataset: ego_dataset[t] -> list of ego frames {camera, im, cam_id,
        mask?}; a callable works for lazy loading.
      stat_dataset: stat_dataset[t] -> list of static frames {camera, im,
        cam_id, mask?, gt_depth?} — ALL are rendered every step (held-out
        loss). Empty list disables the static path.
      rot90_ego: apply the reference's rot90 antimask compositing to the
        rendered ego image (requires pre-rotated GT ego frames).

    Returns (output_params, params, variables).
    """
    callbacks = callbacks or {}
    rng = np.random.RandomState(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    params, variables = G.init_params(
        pt_cld, w2c_stack,
        capacity=cfg.capacity or G.round_capacity(pt_cld.shape[0] * 4),
        semantic_dim=cfg.semantic_dim)
    opt_state = optim.init(params)
    rcfg = raster_config(cfg)
    step = make_ego_step(cfg, rcfg, rot90_ego=rot90_ego,
                         stat_depth_weight=stat_depth_weight)
    densify_jit = jax.jit(densify_mod.densify)

    get_ego = ego_dataset if callable(ego_dataset) \
        else ego_dataset.__getitem__
    get_stat = stat_dataset if callable(stat_dataset) \
        else stat_dataset.__getitem__

    def lr_tree(frozen: bool):
        lrs = {}
        for k in params:
            base = cfg.lrs.get(k, 0.0)
            if k == "means3D":
                base = base * float(variables["scene_radius"])
            if frozen and k in cfg.freeze_after_t0:
                base = 0.0
            lrs[k] = jnp.float32(base)
        return lrs

    output_params = []
    for t in range(cfg.num_timesteps):
        is_initial = t == 0
        ego_t = get_ego(t)
        stat_t = _stack_stat(get_stat(t))
        if not is_initial:
            params, variables, opt_state = initialize_per_timestep(
                params, variables, opt_state)
        num_iters = (cfg.iters_first_timestep if is_initial
                     else cfg.iters_per_timestep)
        lrs = lr_tree(frozen=not is_initial)
        todo: List[int] = []
        for i in range(num_iters):
            if not todo:
                todo = list(rng.permutation(len(ego_t)))
            ego_batch = ego_t[todo.pop()]
            if "mask" not in ego_batch:
                ego_batch = dict(ego_batch)
                h, w = ego_batch["im"].shape[:2]
                ego_batch["mask"] = jnp.ones((h, w), jnp.float32)
            params, opt_state, variables, metrics = step(
                params, opt_state, variables, ego_batch,
                stat_t if stat_t is not None else ego_batch,
                lrs, is_initial, stat_t is not None)
            if is_initial and cfg.densify_start <= i <= cfg.densify_end \
                    and i % cfg.densify_every == 0:
                key, sub = jax.random.split(key)
                params, variables, opt_state, dstats = densify_with_growth(
                    densify_jit, params, variables, opt_state, i, sub, cfg)
                if "on_densify" in callbacks:
                    callbacks["on_densify"](t, i, dstats)
            if "on_step" in callbacks and i % cfg.report_every == 0:
                callbacks["on_step"](t, i, metrics)
        if is_initial:
            params, variables, opt_state, _ = G.compact_with_optimizer(
                params, variables, opt_state)
            params, variables, opt_state = initialize_post_first_timestep(
                params, variables, cfg, opt_state)
        output_params.append(params_to_cpu(params, variables, is_initial))
    return output_params, params, variables
