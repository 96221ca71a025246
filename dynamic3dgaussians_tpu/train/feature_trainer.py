"""Feature-3DGS OO trainer: RGB + distilled semantic-feature field.

Capability parity with the reference's `revise_train.py` (SURVEY.md §3.6):

  training(...)                                   revise_train.py:36-174
    GaussianModel(sh_degree) + scene frames       :39-40
    per iter: render -> rgb / feature_map         :91-94
    loss = (1-l)L1 + l(1-SSIM) + 1.0 * L1(feature_map^, gt_feature)  :98-105
    optional CNN speedup decoder                  :42-53
    densify_and_prune / reset_opacity schedule    :129-140
    capture() checkpoints                         :148-150
    network-GUI serve loop                        :152-174

The reference imports `CNN_decoder` from a `models/` package that is MISSING
from its repo (dead import, SURVEY.md §2.3) — `FeatureDecoder` here is a
working implementation of that speedup head: gaussians carry a low-dim
semantic feature; a 1x1-conv stack decodes the rendered low-dim map up to
the GT feature dimensionality (Feature-3DGS "speedup" mode halves/quarters
the rasterized channel count).

TPU-first: the whole iteration (render + losses + Adam grads for gaussian
AND decoder params) is one jitted XLA program; rgb and the feature map
composite in a single render pass.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.models.gaussian_model import GaussianModel
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from dynamic3dgaussians_tpu.ops.ssim import calc_ssim
from dynamic3dgaussians_tpu.train import optim


def init_feature_decoder(key: jax.Array, in_dim: int, out_dim: int,
                         hidden: int = 64) -> Dict:
    """1x1-conv decoder weights (the reference's CNN_decoder speedup head)."""
    k1, k2 = jax.random.split(key)
    s1 = jnp.sqrt(2.0 / in_dim)
    s2 = jnp.sqrt(2.0 / hidden)
    return {"w1": s1 * jax.random.normal(k1, (in_dim, hidden)),
            "b1": jnp.zeros((hidden,)),
            "w2": s2 * jax.random.normal(k2, (hidden, out_dim)),
            "b2": jnp.zeros((out_dim,))}


def apply_feature_decoder(dec: Dict, fmap: jnp.ndarray) -> jnp.ndarray:
    """(H, W, in_dim) -> (H, W, out_dim); pure 1x1 convs = MXU matmuls."""
    h = jax.nn.relu(fmap @ dec["w1"] + dec["b1"])
    return h @ dec["w2"] + dec["b2"]


def make_feature_train_step(rcfg: RasterConfig, lambda_dssim: float = 0.2,
                            feature_weight: float = 1.0,
                            sh_degree: int = 0,
                            use_decoder: bool = False):
    """Jitted step: grads for gaussian params (+ decoder), probe stats."""

    @functools.partial(jax.jit, static_argnames=())
    def step_fn(params, variables, decoder, batch, active_sh_degree_arr):
        alive = variables["alive"]

        def loss_fn(p, dec, probe):
            from dynamic3dgaussians_tpu.ops import quat as Q
            sh = jnp.concatenate([p["features_dc"], p["features_rest"]], 1)
            # Progressive SH ramp (revise_train.py oneupSHdegree): zero the
            # coefficients above the active degree so the ramp is real while
            # the jitted program keeps a single static shape. Coefficient k
            # belongs to degree floor(sqrt(k)).
            k_idx = jnp.arange(sh.shape[1])
            coeff_deg = jnp.floor(jnp.sqrt(k_idx.astype(jnp.float32)))
            live_coeff = coeff_deg <= active_sh_degree_arr.astype(jnp.float32)
            sh = sh * live_coeff[None, :, None]
            out = render(
                batch["camera"], p["means3D"],
                jnp.zeros_like(p["means3D"]),
                jnp.where(alive, jax.nn.sigmoid(
                    p["logit_opacities"][:, 0]), 0.0),
                jnp.exp(p["log_scales"]),
                Q.normalize(p["unnorm_rotations"]),
                sh=sh, sh_degree=sh_degree,
                extra_channels=p.get("semantic_feature"),
                mean2d_probe_ndc=probe, config=rcfg)
            im = jnp.clip(out.rgb, 0.0, 1.0)
            l1 = jnp.mean(jnp.abs(im - batch["im"]))
            ssim = calc_ssim(im, batch["im"])
            total = (1 - lambda_dssim) * l1 + lambda_dssim * (1 - ssim)
            aux = {"l1": l1, "ssim": ssim, "radii": out.radii}
            if out.extra is not None and "gt_feature" in batch:
                fmap = out.extra
                if use_decoder:
                    fmap = apply_feature_decoder(dec, fmap)
                gt = batch["gt_feature"]
                if fmap.shape[:2] != gt.shape[:2]:
                    fmap = jax.image.resize(
                        fmap, gt.shape[:2] + fmap.shape[2:], "bilinear")
                floss = jnp.mean(jnp.abs(fmap - gt))
                total = total + feature_weight * floss
                aux["feature_l1"] = floss
            return total, aux

        probe = jnp.zeros((alive.shape[0], 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(params, decoder, probe)
        return loss, aux, grads[0], grads[1], grads[2]

    return step_fn


def training(frames: List[Dict], model: GaussianModel,
             iterations: int = 7000,
             rcfg: Optional[RasterConfig] = None,
             gt_feature_dim: Optional[int] = None,
             lambda_dssim: float = 0.2,
             feature_weight: float = 1.0,
             densify_from: int = 500, densify_until: int = 5000,
             densify_every: int = 100, opacity_reset_every: int = 3000,
             sh_increase_every: int = 1000,
             checkpoint_iterations: Optional[List[int]] = None,
             checkpoint_cb: Optional[Callable] = None,
             gui=None, seed: int = 0,
             report_cb: Optional[Callable] = None):
    """OO feature-field training loop (revise_train.py:36-174 semantics).

    Args:
      frames: list of {camera, im (H,W,3), gt_feature (h,w,F)?} datapoints.
      model: a GaussianModel with create_from_pcd + training_setup done.
      gt_feature_dim: if set and > model.semantic_dim, train the speedup
        decoder mapping rendered features up to this dimensionality.
      gui: optional viz.network_gui.NetworkGUI to serve during training.

    Returns (model, decoder_params).
    """
    rcfg = rcfg or RasterConfig()
    rng = np.random.RandomState(seed)
    use_decoder = bool(gt_feature_dim and model.semantic_dim
                       and gt_feature_dim != model.semantic_dim)
    decoder = (init_feature_decoder(jax.random.PRNGKey(seed),
                                    model.semantic_dim, gt_feature_dim)
               if use_decoder else
               {"w1": jnp.zeros((1, 1)), "b1": jnp.zeros((1,)),
                "w2": jnp.zeros((1, 1)), "b2": jnp.zeros((1,))})
    dec_opt = optim.init(decoder)
    step_fn = make_feature_train_step(
        rcfg, lambda_dssim, feature_weight,
        sh_degree=model.max_sh_degree, use_decoder=use_decoder)

    todo: List[int] = []
    for it in range(1, iterations + 1):
        if it % sh_increase_every == 0:
            model.oneupSHdegree()
        if not todo:
            todo = list(rng.permutation(len(frames)))
        batch = frames[todo.pop()]
        loss, aux, gp, gdec, gprobe = step_fn(
            model.params, model.variables, decoder, batch,
            jnp.int32(model.active_sh_degree))
        model.add_densification_stats(gprobe, aux["radii"])
        model.step(gp)
        if use_decoder:
            decoder, dec_opt = optim.step(
                decoder, gdec, dec_opt,
                {k: jnp.float32(1e-3) for k in decoder})

        if densify_from <= it <= densify_until and it % densify_every == 0:
            model.densify_and_prune(it)
        if it % opacity_reset_every == 0 and it <= densify_until:
            model.reset_opacity()
        if checkpoint_iterations and it in checkpoint_iterations \
                and checkpoint_cb:
            checkpoint_cb(it, model.capture(), jax.tree.map(np.asarray,
                                                            decoder))
        if report_cb and it % 100 == 0:
            report_cb(it, {k: float(v) for k, v in aux.items()
                           if jnp.ndim(v) == 0}, float(loss))
        if gui is not None:
            _serve_gui(gui, model, rcfg, training_paused=False)
    return model, decoder


def _serve_gui(gui, model: GaussianModel, rcfg: RasterConfig,
               training_paused: bool):
    """One non-blocking network-GUI poll (revise_train.py:152-174)."""
    from dynamic3dgaussians_tpu.utils.image_utils import render_net_image

    def render_fn(cam, render_mode, scaling_modifier):
        out = render(cam, **model.render_args(), config=rcfg,
                     scale_modifier=scaling_modifier)
        return np.asarray(render_net_image(out, render_mode))

    gui.poll(render_fn,
             metrics_fn=lambda: {"num_points": model.num_points})
