"""OO GaussianModel: the 3DGS-style API surface (reference scene/gaussian_model.py).

A thin object wrapper over the functional core (models.gaussians,
train.optim, train.densify) providing the reference's class API so users of
the OO stack (SURVEY.md §2.2 P6) find what they expect:

  * activation properties get_xyz/get_scaling/get_rotation/get_opacity/
    get_features/get_semantic_feature        (gaussian_model.py:110-143)
  * create_from_pcd: SH-DC init + 3-NN scale init (gaussian_model.py:149-177)
  * training_setup: per-group lrs + exponential xyz lr decay
    (gaussian_model.py:179-204, utils/general_utils.py get_expon_lr_func)
  * step / densify_and_prune / reset_opacity  (gaussian_model.py:249-404)
  * capture() / restore() full-state checkpoints incl. optimizer moments
    (gaussian_model.py:75-109)
  * save_ply / load_ply                       (via viz.export)

SH color storage: features_dc (N, 1, 3) + features_rest (N, K-1, 3) exactly
like the reference; `render_args` assembles inputs for ops.rasterize.render.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.models import gaussians as G
from dynamic3dgaussians_tpu.ops import quat
from dynamic3dgaussians_tpu.ops.knn import mean3_sq_dist
from dynamic3dgaussians_tpu.ops.sh import rgb_to_sh
from dynamic3dgaussians_tpu.train import densify as D
from dynamic3dgaussians_tpu.train import optim


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Exponential lr schedule (reference utils/general_utils.py:49-83)."""
    t = np.clip(step / max_steps, 0, 1)
    log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
            0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    return float(delay_rate * log_lerp)


class GaussianModel:
    def __init__(self, sh_degree: int = 3, semantic_dim: int = 0):
        self.max_sh_degree = sh_degree
        self.active_sh_degree = 0
        self.semantic_dim = semantic_dim
        self.params: Dict[str, jnp.ndarray] = {}
        self.variables: Dict[str, jnp.ndarray] = {}
        self.opt_state: Optional[optim.AdamState] = None
        self.lr_cfg: Dict[str, float] = {}
        self.xyz_schedule = None
        self.step_count = 0
        self._key = jax.random.PRNGKey(0)

    # ------- activations (gaussian_model.py:110-143) -------
    @property
    def get_xyz(self):
        return self.params["means3D"]

    @property
    def get_scaling(self):
        return jnp.exp(self.params["log_scales"])

    @property
    def get_rotation(self):
        return quat.normalize(self.params["unnorm_rotations"])

    @property
    def get_opacity(self):
        return jax.nn.sigmoid(self.params["logit_opacities"])

    @property
    def get_features(self):
        """(N, K, 3) SH coefficients (dc + rest)."""
        return jnp.concatenate([self.params["features_dc"],
                                self.params["features_rest"]], axis=1)

    @property
    def get_semantic_feature(self):
        return self.params.get("semantic_feature")

    @property
    def alive(self):
        return self.variables["alive"]

    @property
    def num_points(self):
        return int(G.num_alive(self.variables))

    def oneupSHdegree(self):
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

    # ------- init (gaussian_model.py:149-177) -------
    def create_from_pcd(self, points: np.ndarray, colors: np.ndarray,
                        spatial_lr_scale: float = 1.0,
                        capacity: Optional[int] = None):
        n = points.shape[0]
        cap = capacity or G.round_capacity(n * 4)
        k = (self.max_sh_degree + 1) ** 2
        pts = jnp.asarray(points, jnp.float32)
        m3sq = mean3_sq_dist(pts)
        params = {
            "means3D": pts,
            "features_dc": rgb_to_sh(jnp.asarray(colors, jnp.float32))
            [:, None, :],
            "features_rest": jnp.zeros((n, k - 1, 3), jnp.float32),
            "unnorm_rotations": jnp.tile(
                jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
            "logit_opacities": G.inverse_sigmoid(
                0.1 * jnp.ones((n, 1), jnp.float32)),
            "log_scales": jnp.tile(jnp.log(jnp.sqrt(m3sq))[:, None], (1, 3)),
        }
        if self.semantic_dim:
            params["semantic_feature"] = 0.01 * jax.random.normal(
                self._key, (n, self.semantic_dim), jnp.float32)
        self.params = G.pad_params(params, cap)
        self.variables = {
            "alive": jnp.arange(cap) < n,
            "scene_radius": jnp.float32(spatial_lr_scale),
            "means2D_gradient_accum": jnp.zeros(cap, jnp.float32),
            "denom": jnp.zeros(cap, jnp.float32),
            "max_2D_radius": jnp.zeros(cap, jnp.float32),
        }
        self.spatial_lr_scale = spatial_lr_scale
        return self

    # ------- optimizer (gaussian_model.py:179-204) -------
    def training_setup(self, position_lr_init=0.00016,
                       position_lr_final=0.0000016,
                       position_lr_max_steps=30_000,
                       feature_lr=0.0025, opacity_lr=0.05, scaling_lr=0.005,
                       rotation_lr=0.001, semantic_feature_lr=0.001):
        self.opt_state = optim.init(self.params)
        self.lr_cfg = {
            "means3D": position_lr_init * self.spatial_lr_scale,
            "features_dc": feature_lr,
            "features_rest": feature_lr / 20.0,
            "logit_opacities": opacity_lr,
            "log_scales": scaling_lr,
            "unnorm_rotations": rotation_lr,
            "semantic_feature": semantic_feature_lr,
        }
        self.xyz_schedule = lambda step: expon_lr(
            step, position_lr_init * self.spatial_lr_scale,
            position_lr_final * self.spatial_lr_scale,
            max_steps=position_lr_max_steps)
        return self

    def _lrs(self):
        lrs = {k: jnp.float32(self.lr_cfg.get(k, 0.0)) for k in self.params}
        if self.xyz_schedule is not None:
            lrs["means3D"] = jnp.float32(self.xyz_schedule(self.step_count))
        return lrs

    def step(self, grads: Dict[str, jnp.ndarray]):
        """One Adam step with the current (scheduled) lrs; masks dead slots."""
        alive = self.variables["alive"]
        grads = {k: jnp.where(alive.reshape((-1,) + (1,) * (v.ndim - 1)),
                              v, 0.0) for k, v in grads.items()}
        self.step_count += 1
        self.params, self.opt_state = optim.step(self.params, grads,
                                                 self.opt_state, self._lrs())

    # ------- densification (gaussian_model.py:249-404) -------
    def add_densification_stats(self, probe_grad, radii):
        self.variables = D.accumulate_stats(self.variables, probe_grad, radii)

    def densify_and_prune(self, iteration: int):
        self._key, sub = jax.random.split(self._key)
        self.params, self.variables, self.opt_state, stats = D.densify(
            self.params, self.variables, self.opt_state,
            jnp.int32(iteration), sub)
        return stats

    def reset_opacity(self):
        self.params, self.opt_state = D.reset_opacity(self.params,
                                                      self.opt_state)

    # ------- checkpointing (gaussian_model.py:75-109) -------
    def capture(self) -> Dict:
        return {
            "active_sh_degree": self.active_sh_degree,
            "step_count": self.step_count,
            "spatial_lr_scale": getattr(self, "spatial_lr_scale", 1.0),
            "params": {k: np.asarray(v) for k, v in self.params.items()},
            "variables": {k: np.asarray(v) for k, v in self.variables.items()},
            "opt_mu": {k: np.asarray(v) for k, v in self.opt_state.mu.items()}
            if self.opt_state else None,
            "opt_nu": {k: np.asarray(v) for k, v in self.opt_state.nu.items()}
            if self.opt_state else None,
            "opt_step": int(self.opt_state.step) if self.opt_state else 0,
        }

    def restore(self, state: Dict):
        self.active_sh_degree = state["active_sh_degree"]
        self.step_count = state["step_count"]
        self.spatial_lr_scale = state["spatial_lr_scale"]
        self.params = {k: jnp.asarray(v) for k, v in state["params"].items()}
        self.variables = {k: jnp.asarray(v)
                          for k, v in state["variables"].items()}
        if state["opt_mu"] is not None:
            self.opt_state = optim.AdamState(
                mu={k: jnp.asarray(v) for k, v in state["opt_mu"].items()},
                nu={k: jnp.asarray(v) for k, v in state["opt_nu"].items()},
                step=jnp.int32(state["opt_step"]))
        return self

    # ------- render plumbing (gaussian_renderer/__init__.py equivalent) ----
    def render_args(self) -> Dict:
        """Inputs for ops.rasterize.render (SH path + semantic features)."""
        args = dict(
            means3d=self.params["means3D"],
            colors=jnp.zeros_like(self.params["means3D"]),
            opacity=jnp.where(self.alive,
                              jax.nn.sigmoid(
                                  self.params["logit_opacities"][:, 0]), 0.0),
            scales=jnp.exp(self.params["log_scales"]),
            rotations=quat.normalize(self.params["unnorm_rotations"]),
            sh=self.get_features,
            sh_degree=self.active_sh_degree,
        )
        if "semantic_feature" in self.params:
            args["extra_channels"] = self.params["semantic_feature"]
        return args
