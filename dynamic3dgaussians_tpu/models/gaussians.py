"""Gaussian scene parameters: capacity-padded tables + activations.

The L2 parameter layer (SURVEY.md §2.2 P1/P6). The params pytree keeps the
reference's exact key names and activation conventions so checkpoints are
interchangeable:

    means3D (N,3)  rgb_colors (N,3)  seg_colors (N,3)
    unnorm_rotations (N,4)  logit_opacities (N,1)  log_scales (N,3)
    cam_m (C,3)  cam_c (C,3)   [+ semantic_feature (N,F), label (N,)]

(reference train_beffor.py:112-136 initialize_params, helpers.py:98-107
params2rendervar.)

TPU-first difference: the per-gaussian axis is padded to a static `capacity`
with an `alive` mask in `variables` — densification then mutates masks and
slots instead of array shapes (XLA static-shape requirement, SURVEY.md §3.4).
Dead slots carry opacity 0 through the activation so every consumer is safe
by construction.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.ops import quat
from dynamic3dgaussians_tpu.ops.knn import mean3_sq_dist

Params = Dict[str, jnp.ndarray]
Variables = Dict[str, jnp.ndarray]

GAUSSIAN_KEYS = ("means3D", "rgb_colors", "seg_colors", "unnorm_rotations",
                 "logit_opacities", "log_scales", "semantic_feature", "label")
CAMERA_KEYS = ("cam_m", "cam_c")


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def round_capacity(n: int, multiple: int = 1024) -> int:
    return max(multiple, -(-n // multiple) * multiple)


def init_params(pt_cld: np.ndarray, w2c_stack: np.ndarray, *,
                max_cams: int = 5, capacity: Optional[int] = None,
                semantic_dim: int = 0, seed: int = 0):
    """Initialize params/variables from an (N, 7) [xyz, rgb, seg] point cloud.

    Mirrors reference train_beffor.py:112-136: identity rotations, zero
    opacity logits, log_scales from sqrt(mean 3-NN squared distance), scene
    radius from camera spread; plus the capacity padding.

    Args:
      pt_cld: (N, 7) numpy array.
      w2c_stack: (C, 4, 4) world-to-cam matrices of the training cameras
        (timestep 0) for the scene-radius estimate.
    Returns:
      (params, variables) with every per-gaussian array padded to capacity.
    """
    n = pt_cld.shape[0]
    cap = capacity or round_capacity(int(n * 4))
    seg = pt_cld[:, 6]
    means = jnp.asarray(pt_cld[:, :3], jnp.float32)
    m3sq = mean3_sq_dist(means)
    log_scales = jnp.tile(jnp.log(jnp.sqrt(m3sq))[:, None], (1, 3))

    params = {
        "means3D": means,
        "rgb_colors": jnp.asarray(pt_cld[:, 3:6], jnp.float32),
        "seg_colors": jnp.stack(
            [jnp.asarray(seg, jnp.float32),
             jnp.zeros(n, jnp.float32),
             1.0 - jnp.asarray(seg, jnp.float32)], axis=-1),
        "unnorm_rotations": jnp.tile(
            jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        "logit_opacities": jnp.zeros((n, 1), jnp.float32),
        "log_scales": log_scales,
        "cam_m": jnp.zeros((max_cams, 3), jnp.float32),
        "cam_c": jnp.zeros((max_cams, 3), jnp.float32),
    }
    if semantic_dim:
        params["semantic_feature"] = 0.01 * jax.random.normal(
            jax.random.PRNGKey(seed), (n, semantic_dim), jnp.float32)

    params = pad_params(params, cap)
    cam_centers = np.linalg.inv(np.asarray(w2c_stack))[:, :3, 3]
    scene_radius = 1.1 * float(np.max(np.linalg.norm(
        cam_centers - cam_centers.mean(0, keepdims=True), axis=-1)))
    variables = {
        "alive": jnp.arange(cap) < n,
        "scene_radius": jnp.float32(scene_radius),
        "means2D_gradient_accum": jnp.zeros(cap, jnp.float32),
        "denom": jnp.zeros(cap, jnp.float32),
        "max_2D_radius": jnp.zeros(cap, jnp.float32),
    }
    return params, variables


def pad_params(params: Params, capacity: int) -> Params:
    """Pad every per-gaussian array to `capacity` rows (zeros)."""
    out = {}
    for k, v in params.items():
        if k in CAMERA_KEYS:
            out[k] = v
            continue
        n = v.shape[0]
        assert n <= capacity, f"{k}: {n} > capacity {capacity}"
        out[k] = jnp.pad(v, [(0, capacity - n)] + [(0, 0)] * (v.ndim - 1))
    return out


def activated(params: Params, alive: Optional[jnp.ndarray] = None) -> Params:
    """Apply activations -> render inputs (reference params2rendervar).

    normalize(quats), sigmoid(opacity) * alive, exp(scales); colors raw.
    """
    opacity = jax.nn.sigmoid(params["logit_opacities"][:, 0])
    if alive is not None:
        opacity = jnp.where(alive, opacity, 0.0)
    out = {
        "means3d": params["means3D"],
        "colors": params["rgb_colors"],
        "rotations": quat.normalize(params["unnorm_rotations"]),
        "opacity": opacity,
        "scales": jnp.exp(params["log_scales"]),
    }
    if "semantic_feature" in params:
        out["semantic_feature"] = params["semantic_feature"]
    return out


def num_alive(variables: Variables) -> jnp.ndarray:
    return jnp.sum(variables["alive"].astype(jnp.int32))


def grow_capacity(params: Params, variables: Variables, new_capacity: int,
                  opt_state=None):
    """Host-side capacity growth (recompile point, SURVEY.md §3.4 note).

    Pads every per-gaussian table (params, densify stats, Adam moments) from
    the current capacity to `new_capacity`; new slots are dead. The next
    jitted step at the new shape recompiles once — growth doubles, so a full
    30k->300k reference-style densification run pays O(log2(10)) recompiles.
    The reference instead reallocates tensors every densify pass
    (external.py:158-180 cat_params_to_optimizer).
    """
    grown = pad_params({k: v for k, v in params.items()}, new_capacity)
    var = dict(variables)
    old_cap = variables["alive"].shape[0]
    extra = new_capacity - old_cap
    for k in ("alive", "means2D_gradient_accum", "denom", "max_2D_radius"):
        var[k] = jnp.pad(variables[k], (0, extra))
    if opt_state is None:
        return grown, var
    pad1 = lambda tree: {
        k: (v if k in CAMERA_KEYS else
            jnp.pad(v, [(0, extra)] + [(0, 0)] * (v.ndim - 1)))
        for k, v in tree.items()}
    if hasattr(opt_state, "mu"):  # optim.AdamState
        from dynamic3dgaussians_tpu.train import optim as _optim
        new_opt = _optim.AdamState(mu=pad1(opt_state.mu),
                                   nu=pad1(opt_state.nu),
                                   step=opt_state.step)
    else:
        mu, nu = opt_state
        new_opt = (pad1(mu), pad1(nu))
    return grown, var, new_opt


def compact_with_optimizer(params: Params, variables: Variables,
                           opt_state):
    """compact() plus the matching Adam-moment row reorder (one canonical
    implementation for the trainer/ego-trainer/dryrun post-t0 step)."""
    from dynamic3dgaussians_tpu.train import optim as _optim
    params, variables, order = compact(params, variables)
    mu = {k: (v if k in CAMERA_KEYS else v[order])
          for k, v in opt_state.mu.items()}
    nu = {k: (v if k in CAMERA_KEYS else v[order])
          for k, v in opt_state.nu.items()}
    return params, variables, _optim.AdamState(mu=mu, nu=nu,
                                               step=opt_state.step), order


def compact(params: Params, variables: Variables):
    """Repack alive gaussians to the front (host-side maintenance).

    Keeps tile-binning efficiency high after heavy pruning; the returned
    permutation lets callers remap cached neighbor indices.
    """
    order = jnp.argsort(~variables["alive"], stable=True)
    out = {k: (v if k in CAMERA_KEYS else v[order])
           for k, v in params.items()}
    var = dict(variables)
    for k in ("alive", "means2D_gradient_accum", "denom", "max_2D_radius"):
        var[k] = variables[k][order]
    return out, var, order


def compose_scenes(static_params: Params, dynamic_params: Params,
                   capacity: Optional[int] = None):
    """Concatenate a static background scene with a dynamic foreground set.

    The reference's `add_new_gaussians` (dyn_double.py:215-240): a trained
    static checkpoint is composed with fresh person/foreground gaussians;
    `label` marks 0 = static (gradient-gated frozen via grad_mask) and
    1 = dynamic. Static params whose stacked checkpoints carry a leading
    time axis contribute their first timestep (dyn_double takes [0]).

    Returns (params, variables) with the usual capacity padding; camera
    tables come from whichever side has them (static wins).
    """
    out: Params = {}
    n_s = np.asarray(static_params["means3D"]).shape[-2] \
        if np.asarray(static_params["means3D"]).ndim == 3 \
        else np.asarray(static_params["means3D"]).shape[0]
    n_d = np.asarray(dynamic_params["means3D"]).shape[0]
    keys = [k for k in dict(static_params, **dynamic_params)
            if k in GAUSSIAN_KEYS]
    for k in keys:
        s = static_params.get(k)
        d = dynamic_params.get(k)
        if s is None or d is None:
            continue
        s = jnp.asarray(s)
        if s.ndim == 3:      # stacked per-timestep checkpoint -> t=0
            s = s[0]
        out[k] = jnp.concatenate([s, jnp.asarray(d)], axis=0)
    out["label"] = jnp.concatenate([jnp.zeros(n_s, jnp.float32),
                                    jnp.ones(n_d, jnp.float32)])
    for k in CAMERA_KEYS:
        if k in static_params:
            out[k] = jnp.asarray(static_params[k])
        elif k in dynamic_params:
            out[k] = jnp.asarray(dynamic_params[k])
    n = n_s + n_d
    cap = capacity or round_capacity(n)
    out = pad_params(out, cap)
    variables = {
        "alive": jnp.arange(cap) < n,
        "scene_radius": jnp.asarray(static_params.get(
            "scene_radius", jnp.float32(1.0))),
        "means2D_gradient_accum": jnp.zeros(cap, jnp.float32),
        "denom": jnp.zeros(cap, jnp.float32),
        "max_2D_radius": jnp.zeros(cap, jnp.float32),
    }
    return out, variables
