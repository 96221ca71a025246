"""Adam with per-parameter-group lrs and densification moment surgery.

Replaces torch.optim.Adam(param_groups, lr=0.0, eps=1e-15) as configured by
the reference (train_beffor.py:139-151) plus the three surgery operations of
external.py:
  * update_params_and_optimizer -> `reset_moments`      (external.py:143-155)
  * cat_params_to_optimizer     -> zeroed slots on write (external.py:158-180)
  * remove_points               -> `mask_moments`        (external.py:183-205)

Hand-rolled (not optax) because surgery needs direct, masked access to the
first/second-moment tables living at the same capacity-padded shapes as the
params; the whole update is a few fused VPU loops under jit.

Learning rates are runtime scalars so the trainer can freeze groups by
passing 0.0 (reference initialize_post_first_timestep, train_beffor:259-262)
without recompiling.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


class AdamState(NamedTuple):
    mu: Params       # first moments, same tree as params
    nu: Params       # second moments
    step: jnp.ndarray  # () int32


# reference lrs (train_beffor.py:139-151); means3D is scaled by scene_radius
DEFAULT_LRS: Dict[str, float] = {
    "means3D": 0.00016,      # x scene_radius at runtime
    "rgb_colors": 0.0025,
    "seg_colors": 0.0,
    "unnorm_rotations": 0.001,
    "logit_opacities": 0.05,
    "log_scales": 0.001,
    "cam_m": 1e-4,
    "cam_c": 1e-4,
    "semantic_feature": 0.0025,
    "label": 0.0,
}


def init(params: Params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros,
                     nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.int32(0))


def step(params: Params, grads: Params, state: AdamState,
         lrs: Dict[str, jnp.ndarray], b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-15) -> Tuple[Params, AdamState]:
    """One Adam step with torch-style bias correction."""
    t = state.step + 1
    bc1 = 1.0 - b1 ** t.astype(jnp.float32)
    bc2 = 1.0 - b2 ** t.astype(jnp.float32)
    new_p, new_mu, new_nu = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        mu = b1 * state.mu[k] + (1.0 - b1) * g
        nu = b2 * state.nu[k] + (1.0 - b2) * g * g
        update = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        new_p[k] = p - lrs[k] * update
        new_mu[k], new_nu[k] = mu, nu
    return new_p, AdamState(mu=new_mu, nu=new_nu, step=t)


def reset_moments(state: AdamState, key: str,
                  mask: jnp.ndarray | None = None) -> AdamState:
    """Zero the moments of one param group (optionally only masked rows).

    The reference resets moments whenever a param tensor is replaced wholesale
    (per-timestep re-init, opacity reset): external.py:143-155.
    """
    def z(x):
        if mask is None:
            return jnp.zeros_like(x)
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[key] = z(mu[key])
    nu[key] = z(nu[key])
    return AdamState(mu=mu, nu=nu, step=state.step)


def mask_moments(state: AdamState, row_mask: jnp.ndarray,
                 gaussian_keys) -> AdamState:
    """Zero moment rows where row_mask is True (pruned/freed slots)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    for k in gaussian_keys:
        if k not in mu:
            continue
        m = row_mask.reshape(row_mask.shape + (1,) * (mu[k].ndim - 1))
        mu[k] = jnp.where(m, 0.0, mu[k])
        nu[k] = jnp.where(m, 0.0, nu[k])
    return AdamState(mu=mu, nu=nu, step=state.step)
