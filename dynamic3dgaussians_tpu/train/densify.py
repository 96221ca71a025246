"""Densification and pruning under static shapes: clone / split / prune.

Capability parity with reference external.py:244-292 `densify` plus the
accumulation helper external.py:136-140, re-designed for XLA's static-shape
world (SURVEY.md §3.4): the gaussian table is capacity-padded with an `alive`
mask, and topology mutations become masked scatter writes into free slots —
no reallocation, no recompile, deterministic.

Semantics mapping (thresholds/schedules identical to the reference):
  * stats: accumulate ||dL/d(mean2D_ndc)||, denom, per-gaussian max radius
  * every 100 iters in [500, 5000]:
      clone:  grad >= 2e-4 and max(scale) <= 0.01*scene_radius
              -> copy row into a free slot (zeroed Adam moments there)
      split:  grad >= 2e-4 and max(scale) >  0.01*scene_radius
              -> two children with x += R @ N(0, scale), scale /= 1.6;
                 parent slot is overwritten by child 1 (moments zeroed, as the
                 reference removes the parent and appends fresh children),
                 child 2 goes to a free slot
      prune:  opacity < 0.005 (0.25 at iter 5000); after iter 3000 also
              max(scale) > 0.1*scene_radius -> alive = False
      stats reset to zero
  * every 3000 iters: opacity reset to 0.01 with moment reset

Capacity overflow (more clones/splits than free slots) drops the excess and
reports it in the stats — never silent.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynamic3dgaussians_tpu.models.gaussians import (
    GAUSSIAN_KEYS, Params, Variables, inverse_sigmoid)
from dynamic3dgaussians_tpu.ops.quat import quat_to_rotmat
from dynamic3dgaussians_tpu.train import optim

GRAD_THRESH = 2e-4
CLONE_SCALE_FRAC = 0.01    # of scene_radius
BIG_POINT_FRAC = 0.1
OPACITY_PRUNE = 0.005
OPACITY_PRUNE_FINAL = 0.25  # at the last densify iteration (i == 5000)
SPLIT_SCALE_DIV = 1.6       # 0.8 * n, n = 2
DENSIFY_END = 5000
BIG_PRUNE_START = 3000


class DensifyStats(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped_capacity: jnp.ndarray
    n_alive: jnp.ndarray


def accumulate_stats(variables: Variables, probe_grad: jnp.ndarray,
                     radii: jnp.ndarray) -> Variables:
    """Fold one iteration's densification signals (external.py:136-140).

    probe_grad: (cap, 2) gradient of the loss wrt the NDC mean2d probe.
    radii: (cap,) int32 screen radii from the render.
    """
    seen = radii > 0
    out = dict(variables)
    out["means2D_gradient_accum"] = variables["means2D_gradient_accum"] + \
        jnp.where(seen, jnp.linalg.norm(probe_grad, axis=-1), 0.0)
    out["denom"] = variables["denom"] + seen.astype(jnp.float32)
    out["max_2D_radius"] = jnp.maximum(variables["max_2D_radius"],
                                       jnp.where(seen, radii, 0))
    return out


def _scatter_rows(params: Params, dest: jnp.ndarray, src_vals: Params,
                  keys) -> Params:
    """params[k][dest[i]] = src_vals[k][i] for every gaussian key (drop OOB)."""
    out = dict(params)
    for k in keys:
        if k not in params:
            continue
        out[k] = params[k].at[dest].set(src_vals[k], mode="drop")
    return out


def densify(params: Params, variables: Variables, opt_state: optim.AdamState,
            i: jnp.ndarray, rng: jax.Array
            ) -> Tuple[Params, Variables, optim.AdamState, DensifyStats]:
    """One clone/split/prune pass (call at the reference cadence)."""
    cap = variables["alive"].shape[0]
    alive = variables["alive"]
    r = variables["scene_radius"]

    grads = variables["means2D_gradient_accum"] / jnp.maximum(
        variables["denom"], 1e-12)
    grads = jnp.nan_to_num(grads, nan=0.0)
    scales = jnp.exp(params["log_scales"])
    max_scale = jnp.max(scales, axis=-1)

    hot = (grads >= GRAD_THRESH) & alive
    to_clone = hot & (max_scale <= CLONE_SCALE_FRAC * r)
    to_split = hot & (max_scale > CLONE_SCALE_FRAC * r)

    # --- allocate free slots: clones first, then split-second-children
    free_slots = jnp.argsort(alive, stable=True)   # dead slots first
    n_free = cap - jnp.sum(alive.astype(jnp.int32))
    clone_rank = jnp.cumsum(to_clone.astype(jnp.int32)) - 1
    n_clone_want = jnp.sum(to_clone.astype(jnp.int32))
    split_rank = jnp.cumsum(to_split.astype(jnp.int32)) - 1 + \
        jnp.minimum(n_clone_want, n_free)

    clone_ok = to_clone & (clone_rank < n_free)
    split2_ok = to_split & (split_rank < n_free)
    clone_dest = jnp.where(clone_ok, free_slots[jnp.clip(clone_rank, 0)], cap)
    split2_dest = jnp.where(split2_ok, free_slots[jnp.clip(split_rank, 0)], cap)

    # --- clone: copy rows verbatim into free slots
    new_params = _scatter_rows(params, clone_dest, params, GAUSSIAN_KEYS)

    # --- split: jitter children by R @ N(0, scale), shrink scales
    k1, k2 = jax.random.split(rng)
    R = quat_to_rotmat(params["unnorm_rotations"])
    def child(key):
        noise = jax.random.normal(key, (cap, 3)) * scales
        vals = dict(params)
        vals["means3D"] = params["means3D"] + jnp.einsum(
            "nij,nj->ni", R, noise)
        vals["log_scales"] = params["log_scales"] - jnp.log(SPLIT_SCALE_DIV)
        return vals
    c1, c2 = child(k1), child(k2)
    # child 1 overwrites the parent slot
    for k in GAUSSIAN_KEYS:
        if k not in new_params:
            continue
        m = to_split.reshape((-1,) + (1,) * (new_params[k].ndim - 1))
        new_params[k] = jnp.where(m, c1[k], new_params[k])
    # child 2 goes to a free slot
    new_params = _scatter_rows(new_params, split2_dest, c2, GAUSSIAN_KEYS)

    alive = alive | jnp.zeros(cap, bool).at[clone_dest].set(True, mode="drop") \
        | jnp.zeros(cap, bool).at[split2_dest].set(True, mode="drop")

    # fresh rows get fresh Adam moments: new slots + overwritten parents
    touched = jnp.zeros(cap, bool).at[clone_dest].set(True, mode="drop") \
        .at[split2_dest].set(True, mode="drop") | to_split
    opt_state = optim.mask_moments(opt_state, touched, GAUSSIAN_KEYS)

    # --- prune
    opacity = jax.nn.sigmoid(new_params["logit_opacities"][:, 0])
    thr = jnp.where(i == DENSIFY_END, OPACITY_PRUNE_FINAL, OPACITY_PRUNE)
    to_remove = opacity < thr
    big = jnp.max(jnp.exp(new_params["log_scales"]), axis=-1) > \
        BIG_POINT_FRAC * r
    to_remove = to_remove | (big & (i >= BIG_PRUNE_START))
    to_remove = to_remove & alive
    alive = alive & ~to_remove
    opt_state = optim.mask_moments(opt_state, to_remove, GAUSSIAN_KEYS)

    new_vars = dict(variables)
    new_vars["alive"] = alive
    new_vars["means2D_gradient_accum"] = jnp.zeros(cap, jnp.float32)
    new_vars["denom"] = jnp.zeros(cap, jnp.float32)
    new_vars["max_2D_radius"] = jnp.zeros(cap, jnp.float32)

    stats = DensifyStats(
        n_cloned=jnp.sum(clone_ok.astype(jnp.int32)),
        n_split=jnp.sum(to_split.astype(jnp.int32)),
        n_pruned=jnp.sum(to_remove.astype(jnp.int32)),
        n_dropped_capacity=(n_clone_want
                            - jnp.sum(clone_ok.astype(jnp.int32))
                            + jnp.sum(to_split.astype(jnp.int32))
                            - jnp.sum(split2_ok.astype(jnp.int32))),
        n_alive=jnp.sum(alive.astype(jnp.int32)),
    )
    return new_params, new_vars, opt_state, stats


def reset_opacity(params: Params, opt_state: optim.AdamState
                  ) -> Tuple[Params, optim.AdamState]:
    """Opacity reset to 0.01 every 3000 iters (external.py:288-290)."""
    new_params = dict(params)
    new_params["logit_opacities"] = jnp.full_like(
        params["logit_opacities"], inverse_sigmoid(jnp.float32(0.01)))
    return new_params, optim.reset_moments(opt_state, "logit_opacities")
