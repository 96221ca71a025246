"""Camera data-parallel training step: shard_map over the "data" mesh axis.

Stage A of the scaling plan (SURVEY.md §7 step 9): parameters replicated,
each device renders its shard of the camera batch, per-gaussian parameter
gradients are pmean'd over ICI, Adam runs replicated. The reference has no
analogue (single-GPU only); this is the TPU-native equivalent of what a
torch.distributed DDP wrapper would have been.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dynamic3dgaussians_tpu.models import gaussians as G
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig
from dynamic3dgaussians_tpu.train import densify as densify_mod
from dynamic3dgaussians_tpu.train import optim
from dynamic3dgaussians_tpu.train.config import TrainConfig
from dynamic3dgaussians_tpu.train.trainer import compute_loss


def collate(frames) -> Dict:
    """Stack camera datapoints into a batched pytree (leading axis = camera)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)


def make_dp_train_step(cfg: TrainConfig, rcfg: RasterConfig, mesh: Mesh,
                       axis: str = "data", reduce: str = "pmean"):
    """Build a jitted DP train step.

    The returned function takes a camera batch whose leading axis is divisible
    by the mesh's `axis` size; params/opt_state/variables are replicated.

    reduce (default "pmean" — decided in PROFILE.md §"Multi-chip
    gradient-reduction default": at this model family's scale both modes'
    ICI+optimizer costs are <1% of the step, so the simpler mode with
    fewer collectives and no capacity%K constraint wins; psum_scatter is
    kept for capacities ~100x beyond this regime):
      "pmean"        — all-reduce gradients, replicated Adam (baseline).
      "psum_scatter" — ZeRO-style: per-gaussian gradients reduce-scattered
        over the axis, Adam runs on each device's 1/K row-shard, updated
        params all-gathered. Halves the per-step ICI bytes vs pmean
        (reduce_scatter + all_gather vs all_reduce counted per leaf at the
        same total, but the optimizer math and its memory traffic shard 1/K,
        and XLA overlaps the reduce_scatter with the remaining backward —
        the BASELINE.md "grad all-reduce overlapped with backward" target).
        Requires capacity % axis_size == 0.
    """

    def local_grads(params, probe, batch, variables, is_initial,
                    reduce_gp=True):
        f = functools.partial(compute_loss, is_initial=is_initial, cfg=cfg,
                              rcfg=rcfg)

        def mean_loss(p, pr):
            losses, auxs = jax.vmap(lambda b: f(p, pr, b, variables))(batch)
            aux = {"radii": jnp.max(auxs["radii"], axis=0),
                   "psnr": jnp.mean(auxs["psnr"]),
                   "n_dropped": jnp.sum(auxs["n_dropped"])}
            return jnp.mean(losses), aux

        (loss, aux), (gp, gprobe) = jax.value_and_grad(
            mean_loss, argnums=(0, 1), has_aux=True)(params, probe)
        if reduce_gp:  # pmean path; psum_scatter reduces in local_step
            gp = jax.lax.pmean(gp, axis)
        gprobe = jax.lax.pmean(gprobe, axis)
        loss = jax.lax.pmean(loss, axis)
        aux = {"radii": jax.lax.pmax(aux["radii"], axis),
               "psnr": jax.lax.pmean(aux["psnr"], axis),
               "n_dropped": jax.lax.psum(aux["n_dropped"], axis)}
        return loss, aux, gp, gprobe

    k_dev = mesh.shape[axis]

    def local_step(params, probe, batch, variables, opt_mu, opt_nu,
                   opt_step, lrs, is_initial):
        """Whole step inside shard_map for the psum_scatter mode: grads
        reduce-scattered, Adam on the 1/K row shard, params all-gathered.

        Adam's mu/nu arrive and leave as the device's 1/K ROW SHARD (their
        in/out_specs are P(axis)): the moments never travel the ICI at all,
        so ZeRO's per-step wire bytes are reduce_scatter(grads) +
        all_gather(params) ~= one all-reduce — not the 3x-gather a
        replicated-moments formulation pays. Between steps the moments live
        as ordinary device-sharded global arrays; rare full-array consumers
        (densify events, capacity growth) just trigger an XLA reshard."""
        loss, aux, gp, gprobe = local_grads(params, probe, batch, variables,
                                            is_initial, reduce_gp=False)
        alive = variables["alive"]
        cap = alive.shape[0]
        shard = cap // k_dev
        d = jax.lax.axis_index(axis)

        def scatter(v):
            return jax.lax.psum_scatter(v, axis, scatter_dimension=0,
                                        tiled=True) / k_dev
        gp_sh, p_sh = {}, {}
        sl = lambda v: jax.lax.dynamic_slice_in_dim(v, d * shard, shard)
        for k, v in gp.items():
            if k in G.CAMERA_KEYS:
                gp_sh[k] = jax.lax.pmean(v, axis)
                p_sh[k] = params[k]
            else:
                m = sl(alive).reshape((-1,) + (1,) * (v.ndim - 1))
                gp_sh[k] = jnp.where(m, scatter(v), 0.0)
                p_sh[k] = sl(params[k])
        new_p_sh, new_opt_sh = optim.step(
            p_sh, gp_sh, optim.AdamState(mu=opt_mu, nu=opt_nu,
                                         step=opt_step),
            lrs)
        new_params = {}
        for k in gp:
            if k in G.CAMERA_KEYS:
                new_params[k] = new_p_sh[k]
            else:
                new_params[k] = jax.lax.all_gather(new_p_sh[k], axis,
                                                   tiled=True)
        return (loss, aux, gprobe, new_params, new_opt_sh.mu,
                new_opt_sh.nu, new_opt_sh.step)

    @functools.partial(jax.jit, static_argnames=("is_initial",))
    def dp_train_step(params, opt_state, variables, batch, lrs,
                      is_initial: bool):
        probe = jnp.zeros((variables["alive"].shape[0], 2), jnp.float32)
        if reduce == "psum_scatter":
            assert variables["alive"].shape[0] % k_dev == 0, \
                "capacity must divide by the data-axis size"
            # per-leaf moment specs: gaussian-row leaves stay device-sharded
            # across steps (no gather), camera-calibration leaves replicate
            mom_spec = {k: (P() if k in G.CAMERA_KEYS else P(axis))
                        for k in opt_state.mu}
            sharded = shard_map(
                functools.partial(local_step, is_initial=is_initial),
                mesh=mesh,
                in_specs=(P(), P(), P(axis), P(), mom_spec, mom_spec,
                          P(), P()),
                out_specs=(P(), P(), P(), P(), mom_spec, mom_spec, P()),
                check_vma=False,
            )
            loss, aux, gprobe, new_params, new_mu, new_nu, new_step = \
                sharded(params, probe, batch, variables, opt_state.mu,
                        opt_state.nu, opt_state.step, lrs)
            new_opt = optim.AdamState(mu=new_mu, nu=new_nu, step=new_step)
        else:
            sharded = shard_map(
                functools.partial(local_grads, is_initial=is_initial),
                mesh=mesh,
                in_specs=(P(), P(), P(axis), P()),
                out_specs=(P(), P(), P(), P()),
                # the compositing scan carries replicated-initialized state
                # that combines with per-device camera data; skip the vma
                # typecheck
                check_vma=False,
            )
            loss, aux, gp, gprobe = sharded(params, probe, batch, variables)
            alive = variables["alive"]
            gp = {k: (v if k in G.CAMERA_KEYS else jnp.where(
                alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0))
                for k, v in gp.items()}
            new_params, new_opt = optim.step(params, gp, opt_state, lrs)
        new_vars = densify_mod.accumulate_stats(variables, gprobe,
                                                aux["radii"])
        metrics = {"loss": loss, "psnr": aux["psnr"],
                   "n_dropped": aux["n_dropped"]}
        return new_params, new_opt, new_vars, metrics

    return dp_train_step
