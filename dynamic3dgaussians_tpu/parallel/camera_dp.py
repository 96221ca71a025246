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
                       axis: str = "data"):
    """Build a jitted DP train step.

    The returned function takes a camera batch whose leading axis is divisible
    by the mesh's `axis` size; params/opt_state/variables are replicated.
    """

    def local_grads(params, probe, batch, variables, is_initial):
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
        # cross-device reduction: grads/loss averaged, radii maxed
        gp = jax.lax.pmean(gp, axis)
        gprobe = jax.lax.pmean(gprobe, axis)
        loss = jax.lax.pmean(loss, axis)
        aux = {"radii": jax.lax.pmax(aux["radii"], axis),
               "psnr": jax.lax.pmean(aux["psnr"], axis),
               "n_dropped": jax.lax.psum(aux["n_dropped"], axis)}
        return loss, aux, gp, gprobe

    @functools.partial(jax.jit, static_argnames=("is_initial",))
    def dp_train_step(params, opt_state, variables, batch, lrs,
                      is_initial: bool):
        probe = jnp.zeros((variables["alive"].shape[0], 2), jnp.float32)
        sharded = shard_map(
            functools.partial(local_grads, is_initial=is_initial),
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(), P(), P()),
            # the compositing scan carries replicated-initialized state that
            # combines with per-device camera data; skip the vma typecheck
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
