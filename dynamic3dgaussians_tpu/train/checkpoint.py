"""Checkpoint / resume: orbax-backed full-state training checkpoints.

Capability parity with SURVEY.md §5.4's three mechanisms:
  (a) functional stacked-npz params (viz.export.save_params — reference
      helpers.py:158-167 layout),
  (b) full training state incl. optimizer moments (the OO stack's
      capture()/restore(), scene/gaussian_model.py:75-109) — implemented here
      with orbax so multi-host arrays checkpoint correctly,
  (c) PLY export (viz.export.save_ply_splat).

Plus checkpoint-initialized restarts (reference dyn_utils.py:300-312):
`load_latest` restores params/opt/variables and the timestep/iteration
cursor, giving crash-recovery the reference never had (SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from dynamic3dgaussians_tpu.train import optim


def _to_pytree(params, opt_state: optim.AdamState, variables,
               cursor: Dict[str, int]):
    return {
        "params": params,
        "opt_mu": opt_state.mu,
        "opt_nu": opt_state.nu,
        "opt_step": opt_state.step,
        "variables": variables,
        "cursor": {k: np.int64(v) for k, v in cursor.items()},
    }


def _from_pytree(tree) -> Tuple[Dict, optim.AdamState, Dict, Dict[str, int]]:
    opt_state = optim.AdamState(mu=tree["opt_mu"], nu=tree["opt_nu"],
                                step=tree["opt_step"])
    cursor = {k: int(v) for k, v in tree["cursor"].items()}
    return tree["params"], opt_state, tree["variables"], cursor


class CheckpointManager:
    """Thin orbax wrapper; step = global iteration counter."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, params, opt_state, variables,
             cursor: Dict[str, int], wait: bool = False):
        tree = _to_pytree(params, opt_state, variables, cursor)
        self.mgr.save(step, args=self._ocp.args.StandardSave(tree))
        if wait:
            self.mgr.wait_until_finished()

    def load(self, step: Optional[int] = None):
        step = self.mgr.latest_step() if step is None else step
        if step is None:
            return None
        tree = self.mgr.restore(step)
        return (step,) + _from_pytree(tree)

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
