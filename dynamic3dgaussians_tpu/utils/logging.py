"""Run logging & observability (SURVEY.md §5.5 equivalent).

The reference logs through wandb (train.py:338-389) and TensorBoard
(revise_train.py:25-29). This environment is zero-egress, so the core logger
is CSV/JSONL-on-disk with the same scalar/image hooks; a wandb backend is
attached automatically when the package is importable and configured.

Also provides `safe_state`-style seeding (reference utils/general_utils.py:
111-133) and timing/throughput trackers (gaussians/s, rays/s — the
BASELINE.json counters; the reference's analogue is tqdm it/s).
"""

from __future__ import annotations

import json
import os
import random
import time
from typing import Dict, Optional

import numpy as np


def safe_state(seed: int = 0):
    """Seed every RNG the framework touches (general_utils.py:111-133)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass
    import jax
    return jax.random.PRNGKey(seed)


class RunLogger:
    """JSONL scalar logging + optional image dumps + optional wandb."""

    def __init__(self, out_dir: str, use_wandb: bool = False,
                 project: str = "dynamic3dgaussians_tpu",
                 run_name: Optional[str] = None):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._f = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, name=run_name,
                                         dir=out_dir)
            except Exception:
                self._wandb = None

    def log(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        row = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            row[(prefix + k) if prefix else k] = float(v)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(row, step=step)

    def log_image(self, step: int, name: str, img) -> str:
        from PIL import Image
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        path = os.path.join(self.out_dir, f"{name}_{step:07d}.png")
        Image.fromarray(arr).save(path)
        return path

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


class Throughput:
    """Rays/s and gaussians/s counters (BASELINE.json primary metric)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._iters = 0
        self._rays = 0
        self._gaussians = 0

    def update(self, n_pixels: int, n_gaussians: int, iters: int = 1):
        self._iters += iters
        self._rays += n_pixels * iters
        self._gaussians += n_gaussians * iters

    def rates(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {"iters_per_s": self._iters / dt,
                "rays_per_s": self._rays / dt,
                "gaussians_per_s": self._gaussians / dt}


class phase_timer:
    """Context-manager wall timer with optional jax sync (SURVEY.md §5.1)."""

    def __init__(self, name: str, sync=None, log: Optional[Dict] = None):
        self.name, self.sync, self.log = name, sync, log

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            import jax
            jax.block_until_ready(self.sync)
        self.dt = time.perf_counter() - self.t0
        if self.log is not None:
            self.log[self.name] = self.dt


def start_profiler_trace(log_dir: str):
    """jax.profiler trace wrapper — view with tensorboard/xprof."""
    import jax
    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    import jax
    jax.profiler.stop_trace()
