"""Typed config tree for training runs.

Replaces the reference's dual config story (reflection-based ParamGroup
argparse in arguments/__init__.py vs mutually inconsistent hard-coded lr
dicts across train.py:119-135 / dyn_train.py:215-232 / ssd_train.py:277-293 —
SURVEY.md §5.6) with one dataclass tree, serializable next to checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Optional, Tuple

from dynamic3dgaussians_tpu.train.losses import DEFAULT_LOSS_WEIGHTS
from dynamic3dgaussians_tpu.train.optim import DEFAULT_LRS


@dataclasses.dataclass
class RasterSettings:
    tile_h: int = 16
    tile_w: int = 16
    chunk: int = 128
    max_per_tile: int = 1024
    # per-gaussian emission slots; overflow is counted in the step metrics
    # (n_dropped) — raise if it stays nonzero. 8 covers trained-scene-scale
    # gaussians; tiny test scenes with huge splats set their own.
    max_tiles_per_gaussian: int = 8
    pairs_per_gaussian: int = 8
    # pallas-path perf knobs (ops/rasterize.RasterConfig docs)
    exact_cull: bool = True
    power_impl: str = "vpu"
    scan_impl: str = "matmul_split3"
    pack_records: bool = False
    unsort_impl: str = "sort"
    # render path: "auto" (pallas on TPU, tiled elsewhere), "pallas",
    # "tiled". Tests force "pallas" to exercise the kernels in interpret
    # mode on CPU (tests/test_scale_slow.py).
    method: str = "auto"


@dataclasses.dataclass
class TrainConfig:
    # schedule (reference train_beffor.py:295-307)
    num_timesteps: int = 3
    iters_first_timestep: int = 5000
    iters_per_timestep: int = 2000
    # densification schedule (external.py:244-292)
    densify_start: int = 500
    densify_end: int = 5000
    densify_every: int = 100
    opacity_reset_every: int = 3000
    # model
    capacity: Optional[int] = None     # default: 4x initial points
    # host-side capacity doubling when densification runs out of free slots
    # (reference grows tensors freely, external.py:244-292); each growth is
    # one recompile. max_capacity caps it (0 = unbounded).
    grow_capacity: bool = True
    max_capacity: int = 0
    # double raster.max_tiles_per_gaussian (recompile) whenever a step
    # reports rect-cap truncation — the reference never truncates
    # (forward.cu:246-250)
    grow_tiles: bool = True
    # tiled-path pair budget (pairs_per_gaussian) during K escalation:
    # 0 = track K (semantically exact — pallas emission capacity is K*N
    # and ignores this); a positive cap pins the CPU oracle's sort length
    # for long runs (disclosed approximation: over-budget pairs are
    # dropped and counted, never silent)
    pairs_budget_cap: int = 0
    num_knn: int = 20                  # rigidity graph (train_beffor.py:243)
    knn_weight_beta: float = 2000.0    # exp(-2000 * d^2)
    # "exact" = O(N^2) MXU matmuls; "approx" = Morton-window (use above
    # ~500k gaussians: seconds instead of minutes, >90% neighbor recall)
    knn_method: str = "exact"
    # windowed one-hot MXU neighbor fetch for the frozen post-t0 graph —
    # exact (ops/neighbor.WindowPlan) but measured SLOWER than the default
    # fg-prefix gather on TPU (artifacts/neighbor_window_probe.log), so
    # off unless the graph's RCM bandwidth is unusually tight
    neighbor_window: bool = False
    semantic_dim: int = 0
    sh_degree: int = 0
    # losses / lrs
    loss_weights: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_LOSS_WEIGHTS))
    lrs: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_LRS))
    # params frozen after the first timestep (train_beffor.py:259-262)
    freeze_after_t0: Tuple[str, ...] = ("logit_opacities", "log_scales",
                                        "cam_m", "cam_c")
    raster: RasterSettings = dataclasses.field(default_factory=RasterSettings)
    seed: int = 0
    report_every: int = 100
    # parallelism: number of cameras batched per step (data-parallel axis)
    cams_per_step: int = 1
    # On-device multi-step window: lax.scan this many train steps per
    # dispatch (trainer.make_train_scan). 1 = host-dispatched per-step loop.
    # Amortizes per-call relay/dispatch latency (~100 ms on the axon
    # tunnel) across the window; pick a divisor of report_every so windows
    # tile the gaps between host actions exactly (VERDICT r4 item 3).
    steps_per_call: int = 1

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "TrainConfig":
        d = json.loads(s)
        d["raster"] = RasterSettings(**d.get("raster", {}))
        d["freeze_after_t0"] = tuple(d.get("freeze_after_t0", ()))
        return TrainConfig(**d)
