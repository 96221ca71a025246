"""Round-5 probe: t>0 train-step decomposition at dynamic-run scale.

The 50-timestep TPU run (artifacts/dynamic_run_tpu_r5.json) delivers
5.4 it/s at t>0 while the isolated bench step runs 47 it/s — this probe
attributes the gap on hardware and prices the fg-prefix edge plan
(ops/neighbor.build_edge_reduction n_dst) inside the REAL train step:

  t0_step          is_initial=True — image losses + Adam only
  t1_full          + physics losses, full cap*K edge plan (r4 shipping)
  t1_prefix        + physics losses, fg-prefix plan (r5)
  t1_scan25        25-step on-device scan window / 25 (dispatch amortized)

Scale mirrors the dynamic run: cap=131072, ~100k alive (~50k fg), 256^2,
K=8, chunk=128, packed transport, 6 composited channels (rgb+seg).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3500 \
           python tools/bench_t1_step.py | tee artifacts/t1_step_probe.log
"""

from __future__ import annotations

import json
import threading

import numpy as np

PHASE_TIMEOUT_S = 900
OUT = {}


def timed(name, fn, *a, **k):
    box = {}

    def run():
        try:
            box["out"] = fn(*a, **k)
        except Exception as e:  # noqa: BLE001
            box["err"] = repr(e)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(PHASE_TIMEOUT_S)
    if th.is_alive():
        print(f"# {name}: blocked > {PHASE_TIMEOUT_S}s — abandoned",
              flush=True)
        return None
    if "err" in box:
        print(f"# {name}: failed: {box['err']}", flush=True)
        return None
    return box.get("out")


def emit(key, val):
    OUT[key] = val
    print(json.dumps({key: val}), flush=True)


def main():
    import sys

    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    from dynamic3dgaussians_tpu.data import synthetic
    from dynamic3dgaussians_tpu.models import gaussians as G
    from dynamic3dgaussians_tpu.train import optim
    from dynamic3dgaussians_tpu.train.config import (RasterSettings,
                                                     TrainConfig)
    from dynamic3dgaussians_tpu.train.trainer import (
        initialize_per_timestep, initialize_post_first_timestep,
        make_train_scan, make_train_step, raster_config, stack_timestep_data)
    from dynamic3dgaussians_tpu.utils.timing import pipelined_ms

    small = "--small" in sys.argv
    n, hw, cams = (4000, 96, 2) if small else (100_000, 256, 4)
    scene = synthetic.make_gt_scene(n_fg=n // 2, n_bg=n // 2, seed=0)
    dataset, w2c, _ = synthetic.make_dataset(scene, num_t=2, num_cams=cams,
                                             w=hw, h=hw, f=float(hw) * 0.9)
    pt = synthetic.init_point_cloud(scene, noise=0.02)
    cap = G.round_capacity(int(n * 1.3))
    cfg = TrainConfig(num_timesteps=2, capacity=cap, report_every=100,
                      knn_method="approx" if small else "exact",
                      raster=RasterSettings(tile_h=16, tile_w=16, chunk=128,
                                            max_tiles_per_gaussian=8,
                                            pack_records=True))
    rcfg = raster_config(cfg)
    train_step = make_train_step(cfg, rcfg)
    params, variables = G.init_params(pt, w2c, capacity=cap)
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(0.001) for k in params}
    batch = dataset[0][0]

    def run_t0():
        nonlocal params, opt_state, variables
        for _ in range(2):
            params, opt_state, variables, m = train_step(
                params, opt_state, variables, batch, lrs, True)
        return float(m["loss"])

    loss0 = timed("t0 warmup", run_t0)
    emit("t0_loss", loss0)
    emit("scale", {"cap": cap, "alive": int(np.asarray(
        variables["alive"]).sum()), "hw": hw})

    ms = timed("time[t0_step]", pipelined_ms, lambda s: train_step(
        {**params, "means3D": params["means3D"] + s}, opt_state, variables,
        batch, lrs, True)[3]["loss"], 10)
    if ms is not None:
        emit("t0_step_ms", round(ms, 2))

    params, variables, opt_state, _ = G.compact_with_optimizer(
        params, variables, opt_state)

    # full-plan state (no reorder/prefix): the r4 shipping behavior
    pf, vf, _ = initialize_post_first_timestep(params, variables, cfg)
    pf, vf, of = initialize_per_timestep(pf, vf, opt_state)
    # prefix-plan state: the r5 behavior (fg-first reorder + n_dst plan)
    pp, vp, op_ = initialize_post_first_timestep(params, variables, cfg,
                                                 opt_state)
    pp, vp, op_ = initialize_per_timestep(pp, vp, op_)
    emit("prefix_rows", int(np.asarray(vp["edge_row_ptr"]).shape[0] - 1))

    batch1 = dataset[1][0]
    for name, (p_, v_, o_) in (("t1_full", (pf, vf, of)),
                               ("t1_prefix", (pp, vp, op_))):
        r = timed(f"warm[{name}]", lambda p_=p_, v_=v_, o_=o_: float(
            train_step(p_, o_, v_, batch1, lrs, False)[3]["loss"]))
        if r is None:
            continue
        emit(f"{name}_loss", round(r, 5))
        ms = timed(f"time[{name}]", pipelined_ms,
                   lambda s, p_=p_, v_=v_, o_=o_: train_step(
                       {**p_, "means3D": p_["means3D"] + s}, o_, v_,
                       batch1, lrs, False)[3]["loss"], 10)
        if ms is not None:
            emit(f"{name}_step_ms", round(ms, 2))

    # 25-step on-device scan window at the prefix state
    train_scan = make_train_scan(cfg, rcfg, train_step)
    data_stack = stack_timestep_data(dataset[1])
    sel = jnp.asarray(np.arange(25, dtype=np.int32) % cams)

    def scan_call(s):
        return train_scan({**pp, "means3D": pp["means3D"] + s}, op_, vp,
                          data_stack, sel, lrs, False)[3]["loss"]

    ms = timed("time[t1_scan25]", pipelined_ms, scan_call, 4)
    if ms is not None:
        emit("t1_scan25_per_step_ms", round(ms / 25, 2))
        emit("t1_scan25_it_s", round(25e3 / ms, 1))

    print("T1_STEP_RESULT " + json.dumps(OUT), flush=True)


if __name__ == "__main__":
    import os
    main()
    os._exit(0)
