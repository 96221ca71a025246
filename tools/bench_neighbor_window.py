"""Round-5 probe: windowed one-hot MXU neighbor fetch vs XLA gather.

Decision it feeds (VERDICT r4 item 3): the t>0 train step in the 50-step
TPU run delivers 5.4 it/s while the isolated bench step is 47 it/s — the
gap is dominated by the physics-loss neighbor fetch (an XLA row-gather of
cap*K rows, measured ~10 ns/row in r5_probe.log C). This probe prices the
replacement (ops/neighbor.WindowPlan: RCM locality reorder at graph build
+ blockwise one-hot MXU matmuls) at the dynamic-run scale, fwd and
fwd+bwd, plus the full physics_losses grad both ways, plus fwd parity.

Scale mirrors artifacts/dynamic_run_tpu_r5.json: cap=131072, n_fg=49152,
K=20, F=8 (7 used lanes + pad).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
           python tools/bench_neighbor_window.py | tee artifacts/neighbor_window_probe.log
"""

from __future__ import annotations

import json
import threading

import numpy as np

PHASE_TIMEOUT_S = 700
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


def build_state(cap=131072, n_fg=49152, k=20, seed=0):
    from scipy.spatial import cKDTree

    from dynamic3dgaussians_tpu.ops.neighbor import (build_edge_reduction,
                                                     build_window_plan,
                                                     locality_order)
    rng = np.random.RandomState(seed)
    # blobby foreground (what a segmented object looks like post-t0)
    centers = rng.uniform(-1, 1, (40, 3))
    pts = (centers[rng.randint(0, 40, n_fg)]
           + rng.normal(scale=0.15, size=(n_fg, 3))).astype(np.float32)
    tree = cKDTree(pts)
    _, nbr = tree.query(pts, k=k + 1)
    idx = np.full((cap, k), -1, np.int32)
    idx[:n_fg] = nbr[:, 1:]
    perm = locality_order(idx, np.arange(n_fg), cap)
    inv = np.empty(cap, np.int64)
    inv[perm] = np.arange(cap)
    idx = np.where(idx[perm] >= 0, inv[np.maximum(idx[perm], 0)],
                   -1).astype(np.int32)
    window = build_window_plan(idx, n_fg)
    plan = build_edge_reduction(idx)
    plan_prefix = build_edge_reduction(idx, n_dst=n_fg)
    return idx, plan, plan_prefix, window


def main():
    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    from dynamic3dgaussians_tpu.ops.neighbor import (neighbor_lookup,
                                                     neighbor_lookup_win)
    from dynamic3dgaussians_tpu.utils.timing import pipelined_ms

    import sys
    small = "--small" in sys.argv          # CPU shakeout scale
    cap, n_fg, k, f = (8192, 3072, 20, 8) if small else (131072, 49152, 20, 8)
    idx_h, plan, plan_prefix, window = build_state(cap, n_fg, k)
    emit("plan", {"cap": cap, "n_fg": n_fg, "K": k,
                  "W": int(window.lanes.shape[0]),
                  "n_blocks": int(window.win_start.shape[0]),
                  "spills": int(window.spill_src.shape[0])})
    rng = np.random.RandomState(1)
    tbl = jnp.asarray(rng.normal(size=(cap, f)).astype(np.float32))
    idx = jnp.asarray(idx_h)
    cot = jnp.asarray(rng.normal(size=(f, k, cap)).astype(np.float32) * 1e-3)
    mask = jnp.asarray((idx_h >= 0).T[None])

    @jax.jit
    def fwd_gather(t):
        return neighbor_lookup(t, idx, plan, k)

    @jax.jit
    def fwd_prefix(t):
        return neighbor_lookup(t, idx, plan_prefix, k)

    @jax.jit
    def both_prefix(t):
        return jax.grad(lambda x: jnp.vdot(
            neighbor_lookup(x, idx, plan_prefix, k) ** 2, cot))(t)

    @jax.jit
    def fwd_win(t):
        return neighbor_lookup_win(t, idx, plan, window, k)

    # square the fetched records so the grad is input-dependent (a linear
    # vdot has a CONSTANT gradient that XLA folds to a compile-time array)
    @jax.jit
    def both_gather(t):
        return jax.grad(lambda x: jnp.vdot(
            jnp.where(mask, neighbor_lookup(x, idx, plan, k), 0.0) ** 2,
            cot))(t)

    @jax.jit
    def both_win(t):
        return jax.grad(lambda x: jnp.vdot(
            neighbor_lookup_win(x, idx, plan, window, k) ** 2, cot))(t)

    # fwd parity first (compiles both fwd programs)
    a = timed("fwd[gather]", lambda: np.asarray(fwd_gather(tbl)))
    b = timed("fwd[window]", lambda: np.asarray(fwd_win(tbl)))
    if a is not None and b is not None:
        m = np.asarray(mask[0])[None]
        emit("fwd_parity_valid_edges",
             float(np.abs(np.where(m, a, 0) - np.where(m, b, 0)).max()))

    c = timed("fwd[prefix]", lambda: np.asarray(fwd_prefix(tbl)))
    if a is not None and c is not None:
        m = np.asarray(mask[0])[None]
        emit("fwd_parity_prefix",
             float(np.abs(np.where(m, a, 0) - np.where(m, c, 0)).max()))

    for name, fn in (("fwd_gather", fwd_gather), ("fwd_window", fwd_win),
                     ("fwd_prefix", fwd_prefix),
                     ("fwdbwd_gather", both_gather),
                     ("fwdbwd_window", both_win),
                     ("fwdbwd_prefix", both_prefix)):
        ms = timed(f"time[{name}]", pipelined_ms,
                   lambda s, fn=fn: fn(tbl + s), 10)
        if ms is not None:
            emit(f"{name}_ms", round(ms, 3))

    # full physics_losses grad, window on vs off
    from dynamic3dgaussians_tpu.train.losses import physics_losses
    q = rng.normal(size=(cap, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    variables = {
        "neighbor_indices": idx,
        "edge_rank": plan.rank, "edge_row_ptr": plan.row_ptr,
        "neighbor_weight": jnp.asarray(
            rng.uniform(0.3, 1, (cap, k)).astype(np.float32)),
        "neighbor_dist": jnp.asarray(
            rng.uniform(0.01, 0.1, (cap, k)).astype(np.float32)),
        "prev_inv_rot": jnp.asarray(q),
        "prev_offset": jnp.asarray(
            rng.normal(size=(3, k, cap)).astype(np.float32) * 0.02),
        "prev_col": jnp.asarray(
            rng.uniform(0, 1, (cap, 3)).astype(np.float32)),
        "init_bg_pts": jnp.asarray(
            rng.normal(size=(cap, 3)).astype(np.float32)),
        "init_bg_rot": jnp.asarray(q),
    }
    win_vars = dict(variables)
    win_vars.update(win_start=window.win_start,
                    win_idx_local=window.idx_local, win_lanes=window.lanes,
                    win_spill_row=window.spill_row,
                    win_spill_k=window.spill_k,
                    win_spill_src=window.spill_src)
    prefix_vars = dict(variables)
    prefix_vars.update(edge_rank=plan_prefix.rank,
                       edge_row_ptr=plan_prefix.row_ptr)
    means = jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32))
    rots = jnp.asarray(q)
    cols = variables["prev_col"]
    is_fg = jnp.asarray(np.arange(cap) < n_fg)
    alive = jnp.asarray(np.arange(cap) < n_fg + 40960)

    def mk_loss(v):
        @jax.jit
        def loss_grad(m):
            def inner(mm):
                ls = physics_losses(mm, rots, cols, v, is_fg, alive)
                return (2.0 * ls["rigid"] + 2.0 * ls["rot"] + 2.0 * ls["iso"]
                        + 2.0 * ls["floor"] + 20.0 * ls["bg"]
                        + 0.01 * ls["soft_col_cons"])
            return jax.value_and_grad(inner)(m)
        return loss_grad

    lg_g = mk_loss(variables)
    lg_w = mk_loss(win_vars)
    lg_p = mk_loss(prefix_vars)
    vg = timed("physics[gather]", lambda: jax.device_get(lg_g(means)))
    vw = timed("physics[window]", lambda: jax.device_get(lg_w(means)))
    vp = timed("physics[prefix]", lambda: jax.device_get(lg_p(means)))
    if vg is not None and vw is not None:
        emit("physics_loss_delta", float(abs(vg[0] - vw[0])))
        emit("physics_grad_delta", float(np.abs(vg[1] - vw[1]).max()))
    if vg is not None and vp is not None:
        emit("physics_loss_delta_prefix", float(abs(vg[0] - vp[0])))
        emit("physics_grad_delta_prefix", float(np.abs(vg[1] - vp[1]).max()))
    for name, fn in (("physics_gather", lg_g), ("physics_window", lg_w),
                     ("physics_prefix", lg_p)):
        ms = timed(f"time[{name}]", pipelined_ms,
                   lambda s, fn=fn: fn(means + s)[1], 10)
        if ms is not None:
            emit(f"{name}_ms", round(ms, 3))

    print("NEIGHBOR_WINDOW_RESULT " + json.dumps(OUT), flush=True)


if __name__ == "__main__":
    import os
    main()
    os._exit(0)
