"""Round-5 probe: forward-kernel speed-of-light decomposition.

VERDICT r4 item 1 asks for a MEASURED per-stage budget that defines "fast
enough" for the render kernel instead of a vibe. This probe isolates the
three resources the tile walk consumes, at exactly the bench shape
(P=256 px/tile, chunk=256 records, 2143 chunks — the 200k-gaussian scene's
schedule from artifacts/r5_probe.log):

  compute_only   the fused cell pipeline on VMEM-resident data: grid walks
                 n_chunks steps, every step re-processes the SAME block
                 (BlockSpec maps all steps to block 0 — no HBM traffic
                 after the first load). This is the VPU+MXU floor.
  dma_only       streams every chunk from HBM (real BlockSpec) but reduces
                 it with one jnp.max — the memory-path floor.
  stream_compute streams AND computes — the realizable kernel floor;
                 raster_fwd's gap above this is bookkeeping/serialization.

Each kernel writes a (1,1) accumulator so nothing folds away.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
           python tools/bench_vpu_sol.py | tee artifacts/vpu_sol_probe.log
"""

from __future__ import annotations

import functools
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


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import (
        GEOM_ROWS, chunk_logalpha_fused, lane_inclusive_scan,
        tile_pixel_coords, tile_pixel_feats)
    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    from dynamic3dgaussians_tpu.utils.timing import pipelined_ms
    enable()

    import sys
    small = "--small" in sys.argv                    # CPU shakeout
    p, chunk, n_chunks, n_rows = ((256, 256, 4, 16) if small
                                  else (256, 256, 2143, 16))
    interpret = jax.default_backend() != "tpu"
    rng = np.random.RandomState(0)
    rec = rng.uniform(-1, 1, (n_rows, n_chunks * chunk)).astype(np.float32)
    rec[6] = -2.0   # log2-op rows: plausible alphas
    rec[7] = -2.0

    def fused_process(records, feats16, logt, acc):
        m = chunk_logalpha_fused(records[:GEOM_ROWS], feats16, 0.0, 0.0,
                                 0, chunk, chunk)
        alpha = jnp.exp2(m)
        logs = jnp.log2(1.0 - alpha)
        cum = lane_inclusive_scan(logs, chunk, interpret, "matmul_block128")
        w = jnp.exp2(m + (cum - logs) + logt)
        acc_new = acc + jax.lax.dot_general(
            w, records[GEOM_ROWS:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return logt + cum[:, chunk - 1:chunk], acc_new

    def kern_compute(rec_ref, out_ref, logt_scr, acc_scr):
        step = pl.program_id(0)
        px, py = tile_pixel_coords(jnp.int32(0), 40, 16, 16)
        feats16 = tile_pixel_feats(px, py, 0.0, 0.0, p)

        @pl.when(step == 0)
        def _():
            logt_scr[:] = jnp.zeros((p, 1), jnp.float32)
            acc_scr[:] = jnp.zeros((p, n_rows - GEOM_ROWS), jnp.float32)

        lt, ac = fused_process(rec_ref[:], feats16, logt_scr[:], acc_scr[:])
        logt_scr[:] = lt
        acc_scr[:] = ac

        @pl.when(step == n_chunks - 1)
        def _():
            out_ref[0, 0] = jnp.sum(acc_scr[:]) + jnp.sum(logt_scr[:])

    def kern_dma(rec_ref, out_ref, acc_scr):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_scr[:] = jnp.zeros((8, 128), jnp.float32)

        acc_scr[:] += rec_ref[0:8, 0:128] + rec_ref[8:16, chunk - 128:chunk]

        @pl.when(step == n_chunks - 1)
        def _():
            out_ref[0, 0] = jnp.sum(acc_scr[:])

    def build(kind):
        resident = kind == "compute_only"
        scratch = ([pltpu.VMEM((p, 1), jnp.float32),
                    pltpu.VMEM((p, n_rows - GEOM_ROWS), jnp.float32)]
                   if kind != "dma_only" else
                   [pltpu.VMEM((8, 128), jnp.float32)])
        kern = kern_dma if kind == "dma_only" else kern_compute
        return pl.pallas_call(
            kern,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec(
                (n_rows, chunk),
                (lambda i: (0, 0)) if resident else (lambda i: (0, i)))],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )

    rec_dev = jnp.asarray(rec)
    for kind in ("compute_only", "dma_only", "stream_compute"):
        call = build(kind)
        fn = jax.jit(lambda s, call=call: call(rec_dev + s)[0, 0])
        r = timed(f"warm[{kind}]", lambda fn=fn: float(fn(np.float32(0.0))))
        if r is None:
            continue
        ms = timed(f"time[{kind}]", pipelined_ms, fn, 20)
        if ms is not None:
            cells = n_chunks * chunk * p
            emit(kind, {"ms": round(ms, 3),
                        "ns_per_cell": round(ms * 1e6 / cells, 3),
                        "GB_s": round(rec.nbytes / ms / 1e6, 1)})

    # raw transcendental ceiling: one exp2 over the same cell count, XLA
    bigx = jnp.asarray(
        rng.uniform(-8, 0, (n_chunks, p, 128)).astype(np.float32))
    exp_fn = jax.jit(lambda s: jnp.sum(jnp.exp2(bigx + s)))
    r = timed("warm[exp2_xla]", lambda: float(exp_fn(np.float32(0.0))))
    if r is not None:
        ms = timed("time[exp2_xla]", pipelined_ms, exp_fn, 10)
        if ms is not None:
            emit("exp2_xla", {"ms": round(ms, 3),
                              "ns_per_elem": round(
                                  ms * 1e6 / bigx.size, 4)})

    print("VPU_SOL_RESULT " + json.dumps(OUT), flush=True)


if __name__ == "__main__":
    import os
    main()
    os._exit(0)
