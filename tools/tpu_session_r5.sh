#!/bin/bash
# Round-5 TPU work session, strictly serial (ONE device process at a time;
# single host core — see PROFILE.md "Operational caveat" + verify skill).
# Order = value order from VERDICT r4: render headline -> end-to-end it/s
# -> config-2 scale -> long sequence for tracking.
#
# Each step has an internal timeout and exits by itself; a health probe
# gates every step so a wedged session skips cleanly instead of queueing.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

health() {
    timeout 240 python -u -c "
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref): o_ref[:] = x_ref[:] * 2.0
x = jnp.ones((8,128), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))(x)
print('health ok', float(y.sum()))" 2>&1 | grep -q "health ok"
}

wait_healthy() {
    for i in $(seq 1 20); do
        if health; then echo "HEALTHY after probe $i"; return 0; fi
        echo "probe $i: unhealthy, sleeping 180s"; sleep 180
    done
    echo "GIVE UP: device never became healthy"; return 1
}

wait_healthy || exit 1

timeout 3600 python -u tools/bench_r5_probe3b.py \
    > artifacts/r5_probe3b.log 2>&1
git add artifacts/r5_probe3b.log && git commit -q -m "r5: tile_batch hardware probe log" || true

wait_healthy || exit 1
timeout 5400 python -u bench.py 2>&1 | grep -v WARNING \
    > artifacts/bench_r5_step1.txt
git add artifacts/bench_r5_step1.txt && git commit -q -m "r5: builder bench record (post tile_batch)" || true

wait_healthy || exit 1
timeout 6000 python -u tools/dynamic_run.py --timesteps 50 --iters0 1000 \
    --iters 200 --steps_per_call 25 --n 50000 --hw 256 --cams 8 \
    --out artifacts/dynamic_run_tpu_r5.json \
    --save_params artifacts/seq50_params.npz 2>&1 | grep -v WARNING \
    | tail -80 > artifacts/dynamic_run_tpu_r5.log
git add artifacts/dynamic_run_tpu_r5.json artifacts/dynamic_run_tpu_r5.log \
    && git commit -q -m "r5: 50-timestep dynamic sequence on TPU (scan-window trainer)" || true

wait_healthy || exit 1
timeout 6000 python -u tools/scale_run.py --n 30000 --gt_mult 8 --hw 400 \
    --cams 6 --iters 3000 --report 100 --densify_every 100 \
    --out artifacts/scale_run_tpu_r5.json 2>&1 | grep -v WARNING \
    | tail -60 > artifacts/scale_run_tpu_r5.log
git add artifacts/scale_run_tpu_r5.json artifacts/scale_run_tpu_r5.log \
    && git commit -q -m "r5: config-2 scale run on TPU (growth enabled)" || true

echo "SESSION DONE"
