#!/bin/bash
# Round-3 TPU queue 2: the big evidence runs. Waits for queue 1 (watcher:
# gate + variant sweep, tools/tpu_watch.sh) to print QUEUE DONE, then runs
#   1. BASELINE config-2 scale run (30k init, growth pressure, 10k iters)
#   2. config-3 dynamic-sequence run (50k alive, 12 timesteps, physics)
#   3. bench.py (builder-side record of the driver metric)
# Each step is bounded by `timeout` so a mid-run tunnel death cannot stall
# the queue forever (SIGTERM to a client whose tunnel is already dead
# wedges nothing real; a healthy run finishes well inside the bound).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q "QUEUE DONE" artifacts/tpu_watch.log 2>/dev/null; do
    sleep 60
done
sleep 30
echo "== scale run (config 2) =="
timeout -k 60 9000 python -u tools/scale_run.py \
    --iters 10000 --gt_mult 8 --cams 27 --report 100 \
    --out artifacts/scale_run_tpu.json 2>&1 | grep -v WARNING \
    | tee artifacts/scale_run_tpu.txt
echo "== dynamic run (config 3) =="
sleep 30
timeout -k 60 7200 python -u tools/dynamic_run.py \
    --out artifacts/dynamic_run_tpu.json 2>&1 | grep -v WARNING \
    | tee artifacts/dynamic_run_tpu.txt
echo "== bench =="
sleep 30
timeout -k 60 4000 python -u bench.py 2>&1 | grep -v WARNING \
    | tee artifacts/bench_builder_r03.txt
echo "QUEUE2 DONE $(date)"
