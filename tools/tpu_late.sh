#!/bin/bash
# Late-recovery TPU session: when the relay comes back with little round
# time left, skip the sweep/scale/dynamic queue and land only the two
# driver-auditable artifacts — the compiled-kernel golden gate and a clean
# bench — then leave the device idle for the driver's own bench run.
# Usage: kill the watcher (tools/tpu_watch.sh) and queue2 by EXACT pid
# first, then: nohup bash tools/tpu_late.sh >> artifacts/tpu_late.log 2>&1 &
set -x
set -o pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout -k 60 1800 python -u tools/run_tpu_gate.py 2>&1 | grep -v WARNING \
    | tee artifacts/tpu_gate_r03.txt
echo "gate rc=${PIPESTATUS[0]}"  # grep -v exits 1 on all-WARNING output
sleep 30
timeout -k 60 4000 python -u bench.py 2>&1 | grep -v WARNING \
    | tee artifacts/bench_builder_r03.txt
echo "LATE SESSION DONE $(date)"
