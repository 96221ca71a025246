#!/bin/bash
# Round-3 TPU session 1: wait for a clean device, then run the
# compiled-kernel golden gate and the perf-variant sweep, batched in ONE
# shot so no client is ever killed mid-flight (PROFILE.md session
# protocol). Each python step has its own internal phase timeouts.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
python -u tools/wait_device.py 2>&1 | grep -v WARNING
python -u tools/run_tpu_gate.py 2>&1 | grep -v WARNING | tee artifacts/tpu_gate_r03.txt
python -u tools/bench_r3_variants.py 2>&1 | grep -v WARNING
echo "SESSION DONE"
