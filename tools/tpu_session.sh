#!/bin/bash
# One TPU work session: bench -> compiled-kernel golden gate -> scale run.
# Run when the remote compile service is healthy (tiny probe < 5 s).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 7200 python -u bench.py 2>&1 | grep -v WARNING
timeout 5400 python -u tools/run_tpu_gate.py 2>&1 | grep -v WARNING
timeout 7200 python -u tools/scale_run.py --iters 1200 --report 100 \
    2>&1 | grep -v WARNING
