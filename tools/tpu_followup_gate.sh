#!/bin/bash
# Wait for the variants process to finish, then run the compiled-kernel
# golden gate (it failed earlier on a transient backend outage).
set -x
set -o pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 30; done
sleep 60   # let the finished client's session close out
python -u tools/run_tpu_gate.py 2>&1 | grep -v WARNING | tee artifacts/tpu_gate_r03.txt
echo "GATE DONE rc=$?"
