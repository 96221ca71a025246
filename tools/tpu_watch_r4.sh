#!/bin/bash
# Round-4 TPU recovery pipeline (VERDICT r4 item 1): probe the relay
# socket every 60s; the moment it answers, run the evidence queue
# EARLIEST-FIRST, committing each artifact before starting the next so a
# second outage can never erase the round:
#   gate -> bench -> variants sweep -> bench rerun
#   -> dynamic run (config 3) -> scale run (config 2)
# No step is ever killed externally (a killed axon client leaves a stale
# server-side session holding the device, PROFILE.md); every python job
# has internal phase timeouts and incremental flushing.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=artifacts/tpu_watch_r4.log

commit() {
  for i in 1 2 3; do
    git add artifacts/ 2>>"$LOG"
    if git commit -m "$1" >>"$LOG" 2>&1; then return 0; fi
    sleep 15
  done
  echo "commit failed: $1" >>"$LOG"
}

echo "r4 watch start $(date)" | tee -a "$LOG"
while true; do
  if python - <<'EOF'
import socket, sys
try:
    s = socket.create_connection(("127.0.0.1", 8082), timeout=3)
    s.close()
    sys.exit(0)
except Exception:
    sys.exit(1)
EOF
  then break; fi
  sleep 60
done
echo "relay back $(date) — settling 60s" | tee -a "$LOG"
sleep 60

echo "== step 0: wait out any stale device session ==" | tee -a "$LOG"
# a stale axon session (left by a killed client) holds the device ~30-60
# min; wait_device blocks with NO external timeout until a tiny op runs
# (killing it would create exactly the stale session it waits out)
python -u tools/wait_device.py 2>&1 | grep -v WARNING | tee -a "$LOG"

echo "== step 1: compiled-kernel gate (all shipping configs) ==" | tee -a "$LOG"
python -u tools/run_tpu_gate.py 2>&1 | grep -v WARNING | tee artifacts/tpu_gate_r04.txt
commit "Add round-4 TPU compiled-kernel gate log (all shipping configs)"

echo "== step 2: bench ==" | tee -a "$LOG"
python -u bench.py 2>&1 | grep -v WARNING | tee artifacts/bench_r04_step2.txt
commit "Add first on-TPU bench result for round 4"

echo "== step 3: perf variant sweep ==" | tee -a "$LOG"
python -u tools/bench_r3_variants.py 2>&1 | grep -v WARNING | tee artifacts/variants_r04.txt
commit "Add on-TPU perf variant sweep results"

echo "== step 4: bench rerun ==" | tee -a "$LOG"
python -u bench.py 2>&1 | grep -v WARNING | tee artifacts/bench_r04_step4.txt
commit "Add post-sweep bench rerun result"

echo "== step 5: dynamic sequence run (config 3) ==" | tee -a "$LOG"
python -u tools/dynamic_run.py --out artifacts/dynamic_run_tpu.json \
  2>&1 | grep -v WARNING | tail -60 >> "$LOG"
commit "Add on-TPU dynamic-sequence run artifact (config 3)"

echo "== step 6: scale run (config 2) ==" | tee -a "$LOG"
python -u tools/scale_run.py --iters 10000 --report 100 --gt_mult 8 \
  --cams 27 --out artifacts/scale_run_tpu.json \
  2>&1 | grep -v WARNING | tail -60 >> "$LOG"
commit "Add on-TPU scale run artifact (config 2)"

echo "QUEUE DONE $(date)" | tee -a "$LOG"
