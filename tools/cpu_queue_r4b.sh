#!/bin/bash
# Round-4 CPU evidence queue, revision b: the first attempt's densify
# cadence (every 50, end 600) projected to only ~116k alive — short of
# the >=150k target (VERDICT r4 item 3). Densify every 25 to 650 reaches
# the target with margin; everything else unchanged. The first attempt's
# partial artifact (through i~540, capacity growth at i=300 with zero
# drops) is preserved as artifacts/scale_mech_cpu_partial_r4a.json.
cd /root/repo
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
LOG=artifacts/cpu_queue_r4.log

commit() {
  for i in 1 2 3; do
    git add artifacts/ 2>>"$LOG"
    if git commit -m "$1" >>"$LOG" 2>&1; then return 0; fi
    sleep 15
  done
  echo "commit failed: $1" >>"$LOG"
}

echo "cpu queue (rev b) start $(date)" | tee -a "$LOG"

echo "== 1. config-2 mechanism run to completion (>=150k) ==" | tee -a "$LOG"
python -u tools/scale_run.py --n 30000 --gt_mult 8 --hw 128 --cams 6 \
  --iters 1200 --densify_every 25 --densify_end 650 --report 25 \
  --out artifacts/scale_mech_cpu.json >> "$LOG" 2>&1 || true
commit "Complete the config-2 CPU mechanism run (1200 iters, growth past 150k)"

echo "== 2. config-3 dynamic run (CPU) ==" | tee -a "$LOG"
python -u tools/dynamic_run.py --n 50000 --timesteps 10 --iters0 200 \
  --iters 80 --hw 128 --cams 4 --out artifacts/dynamic_run_cpu.json \
  >> "$LOG" 2>&1 || true
commit "Add config-3 dynamic-sequence CPU artifact (10 timesteps, 50k)"

echo "== 3. K-escalation A/B ==" | tee -a "$LOG"
python -u tools/scale_run.py --n 30000 --gt_mult 8 --hw 128 --cams 6 \
  --iters 400 --densify_every 50 --report 25 --k_cap 16 \
  --out artifacts/kcap_ab_escalating.json >> "$LOG" 2>&1 || true
python -u tools/scale_run.py --n 30000 --gt_mult 8 --hw 128 --cams 6 \
  --iters 400 --densify_every 50 --report 25 --k_cap 64 \
  --out artifacts/kcap_ab_fixed64.json >> "$LOG" 2>&1 || true
python -u tools/analyze_kcap_ab.py >> "$LOG" 2>&1 || true
commit "Add K-escalation vs fixed-K=64 A/B PSNR trajectories + summary"

echo "CPU QUEUE DONE $(date)" | tee -a "$LOG"
