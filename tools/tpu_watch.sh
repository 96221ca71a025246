#!/bin/bash
# Watch for the axon relay to come back (it died at ~14:10; raw-socket
# probe is safe — no axon session), then run the round-3 TPU queue:
# compiled-kernel gate -> perf variant sweep. Each python job exits by
# itself (internal timeouts); nothing here ever kills a TPU client.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "watch start $(date)"
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
echo "relay back $(date) — settling"
sleep 60
echo "== gate =="
python -u tools/run_tpu_gate.py 2>&1 | grep -v WARNING | tee artifacts/tpu_gate_r03.txt
echo "== variants =="
python -u tools/bench_r3_variants.py 2>&1 | grep -v WARNING
echo "QUEUE DONE $(date)"
