#!/bin/bash
# Round-3 endgame watcher: relay recovery -> gate + bench only
# (tools/tpu_late.sh). The full sweep/scale/dynamic queue no longer fits
# the remaining round time.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "late watch start $(date)"
while true; do
    if python - <<'PYEOF'
import socket, sys
try:
    s = socket.create_connection(("127.0.0.1", 8082), timeout=3)
    s.close()
    sys.exit(0)
except Exception:
    sys.exit(1)
PYEOF
    then break; fi
    sleep 45
done
echo "relay back $(date) — settling"
sleep 45
bash tools/tpu_late.sh
