#!/bin/bash
# Wait until the host serves fresh pages at a healthy rate (3
# consecutive probes > 300 MB/s fault-in), then run one interleaved
# scaling window. Leaves its verdicts in /tmp/gated_window.log.
cd /root/repo
ok=0
while [ "$ok" -lt 3 ]; do
  rate=$(python - <<'EOF'
import time
import numpy as np
t0 = time.time()
a = np.empty(64 * 1024 * 1024, dtype=np.uint8)
a[::4096] = 1
print(int(64 / (time.time() - t0)))
EOF
)
  echo "$(date +%H:%M:%S) fault_in=${rate}MB/s ok=${ok}"
  if [ "$rate" -gt 300 ]; then ok=$((ok + 1)); else ok=0; fi
  sleep 90
done
echo "$(date +%H:%M:%S) healthy — launching window"
QWS_SKIP_QUERIES=1 python scripts/scaling_bench.py \
  --levels 2,8 --docs 1000000 --reps 5 --runs 1
