#!/bin/bash
# Same health gate as gated_window.sh (3 consecutive median-of-3
# fault-in probes > 300 MB/s, JVM/pytest quiescence), then ONE
# build-fleet 4<->16 window with bracketing probes.
cd /root/repo
ok=0
while [ "$ok" -lt 3 ]; do
  if pgrep -f 'java|pytest' > /dev/null 2>&1; then
    echo "$(date +%H:%M:%S) busy (java/pytest running) ok=0"
    ok=0; sleep 60; continue
  fi
  probe=$(python - <<'PYEOF'
import time
import numpy as np
rates = []
for _ in range(3):
    t0 = time.time()
    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)
    a[::4096] = 1
    rates.append(int(64 / (time.time() - t0)))
    del a
print(sorted(rates)[1], *rates)
PYEOF
)
  rate=${probe%% *}
  echo "$(date +%H:%M:%S) fault_in=${rate}MB/s samples=[${probe#* }] ok=${ok}"
  if [ "$rate" -gt 300 ]; then ok=$((ok + 1)); else ok=0; fi
  sleep 90
done
echo "$(date +%H:%M:%S) healthy + quiet — launching build-fleet window"
date
python scripts/build_fleet_bench.py --fleet --levels 4,16 --docs 1000000 --reps 2
python - <<'PYEOF'
import time, numpy as np
for i in range(3):
    t0 = time.time()
    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)
    a[::4096] = 1
    print("ambient_post fault_in_mb_s", int(64 / (time.time() - t0)), flush=True)
    del a
    time.sleep(2)
PYEOF
date
