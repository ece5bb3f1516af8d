#!/bin/bash
# Health-gated build-fleet window. Gate = (a) 3 consecutive
# median-of-3 fault-in probes > 300 MB/s, (b) JVM/pytest quiescence,
# (c) a LOADED-steal probe: idle probes can't see the contended-
# period failure mode (attempt 2 read 2-5 GB/s fault-in idle, then
# 9-11% steal the moment 16 vCPUs loaded), so spin 16 real processes
# for ~4s and require <1% steal before opening.
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
  if [ "$ok" -eq 3 ]; then
    for i in $(seq 1 16); do timeout 5 python -c 'while 1: pass' & done
    sleep 1
    lsteal=$(python - <<'PYEOF'
import time
def snap():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]
a = snap(); time.sleep(3.0); b = snap()
d = [y - x for x, y in zip(a, b)]
print(round(100.0 * d[7] / max(sum(d), 1), 2))
PYEOF
)
    wait
    echo "$(date +%H:%M:%S) loaded_steal=${lsteal}%"
    if ! python -c "import sys; sys.exit(0 if float('${lsteal}') < 1.0 else 1)"; then
      echo "$(date +%H:%M:%S) loaded-steal gate failed — back to waiting"
      ok=0
    fi
  fi
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
