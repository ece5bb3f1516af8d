#!/bin/bash
# Round-5 query FLEET scaling window on final code — the north_rule's
# query-path N->4N evidence (searcher scale-out = independent pinned
# drivers over ONE staged immutable index, the reference's
# searcher-replica deployment shape). Same synchronized-start
# shared-wall protocol as round 4 (run_window_r4_fleet2.sh), with the
# round-5 lesson applied: gate at launch AND self-validate after
# (host fault-in can collapse 3x mid-run with steal ~0).
#
# Runs the 2<->8 pair (the memory-bandwidth-headroom regime that is
# the accepted rule evidence) then the 4<->16 ceiling datapoint.
cd /root/repo
LOG=${QWS_FLEET_LOG:-scripts/window_r5_fleet.log}

ok=0
while [ "$ok" -lt 3 ]; do
  if pgrep -f 'java|pytest' > /dev/null 2>&1; then
    echo "$(date +%H:%M:%S) busy (java/pytest running) ok=0" >> "$LOG"
    ok=0
    sleep 60
    continue
  fi
  probe=$(python - <<'EOF'
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
EOF
)
  rate=${probe%% *}
  echo "$(date +%H:%M:%S) fault_in=${rate}MB/s samples=[${probe#* }] ok=${ok}" >> "$LOG"
  if [ "$rate" -gt 300 ]; then ok=$((ok + 1)); else ok=0; fi
  sleep 90
done
echo "$(date +%H:%M:%S) healthy + quiet — launching fleet window" >> "$LOG"
date >> "$LOG"
echo "=== fleet 2,8 ===" >> "$LOG"
python scripts/query_scaling_bench.py --fleet --levels 2,8 --docs 1000000 --reps 3 >> "$LOG" 2>&1
echo "=== fleet 4,16 ===" >> "$LOG"
python scripts/query_scaling_bench.py --fleet --levels 4,16 --docs 1000000 --reps 3 >> "$LOG" 2>&1
# closing ambient probe: reps already interleave lo/hi, so the main
# contamination tell is the closing rate + per-rep spread in the JSON
python - <<'EOF' >> "$LOG"
import time
import numpy as np
for _ in range(3):
    t0 = time.time()
    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)
    a[::4096] = 1
    print("closing fault_in_mb_s", int(64 / (time.time() - t0)), flush=True)
    del a
    time.sleep(2)
EOF
date >> "$LOG"
