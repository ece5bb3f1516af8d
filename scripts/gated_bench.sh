#!/bin/bash
# Verdict-r3 item #1: one health-gated bench.py artifact. Waits for
# host quiescence (no java/pytest) + healthy fault-in (median-of-3
# probe > 500 MB/s), then runs bench.py and writes the JSON line to
# $OUT (default scripts/bench_gated.json). If the gate never opens
# within MAX_WAIT_MIN, records the rejected probes instead.
cd /root/repo
OUT=${1:-scripts/bench_gated.json}
MAX_WAIT_MIN=${2:-60}
LOG=scripts/gated_bench.log
: > "$LOG"
deadline=$(( $(date +%s) + MAX_WAIT_MIN * 60 ))
while true; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "$(date +%H:%M:%S) gate never opened in ${MAX_WAIT_MIN}min" >> "$LOG"
    exit 1
  fi
  if pgrep -f 'java|pytest' > /dev/null 2>&1; then
    echo "$(date +%H:%M:%S) busy (java/pytest running)" >> "$LOG"
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
  echo "$(date +%H:%M:%S) fault_in=${rate}MB/s samples=[${probe#* }]" >> "$LOG"
  if [ "$rate" -gt 500 ]; then break; fi
  sleep 60
done
echo "$(date +%H:%M:%S) gate open — running bench.py" >> "$LOG"
python bench.py 2>> "$LOG" | tail -1 > "$OUT"
# $? after a pipeline is tail's status (always 0) — record bench.py's
rc=${PIPESTATUS[0]}
echo "$(date +%H:%M:%S) done rc=$rc -> $OUT" >> "$LOG"
