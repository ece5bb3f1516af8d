#!/bin/bash
# Wait until (a) the host serves fresh pages at a healthy rate (3
# consecutive probes > 300 MB/s fault-in) AND (b) no other JVM /
# pytest is running (in-VM contention doesn't show in steal%, see
# BENCH.md), then run one interleaved scaling window. Leaves its
# verdicts in /tmp/gated_window.log.
#
# Args: [reps] [docs]   (default 3 reps of 1M docs ≈ 25 min healthy)
cd /root/repo
REPS=${1:-3}
DOCS=${2:-1000000}
ok=0
while [ "$ok" -lt 3 ]; do
  # quiescence: any running java (other Spark session) or pytest
  # resets the streak — their CPU pollutes a window invisibly
  if pgrep -f 'java|pytest' > /dev/null 2>&1; then
    echo "$(date +%H:%M:%S) busy (java/pytest running) ok=0"
    ok=0
    sleep 60
    continue
  fi
  # Median of 3 back-to-back allocations, all three logged: the FIRST
  # allocation in a fresh interpreter routinely reads 5-20x slower
  # than the next two (allocator warmup, not host state) — observed
  # 98 then 4508 then 2029 MB/s in one probe — so the cold outlier is
  # discarded; but max-of-3 is biased optimistic on a genuinely
  # degraded host that is briefly fast once per probe, so the gate
  # reads the MEDIAN.
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
  echo "$(date +%H:%M:%S) fault_in=${rate}MB/s samples=[${probe#* }] ok=${ok}"
  if [ "$rate" -gt 300 ]; then ok=$((ok + 1)); else ok=0; fi
  sleep 90
done
echo "$(date +%H:%M:%S) healthy + quiet — launching window"
QWS_SKIP_QUERIES=1 python scripts/scaling_bench.py \
  --levels 2,8 --docs "$DOCS" --reps "$REPS" --runs 1
