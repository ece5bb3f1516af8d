#!/bin/bash
# Round-4 query FLEET scaling windows, synchronized-start shared-wall
# protocol (aggregate qps = total queries / union span): 4x local[4]
# vs 1 (cores 0-15), then 4x local[2] vs 1 (cores 0-7, the
# memory-bandwidth-headroom regime). Ambient probes bracket each.
cd /root/repo
probe() {
python - <<'PYEOF'
import time, numpy as np
for i in range(3):
    t0 = time.time()
    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)
    a[::4096] = 1
    print("ambient fault_in_mb_s", int(64 / (time.time() - t0)), flush=True)
    del a
    time.sleep(2)
PYEOF
}
date; probe
echo "=== fleet 4,16 ==="
python scripts/query_scaling_bench.py --fleet --levels 4,16 --docs 1000000 --reps 3
probe
echo "=== fleet 2,8 ==="
python scripts/query_scaling_bench.py --fleet --levels 2,8 --docs 1000000 --reps 3
probe; date
