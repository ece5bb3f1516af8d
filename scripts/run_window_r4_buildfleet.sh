#!/bin/bash
# Round-4 build FLEET window: 4 independent pinned local[4] builders
# (process isolation control for the in-process 4<->16 = 0.49) vs 1,
# 1M docs each, synchronized start, union-span aggregation.
cd /root/repo
date
python - <<'PYEOF'
import time, numpy as np
for i in range(3):
    t0 = time.time()
    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)
    a[::4096] = 1
    print("ambient_pre fault_in_mb_s", int(64 / (time.time() - t0)), flush=True)
    del a
    time.sleep(2)
PYEOF
python scripts/build_fleet_bench.py --fleet --levels 4,16 --docs 1000000 --reps 3
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
