#!/bin/bash
# Round-4 query FLEET scaling window: 4 independent pinned local[4]
# drivers over one staged index vs 1 (3 reps), ambient probes
# bracketing.
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
python scripts/query_scaling_bench.py --fleet --levels 4,16 --docs 1000000 --reps 3
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
