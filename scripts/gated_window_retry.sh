#!/bin/bash
# Self-rejecting scaling window: gate on host health at launch
# (gated_window.sh), then POST-validate the finished window and retry
# if it was contaminated mid-run — the round-5 first attempt showed
# the host's fault-in rate can collapse 3x AFTER a healthy gate opens
# (identical 8-core reps swung 75s vs 18.8s on the docmap phase with
# steal ~0), so a launch-time gate alone is not sufficient.
#
# Accept criteria, per parallelism level, over the window's own rep
# samples (no external probe needed — the reps ARE the probe):
#   max(docs_per_sec) / min(docs_per_sec) <= 1.35   (quiet host: r4
#   observed 1.15x at 2 cores, 1.29x at 8 incl. one cold first rep)
# plus a closing fault-in probe > 300 MB/s (median of 3).
#
# Args: [attempts] [reps] [docs]
cd /root/repo
ATTEMPTS=${1:-4}
REPS=${2:-3}
DOCS=${3:-1000000}
LOG=${QWS_WINDOW_LOG:-scripts/window_r5_build28.log}

for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "=== attempt ${attempt}/${ATTEMPTS} $(date +%H:%M:%S) ===" >> "$LOG"
  bash scripts/gated_window.sh "$REPS" "$DOCS" >> "$LOG" 2>&1
  verdict=$(python - "$LOG" <<'EOF'
import json
import sys

lines = open(sys.argv[1]).read().splitlines()
# samples from the CURRENT attempt only (after the last attempt marker)
last = max(i for i, l in enumerate(lines) if l.startswith("=== attempt"))
by_level = {}
final = None
for line in lines[last:]:
    if line.startswith("rep ") and "{" in line:
        d = json.loads(line.split(": ", 1)[1])
        by_level.setdefault(d["cores"], []).append(d["docs_per_sec"])
    if '"scaling_efficiency"' in line:
        final = line
if not by_level or final is None:
    print("REJECT no-complete-window")
    raise SystemExit
worst = max(max(v) / min(v) for v in by_level.values())
ratios = {k: round(max(v) / min(v), 3) for k, v in by_level.items()}
if worst > 1.35:
    print(f"REJECT intra-level-variance {ratios}")
else:
    print(f"ACCEPT intra-level-variance {ratios}")
EOF
)
  rate=$(python - <<'EOF'
import time
import numpy as np
rates = []
for _ in range(3):
    t0 = time.time()
    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)
    a[::4096] = 1
    rates.append(int(64 / (time.time() - t0)))
    del a
print(sorted(rates)[1])
EOF
)
  echo "post-check: ${verdict}; closing fault_in=${rate}MB/s" >> "$LOG"
  if [[ "$verdict" == ACCEPT* && "$rate" -gt 300 ]]; then
    echo "attempt ${attempt}: ACCEPTED" >> "$LOG"
    exit 0
  fi
  echo "attempt ${attempt}: rejected — retrying" >> "$LOG"
  sleep 120
done
echo "all ${ATTEMPTS} attempts rejected" >> "$LOG"
exit 1
