#!/bin/bash
# Interleaved A/B: JVM-regex vs python-UDF extraction, same box, same
# corpus, local[8], one build per fresh JVM. Attribution harness for
# the extract-stage regression hypothesis.
cd /root/repo
for rep in 1 2 3; do
  echo "=== rep $rep jvm ==="
  QWS_SKIP_QUERIES=1 python scripts/scaling_bench.py --cores 8 --docs 2000000 --runs 1 2>/dev/null | tail -1
  echo "=== rep $rep py ==="
  QWS_SKIP_QUERIES=1 QWS_EXTRACT_PY=1 python scripts/scaling_bench.py --cores 8 --docs 2000000 --runs 1 2>/dev/null | tail -1
done
