#!/bin/bash
cd /root/repo
date
QWS_SKIP_QUERIES=1 python scripts/scaling_bench.py --levels 2,8 --docs 1000000 --reps 3
date
