"""Log the sandbox's ambient noise every interval: hypervisor steal%
and fresh-page fault-in rate (MB/s first-touching a 64MB numpy
buffer). The fault-in rate is the signal steal% misses: host-side
memory reclaim serves fresh guest pages at ~10 MB/s during bad
periods (measured 2026-08-18) vs multi-GB/s when healthy — the
difference decides whether a scaling window is worth running.

Usage: python scripts/noise_monitor.py [interval_s] >> /tmp/noise.tsv
"""

from __future__ import annotations

import sys
import time

import numpy as np


def steal_sample(secs: float = 2.0) -> float:
    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))

    a = snap()
    time.sleep(secs)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    return 100.0 * d[7] / max(sum(d), 1)


def fault_in_rate_mb_s(mb: int = 64) -> float:
    t0 = time.time()
    a = np.empty(mb * 1024 * 1024, dtype=np.uint8)
    a[:: 4096] = 1  # one write per page → pure first-touch cost
    dt = time.time() - t0
    del a
    return mb / dt


def main() -> None:
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    print("ts\tsteal_pct\tfault_in_mb_s", flush=True)
    while True:
        st = steal_sample()
        fr = fault_in_rate_mb_s()
        print(f"{time.strftime('%H:%M:%S')}\t{st:.2f}\t{fr:.0f}", flush=True)
        time.sleep(max(0.0, interval - 2.0))


if __name__ == "__main__":
    main()
