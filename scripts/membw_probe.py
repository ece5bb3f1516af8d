"""Aggregate memory-bandwidth probe: how much DRAM bandwidth does this
box actually deliver to T concurrent workers?

Purpose: attribute the pinned N->4N build-scaling numbers. If the
box's aggregate copy bandwidth rises ~4x from 4 to 16 workers, a
bandwidth-bound job SHOULD scale ~0.8+ and a low efficiency is the
code's fault; if aggregate bandwidth saturates well below 4x, that
saturation is a hard ceiling on ANY bandwidth-bound job's measured
scaling on this single box — and is exactly the resource a multi-node
cluster does NOT share (each node brings its own memory controllers).

Method: T pinned processes (multiprocessing, one per hardware thread
0..T-1), each repeatedly copying a 256 MB uint8 array (read+write
streams, numpy memcpy — the same order-of-magnitude working-set and
access pattern as Arrow batch encode) for ~3 s after a barrier.
Reports per-T aggregate GB/s as one JSON line.

Usage: python scripts/membw_probe.py [T ...]   (default 1 4 16 32)
"""
import json
import multiprocessing as mp
import os
import sys
import time

ARR_MB = 256
SECS = 3.0


def worker(cpu, barrier, out):
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    src = np.random.randint(0, 255, ARR_MB << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault both in
    barrier.wait()
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECS:
        np.copyto(dst, src)
        n += 1
    dt = time.time() - t0
    # each copy moves ARR_MB read + ARR_MB written
    out.put((cpu, 2 * n * ARR_MB / 1024.0 / dt))


def measure(threads):
    barrier = mp.Barrier(threads)
    out = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(c, barrier, out))
        for c in range(threads)
    ]
    for p in procs:
        p.start()
    rates = [out.get()[1] for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main():
    levels = [int(x) for x in sys.argv[1:]] or [1, 4, 16, 32]
    result = {}
    for t in levels:
        gbs = measure(t)
        result[str(t)] = round(gbs, 1)
    base = result[str(levels[0])]
    print(
        json.dumps(
            {
                "metric": "aggregate_copy_bandwidth_gb_s",
                "array_mb": ARR_MB,
                "levels": result,
                "scaling_vs_first": {
                    k: round(v / base, 2) for k, v in result.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
