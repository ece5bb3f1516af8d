"""Query-path scaling-efficiency evidence for the north_rule.

The build-path 4<->16 window (BENCH.md) is DRAM-bandwidth-bound on
this single box (posting encode streams ~GB/s per core), so its 0.49
reflects the box's memory system, not the job graph. The QUERY path —
BM25 top-k over block-max postings — is compute-bound per task
(decode + score a few posting blocks, ~MBs not GBs), so it gives the
cleaner single-box proxy for the rule's N -> 4N criterion.

Protocol (mirrors scripts/scaling_bench.py, same honesty rules):
- ONE index is staged up front (32 splits, 1M synthetic web pages) —
  identical files, therefore identical per-query task graph at every
  parallelism level;
- each level runs in a fresh JVM, pinned with ``taskset -c 0..N-1``
  so JVM task threads + Arrow python workers share exactly N hardware
  threads (the faithful model of an N-core cluster executor);
- the workload is THROUGHPUT, not single-query latency: a fixed batch
  of queries (6 shapes x --qreps) submitted from a fixed-size thread
  pool (8 in-flight, same at both levels — concurrent queries overlap
  each other's driver/scheduling gaps, exactly like a searcher
  serving QPS). Efficiency = (qps_hi / qps_lo) / (cores_hi/cores_lo);
- levels ALTERNATE within one window (lo, hi, lo, hi, ...) and
  per-level MEDIANS are compared, so noisy-neighbor phases hit both
  levels equally; per-window hypervisor steal%% is recorded.

Worker mode: python scripts/query_scaling_bench.py --cores 4
Wrapper:     python scripts/query_scaling_bench.py --levels 4,16
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scaling_bench import (  # noqa: E402
    CORPUS_PATH,
    NUM_SPLITS,
    SEARCHES,
    SHUFFLE_PARTITIONS,
    _cpu_stat,
    stage_corpus,
)

INDEX_PATH = "/tmp/qws_scaling_index"
POOL = 8  # offered concurrency in same-driver mode (identical per level)


def stage_index(docs: int) -> None:
    """Build the shared index ONCE (unpinned, untimed). Every level
    then queries the same immutable split files."""
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.config import webpages_config
    from quickwit_spark.session import get_spark
    from quickwit_spark.sources.extract import with_extracted_text

    marker = os.path.join(INDEX_PATH, f"_staged_{docs}")
    if os.path.exists(marker):
        return
    stage_corpus(docs)
    shutil.rmtree(INDEX_PATH, ignore_errors=True)
    spark = get_spark("stage_index", shuffle_partitions=SHUFFLE_PARTITIONS)
    pages = with_extracted_text(spark.read.parquet(CORPUS_PATH))
    build_index(
        spark, pages, INDEX_PATH, webpages_config(),
        num_splits=NUM_SPLITS, term_buckets=SHUFFLE_PARTITIONS,
    )
    open(marker, "w").close()
    spark.stop()


def run_worker(cores: int, qreps: int, windows: int,
               pool_size: int | None = None,
               start_at: float = 0.0) -> None:
    from quickwit_spark.operators.search import SearchRequest, search_df
    from quickwit_spark.session import get_spark

    pool_size = pool_size or POOL
    spark = get_spark(f"query_scaling_{cores}", cores=cores,
                      shuffle_partitions=SHUFFLE_PARTITIONS)
    reqs = [SearchRequest(query=q, k=10) for q in SEARCHES.values()]

    # warmup: searcher open (file listing + footer schema), JVM JIT,
    # python-worker spin-up — per-searcher costs, not per-query.
    # TWO passes so the first timed window is steady-state, not a
    # JIT tail (observed: window 1 ran ~40% slower than window 2).
    for _ in range(2):
        for r in reqs:
            search_df(spark, INDEX_PATH, r).collect()

    # fleet synchronization: all procs begin timing at one epoch so
    # their windows cover the SAME wall interval (aggregate qps over
    # a shared span, not a sum of disjoint best windows)
    start_lag = 0.0
    if start_at:
        now = time.time()
        start_lag = max(0.0, now - start_at)
        time.sleep(max(0.0, start_at - now))

    batch = reqs * qreps
    runs = []
    with ThreadPoolExecutor(max_workers=pool_size) as pool:
        for _ in range(windows):
            st0, tot0 = _cpu_stat()
            t0 = time.time()
            list(pool.map(
                lambda r: search_df(spark, INDEX_PATH, r).collect(), batch
            ))
            t1 = time.time()
            secs = t1 - t0
            st1, tot1 = _cpu_stat()
            runs.append({
                "secs": round(secs, 3),
                "qps": round(len(batch) / secs, 2),
                "steal_pct": round(
                    100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2),
                "t0": round(t0, 3),
                "t1": round(t1, 3),
            })
    total_q = len(batch) * len(runs)
    span = runs[-1]["t1"] - runs[0]["t0"]
    print(json.dumps({
        "cores": cores,
        "hw_threads": len(os.sched_getaffinity(0)),
        "queries_per_window": len(batch),
        "pool": pool_size,
        "qps": max(r["qps"] for r in runs),
        "qps_span": round(total_q / span, 2),
        "total_queries": total_q,
        "t0": runs[0]["t0"],
        "t1": runs[-1]["t1"],
        "start_lag": round(start_lag, 2),
        "runs": runs,
    }))


def run_wrapper(levels: list[int], docs: int, reps: int,
                qreps: int, windows: int, pin: bool) -> None:
    stage_index(docs)
    taskset = shutil.which("taskset") if pin else None
    samples: dict[int, list[dict]] = {c: [] for c in levels}
    for rep in range(reps):
        for cores in levels:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--cores", str(cores), "--qreps", str(qreps),
                   "--windows", str(windows)]
            if taskset:
                cmd = [taskset, "-c", f"0-{cores - 1}"] + cmd
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 cwd=REPO, check=True)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            r = json.loads(line)
            samples[cores].append(r)
            print(f"rep {rep + 1}/{reps}: {line}", file=sys.stderr)

    results = {}
    for cores in levels:
        qpss = sorted(s["qps"] for s in samples[cores])
        results[cores] = {
            "cores": cores,
            "qps_median": round(statistics.median(qpss), 2),
            "samples_qps": qpss,
            "steal_pct": [r["steal_pct"] for s in samples[cores]
                          for r in s["runs"]],
        }
    pairs = []
    for lo, hi in zip(levels, levels[1:]):
        eff = (results[hi]["qps_median"] / results[lo]["qps_median"]) / (
            hi / lo)
        pairs.append({"lo": lo, "hi": hi, "efficiency": round(eff, 3)})
    print(json.dumps({
        "metric": "query_scaling_efficiency",
        "value": pairs[0]["efficiency"],
        "unit": "ratio",
        "pairs": pairs,
        "levels": results,
        "docs": docs,
        "pool": POOL,
        "protocol": f"interleaved A/B, median of {reps} per level, "
                    f"{windows} windows/JVM, pool={POOL}",
    }))


def run_fleet(lo: int, hi: int, docs: int, reps: int, qreps: int,
              windows: int) -> None:
    """Searcher-FLEET scaling: quickwit scales the query path by
    adding independent searcher processes over the same immutable
    splits (no shared driver). The faithful single-box proxy is
    therefore hi//lo INDEPENDENT pinned local[lo] sessions querying
    the same staged index concurrently, vs ONE such session —
    aggregate qps vs single qps. Each process is its own driver, so
    the same-driver mode's serial sections (one DAGScheduler event
    loop, one py4j gateway, one client GIL) don't pool across the
    fleet, exactly as they don't across real searcher nodes."""
    stage_index(docs)
    taskset = shutil.which("taskset")
    n_procs = hi // lo
    pool = 2 * lo
    warmup_budget = 120.0  # secs from launch to the shared start epoch

    def spawn(cpu_lo: int, start_at: float = 0.0) -> subprocess.Popen:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--cores", str(lo), "--qreps", str(qreps),
               "--windows", str(windows), "--pool", str(pool),
               "--start-at", str(start_at)]
        if taskset:
            cmd = [taskset, "-c", f"{cpu_lo}-{cpu_lo + lo - 1}"] + cmd
        return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True,
                                cwd=REPO)

    def result(p: subprocess.Popen) -> dict:
        out, _ = p.communicate()
        if p.returncode:
            raise RuntimeError(f"worker failed rc={p.returncode}")
        return json.loads(
            [l for l in out.splitlines() if l.startswith("{")][-1]
        )

    singles, fleets = [], []
    for rep in range(reps):
        r1 = result(spawn(0))
        singles.append(r1["qps_span"])
        # all fleet procs sleep (post-warmup) until one shared epoch,
        # then run their windows back-to-back: aggregate throughput
        # is total queries over the UNION wall span — conservative
        # (stragglers extend the span; no disjoint-window sums)
        epoch = time.time() + warmup_budget
        procs = [spawn(i * lo, epoch) for i in range(n_procs)]
        rs = [result(p) for p in procs]
        span = max(r["t1"] for r in rs) - min(r["t0"] for r in rs)
        agg = round(sum(r["total_queries"] for r in rs) / span, 2)
        fleets.append({
            "agg_qps_span": agg,
            "per_proc_qps_span": [r["qps_span"] for r in rs],
            "union_span_secs": round(span, 1),
            "start_lag_max": max(r["start_lag"] for r in rs),
            "steal_pct": [w["steal_pct"] for r in rs for w in r["runs"]],
        })
        print(f"rep {rep + 1}/{reps}: single={r1['qps_span']} "
              f"fleet={json.dumps(fleets[-1])}", file=sys.stderr)

    qps_lo = statistics.median(singles)
    qps_hi = statistics.median(f["agg_qps_span"] for f in fleets)
    eff = (qps_hi / qps_lo) / n_procs
    print(json.dumps({
        "metric": "query_fleet_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "lo_cores": lo,
        "hi_cores": hi,
        "n_procs": n_procs,
        "qps_single_median": qps_lo,
        "qps_fleet_median": qps_hi,
        "singles": singles,
        "fleet_reps": fleets,
        "docs": docs,
        "pool_per_proc": pool,
        "protocol": (
            f"fleet: {n_procs} independent pinned local[{lo}] drivers "
            f"over one staged index vs 1; median of {reps}"),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--qreps", type=int, default=8,
                    help="repeats of the 6 query shapes per window")
    ap.add_argument("--windows", type=int, default=2,
                    help="timed windows per JVM (best kept)")
    ap.add_argument("--pool", type=int, default=None,
                    help="thread-pool size (worker mode)")
    ap.add_argument("--start-at", type=float, default=0.0,
                    help="epoch to begin timed windows (fleet sync)")
    ap.add_argument("--fleet", action="store_true",
                    help="independent-drivers fleet protocol")
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args()
    if args.cores:
        run_worker(args.cores, args.qreps, args.windows, args.pool,
                   args.start_at)
    elif args.fleet:
        lo, hi = [int(x) for x in args.levels.split(",")]
        run_fleet(lo, hi, args.docs, args.reps, args.qreps, args.windows)
    else:
        run_wrapper([int(x) for x in args.levels.split(",")], args.docs,
                    args.reps, args.qreps, args.windows,
                    pin=not args.no_pin)


if __name__ == "__main__":
    main()
