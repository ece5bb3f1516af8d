"""Build-path FLEET scaling: process-isolated indexer scale-out.

The reference scales indexing with independent indexer processes
(each builds its own splits; the metastore serializes only tiny
publishes). The in-process build 4<->16 window reads 0.49 on this box
(BENCH.md, DRAM-attributed). This protocol removes every shared
in-process resource: hi//lo INDEPENDENT pinned local[lo] drivers each
build the SAME staged corpus into their own index directory,
synchronized to one start epoch; aggregate throughput = total docs
indexed / union wall span, vs one identical pinned process. If the
fleet converges to the same ~0.5 at 4<->16, the ceiling is the box's
memory system (as the query fleet showed); an engine-side
serialization would instead show the fleet scaling where the shared
process did not.

Worker:  python scripts/build_fleet_bench.py --cores 4 [--start-at E]
Wrapper: python scripts/build_fleet_bench.py --fleet --levels 4,16
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scaling_bench import (  # noqa: E402
    CORPUS_PATH,
    NUM_SPLITS,
    SHUFFLE_PARTITIONS,
    _cpu_stat,
    stage_corpus,
)


def run_worker(cores: int, docs: int, start_at: float) -> None:
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.config import webpages_config
    from quickwit_spark.session import get_spark
    from quickwit_spark.sources.extract import with_extracted_text

    spark = get_spark(
        f"build_fleet_{cores}", cores=cores,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)
        },
    )
    pages = with_extracted_text(spark.read.parquet(CORPUS_PATH))

    # warmup: JIT + python workers (amortized at real scale)
    idx = tempfile.mkdtemp(prefix=f"qws_bf_warm_{cores}_")
    shutil.rmtree(idx)
    build_index(spark, pages.limit(docs // 20), idx, webpages_config(),
                num_splits=4, term_buckets=32)
    shutil.rmtree(idx, ignore_errors=True)

    start_lag = 0.0
    if start_at:
        now = time.time()
        start_lag = max(0.0, now - start_at)
        time.sleep(max(0.0, start_at - now))

    idx = tempfile.mkdtemp(prefix=f"qws_bf_{cores}_")
    shutil.rmtree(idx)
    st0, tot0 = _cpu_stat()
    t0 = time.time()
    metas = build_index(spark, pages, idx, webpages_config(),
                        num_splits=NUM_SPLITS,
                        term_buckets=SHUFFLE_PARTITIONS)
    t1 = time.time()
    st1, tot1 = _cpu_stat()
    built = sum(m.num_docs for m in metas)
    shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps({
        "cores": cores,
        "hw_threads": len(os.sched_getaffinity(0)),
        "docs": built,
        "secs": round(t1 - t0, 3),
        "docs_per_sec": round(built / (t1 - t0), 1),
        "t0": round(t0, 3),
        "t1": round(t1, 3),
        "start_lag": round(start_lag, 2),
        "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2),
    }))


def run_fleet(lo: int, hi: int, docs: int, reps: int) -> None:
    stage_corpus(docs)
    taskset = shutil.which("taskset")
    n_procs = hi // lo
    warmup_budget = 180.0

    def spawn(cpu_lo: int, start_at: float = 0.0) -> subprocess.Popen:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--cores", str(lo), "--docs", str(docs),
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
        singles.append(r1["docs_per_sec"])
        epoch = time.time() + warmup_budget
        procs = [spawn(i * lo, epoch) for i in range(n_procs)]
        rs = [result(p) for p in procs]
        span = max(r["t1"] for r in rs) - min(r["t0"] for r in rs)
        agg = round(sum(r["docs"] for r in rs) / span, 1)
        fleets.append({
            "agg_docs_per_sec_span": agg,
            "per_proc_docs_per_sec": [r["docs_per_sec"] for r in rs],
            "union_span_secs": round(span, 1),
            "start_lag_max": max(r["start_lag"] for r in rs),
            "steal_pct": [r["steal_pct"] for r in rs],
        })
        print(f"rep {rep + 1}/{reps}: single={r1['docs_per_sec']} "
              f"fleet={json.dumps(fleets[-1])}", file=sys.stderr)

    tput_lo = statistics.median(singles)
    tput_hi = statistics.median(f["agg_docs_per_sec_span"] for f in fleets)
    print(json.dumps({
        "metric": "build_fleet_scaling_efficiency",
        "value": round((tput_hi / tput_lo) / n_procs, 3),
        "unit": "ratio",
        "lo_cores": lo,
        "hi_cores": hi,
        "n_procs": n_procs,
        "docs_per_sec_single_median": tput_lo,
        "docs_per_sec_fleet_median": tput_hi,
        "singles": singles,
        "fleet_reps": fleets,
        "docs": docs,
        "protocol": (
            f"fleet: {n_procs} independent pinned local[{lo}] builders "
            f"over the same staged corpus vs 1; median of {reps}; "
            "synchronized start, union-span aggregation"),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--start-at", type=float, default=0.0)
    ap.add_argument("--fleet", action="store_true")
    args = ap.parse_args()
    if args.cores:
        run_worker(args.cores, args.docs, args.start_at)
    else:
        lo, hi = [int(x) for x in args.levels.split(",")]
        run_fleet(lo, hi, args.docs, args.reps)


if __name__ == "__main__":
    main()
