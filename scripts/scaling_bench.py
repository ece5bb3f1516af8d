"""Scaling-efficiency evidence for the north_rule.

The rule demands throughput scaling efficiency >= 0.8 from N to 4N
executors. This sandbox has no real cluster, so (per the driver
protocol recorded in BASELINE.md §c) we run the IDENTICAL job — same
input, same num_splits, same shuffle partitioning, therefore the same
task graph — at two local parallelism levels and report

    efficiency = (docs_per_sec_hi / docs_per_sec_lo) / (cores_hi / cores_lo)

Worker mode (one JSON line to stdout):
    python scripts/scaling_bench.py --cores 8 --docs 200000

Wrapper mode (runs both levels as subprocesses so each gets a fresh
JVM, computes efficiency, rewrites BENCH.md):
    python scripts/scaling_bench.py --lo 8 --hi 32 --docs 200000
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

SEARCHES = {
    "q_term": "word",
    "q_hot": "the",
    "q_and": "hot word",
    "q_or": "hot OR word OR one",
    "q_phrase": '"of the"',
    "q_rare": "qw_marker_7",
}

# identical task graph at every parallelism level
NUM_SPLITS = 32
SHUFFLE_PARTITIONS = 64


def run_worker(cores: int, docs: int) -> None:
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.operators.search import SearchRequest, search_df
    from quickwit_spark.plans.config import webpages_config
    from quickwit_spark.session import get_spark
    from quickwit_spark.sources.corpus import webpages_df
    from quickwit_spark.sources.extract import with_extracted_text

    spark = get_spark(
        f"scaling_bench_{cores}",
        cores=cores,
        shuffle_partitions=SHUFFLE_PARTITIONS,
    )
    index_dir = tempfile.mkdtemp(prefix=f"qws_scale_{cores}_")
    corpus_dir = tempfile.mkdtemp(prefix=f"qws_scale_corpus_{cores}_")
    try:
        # stage the corpus as parquet so the timed job is the
        # north-star shape: read pages table → extract → index
        webpages_df(spark, docs, seed=42).drop("text").write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        pages = with_extracted_text(spark.read.parquet(corpus_dir))
        t0 = time.time()
        metas = build_index(
            spark,
            pages,
            index_dir,
            webpages_config(),
            num_splits=NUM_SPLITS,
            term_buckets=SHUFFLE_PARTITIONS,
        )
        build_secs = time.time() - t0
        built = sum(m.num_docs for m in metas)

        queries = {}
        for name, q in SEARCHES.items():
            times = []
            for _ in range(3):
                t0 = time.time()
                search_df(spark, index_dir, SearchRequest(query=q, k=10)).collect()
                times.append(time.time() - t0)
            queries[name] = round(statistics.median(times), 3)
        print(
            json.dumps(
                {
                    "cores": cores,
                    "docs": built,
                    "build_secs": round(build_secs, 3),
                    "docs_per_sec": round(built / build_secs, 1),
                    "query_p50": queries,
                }
            )
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        shutil.rmtree(corpus_dir, ignore_errors=True)


def run_wrapper(lo: int, hi: int, docs: int) -> None:
    results = {}
    for cores in (lo, hi):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cores", str(cores), "--docs", str(docs)],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line, file=sys.stderr)

    r_lo, r_hi = results[lo], results[hi]
    eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo)
    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "lo": r_lo,
        "hi": r_hi,
        "docs": docs,
    }
    print(json.dumps(summary))
    _write_bench_md(summary)


def _write_bench_md(s: dict) -> None:
    lo, hi = s["lo"], s["hi"]
    qrows = "\n".join(
        f"| {name} | {lo['query_p50'][name]:.3f} | {hi['query_p50'][name]:.3f} |"
        for name in lo["query_p50"]
    )
    md = f"""# BENCH — measured numbers (sandbox protocol)

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox proxy (no real cluster): the IDENTICAL index-build
job — same {s['docs']:,}-doc deterministic synthetic web-page corpus,
same `num_splits={NUM_SPLITS}`, same `spark.sql.shuffle.partitions=
{SHUFFLE_PARTITIONS}` (identical task graph) — run at `local[{lo['cores']}]`
and `local[{hi['cores']}]` in fresh JVMs.

## Index-build throughput

| parallelism | docs | build wall (s) | throughput (docs/s) |
|---|---|---|---|
| local[{lo['cores']}] | {lo['docs']:,} | {lo['build_secs']:.1f} | {lo['docs_per_sec']:,.0f} |
| local[{hi['cores']}] | {hi['docs']:,} | {hi['build_secs']:.1f} | {hi['docs_per_sec']:,.0f} |

**Scaling efficiency ({lo['cores']} → {hi['cores']} cores):
(T_hi/T_lo)/({hi['cores']}/{lo['cores']}) = {s['value']:.3f}**

## BM25 top-10 query latency p50 (s)

| query | local[{lo['cores']}] | local[{hi['cores']}] |
|---|---|---|
{qrows}

Query latency is dominated by fixed per-job driver overhead at this
tiny scale (tenths of a second of Spark job scheduling); on a real
cluster the per-split evaluator tasks are the scaling unit — the
split-pruned scan reads only the queried `(split, term)` posting
rows, so latency is flat in corpus size for constant hit counts.

Reproduce: `python scripts/scaling_bench.py --lo {lo['cores']} --hi {hi['cores']} --docs {s['docs']}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    args = ap.parse_args()
    if args.cores:
        run_worker(args.cores, args.docs)
    else:
        run_wrapper(args.lo, args.hi, args.docs)


if __name__ == "__main__":
    main()
