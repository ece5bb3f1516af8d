"""Full-lifecycle gated benchmark at sf1 scale (2 M docs total).

Exercises the complete reference lifecycle on one index — the shape
quickwit runs in production (indexer commits cut fresh splits, the
merge policy compacts them, searchers query throughout;
merge_policy.rs levels driving merge_executor.rs):

  1. bootstrap build — 1 M docs into 8 splits (125 k docs each)
  2. incremental ingest — 10 add_documents batches of 100 k docs,
     one fresh split per batch (the streaming micro-batch shape)
  3. policy-planned compaction — plan_merges (the exact-parity
     policy port) plans; merge_splits executes every planned op
  4. search — BM25 top-10 p50 on the compacted index, plus an
     invariant check: count("the") identical before and after merges

Prints ONE JSON line with per-phase walls, merge docs/s, and ambient
probes (steal%% + fault-in) around every phase so a polluted window
is self-evident. Run:

  python scripts/lifecycle_bench.py [--docs 2000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from bench import ambient_sample  # noqa: E402
from quickwit_spark.operators.build import add_documents, build_index  # noqa: E402
from quickwit_spark.operators.search import (  # noqa: E402
    SearchRequest,
    count_hits,
    search_df,
)
from quickwit_spark.plans.config import webpages_config  # noqa: E402
from quickwit_spark.plans.merge_policy import plan_merges  # noqa: E402
from quickwit_spark.plans.metastore import open_metastore  # noqa: E402
from quickwit_spark.session import get_spark  # noqa: E402
from quickwit_spark.sources.corpus import WEBPAGES_SCHEMA, gen_batch  # noqa: E402
from quickwit_spark.sources.extract import with_extracted_text  # noqa: E402


def _pages(spark, start: int, end: int):
    """Deterministic corpus slice [start, end) — distinct id ranges
    give distinct doc keys across bootstrap and ingest batches."""
    n = end - start
    rng = spark.range(start, end, 1, max(1, min(64, n // 2000 + 1)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_batch(pdf["id"].to_numpy(), seed=42)

    return with_extracted_text(
        rng.mapInPandas(gen, WEBPAGES_SCHEMA).drop("text")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--batches", type=int, default=10)
    args = ap.parse_args()

    n_boot = args.docs // 2
    n_batch = (args.docs - n_boot) // args.batches
    spark = get_spark("lifecycle_bench", cores=args.cpus)
    index_dir = tempfile.mkdtemp(prefix="qws_lifecycle_")
    # min_level 120k puts the 125k bootstrap splits one level above
    # the 100k ingest splits at sf1; the policy still plans a mixed
    # max_merge_factor op — exactly the reference's adaptive behavior
    config = webpages_config(
        min_level_num_docs=120_000, merge_factor=10, max_merge_factor=12
    )
    out: dict = {"phases": {}, "ambient": {}}
    out["ambient"]["start"] = ambient_sample()

    # ---- 1. bootstrap build ----
    t0 = time.time()
    metas = build_index(
        spark, _pages(spark, 0, n_boot), index_dir, config, num_splits=8
    )
    t_build = time.time() - t0
    boot_docs = sum(m.num_docs for m in metas)
    out["phases"]["build"] = {
        "wall_secs": round(t_build, 3),
        "docs": boot_docs,
        "docs_per_sec": round(boot_docs / t_build, 1),
        "splits": len(metas),
    }
    out["ambient"]["post_build"] = ambient_sample()

    # ---- 2. incremental ingest ----
    batch_walls = []
    ingest_docs = 0
    t0 = time.time()
    for b in range(args.batches):
        lo = n_boot + b * n_batch
        tb = time.time()
        metas = add_documents(
            spark, _pages(spark, lo, lo + n_batch), index_dir,
            source_id="bench_stream", position=f"{b:010d}", num_splits=1,
        )
        batch_walls.append(round(time.time() - tb, 3))
        ingest_docs += sum(m.num_docs for m in metas)
    t_ingest = time.time() - t0
    out["phases"]["ingest"] = {
        "wall_secs": round(t_ingest, 3),
        "docs": ingest_docs,
        "docs_per_sec": round(ingest_docs / t_ingest, 1),
        "batches": args.batches,
        "batch_walls": batch_walls,
        "batch_p50": statistics.median(batch_walls),
    }
    out["ambient"]["post_ingest"] = ambient_sample()

    # ---- 3. policy-planned compaction ----
    ms = open_metastore(index_dir)
    pre_count = count_hits(spark, index_dir, SearchRequest(query="the"))
    published = ms.list_published()
    ops = plan_merges(published, ms.config())
    docs_of = {s.split_id: s.num_docs for s in published}
    from quickwit_spark.operators.merge import merge_splits

    t0 = time.time()
    merged_docs = 0
    op_walls = []
    for op in ops:
        tm = time.time()
        merge_splits(spark, index_dir, op)
        op_walls.append(round(time.time() - tm, 3))
        merged_docs += sum(docs_of[sid] for sid in op)
    t_merge = time.time() - t0
    out["phases"]["merge"] = {
        "wall_secs": round(t_merge, 3),
        "ops": [[len(op), sum(docs_of[s] for s in op)] for op in ops],
        "op_walls": op_walls,
        "docs_merged": merged_docs,
        "merge_docs_per_sec": round(merged_docs / t_merge, 1) if t_merge else None,
        "splits_before": len(published),
        "splits_after": len(ms.list_published()),
    }
    out["ambient"]["post_merge"] = ambient_sample()

    # ---- 4. search on the compacted index ----
    post_count = count_hits(spark, index_dir, SearchRequest(query="the"))
    assert post_count == pre_count, (pre_count, post_count)
    search_df(spark, index_dir, SearchRequest(query="word", k=10)).collect()
    qs = {}
    for name, q in {"q_term": "word", "q_phrase": '"of the"',
                    "q_and": "hot word"}.items():
        times = []
        for _ in range(5):
            tq = time.time()
            search_df(spark, index_dir, SearchRequest(query=q, k=10)).collect()
            times.append(round(time.time() - tq, 3))
        qs[name] = {"p50": statistics.median(times), "times": times}
    out["phases"]["search"] = {
        "queries": qs, "count_the": post_count,
        "count_invariant_across_merge": True,
    }
    out["ambient"]["end"] = ambient_sample()
    out["total_docs"] = boot_docs + ingest_docs
    out["index_dir"] = index_dir
    print(json.dumps(out))


if __name__ == "__main__":
    main()
