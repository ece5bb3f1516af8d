"""Session-2 ops scaling window: the SAME job at two parallelism
levels (north-rule shape — local[N] vs local[4N] standing in for two
cluster sizes).

Job: generate N_DOCS synthetic pages, then run the session-2
additions end-to-end — fix_text (pure map), top_ngrams (hash agg +
group-limited rank), perplexity_buckets (corpus-trained bigram LM:
two aggs + broadcast cutoff join) — each reduced to a tiny agg so
only engine work is timed; checksums pin determinism across core
counts.

Usage:
  python scripts/session2_window.py run <cores>
  python scripts/session2_window.py window
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 120_000


def one_run(cores: int) -> dict:
    from pyspark.sql import functions as F

    from quickwit_spark import get_spark
    from quickwit_spark.functions.lmquality import perplexity_buckets
    from quickwit_spark.functions.textfix import fix_text
    from quickwit_spark.functions.textstats import top_ngrams
    from quickwit_spark.sources.corpus import webpages_df
    from quickwit_spark.sources.extract import with_extracted_text

    spark = get_spark(
        f"s2_window_{cores}", cores=cores, shuffle_partitions=cores
    )
    pages = with_extracted_text(
        webpages_df(spark, N_DOCS, seed=23).drop("text")
    ).select(F.xxhash64("url").alias("doc_id"), "lang", "text")

    def job():
        a = (
            fix_text(pages)
            .agg(F.sum("clean_len"), F.sum("n_dropped"))
            .collect()[0]
        )
        b = (
            top_ngrams(pages, n=2, k=10, group_col="lang")
            .agg(F.sum("n_occurrences"), F.count(F.lit(1)))
            .collect()[0]
        )
        c = (
            perplexity_buckets(pages)
            .groupBy("bucket")
            .count()
            .orderBy("bucket")
            .collect()
        )
        return (tuple(a), tuple(b), tuple((r[0], r[1]) for r in c))

    sums = job()  # warmup — untimed
    walls = []
    for _ in range(2):
        t0 = time.time()
        assert job() == sums  # determinism across runs and core counts
        walls.append(round(time.time() - t0, 3))
    wall = min(walls)
    out = {
        "cores": cores,
        "n_docs": N_DOCS,
        "wall_s": wall,
        "walls": walls,
        "docs_per_s": round(3 * N_DOCS / wall, 1),
        "checksums": [list(sums[0]), list(sums[1]), sums[2]],
    }
    spark.stop()
    return out


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "run":
        print(json.dumps(one_run(int(sys.argv[2]))))
        return
    results = {}
    for cores in (2, 8):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", str(cores)],
            capture_output=True, text=True, check=True,
        )
        results[cores] = json.loads(p.stdout.strip().splitlines()[-1])
    lo, hi = results[2], results[8]
    assert lo["checksums"] == hi["checksums"], "nondeterministic across cores"
    speedup = lo["wall_s"] / hi["wall_s"]
    out = {
        "runs": results,
        "speedup_2_to_8": round(speedup, 3),
        "efficiency": round(speedup / 4, 3),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "scripts/session2_window.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
