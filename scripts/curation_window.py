"""Curation-tier scaling window: the SAME job at two parallelism
levels (north-rule shape — local[N] vs local[4N] standing in for the
two cluster sizes this sandbox cannot provision).

Job: generate N_DOCS synthetic pages (mapInPandas over a Range — the
generator parallelizes with the core count, exactly like a parquet
scan would), extract text, then run the round-5 cleaning/quality
operators end-to-end: c4_clean + gopher_rules + quality_classifier,
each reduced to a tiny agg so only engine work is measured.

Usage:
  python scripts/curation_window.py run <cores>      # one timed run
  python scripts/curation_window.py window           # 2 vs 8 + ratio
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 150_000


def one_run(cores: int) -> dict:
    from pyspark.sql import functions as F

    from quickwit_spark import get_spark
    from quickwit_spark.functions.gopher import gopher_rules
    from quickwit_spark.functions.quality_clf import quality_classifier
    from quickwit_spark.functions.webclean import c4_clean
    from quickwit_spark.sources.corpus import webpages_df
    from quickwit_spark.sources.extract import with_extracted_text

    spark = get_spark(
        f"curation_window_{cores}", cores=cores, shuffle_partitions=cores
    )
    pages = with_extracted_text(
        webpages_df(spark, N_DOCS, seed=11).drop("text")
    ).select(F.xxhash64("url").alias("doc_id"), "text")

    def job():
        a = c4_clean(pages).agg(F.sum("n_kept")).collect()[0][0]
        b = gopher_rules(pages).agg(F.sum("keep")).collect()[0][0]
        c = quality_classifier(pages).agg(F.sum("keep")).collect()[0][0]
        return (a, b, c)

    sums = job()  # warmup (JIT, Arrow workers) — untimed
    walls = []
    for _ in range(2):
        t0 = time.time()
        assert job() == sums  # determinism across runs, any core count
        walls.append(round(time.time() - t0, 3))
    wall = min(walls)
    out = {
        "cores": cores,
        "n_docs": N_DOCS,
        "wall_s": wall,
        "walls": walls,
        "docs_per_s": round(3 * N_DOCS / wall, 1),  # 3 operators
        "checksums": list(sums),
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
    assert results[2]["checksums"] == results[8]["checksums"]
    eff = (
        results[2]["wall_s"] / results[8]["wall_s"]
    ) / 4.0
    out = {
        "window": "curation 2 vs 8 cores",
        "runs": results,
        "speedup_2_to_8": round(
            results[2]["wall_s"] / results[8]["wall_s"], 3
        ),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "scripts", "curation_window_r5.json"),
              "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
