"""Benchmark decontamination: flag corpus documents that share any
k-token n-gram with a benchmark/eval set.

Standard training-data hygiene (the GPT-3/PaLM 13-gram protocol, run
over every pretraining corpus before use): an eval example leaking
into the training set inflates downstream scores, so documents with
n-gram overlap against the benchmark are flagged (and usually
dropped or scrubbed). Reference-repo analogue: none — this is one of
the LLM-pipeline operators layered on the engine's corpus tooling,
sharing the shingle machinery of :mod:`quickwit_spark.functions.dedup`.

Scale shape (100 TB corpus, benchmark suites of 10^3-10^6 examples):
the benchmark side collapses to a DISTINCT gram set that is tiny
relative to the corpus and is broadcast, so the corpus is scanned
exactly once with NO shuffle of corpus grams — only grams that
actually hit the benchmark set flow into the per-doc count
aggregation, and the count table (one row per doc with >=1 hit) joins
back onto the corpus for the final flag column (AQE broadcasts it
when small, as it usually is). A
``max_benchmark_grams`` guard fails loudly instead of silently
broadcasting an unbounded set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.dedup import shingle_col


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    k: int = 3,
    key_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    max_benchmark_grams: int | None = 1_000_000,
    max_benchmark_gram_bytes: int | None = 256 << 20,
) -> DataFrame:
    """Per-document contamination report against ``benchmark``.

    Returns one row per ``docs`` row: ``(key, n_grams, n_hit_grams,
    contaminated)`` where ``n_hit_grams`` counts the doc's DISTINCT
    k-grams that appear anywhere in the benchmark and ``contaminated``
    is true when that count is > 0. Grams are distinct lowercased
    alnum-token shingles (same tokenization as the dedup/textstats
    oracles, so the whole report is SQL-reproducible).
    """
    btc = bench_text_col or text_col
    bench_grams = benchmark.select(
        F.explode(shingle_col(F.col(btc), k)).alias("gram")
    ).distinct()
    if max_benchmark_grams is not None:
        # count(limit n+1) — an early-stopping guard, not a full count:
        # a runaway benchmark (10^10 grams) stops at n+1 rows instead
        # of paying a full distinct scan before failing
        probe = bench_grams.limit(max_benchmark_grams + 1).count()
        if probe > max_benchmark_grams:
            raise ValueError(
                f"benchmark has > {max_benchmark_grams} distinct "
                f"{k}-grams — too large to broadcast; raise "
                "max_benchmark_grams or pre-reduce the benchmark"
            )
    if max_benchmark_gram_bytes is not None and max_benchmark_grams is not None:
        # row count bounds cardinality, not payload: 1M grams of long
        # strings can still be hundreds of MB. The set is row-bounded
        # now, so collect it ONCE — the same materialization serves the
        # byte guard AND the broadcast side below, instead of the
        # explode+distinct shuffle executing a third time when the
        # broadcast builds.
        grams = [r["gram"] for r in bench_grams.collect()]
        est = sum(len(g.encode("utf-8")) for g in grams)
        if est > max_benchmark_gram_bytes:
            raise ValueError(
                f"benchmark gram set is ~{est} bytes of strings — over "
                f"the {max_benchmark_gram_bytes}-byte broadcast guard; "
                "raise max_benchmark_gram_bytes or pre-reduce the "
                "benchmark"
            )
        bench_grams = benchmark.sparkSession.createDataFrame(
            [(g,) for g in grams], "gram string"
        )
    elif max_benchmark_gram_bytes is not None:
        # byte guard without a row bound: stay distributed (an
        # unbounded collect would be its own hazard)
        est = bench_grams.agg(
            F.coalesce(F.sum(F.octet_length("gram")), F.lit(0)).alias("b")
        ).collect()[0][0]
        if est > max_benchmark_gram_bytes:
            raise ValueError(
                f"benchmark gram set is ~{est} bytes of strings — over "
                f"the {max_benchmark_gram_bytes}-byte broadcast guard; "
                "raise max_benchmark_gram_bytes or pre-reduce the "
                "benchmark"
            )
    doc_grams = docs.select(
        F.col(key_col).alias("key"),
        F.explode(shingle_col(F.col(text_col), k)).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("key")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    sizes = docs.select(
        F.col(key_col).alias("key"),
        F.size(shingle_col(F.col(text_col), k)).alias("n_grams"),
    )
    # hits is one row per CONTAMINATED doc — usually tiny (AQE will
    # broadcast it), but not provably bounded, so no forced broadcast
    return (
        sizes.join(hits, "key", "left")
        .select(
            "key",
            "n_grams",
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
