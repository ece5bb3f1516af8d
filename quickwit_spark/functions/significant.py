"""Significant-terms mining (the ES `significant_terms` shape):
which terms are over-represented in a FOREGROUND doc set (a query's
matches, a domain, a cluster) versus the rest of the corpus —
standard vocabulary for corpus forensics (what distinguishes spam
domains, a language slice, a near-dup cluster).

Scoring: the smoothed rate ratio

    score(t) = (fg_count / fg_total) / ((bg_count + 1) / (bg_total + 1))

ordered exactly: with doc counts below 2^20, ``fg_count/(bg_count+1)``
in IEEE-754 double is correctly rounded and distinct rationals stay
distinct (difference ≥ 1/(b₁·b₂) ≫ ULP), so every engine produces the
identical ranking — no float-tie environment sensitivity. All emitted
CELLS are integers (counts, totals, rank) plus the term.

Plan (scale): one distinct-(doc, term) explode (narrow, per-row
``array_distinct`` first, so a term counts once per doc like ES), ONE
hash aggregation on term with conditional partial counts, and a rank
window over the aggregated term rows whose ``row_number() <= k``
filter Spark rewrites into a pre-shuffle WindowGroupLimit. The
foreground/background totals are one tiny scalar aggregate broadcast
via crossJoin. Nothing corpus-sized is ever sorted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.textstats import tokens_col


def significant_terms(
    df: DataFrame,
    fg_col: Column,
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` foreground-significant terms.

    ``fg_col``: boolean Column marking foreground docs (e.g. "matches
    the query", "from this domain"). Returns (term, fg_count,
    bg_count, fg_total, bg_total, rank), rank 1 = most significant;
    ties break toward the lexicographically smaller term. Terms never
    seen in the foreground are excluded (ES semantics).
    """
    from pyspark.sql import Window

    from quickwit_spark.functions.dedup import _widen_narrow_input

    base = _widen_narrow_input(df.select(fg_col.alias("fg"), text_col))
    totals = base.agg(
        F.sum(F.when(F.col("fg"), 1).otherwise(0)).alias("fg_total"),
        F.sum(F.when(~F.col("fg"), 1).otherwise(0)).alias("bg_total"),
    )
    pairs = base.select(
        "fg",
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
            "term"
        ),
    )
    counts = pairs.groupBy("term").agg(
        F.sum(F.when(F.col("fg"), 1).otherwise(0)).alias("fg_count"),
        F.sum(F.when(~F.col("fg"), 1).otherwise(0)).alias("bg_count"),
    )
    scored = counts.filter(F.col("fg_count") >= 1).crossJoin(
        F.broadcast(totals)
    )
    # exact ordering key (see module docstring); fg_total/bg_total are
    # constant so the ratio reduces to fg_count/(bg_count+1).
    # Materialized as a column: InferWindowGroupLimit then rewrites
    # the rank filter into a pre-shuffle group limit (plan-asserted).
    scored = scored.withColumn(
        "__key", F.col("fg_count").cast("double") / (F.col("bg_count") + 1)
    )
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("__key").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "term", "fg_count", "bg_count", "fg_total", "bg_total", "rank"
        )
    )
