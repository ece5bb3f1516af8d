"""Exact duplicate-substring span detection (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").

The reference protocol finds substrings of ≥ k tokens that occur
verbatim in more than one document (suffix-array based in the paper).
The Spark-native equivalent for a FIXED minimum length k: every
k-token window (shingle) is hashed; a shingle whose hash occurs in
≥ ``min_docs`` distinct docs is a duplicate *seed*; per document,
overlapping/adjacent seed windows are merged into maximal spans
(gaps-and-islands), giving exactly the token ranges a suffix-array
pass would flag for ≥ k-token cross-doc repeats.

Plan shape (scale analysis for 100 TB):
1. shingling is a per-row array expression (``transform`` over a
   ``sequence`` of start offsets + ``slice``) — narrow, no Python;
2. the global seed-detection groups on ``md5(shingle)`` — the shuffle
   carries (hash, doc) pairs pre-deduped per doc, never shingle text;
3. the membership join back is hash-keyed (uniform, unskewable);
   the duplicate-seed set is small vs the corpus, so AQE broadcasts;
4. island-merging is one window over (doc, pos) — partitioned by doc,
   so it parallelizes across the corpus with no global sort.

Output is one row per maximal duplicated span. Callers can cut the
spans out (the paper's remedy) or drop whole docs above a duplicated
-fraction threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _shingles(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(doc_id, pos, h): md5 of each k-token whitespace shingle."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    starts = F.when(
        n >= k, F.sequence(F.lit(0), n - k)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.array_join(F.slice(toks, i + 1, k), " ")).alias("h"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("g")
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal cross-doc duplicated token spans of length ≥ ``k``.

    Returns (doc_id, span_start, span_end, span_len, n_grams): token
    index range [span_start, span_end) built by merging seed windows
    whose starts are ≤ k apart (overlapping or exactly adjacent), and
    the number of seed windows merged into the span.
    """
    sh = _shingles(df, text_col, id_col, k)
    dup = (
        sh.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    hits = sh.join(dup, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "new_island",
        F.when(
            F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
            "n_grams",
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    min_docs: int = 2,
) -> DataFrame:
    """The paper's remedy applied: rewrite each doc with every token
    inside a duplicated span cut out (ALL occurrences — Lee et al.'s
    ExactSubstr protocol), single-space-rejoined in original order.

    Returns (doc_id, n_tokens, n_removed, new_text); docs with no
    duplicated span pass through verbatim-normalized (whitespace
    collapsed by the split/rejoin).

    Scale shape: the spans DataFrame is grouped per doc (a few spans
    each) and joined back — span lists are tiny, so AQE broadcasts;
    the cut itself is a per-row ``filter`` over the token index with
    an ``exists`` probe into the doc's span array: O(tokens × spans)
    inside codegen, no Python, no extra shuffle beyond the span
    detection itself.
    """
    spans = duplicate_spans(df, text_col, id_col, k, min_docs)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    joined = base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce(
            "spans",
            F.array().cast("array<struct<span_start:int,span_end:int>>"),
        ).alias("spans"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.col("spans"),
            lambda s: (s["span_start"] <= i) & (i < s["span_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("new_text"),
    )


def duplicated_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    min_docs: int = 2,
) -> DataFrame:
    """Per doc: total tokens inside duplicated spans and the fraction
    of the doc they cover (0.0 for docs with no duplicated span) —
    the quantity thresholded when dropping near-entirely-duplicated
    docs."""
    spans = duplicate_spans(df, text_col, id_col, k, min_docs)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = df.select(F.col(id_col).alias("doc_id"), F.size(toks).alias("n_tokens"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )
