"""Per-domain (source) corpus statistics for curation dashboards.

Web-corpus curation decisions are made per domain: crawl quotas,
blocklists, per-domain sampling weights (C4 and derivatives publish
exactly these tables).

Plan shape (scale analysis for 100 TB): one hash aggregation to
(domain, lang) partials — every metric has a map-side partial form,
so the shuffle carries one partial row per (task, domain, lang) —
then a per-domain rollup of those partials plus a window over the
(domain, lang) rows to pick the modal language. The window partitions
by domain over the ALREADY-AGGREGATED per-lang rows (|domains| ×
|langs| rows, tiny vs the corpus), so no corpus-sized sort exists
anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quickwit_spark.functions.textstats import tokens_col


def domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per domain: doc count, total alnum tokens, total text chars,
    distinct-language count, and the modal language (doc-count ties
    broken toward the lexicographically smallest lang).

    All numeric cells are integer-exact bigints (averages are
    total/n_docs for the caller): rounded-double cells are
    engine-version-sensitive on ties (Spark HALF_UP vs DuckDB double
    rounding), which broke oracle hash comparison in round 4."""
    ntok = F.size(tokens_col(F.col(text_col)))
    base = df.select(
        F.col(domain_col).alias("domain"),
        F.col(lang_col).alias("lang"),
        ntok.alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )
    per_lang = base.groupBy("domain", "lang").agg(
        F.count(F.lit(1)).alias("lang_docs"),
        F.sum("n_tokens").alias("lang_tokens"),
        F.sum("n_chars").alias("lang_chars"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("lang_docs").desc(), F.col("lang").asc()
    )
    ranked = per_lang.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("domain")
        .agg(
            F.sum("lang_docs").alias("n_docs"),
            F.sum("lang_tokens").alias("total_tokens"),
            F.sum("lang_chars").alias("total_chars"),
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.when(F.col("rn") == 1, F.col("lang"))).alias("top_lang"),
        )
    )
