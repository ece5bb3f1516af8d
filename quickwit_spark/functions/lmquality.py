"""Statistical language-model quality scoring (CCNet-style).

CCNet ranks web documents by the perplexity of a small n-gram LM; the
Spark-native equivalent trains an add-one-smoothed bigram model ON
THE CORPUS ITSELF (one aggregation) and scores every document by its
mean bigram log-probability. Deterministic — no external model file —
so scores are exactly reproducible and oracle-checkable.

Model: for adjacent token pair (w1, w2),

    log p(w2 | w1) = ln( (c(w1,w2) + 1) / (c(w1,·) + V) )

with c(·) corpus bigram counts and V the corpus unigram vocabulary
size. A document's score is the mean over its bigrams, rounded to
3 dp (the same float-determinism contract as the BM25 oracles);
docs with < 2 tokens score NULL with ``n_bigrams = 0``.

Plan shape (scale analysis for 100 TB):
- bigram extraction is a per-row array expression (zip of the token
  array with itself shifted) — narrow, no Python;
- model training is one groupBy(w1, w2) count; left-context totals
  c(w1,·) derive from THOSE aggregates (|bigram| rows, not corpus
  rows), and V is one distinct count over exploded tokens;
- scoring joins each doc's bigrams to the model on (w1, w2) — the
  model table is vocabulary-bounded (≪ corpus), so AQE broadcasts it
  when it fits and falls back to a hash join keyed by the bigram
  (high-cardinality, naturally unskewed relative to doc rows) —
  followed by one groupBy(doc) mean.

Tokenization matches functions/textstats.tokens_col (lowercased
alnum runs), so the DuckDB oracle shares the engine's token CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.textstats import tokens_col


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per doc: ``n_bigrams`` and ``lm_score`` — mean add-one-smoothed
    bigram log-probability under the corpus's own bigram model,
    rounded to 3 dp (NULL when the doc has < 2 tokens)."""
    bg = _bigrams(df, text_col, id_col)
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    left_tot = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    scored = (
        bg.join(model, ["w1", "w2"])
        .join(left_tot, "w1")
        .crossJoin(vocab)
        .withColumn(
            "lp",
            F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v"))),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 3).alias("lm_score"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "lm_score",
    )
