"""Hash-feature linear quality classifier (fasttext-style stand-in).

Production pipelines (CCNet, LLaMA, RedPajama) gate documents with a
linear text classifier over hashed token features. The model weights
here are DERIVED from the hash itself (a keyed md5 of each token maps
to an integer weight in [-scale, +scale]) instead of a trained table —
a deterministic stand-in with the exact Spark plumbing a trained model
needs (broadcast weight lookup degenerates to a hash expression; swap
``_token_weight`` for a map-join against a real weight table to deploy
one). Like fasttext's hashed bigram buckets, collisions are part of
the model.

Everything is integer arithmetic end-to-end: the logit is a SUM OF
INTEGER WEIGHTS (no float dot product, no sigmoid in any compared
cell), so verdicts are bit-reproducible across engines. The sigmoid
probability is a presentation-layer concern callers can apply to
``logit / n_tokens``.

Scale shape: pure map — tokens never leave their row (the per-token
weight and the sum are higher-order array expressions), zero shuffles,
whole-stage codegen. Scoring 10^12 docs costs one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.textstats import tokens_col


def _token_weight(tok: Column, seed: str, scale: int) -> Column:
    """Integer weight in [-scale, scale] keyed by md5(seed|token)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "|"), tok)), 1, 8), 16, 10
    ).cast("long")
    return h % (2 * scale + 1) - scale


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "qclf",
    scale: int = 1000,
    threshold_num: int = 0,
    threshold_den: int = 1,
) -> DataFrame:
    """Score each doc with the hashed-feature linear model.

    Output: ``doc_id``, ``n_tokens``, ``logit`` (sum of integer token
    weights) and ``keep`` — 1 when the mean token weight clears the
    threshold, evaluated in integers:
    ``logit * threshold_den >= threshold_num * n_tokens``
    (empty docs score keep=0).
    """
    toks = tokens_col(F.col(text_col))
    logit = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + _token_weight(t, seed, scale),
    )
    n = F.size(toks).cast("long")
    keep = (
        F.when(
            (n > 0) & (logit * threshold_den >= F.lit(threshold_num) * n),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("keep")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        logit.alias("logit"),
        keep,
    )
