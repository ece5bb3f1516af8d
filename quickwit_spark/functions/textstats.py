"""Text analysis for corpus curation: language ID, quality scoring,
token counting, fingerprinting.

All pure column expressions (JVM-side, codegen'd — no Python), all
deterministic, each with an exact DuckDB-SQL oracle in
``__spark_entry__.oracle_sql``. The heuristics are standard n-gram /
stopword-ratio features; determinism (not linguistic accuracy) is
the contract, since these gate 10^12-doc corpus decisions that must
be reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# distinct-token overlap wordlists (deterministic, tiny)
STOPWORDS = {
    "en": ("the", "of", "and", "to", "a", "in", "is", "it", "you", "that",
           "was", "for", "on", "are", "with", "as", "they", "be", "at"),
    "de": ("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit",
           "auf", "für", "von", "zu", "den", "dem", "sie", "es"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "pour", "sur", "avec", "pas", "au", "ce"),
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# BPE-ish pre-tokenization: word pieces OR single non-space symbols
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens_col(col: Column) -> Column:
    """lowercased alnum tokens (matches the DuckDB oracle exactly)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish piece count per doc."""
    c = F.col(text_col)
    ws = F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all(c, F.lit(BPE_RE), 0))
    return df.withColumn("n_ws_tokens", ws).withColumn("n_bpe_tokens", bpe)


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: distinct-token overlap with each
    wordlist; argmax with deterministic tie order en > de > fr; 'und'
    when no list overlaps."""
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]) & (scores["en"] > 0),
            F.lit("en"),
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] > 0), F.lit("de"))
        .when(scores["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    out = df
    for lang, s in scores.items():
        out = out.withColumn(f"lid_{lang}", s)
    return out.withColumn("lang_pred", pred)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / lexical-diversity / stopword-ratio quality features
    and a [0,1] score (deterministic linear blend, rounded to 6dp)."""
    c = F.col(text_col)
    toks = tokens_col(c)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    diversity = F.when(n > 0, n_distinct / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    score = F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * diversity + F.lit(0.3) * stop_ratio, 6
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn("n_distinct", n_distinct)
        .withColumn("n_stopwords", n_stop)
        .withColumn("quality", score)
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the normalized (lowercase,
    single-space-joined alnum tokens) text — whitespace/punctuation
    insensitive doc identity."""
    normalized = F.array_join(tokens_col(F.col(text_col)), " ")
    return df.withColumn("fingerprint", F.md5(normalized))
