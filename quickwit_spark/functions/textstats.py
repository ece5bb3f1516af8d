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


def _word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (tokens are alnum-only,
    so the join is unambiguous). Empty array when the doc has fewer
    than ``n`` tokens."""
    if n == 1:
        return toks
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _top_run_count(arr: Column) -> Column:
    """Occurrences of the most frequent element, computed as the
    longest equal-run of the SORTED array via a single expression
    fold — per-row, map-side, no explode/groupBy shuffle. 0 for an
    empty array."""
    state0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, g: Column) -> Column:
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), state0, step, lambda acc: acc["best"])


def with_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family,
    public: Rae et al. 2021 §A1.1) over the alnum token stream:

    - ``rep_top_2gram_frac`` / ``rep_top_3gram_frac``: occurrences of
      the most frequent word 2-/3-gram over total 2-/3-grams — high
      values flag boilerplate / template spam;
    - ``rep_dup_5gram_frac``: fraction of 5-gram occurrences that are
      repeats (1 - distinct/total) — flags looping generators;
    - ``rep_dup_token_frac``: 1 - distinct tokens / total tokens.

    Everything is a per-row JVM expression (sorted-array fold for the
    top count) — the operator is shuffle-free and costs one map pass
    at any corpus size. Fractions are exact IEEE divisions of small
    ints (bit-reproducible vs the SQL oracle). Reference scope note:
    the reference engine indexes but does not curate; these extend
    the corpus-curation tier alongside quality_score.
    """
    toks = tokens_col(F.col(text_col))
    out = df.withColumn("n_tokens", F.size(toks))

    def frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    for n, name in ((2, "rep_top_2gram_frac"), (3, "rep_top_3gram_frac")):
        grams = _word_ngrams(toks, n)
        out = out.withColumn(name, frac(_top_run_count(grams), F.size(grams)))
    g5 = _word_ngrams(toks, 5)
    out = out.withColumn(
        "rep_dup_5gram_frac",
        frac(F.size(g5) - F.size(F.array_distinct(g5)), F.size(g5)),
    )
    return out.withColumn(
        "rep_dup_token_frac",
        frac(F.size(toks) - F.size(F.array_distinct(toks)), F.size(toks)),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    scheme): hash every k-token shingle, slide a w-hash window, keep
    each window's MINIMUM hash; the distinct selected hashes are the
    doc's fingerprint set. Two docs sharing a sufficiently long run
    of tokens are guaranteed to share a fingerprint — the standard
    rolling-hash identity for plagiarism / near-dup detection.

    One row per (doc_id, fp). Everything is per-row array arithmetic
    (shingle -> 60-bit md5 hash -> windowed array_min -> distinct),
    so the operator is a shuffle-free map before the explode; at
    100 TB each doc's fingerprints compute where the doc lives.
    Docs with fewer than k tokens emit no rows.
    """
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.array_join(F.slice(toks, i, k), " ")), 1, 15
                ),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    m = F.size(grams)
    mins = F.when(
        m >= w,
        F.transform(
            F.sequence(F.lit(1), m - (w - 1)),
            lambda i: F.array_min(F.slice(grams, i, w)),
        ),
    ).otherwise(grams)  # short docs: every gram hash is a fingerprint
    fps = F.array_distinct(mins)
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(fps).alias("fp")
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 10,
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Corpus-level top-``k`` most frequent word n-grams, optionally
    per group (e.g. per language) — the standard corpus-inspection
    table curation teams eyeball for template/boilerplate pollution
    before training (C4 / Dolma publish exactly these).

    Plan shape (scale analysis for 100 TB): per-row n-gram arrays are
    a narrow projection; the ONLY corpus-sized shuffle is one hash
    aggregation on (group, ngram) with map-side partial counts. The
    rank window runs over already-aggregated distinct-ngram rows, and
    because the filter is ``row_number() <= k`` Spark's
    WindowGroupLimit rewrite caps each map task's contribution to k
    rows per group BEFORE the window exchange — the final sort never
    sees the full distinct-ngram tail (plan-asserted in tests).

    Ties break deterministically: count desc, then ngram asc.
    Output: (grp, ngram, n_occurrences, rank); ``grp`` is constant ''
    when ``group_col`` is None.
    """
    # lazy import (dedup imports this module at load time)
    from quickwit_spark.functions.dedup import _widen_narrow_input

    # the n-gram explode runs at SCAN parallelism — a one-file input
    # would serialize it onto one core (measured 6x on the bench
    # corpus; same trap as the minhash map stage)
    df = _widen_narrow_input(df)
    toks = tokens_col(F.col(text_col))
    grams = _word_ngrams(toks, n)
    grp = F.col(group_col) if group_col else F.lit("")
    exploded = df.select(grp.alias("grp"), F.explode(grams).alias("ngram"))
    counted = exploded.groupBy("grp", "ngram").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    from pyspark.sql import Window

    # always partition by grp (constant '' when ungrouped) so the
    # window never plans the warn-level no-partition global sort
    w = Window.partitionBy(F.col("grp")).orderBy(
        F.col("n_occurrences").desc(), F.col("ngram").asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("grp", "ngram", "n_occurrences", "rank")
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords — the standard
    doc-tagging/labeling step. score = tf · ln(N/df) over the
    corpus's own document frequencies.

    Determinism contract (the round-4 lesson): the RANKING key is the
    score quantized to 3dp (both engines round the same cell — the
    same convention the BM25/lm oracles ride) with a term-asc
    tie-break, and the emitted score cell is that same quantized
    value — no raw-double ordering anywhere.

    Plan shape (100 TB): distinct-(doc, term) explode (term counted
    once per doc for df; tf kept per pair) → ONE hash aggregation per
    side — (doc, term) tf and term df — joined on term (aggregated
    rows, not corpus rows), then a per-doc rank window whose
    ``row_number() <= k`` filter becomes a pre-shuffle
    WindowGroupLimit. N is one scalar agg broadcast via crossJoin.
    """
    from pyspark.sql import Window

    from quickwit_spark.functions.dedup import _widen_narrow_input

    base = _widen_narrow_input(
        df.select(F.col(id_col).alias("doc_id"), text_col)
    )
    pairs = base.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    tf = pairs.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = base.agg(F.count(F.lit(1)).alias("n")).withColumnRenamed(
        "n", "__n"
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df")), 3
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )
