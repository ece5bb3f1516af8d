"""Deduplication: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Scale design (the point of each operator at 10^12 docs):

- exact: one hash-groupBy on md5(normalized text) — Spark partial
  agg + AQE handle skew; no pairwise work.
- MinHash+LSH: per-doc signatures are H independent min-aggregations
  over shingle hashes (all JVM expressions); candidate pairs come
  from a self-join on (band_id, band_hash) — the only shuffle is on
  band keys, never all-pairs. Hash = md5 hex prefix, so a SQL oracle
  reproduces signatures exactly.
- n-gram Jaccard: exact verification for candidate pairs (or small
  corpora): shingle-set self-join, |∩| by count, |∪| by inclusion-
  exclusion. Quadratic only within matching shingles.
- SimHash: 32-bit sign-sum sketch over token hashes; near pairs
  bucket by 16-bit halves (pigeonhole over the hamming budget).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.textstats import tokens_col


def normalized_text(col: Column) -> Column:
    return F.array_join(tokens_col(col), " ")


def _widen_narrow_input(df: DataFrame) -> DataFrame:
    """The shingle/hash map stage runs at SCAN parallelism, which for a
    small input (one parquet file → one partition) serializes the
    heaviest work onto one core (measured 6× on the bench corpus).
    Widen ONLY when the scan is narrower than the cluster's default
    parallelism — at real scale (input partitions ≫ cores) this never
    fires, so no exchange is added where the data is already wide."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """(key, content_hash, group_size, is_canonical): canonical = min
    key per identical-content group; drop non-canonicals to dedup."""
    from pyspark.sql import Window

    h = F.md5(normalized_text(F.col(text_col)))
    w = Window.partitionBy("content_hash")
    return (
        df.select(F.col(key_col).alias("key"), h.alias("content_hash"))
        .withColumn("group_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col("key") == F.min("key").over(w))
    )


def shingle_col(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) of the token stream."""
    toks = tokens_col(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def _minhash_expr(i: int) -> Column:
    # hash_i(shingle) = md5('<i>|' + shingle) hex — min of fixed-width
    # hex strings == numeric min; identical in any SQL engine with md5
    return F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(
        f"mh_{i}"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 12,
    k: int = 3,
) -> DataFrame:
    """One row per doc: key + num_hashes minhash columns (md5-hex)."""
    df = _widen_narrow_input(df)
    sh = df.select(
        F.col(key_col).alias("key"),
        F.explode(shingle_col(F.col(text_col), k)).alias("shingle"),
    )
    return sh.groupBy("key").agg(*[_minhash_expr(i) for i in range(num_hashes)])


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Docs sharing ≥1 LSH band → (key_a < key_b) candidate pairs.

    Self-join shuffles only on (band_id, band_hash) — never all
    pairs. Identical docs collide in every band; near-dups in ≥1
    with high probability. ``max_bucket_size`` drops mega-buckets
    (boilerplate that hashes thousands of docs into one band value)
    BEFORE the self-join — an m-doc bucket contributes m² pairs, so
    one boilerplate bucket otherwise dominates the whole job; capped
    docs still pair through their other, more selective bands.
    """
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("|", *parts)).alias("band_hash"))
        )
    exploded = signatures.select(
        "key", F.explode(F.array(*band_cols)).alias("band")
    ).select("key", "band.band_id", "band.band_hash")
    if max_bucket_size is not None:
        from pyspark.sql import Window

        wcnt = Window.partitionBy("band_id", "band_hash")
        exploded = (
            exploded.withColumn("__bsz", F.count("*").over(wcnt))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    # merge hint: under AQE, converting one side of this self-join to
    # a broadcast breaks shuffle-stage reuse and RECOMPUTES the whole
    # signature lineage (corpus scan + shingle explode + 12 min-aggs)
    # for that side — measured 2-3x wall on sf0.1. Pinning SMJ keeps
    # both sides on the same reused shuffle stage; at corpus scale SMJ
    # is what AQE would pick anyway.
    a = exploded.alias("a").hint("merge")
    b = exploded.alias("b").hint("merge")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over k-shingle sets for pairs sharing ≥1
    shingle; emits pairs with jaccard ≥ threshold (rounded 6dp).

    ``candidates`` (key_a, key_b) restricts the quadratic shingle
    self-join to candidate docs and the output to candidate pairs —
    the post-LSH verifier shape that makes this usable at corpus
    scale (standalone it is quadratic in docs sharing a shingle)."""
    sh = df.select(
        F.col(key_col).alias("key"),
        F.explode(shingle_col(F.col(text_col), k)).alias("shingle"),
    )
    if candidates is not None:
        ckeys = (
            candidates.select(F.col("key_a").alias("key"))
            .unionByName(candidates.select(F.col("key_b").alias("key")))
            .distinct()
        )
        sh = sh.join(ckeys, "key", "left_semi")
    sizes = sh.groupBy("key").agg(F.count("*").alias("sz"))
    # merge hint: same AQE stage-reuse rationale as lsh_candidate_pairs
    # (a broadcast-converted side would re-scan + re-explode the corpus)
    a = sh.alias("a").hint("merge")
    b = sh.alias("b").hint("merge")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.key") < F.col("b.key")))
        .groupBy(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .agg(F.count("*").alias("n_common"))
    )
    if candidates is not None:
        inter = inter.join(
            candidates.select("key_a", "key_b"), ["key_a", "key_b"], "left_semi"
        )
    sa = sizes.select(F.col("key").alias("key_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("key").alias("key_b"), F.col("sz").alias("sz_b"))
    # plain equi-joins: `sizes` is one row PER DOC, so at corpus scale
    # it must not be broadcast (driver/executor OOM) — AQE still
    # auto-broadcasts when the runtime size happens to be small
    out = (
        inter.join(sa, "key_a")
        .join(sb, "key_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "n_common", "jaccard")
    )
    return out


def simhash(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """32-bit SimHash: bit b = sign of Σ_tokens (±1 by bit b of
    md5(token)). Pure column expressions (conv hex→long + bit ops)."""
    df = _widen_narrow_input(df)
    tok = df.select(
        F.col(key_col).alias("key"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    h = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    tok = tok.withColumn("h", h)
    aggs = []
    for b in range(bits):
        bit = F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"s_{b}"))
    sums = tok.groupBy("key").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(0)
    return sums.select("key", sig.alias("simhash"))


def simhash_near_pairs(sig_df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Bucket by 16-bit halves (pigeonhole) then exact hamming
    filter — near-dup pairs without an all-pairs join."""
    lo = F.col("simhash").bitwiseAND(F.lit((1 << 16) - 1))
    hi = F.shiftright(F.col("simhash"), 16).bitwiseAND(F.lit((1 << 16) - 1))
    parts = sig_df.select(
        "key",
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("which"), lo.alias("half")),
                F.struct(F.lit(1).alias("which"), hi.alias("half")),
            )
        ).alias("p"),
    ).select("key", "simhash", "p.which", "p.half")
    # merge hint: same AQE stage-reuse rationale as lsh_candidate_pairs
    # (parts derives from the per-doc simhash aggregation)
    a, b = parts.alias("a").hint("merge"), parts.alias("b").hint("merge")
    cand = (
        a.join(
            b,
            (F.col("a.which") == F.col("b.which"))
            & (F.col("a.half") == F.col("b.half"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("key_a", "key_b", "hamming")


def connected_components(
    edges: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iter: int = 50,
) -> DataFrame:
    """(key, comp) for every vertex of ``edges``; comp = MIN key
    reachable from it (so the component label IS its canonical doc).

    Iterative min-label propagation: each round every vertex takes
    the minimum of its own and its neighbors' labels — one shuffle
    per round, converging in O(graph diameter) rounds (dedup groups
    are shallow: near-clique clusters converge in 2-3).
    ``localCheckpoint`` truncates the growing plan each round.
    """
    sym = (
        edges.select(F.col(key_a).alias("src"), F.col(key_b).alias("dst"))
        .unionByName(
            edges.select(F.col(key_b).alias("src"), F.col(key_a).alias("dst"))
        )
        .distinct()
    )
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("key"))
        .distinct()
        .withColumn("comp", F.col("key"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels.withColumnRenamed("key", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
            .withColumnRenamed("src", "key")
        )
        new = (
            labels.join(neigh, "key", "left")
            .select(
                "key",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new.withColumnRenamed("comp", "ncomp2")
            .join(labels, "key")
            .filter(F.col("ncomp2") != F.col("comp"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"({changed} labels still changing) — the dup graph has a "
        f"longer chain than expected; raise max_iter"
    )


def near_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 6,
    shingle_k: int = 1,
    bands: int = 3,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The full near-dup pipeline a 100 TB training-data run needs,
    as ONE operator: MinHash signatures → LSH candidate pairs (with
    the mega-bucket cap) → exact n-gram-Jaccard verification of ONLY
    the candidates → connected components → canonical-doc selection.

    Returns one row per input doc: ``(key, group_id, group_size,
    is_canonical)`` where group_id = min key of the doc's near-dup
    component (its own key when unpaired) — ``filter(is_canonical)``
    is the deduplicated corpus.
    """
    sigs = minhash_signatures(df, text_col, key_col, num_hashes, shingle_k)
    cand = lsh_candidate_pairs(
        sigs, bands, rows_per_band, max_bucket_size=max_bucket_size
    )
    # exact verification restricted to candidate docs/pairs
    verified = ngram_jaccard_pairs(
        df, text_col, key_col, shingle_k, threshold, candidates=cand
    ).select("key_a", "key_b")
    comps = connected_components(verified)
    from pyspark.sql import Window

    out = (
        df.select(F.col(key_col).alias("key"))
        .join(comps, "key", "left")
        .withColumn("group_id", F.coalesce(F.col("comp"), F.col("key")))
        .drop("comp")
    )
    w = Window.partitionBy("group_id")
    return out.withColumn("group_size", F.count("*").over(w)).withColumn(
        "is_canonical", F.col("key") == F.col("group_id")
    )


def dedup_against(
    batch: DataFrame,
    corpus_hashes: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Incremental exact dedup of a new ingest batch against an
    already-published corpus — the periodic-crawl flow: given the
    corpus's content-hash table (e.g. the ``content_hash`` column of
    :func:`exact_dup_groups` output, persisted at publish time), mark
    each batch doc as already-in-corpus, an intra-batch repeat, or
    the batch-canonical first occurrence of genuinely new content —
    only the last should be ingested.

    Output: (key, content_hash, in_corpus, is_new_canonical).

    Scale (10^12-doc corpus): only the corpus's 32-byte hash COLUMN is
    scanned, never its text; the membership probe is one equi-join on
    md5 (broadcast when the hash table is small, sort-merge otherwise
    — an un-skewable key); within-batch canonicalization windows over
    the BATCH side only. Nothing is ever quadratic.
    """
    from pyspark.sql import Window

    h = F.md5(normalized_text(F.col(text_col)))
    b = batch.select(F.col(key_col).alias("key"), h.alias("content_hash"))
    corpus = (
        corpus_hashes.select(F.col(hash_col).alias("content_hash"))
        .distinct()
        .withColumn("__in", F.lit(True))
    )
    w = Window.partitionBy("content_hash")
    return (
        b.join(corpus, "content_hash", "left")
        .select(
            "key",
            "content_hash",
            F.coalesce("__in", F.lit(False)).alias("in_corpus"),
        )
        .withColumn(
            "is_new_canonical",
            (~F.col("in_corpus"))
            & (F.col("key") == F.min("key").over(w)),
        )
    )


def dedup_exact_stream(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Streaming twin of exact dedup for continuous ingestion: over a
    STREAMING DataFrame of documents, emit only the first arrival of
    each distinct normalized content — Spark's stateful streaming
    ``dropDuplicates`` keyed on the 32-byte md5, the idiomatic
    engine-managed version of the seen-hash set.

    Output: (key, content_hash) append stream.

    Contract / scale notes: state is the distinct-hash set, stored in
    the state store partitioned by hash (HDFS/RocksDB-backed at
    cluster scale), and without a watermark it grows with distinct
    content forever — the right semantic for corpus dedup, where
    "seen once, ever" is the contract (the batch side's periodic
    :func:`dedup_against` anti-join is the compaction path when state
    must be rebased onto a published corpus). With time-ordered
    arrival the kept doc per group equals the batch
    :func:`exact_dup_groups` canonical (min key) — pinned by test.
    """
    h = F.md5(normalized_text(F.col(text_col)))
    return df.select(
        F.col(key_col).alias("key"), h.alias("content_hash")
    ).dropDuplicates(["content_hash"])
