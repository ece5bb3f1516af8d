"""Sequence packing: concat-and-split assignment for LLM training.

Training pipelines concatenate the token streams of all documents (in
a fixed, reproducible order) and cut the stream every ``capacity``
tokens into fixed-length training sequences. The hard part at 10^12
docs is the **global exclusive prefix sum** of per-doc token counts —
a naive ``row_number()/sum() OVER (ORDER BY key)`` is a single-task
window (the classic scale-killer). This implements the same two-phase
prefix sum the index builder uses for doc-id assignment
(operators/build.py:_assign_doc_ids "twophase"), with one twist that
makes it **recompute-safe**:

- bucket boundaries are computed ONCE via ``approxQuantile`` and
  baked into the plan as literals, so the order-preserving bucket of
  a row is a pure function of its key. A ``spark_partition_id()``
  over ``repartitionByRange`` would depend on sampled range
  boundaries and could silently change if a partition is recomputed
  after cache eviction; literal boundaries cannot.
- per-bucket token sums are one cheap aggregate job; the driver
  cumsums the ≤``num_buckets`` partials and broadcasts them back;
- each row's global offset = bucket offset + a window prefix sum
  *within* its bucket (hash exchange on the bucket column + sort —
  the only shuffle, and it is full-width parallel).

Semantics (deterministic; the DuckDB oracle reproduces it exactly):
docs ordered by ``key_col`` (must be numeric and unique), tokenized
by whitespace (``\\s+``, empties dropped — same contract as
chunking/textstats); zero-token docs contribute nothing. Sequence
``s`` covers global token offsets ``[s*capacity, (s+1)*capacity)``; a
doc straddling a cut emits one row per overlapped sequence. Output:
``(key, seq_id, seq_tok_start, doc_tok_start, n_toks, piece_text)``.

Cost model at 100 TB: tokenize is a map; the quantile pass reads only
the key column (parquet column pruning); the offset window shuffles
``(key, n, toks)`` once. Explode factor is ``1 + n/capacity`` — ~1 for
capacity ≫ doc length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_buckets: int | None = None,
) -> DataFrame:
    """Assign every document's tokens to fixed-``capacity`` training
    sequences (concat-and-split packing). Returns one row per
    (doc, sequence) overlap — see module docstring for the contract.

    Calling this runs two small Spark jobs up front (quantile
    boundaries + per-bucket sums); the returned DataFrame is lazy.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )

    from quickwit_spark.functions.dedup import _widen_narrow_input

    # the tokenize map runs at scan parallelism on the sums job —
    # widen one-file inputs (no-op at real scale; see dedup helper)
    df = _widen_narrow_input(df)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = (
        df.select(F.col(key_col).alias("__key"), toks.alias("__toks"))
        .withColumn("__n", F.size("__toks").cast("long"))
        .filter(F.col("__n") > 0)
    )

    # order-preserving bucket from literal quantile boundaries
    # (recompute-safe: the bucket is a pure function of the key).
    # Precision at the i64 edge: the double cast collapses adjacent
    # keys above 2^53, but int64→double rounding is MONOTONE
    # (k1 < k2 ⇒ double(k1) ≤ double(k2)), so buckets stay
    # order-preserving, and the within-bucket window below orders by
    # the exact __key — global token order is exact for all int64
    # keys (pinned by test_pack_sequences_keys_above_2_53_stay_exact)
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(
        set(
            base.select(
                F.col("__key").cast("double").alias("__key")
            ).stat.approxQuantile("__key", probs, 0.001)
        )
    ) if probs else []
    kd = F.col("__key").cast("double")
    if not bounds:
        bucket = F.lit(0)
    elif len(bounds) <= 512:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b < kd))
    else:
        # two-level search: a flat scan of B boundaries per row caps
        # num_buckets, but at 10^12 docs each bucket is ONE window
        # task, so B must grow with the corpus. Coarse = every 256th
        # boundary (chunk maxima); bucket = 256·chunk + rank within
        # the chunk's 256-boundary slice — ≤ 512 comparisons per row
        # for B up to 65 536, all inside whole-stage codegen.
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        coarse = bounds[255::256]
        carr = F.array(*[F.lit(float(b)) for b in coarse])
        ci = F.size(F.filter(carr, lambda b: b < kd))
        fine = F.size(
            F.filter(F.slice(barr, ci * 256 + 1, 256), lambda b: b < kd)
        )
        bucket = ci * 256 + fine
    base = base.withColumn("__b", bucket)

    # driver-side cumsum of per-bucket token totals (≤ num_buckets rows)
    sums = {
        int(r["__b"]): int(r["s"])
        for r in base.groupBy("__b").agg(F.sum("__n").alias("s")).collect()
    }
    acc, offs = 0, []
    for b in sorted(sums):
        offs.append((b, acc))
        acc += sums[b]
    if not offs:  # empty corpus
        offs = [(0, 0)]
    offs_df = F.broadcast(
        spark.createDataFrame(offs, "__b int, __off long")
    )

    w = (
        Window.partitionBy("__b")
        .orderBy("__key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cap = F.lit(int(capacity)).cast("long")
    o = (F.col("__off") + F.coalesce(F.sum("__n").over(w), F.lit(0))).alias(
        "__o"
    )
    spanned = (
        base.join(offs_df, "__b")
        .select("__key", "__toks", "__n", o)
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr("__o div " + str(int(capacity))),
                    F.expr(f"(__o + __n - 1) div {int(capacity)}"),
                )
            ),
        )
    )
    start = F.greatest(F.col("__o"), F.col("seq_id") * cap)
    stop = F.least(F.col("__o") + F.col("__n"), (F.col("seq_id") + 1) * cap)
    doc_tok_start = (start - F.col("__o")).cast("long")
    n_toks = (stop - start).cast("long")
    return spanned.select(
        F.col("__key").alias(key_col),
        F.col("seq_id").cast("long").alias("seq_id"),
        (start - F.col("seq_id") * cap).cast("long").alias("seq_tok_start"),
        doc_tok_start.alias("doc_tok_start"),
        n_toks.alias("n_toks"),
        F.array_join(
            F.slice(F.col("__toks"), doc_tok_start + 1, n_toks), " "
        ).alias("piece_text"),
    )


def assemble_sequences(packed: DataFrame) -> DataFrame:
    """Materialize training rows from ``pack_sequences`` output: one
    row per sequence, pieces concatenated in stream order. One hash
    exchange on ``seq_id`` (uniform by construction — sequences are
    equal-sized cuts of the token stream, so no skew) with a map-side
    partial aggregate; ``n_toks == capacity`` for every row but the
    last sequence."""
    return (
        packed.groupBy("seq_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("seq_tok_start", "piece_text")
                        )
                    ),
                    lambda s: s["piece_text"],
                ),
                " ",
            ).alias("seq_text"),
            F.sum("n_toks").alias("n_toks"),
            F.count("*").alias("n_pieces"),
        )
        .select("seq_id", "n_toks", "n_pieces", "seq_text")
    )
