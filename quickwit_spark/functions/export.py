"""Deterministic sharded export — the "materialize the training set"
step at the end of a curation pipeline: docs land in fixed-size,
key-ordered shards with an integrity manifest (row/token counts +
content digest per shard), so a downstream trainer can consume, audit
and resume the dataset shard-by-shard.

Scale design (why there is NO global row_number window): the naive
``row_number() OVER (ORDER BY key)`` plans a single-task sort — the
classic export killer at 10^12 rows. Instead, the same
recompute-safe two-phase recipe as functions/packing.py:

1. LITERAL quantile boundaries over the (numeric) key are baked into
   the plan — row→bucket assignment is a pure comparison expression,
   so a Spark recompute of any stage reproduces it exactly (a
   ``repartitionByRange`` would NOT: its RangePartitioner re-samples
   on recompute);
2. exact bucket counts (one tiny row per bucket) fold into literal
   prefix-sum offsets;
3. each row's GLOBAL index = its bucket's offset + a rank local to
   the bucket (one exchange on the bucket key);
4. shard = global_index div rows_per_shard.

The DuckDB oracle is the plain ROW_NUMBER formulation, so the gate
proves the distributed plan equals the naive semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.textstats import tokens_col


def assign_shards(
    df: DataFrame,
    rows_per_shard: int,
    key_col: str = "doc_id",
    num_buckets: int | None = None,
) -> DataFrame:
    """Add ``shard`` and ``__gidx`` columns: rows ordered by the
    (unique, numeric) ``key_col`` are packed into consecutive shards
    of ``rows_per_shard`` rows (the last shard may be short)."""
    import functools

    from pyspark.sql import Window

    spark = df.sparkSession
    n = num_buckets or max(2, spark.sparkContext.defaultParallelism)
    qs = [i / n for i in range(1, n)]
    bounds = sorted(set(
        df.stat.approxQuantile(key_col, qs, 0.001)
    ))
    bucket = functools.reduce(
        lambda acc, b: acc + (F.col(key_col) > F.lit(b)).cast("int"),
        bounds,
        F.lit(0),
    )
    with_b = df.withColumn("__b", bucket)
    counts = {
        int(r["__b"]): int(r["c"])
        for r in with_b.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__b").orderBy(F.col(key_col).asc())
    return (
        with_b.withColumn(
            "__gidx", omap[F.col("__b")] + F.row_number().over(w) - 1
        )
        .withColumn(
            "shard",
            F.expr(f"__gidx div {int(rows_per_shard)}").cast("long"),
        )
        .drop("__b")
    )


def shard_manifest(
    df: DataFrame,
    rows_per_shard: int,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, n_rows, n_tokens, key_lo, key_hi, digest): the export
    integrity manifest — digest is md5 over the shard's ordered key
    list (≤ rows_per_shard entries, bounded agg state), so a consumer
    verifies shard membership without reading text."""
    assigned = assign_shards(df, rows_per_shard, key_col)
    ntok = F.size(tokens_col(F.col(text_col)))
    return (
        assigned.withColumn("__ntok", ntok)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__ntok").alias("n_tokens"),
            F.min(key_col).alias("key_lo"),
            F.max(key_col).alias("key_hi"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col("__gidx"), F.col(key_col))
                            )
                        ),
                        lambda s: s[key_col].cast("string"),
                    ),
                    ",",
                )
            ).alias("digest"),
        )
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    rows_per_shard: int,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Write ``out_dir/shard=N/`` parquet plus ``out_dir/_manifest``
    parquet; returns the manifest DataFrame. Assignment is a pure
    function of the data (literal boundaries + exact counts), so a
    re-run overwrites with identical shard membership."""
    assigned = assign_shards(df, rows_per_shard, key_col)
    (
        assigned.repartition(F.col("shard"))
        .sortWithinPartitions(key_col)
        .drop("__gidx")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )
    manifest = shard_manifest(df, rows_per_shard, key_col, text_col)
    manifest.write.mode("overwrite").parquet(out_dir + "/_manifest")
    return manifest
