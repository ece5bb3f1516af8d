"""Distributed inverted-index build — Indexer + Packager re-expressed
as DataFrame ops (reference pipeline: quickwit-indexing
actors/indexer.rs + actors/packager.rs, SURVEY.md §2.4, §3.2).

Shape of the job (all declarative until the final encode UDF):

1. split assignment — deterministic hash of the doc key
   (``pmod(xxhash64(key), num_splits)``) → same doc always lands in
   the same split regardless of parallelism (resumability + stable
   doc ids). Analogue of the indexer cutting splits at
   ``split_num_docs_target`` (index_config.rs:161-163).
2. doc-id assignment — ``row_number() over (partition by split order
   by key)``: deterministic, reproducible tie-break key
   ``(split_id, doc_id)`` (reference global sort key lib.rs:99-104).
3. tokenize JVM-side (``split``/``lower``/``filter`` — whole-stage
   codegen; zero Python) → ``posexplode`` for positions.
4. per-(split, term, doc) tf aggregation — Spark partial+final hash
   agg (map-side combine shrinks the shuffle).
5. posting encode — ``applyInPandas`` over ``(split_id, bucket)``
   groups (bucket = hash of term) where numpy delta-gap + varbyte
   encodes each term's posting list with per-block skip data.
   Optionally two-phase with doc-range salting for hot terms
   (``salt_chunk``): partial encodes per (term, doc-chunk) are
   re-merged by concatenation + re-gapping — the north_rule's
   explicit skew handling.
6. stats + tags per split (min/max timestamp, exact token totals,
   ``collect_set`` tags under the ≤1000 cardinality guard of
   packager.rs:36-40) → staged + atomically published to the
   metastore with a checkpoint delta (publisher.rs:87-111).

Writes are idempotent per split (dynamic partition overwrite), so a
crashed build resumes by skipping splits whose checkpoint positions
are already recorded (checkpoint.rs:160-178 semantics).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quickwit_spark.operators.analysis import tokenize_col
from quickwit_spark.operators.codec import encode_posting_list
from quickwit_spark.operators.fieldnorm import fieldnorm_to_id
from quickwit_spark.plans.config import IndexConfig, RECORD_POSITION
from quickwit_spark.plans.metastore import Metastore, SplitMetadata

POSTINGS_SCHEMA = (
    "split_id int, field string, term string, doc_freq long, total_tf long, "
    "doc_bytes binary, tf_bytes binary, skip_bytes binary, pos_bytes binary"
)


def _encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
    """Encode every (field, term) posting list in one bucket group.

    Input rows: field, term, doc_id, tf, positions (nullable list).
    Vectorized: one numpy sort + boundary detection, then the
    per-term numpy encoder.
    """
    split_id = int(pdf["split_id"].iloc[0])
    pdf = pdf.sort_values(["field", "term", "doc_id"], kind="mergesort")
    fields = pdf["field"].to_numpy()
    terms = pdf["term"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    has_pos = "positions" in pdf.columns
    positions = pdf["positions"].to_numpy() if has_pos else None

    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            columns=[
                "split_id", "field", "term", "doc_freq", "total_tf",
                "doc_bytes", "tf_bytes", "skip_bytes", "pos_bytes",
            ]
        )
    boundary = np.ones(n, dtype=bool)
    boundary[1:] = (terms[1:] != terms[:-1]) | (fields[1:] != fields[:-1])
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], n)

    rows = []
    for s, e in zip(starts, ends):
        pos_arrays = None
        if has_pos and positions[s] is not None:
            pos_arrays = [np.asarray(p, dtype=np.uint64) for p in positions[s:e]]
        enc = encode_posting_list(doc_ids[s:e], tfs[s:e], pos_arrays)
        rows.append(
            (
                split_id,
                fields[s],
                terms[s],
                int(e - s),
                int(tfs[s:e].sum()),
                enc["doc_bytes"],
                enc["tf_bytes"],
                enc["skip_bytes"],
                enc.get("pos_bytes"),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "split_id", "field", "term", "doc_freq", "total_tf",
            "doc_bytes", "tf_bytes", "skip_bytes", "pos_bytes",
        ],
    )


def _norm_id_udf():
    from pyspark.sql.pandas.functions import pandas_udf

    def _norm(lens):
        return pd.Series(
            fieldnorm_to_id(lens.to_numpy(dtype=np.int64)).astype(np.int32)
        )

    _norm.__annotations__ = {"lens": pd.Series, "return": pd.Series}
    return pandas_udf(_norm, "int")


def build_index(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    config: IndexConfig,
    num_splits: int | None = None,
    source_id: str = "default",
    term_buckets: int | None = None,
    salt_chunk: int | None = None,
) -> list[SplitMetadata]:
    """Build (or resume building) the index for ``df``.

    Returns the SplitMetadata of splits built in THIS invocation.
    ``salt_chunk``: if set, posting construction runs in two phases
    with doc-id-range salting so a hot term's encode is spread over
    ``num_docs / salt_chunk`` tasks (skew handling).
    """
    ms = Metastore(index_dir)
    if not ms.exists():
        ms.create(config)
    else:
        config = ms.config()

    if num_splits is None:
        approx = df.count()
        num_splits = max(1, -(-approx // config.split_num_docs_target))
    if term_buckets is None:
        term_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    key = config.key_field
    split_col = F.pmod(F.xxhash64(F.col(key)), F.lit(num_splits)).cast("int")
    df = df.withColumn("split_id", split_col)

    # resume: skip splits whose checkpoint position is already recorded
    done = {int(p) for p in ms.checkpoint(source_id)}
    todo = sorted(set(range(num_splits)) - done)
    if not todo:
        return []
    if done:
        df = df.filter(~F.col("split_id").isin([int(d) for d in done]))

    return _execute_build(
        spark, ms, config, df, todo, source_id,
        checkpoint_delta_fn=lambda metas: {
            m.split_id: f"docs:{m.num_docs:020d}" for m in metas
        },
        term_buckets=term_buckets,
        salt_chunk=salt_chunk,
    )


def add_documents(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    source_id: str = "stream",
    position: str | None = None,
    num_splits: int | None = None,
    term_buckets: int | None = None,
) -> list[SplitMetadata]:
    """Append ``df`` as NEW splits to an existing index — the
    incremental-ingest primitive the streaming path uses per
    micro-batch (reference: each indexer commit cuts fresh splits,
    indexer.rs:347-351; publish advances the source checkpoint
    atomically, publisher.rs:87-111).

    ``position``: monotonically-increasing source position (e.g. a
    zero-padded streaming batch id). If the recorded checkpoint for
    ``source_id`` is already at/past it, the call is a NO-OP —
    exactly-once on micro-batch replay (checkpoint.rs:160-178).
    """
    ms = Metastore(index_dir)
    config = ms.config()
    if position is not None:
        prev = ms.checkpoint(source_id).get("position")
        if prev is not None and str(position) <= prev:
            return []  # batch already committed — replay no-op
    if term_buckets is None:
        term_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if num_splits is None:
        approx = df.count()
        num_splits = max(1, -(-approx // config.split_num_docs_target))
    base = max((int(s.split_id) for s in ms.splits()), default=-1) + 1

    key = config.key_field
    split_col = (
        F.pmod(F.xxhash64(F.col(key)), F.lit(num_splits)).cast("int")
        + F.lit(base)
    )
    df = df.withColumn("split_id", split_col)
    todo = list(range(base, base + num_splits))
    delta = (
        (lambda metas: {"position": str(position)})
        if position is not None
        else (lambda metas: None)
    )
    return _execute_build(
        spark, ms, config, df, todo, source_id,
        checkpoint_delta_fn=delta,
        term_buckets=term_buckets,
        salt_chunk=None,
    )


def _execute_build(
    spark: SparkSession,
    ms: Metastore,
    config: IndexConfig,
    df: DataFrame,
    todo: list[int],
    source_id: str,
    checkpoint_delta_fn,
    term_buckets: int,
    salt_chunk: int | None,
) -> list[SplitMetadata]:
    """Shared build core: ``df`` already carries ``split_id``; encode
    postings/docmap/fastfields for the splits in ``todo`` and publish
    them atomically."""
    # under foreachBatch the DataFrame is bound to a CLONED session —
    # conf must be set there or the partition overwrite goes static
    # and wipes previously-built splits
    spark = df.sparkSession
    key = config.key_field
    t0 = time.time()
    w = Window.partitionBy("split_id").orderBy(key)
    docs = df.withColumn("doc_id", F.row_number().over(w) - F.lit(1))

    norm_udf = _norm_id_udf()
    doc_cols = [F.col("split_id"), F.col("doc_id"), F.col(key).alias("key")]
    if config.timestamp_field:
        doc_cols.append(F.col(config.timestamp_field))
    for f in config.fast_fields:
        if f not in (config.timestamp_field, key):
            doc_cols.append(F.col(f))
    tok_cols = {}
    for fc in config.indexed_fields:
        tok = tokenize_col(F.col(fc.name), fc.tokenizer)
        tok_cols[fc.name] = tok
        doc_cols.append(F.size(tok).alias(f"len_{fc.name}"))
        doc_cols.append(norm_udf(F.size(tok)).alias(f"norm_{fc.name}"))
    docs = docs.select(*doc_cols, *[
        tok_cols[fc.name].alias(f"toks_{fc.name}") for fc in config.indexed_fields
    ])
    docs.cache()

    # ---- docmap (doc store + fast fields + fieldnorms) ----
    docmap = docs.drop(*[f"toks_{fc.name}" for fc in config.indexed_fields])
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        docmap.repartition("split_id")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("split_id")
        .mode("overwrite")
        .parquet(ms.docmap_dir())
    )

    # ---- packed per-split fast-field blobs (tantivy-style columnar
    #      values: one binary cell per (split, column) — the query
    #      path reads these tiny rows instead of shuffling the whole
    #      docmap; docmap parquet remains the doc store) ----
    ff_cols = [f"norm_{fc.name}" for fc in config.indexed_fields]
    ts_field = config.timestamp_field

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        sid = int(pdf["split_id"].iloc[0])
        rows = []
        for c in ff_cols:
            rows.append((sid, c, pdf[c].to_numpy(dtype=np.uint8).tobytes()))
        if ts_field is not None:
            s = pdf[ts_field]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            micros = s.astype("datetime64[us]").astype(np.int64)
            rows.append((sid, f"ts_{ts_field}", micros.to_numpy().tobytes()))
        return pd.DataFrame(rows, columns=["split_id", "name", "data"])

    ff_select = ["split_id", "doc_id", *ff_cols] + (
        [ts_field] if ts_field else []
    )
    fastfields = (
        docmap.select(*ff_select)
        .groupBy("split_id")
        .applyInPandas(_pack, "split_id int, name string, data binary")
    )
    (
        fastfields.write.partitionBy("split_id")
        .mode("overwrite")
        .parquet(os.path.join(ms.index_dir, "fastfields"))
    )

    # ---- token rows → tf per (split, field, term, doc) ----
    per_field = []
    for fc in config.indexed_fields:
        ex = docs.select(
            "split_id",
            "doc_id",
            F.lit(fc.name).alias("field"),
            F.posexplode(f"toks_{fc.name}").alias("pos", "term"),
        )
        if fc.record == RECORD_POSITION:
            tf = ex.groupBy("split_id", "field", "term", "doc_id").agg(
                F.count("*").alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            )
        else:
            tf = ex.groupBy("split_id", "field", "term", "doc_id").agg(
                F.count("*").alias("tf"),
                F.lit(None).cast("array<int>").alias("positions"),
            )
        per_field.append(tf)
    tf_rows = per_field[0]
    for other in per_field[1:]:
        tf_rows = tf_rows.unionByName(other)

    # ---- posting encode (grouped by term-hash bucket; optional
    #      doc-range salt splits hot terms across tasks) ----
    if salt_chunk:
        # each (term, doc-chunk) partial must cover ONE contiguous doc
        # range so the phase-2 merge can concatenate by first doc
        tf_rows = tf_rows.withColumn(
            "chunk", (F.col("doc_id") / F.lit(salt_chunk)).cast("long")
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("term", "chunk"), F.lit(term_buckets))
        )
        group_cols = ["split_id", "bucket", "chunk"]
    else:
        tf_rows = tf_rows.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets))
        )
        group_cols = ["split_id", "bucket"]
    encoded = tf_rows.groupBy(*group_cols).applyInPandas(
        lambda pdf: _encode_groups(pdf), POSTINGS_SCHEMA
    )
    if salt_chunk:
        from quickwit_spark.operators.merge import merge_partial_postings

        encoded = merge_partial_postings(encoded, term_buckets)

    (
        encoded.repartition("split_id")
        .sortWithinPartitions("field", "term")
        .write.partitionBy("split_id")
        .mode("overwrite")
        .parquet(ms.postings_dir())
    )

    # ---- per-split stats + tags → metadata ----
    aggs = [F.count("*").alias("num_docs")]
    if config.timestamp_field:
        ts = config.timestamp_field
        aggs += [
            F.min(F.unix_micros(F.col(ts))).alias("ts_min"),
            F.max(F.unix_micros(F.col(ts))).alias("ts_max"),
        ]
    for fc in config.indexed_fields:
        aggs.append(F.sum(f"len_{fc.name}").alias(f"tok_{fc.name}"))
    stats = {r["split_id"]: r.asDict() for r in docmap.groupBy("split_id").agg(*aggs).collect()}

    tags: dict[int, dict[str, list[str]]] = {s: {} for s in stats}
    for tag_field in config.tag_fields:
        trows = (
            df.groupBy("split_id")
            .agg(F.collect_set(F.col(tag_field).cast("string")).alias("vals"))
            .collect()
        )
        for r in trows:
            vals = sorted(v for v in r["vals"] if v is not None)
            if len(vals) <= config.tag_cardinality_limit:  # packager.rs:36-40
                tags.setdefault(r["split_id"], {})[tag_field] = vals
    docs.unpersist()

    build_secs = time.time() - t0
    metas = []
    for sid in todo:
        st = stats.get(sid)
        if st is None:
            continue  # no docs hashed into this split
        meta = SplitMetadata(
            split_id=str(sid),
            num_docs=int(st["num_docs"]),
            total_tokens={
                fc.name: int(st[f"tok_{fc.name}"]) for fc in config.indexed_fields
            },
            time_range=(
                (int(st["ts_min"]), int(st["ts_max"]))
                if config.timestamp_field
                else None
            ),
            tags=tags.get(sid, {}),
            lineage={
                "source_id": source_id,
                "build_wall_secs": round(build_secs, 3),
                "num_splits_in_batch": len(todo),
            },
        )
        metas.append(meta)
    ms.stage_splits(metas)
    ms.publish_splits(
        [m.split_id for m in metas],
        source_id=source_id,
        checkpoint_delta=checkpoint_delta_fn(metas),
    )
    return metas
