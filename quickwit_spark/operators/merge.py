"""Split merging — the shuffle + re-aggregate tier.

Two jobs (reference: quickwit-indexing actors/merge_executor.rs,
SURVEY.md §2.5):

- :func:`merge_partial_postings` — second phase of the salted build:
  partial posting encodes of doc-id chunks of the same term are
  re-merged by concatenation + re-gapping (the chunks cover disjoint
  ascending doc ranges, so a decode → concat → encode per term is a
  k-way merge of sorted runs).
- :func:`merge_splits` — compaction: k published splits → 1. Doc ids
  are re-based by the cumulative doc counts of the inputs in
  ascending split-id order (merge_executor.rs:271-335 re-bases via
  tantivy segment merge; ours is arithmetic), postings re-merged per
  term, docmap/fastfields concatenated, and the output split
  atomically replaces its inputs in the metastore
  (publish-with-replace semantics, publisher.rs:94-105).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.operators.codec import (
    decode_posting_list,
    decode_positions,
    encode_posting_list,
)
from quickwit_spark.plans.metastore import SplitMetadata, open_metastore

POSTINGS_SCHEMA = (
    "split_id int, field string, term string, doc_freq long, total_tf long, "
    "doc_bytes binary, tf_bytes binary, skip_bytes binary, pos_bytes binary"
)


def _merge_term_rows(pdf: pd.DataFrame, rebase: dict[int, int] | None) -> pd.DataFrame:
    """Merge posting chunks row-group: input rows are partial lists of
    the same (field, term) — or of multiple terms — each covering a
    disjoint doc range (after optional re-basing)."""
    out_rows = []
    target_sid = int(pdf["out_split"].iloc[0]) if "out_split" in pdf.columns else int(
        pdf["split_id"].iloc[0]
    )
    for (field, term), grp in pdf.groupby(["field", "term"], sort=True):
        docs_parts, tfs_parts, pos_parts = [], [], []
        any_pos = grp["pos_bytes"].notna().any()
        for _, r in grp.iterrows():
            docs, tfs = decode_posting_list(
                r["doc_bytes"], r["tf_bytes"], int(r["doc_freq"])
            )
            docs = docs.astype(np.int64)
            if rebase is not None:
                docs = docs + rebase[int(r["split_id"])]
            docs_parts.append(docs)
            tfs_parts.append(tfs)
            if any_pos:
                pos_parts.append(
                    decode_positions(r["pos_bytes"], tfs)
                    if r["pos_bytes"] is not None
                    else [np.empty(0, np.uint64)] * len(docs)
                )
        order = np.argsort([int(d[0]) for d in docs_parts], kind="stable")
        docs = np.concatenate([docs_parts[i] for i in order])
        tfs = np.concatenate([tfs_parts[i] for i in order])
        positions = None
        if any_pos:
            positions = []
            for i in order:
                positions.extend(pos_parts[i])
        if docs.size > 1 and not (np.diff(docs) > 0).all():
            # sorted-index merge: partials interleave in doc space
            # (the remap permutes docs globally by the sort field), so
            # finish with a real k-way merge — doc ids are unique
            # across partials, a stable sort is the merge
            perm = np.argsort(docs, kind="mergesort")
            docs, tfs = docs[perm], tfs[perm]
            if positions is not None:
                positions = [positions[i] for i in perm]
        enc = encode_posting_list(docs.astype(np.uint64), tfs, positions)
        out_rows.append(
            (
                target_sid, field, term, int(docs.size), int(tfs.sum()),
                enc["doc_bytes"], enc["tf_bytes"], enc["skip_bytes"],
                enc.get("pos_bytes"),
            )
        )
    return pd.DataFrame(
        out_rows,
        columns=[
            "split_id", "field", "term", "doc_freq", "total_tf",
            "doc_bytes", "tf_bytes", "skip_bytes", "pos_bytes",
        ],
    )


def remap_postings_fn(key, post_pdf: pd.DataFrame, map_pdf: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped per input split: decode each posting list, remap its
    doc ids through the (doc_id -> new_split, new_doc) mapping, and
    emit one PARTIAL posting row per (output split, term). Partials
    are disjoint contiguous runs when the mapping keeps each input
    split's docs in relative order (demux) or re-sorts globally
    (sorted merge) — either way merge_partial_postings finishes the
    k-way merge. Shared by demux and the sorted merge path."""
    cols = [
        "split_id", "field", "term", "doc_freq", "total_tf",
        "doc_bytes", "tf_bytes", "skip_bytes", "pos_bytes",
    ]
    if len(post_pdf) == 0 or len(map_pdf) == 0:
        return pd.DataFrame(columns=cols)
    n_docs = int(map_pdf["doc_id"].max()) + 1
    to_split = np.full(n_docs, -1, dtype=np.int64)
    to_doc = np.full(n_docs, -1, dtype=np.int64)
    od = map_pdf["doc_id"].to_numpy()
    to_split[od] = map_pdf["new_split"].to_numpy()
    to_doc[od] = map_pdf["new_doc"].to_numpy()
    rows = []
    for r in post_pdf.itertuples(index=False):
        docs, tfs = decode_posting_list(r.doc_bytes, r.tf_bytes, int(r.doc_freq))
        docs = docs.astype(np.int64)
        pos = (
            decode_positions(r.pos_bytes, tfs)
            if r.pos_bytes is not None
            else None
        )
        tgt_split = to_split[docs]
        tgt_doc = to_doc[docs]
        if (tgt_split < 0).any():
            raise ValueError(
                f"postings reference doc ids missing from the docmap "
                f"mapping (split {r.split_id}, term {r.term!r})"
            )
        for ns in np.unique(tgt_split):
            sel = tgt_split == ns
            d, t = tgt_doc[sel], tfs[sel]
            order = np.argsort(d, kind="mergesort")
            d, t = d[order], t[order]
            p = None
            if pos is not None:
                idx = np.flatnonzero(sel)[order]
                p = [pos[i] for i in idx]
            enc = encode_posting_list(d.astype(np.uint64), t, p)
            rows.append(
                (
                    int(ns), r.field, r.term, int(d.size), int(t.sum()),
                    enc["doc_bytes"], enc["tf_bytes"], enc["skip_bytes"],
                    enc.get("pos_bytes"),
                )
            )
    return pd.DataFrame(rows, columns=cols)


def merge_partial_postings(encoded: DataFrame, term_buckets: int) -> DataFrame:
    """Phase-2 of the salted build: re-merge doc-chunk partials."""
    bucketed = encoded.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets))
    )
    return (
        bucketed.groupBy("split_id", "bucket")
        .applyInPandas(lambda pdf: _merge_term_rows(pdf, rebase=None), POSTINGS_SCHEMA)
    )


def merge_splits(
    spark: SparkSession,
    index_dir: str,
    split_ids: list[str],
    term_buckets: int | None = None,
) -> SplitMetadata:
    """Merge k published splits into one new split (compaction op)."""
    ms = open_metastore(index_dir)
    config = ms.config()
    metas = {s.split_id: s for s in ms.list_published()}
    inputs = [metas[sid] for sid in split_ids]
    if len(inputs) < 2:
        raise ValueError("need >= 2 splits to merge")
    if term_buckets is None:
        term_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    in_ids = sorted(int(s.split_id) for s in inputs)
    # CAS-reserved id + placeholder staged before any data write:
    # concurrent writers get disjoint ids, crashed merges leave a
    # GC-able Staged entry (reference order: stage -> upload -> publish)
    new_sid = int(ms.allocate_split_ids(1)[0])
    ms.stage_splits([SplitMetadata(split_id=str(new_sid))])
    if config.sort_by_field:
        return _merge_splits_sorted(
            spark, ms, config, inputs, in_ids, new_sid, term_buckets
        )
    rebase, acc = {}, 0
    for sid in in_ids:
        rebase[sid] = acc
        acc += metas[str(sid)].num_docs

    # ---- postings: constant-offset re-base → vectorized
    #      concatenation merge (inputs' doc ranges are disjoint after
    #      the rebase, so this is the same concat-in-first-doc-order
    #      merge the map-side build uses — no per-term Python) ----
    from quickwit_spark.operators.build import _make_partial_merger

    postings = (
        spark.read.parquet(ms.postings_dir())
        .filter(F.col("split_id").isin(in_ids))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)))
    )
    merger = _make_partial_merger(
        [fc.name for fc in config.indexed_fields],
        rebase=rebase,
        out_split=new_sid,
    )
    merged = postings.groupBy("bucket").applyInArrow(
        merger, POSTINGS_SCHEMA
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        merged.repartition("split_id")
        .sortWithinPartitions("field", "term")
        .write.partitionBy("split_id")
        .mode("overwrite")
        .parquet(ms.postings_dir())
    )

    # ---- docmap: re-base + move under the new split ----
    rebase_expr = F.col("doc_id")
    for sid in in_ids:
        rebase_expr = F.when(
            F.col("split_id") == sid, F.col("doc_id") + F.lit(rebase[sid])
        ).otherwise(rebase_expr)
    docmap = (
        spark.read.parquet(ms.docmap_dir())
        .filter(F.col("split_id").isin(in_ids))
        .withColumn("doc_id", rebase_expr)
        .withColumn("split_id", F.lit(new_sid))
    )
    (
        docmap.repartition("split_id")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("split_id")
        .mode("overwrite")
        .parquet(ms.docmap_dir())
    )

    # ---- fastfields: concatenate blobs in split order ----
    ff = (
        spark.read.parquet(os.path.join(ms.index_dir, "fastfields"))
        .filter(F.col("split_id").isin(in_ids))
    )
    order_map = {sid: i for i, sid in enumerate(in_ids)}

    def _concat(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("split_id", key=lambda s: s.map(order_map))
        return pd.DataFrame(
            {
                "split_id": [new_sid],
                "name": [pdf["name"].iloc[0]],
                "data": [b"".join(pdf["data"])],
            }
        )

    ff_merged = ff.groupBy("name").applyInPandas(
        _concat, "split_id int, name string, data binary"
    )
    (
        ff_merged.write.partitionBy("split_id")
        .mode("overwrite")
        .parquet(os.path.join(ms.index_dir, "fastfields"))
    )

    # ---- metadata union + atomic replace ----
    meta = _union_meta(config, inputs, new_sid)
    ms.stage_splits([meta])
    ms.publish_splits(
        [meta.split_id], replaced_split_ids=[s.split_id for s in inputs]
    )
    return meta


def _union_meta(config, inputs, new_sid) -> SplitMetadata:
    tr = None
    ranges = [m.time_range for m in inputs if m.time_range]
    if ranges:
        tr = (min(r[0] for r in ranges), max(r[1] for r in ranges))
    tags: dict[str, list[str]] = {}
    for fld in config.tag_fields:
        vals = set()
        missing = False
        for m in inputs:
            if fld in m.tags:
                vals |= set(m.tags[fld])
            else:
                missing = True
        if not missing and len(vals) <= config.tag_cardinality_limit:
            tags[fld] = sorted(vals)
    total_tokens: dict[str, int] = {}
    for m in inputs:
        for f, v in m.total_tokens.items():
            total_tokens[f] = total_tokens.get(f, 0) + v
    return SplitMetadata(
        split_id=str(new_sid),
        num_docs=sum(m.num_docs for m in inputs),
        total_tokens=total_tokens,
        time_range=tr,
        tags=tags,
        merge_ops=max(m.merge_ops for m in inputs) + 1,
        lineage={"merged_from": [s.split_id for s in inputs], "ts": time.time()},
    )


def _merge_splits_sorted(
    spark: SparkSession,
    ms: Metastore,
    config,
    inputs: list[SplitMetadata],
    in_ids: list[int],
    new_sid: int,
    term_buckets: int,
) -> SplitMetadata:
    """Merge for a SORTED index (config.sort_by_field): the output
    split's doc ids follow the global (sort field, key) order across
    all inputs, preserving the index-sorting invariant — the
    reference's sorted segment merge (indexer.rs:99-103 index sorting
    + merge_executor doc mapping). The global rank window is one
    task, which is reference parity: one MergeExecutor process owns a
    merge op; the postings rewrite itself fans out per input split
    and term bucket."""
    from pyspark.sql import Window

    from quickwit_spark.operators.build import write_fastfields

    docmap_in = spark.read.parquet(ms.docmap_dir()).filter(
        F.col("split_id").isin(in_ids)
    )
    w = Window.orderBy(F.col(config.sort_by_field), F.col("key"))
    mapped = docmap_in.withColumn("new_doc", F.row_number().over(w) - F.lit(1))
    mapped = mapped.withColumn("new_split", F.lit(new_sid))
    mapped.cache()

    mapping = mapped.select("split_id", "doc_id", "new_split", "new_doc")
    postings = spark.read.parquet(ms.postings_dir()).filter(
        F.col("split_id").isin(in_ids)
    )
    partials = (
        postings.groupBy("split_id")
        .cogroup(mapping.groupBy("split_id"))
        .applyInPandas(remap_postings_fn, POSTINGS_SCHEMA)
    )
    merged = merge_partial_postings(partials, term_buckets)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        merged.repartition("split_id")
        .sortWithinPartitions("field", "term")
        .write.partitionBy("split_id")
        .mode("overwrite")
        .parquet(ms.postings_dir())
    )

    new_docmap = (
        mapped.drop("split_id", "doc_id")
        .withColumnRenamed("new_split", "split_id")
        .withColumnRenamed("new_doc", "doc_id")
    )
    (
        new_docmap.repartition("split_id")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("split_id")
        .mode("overwrite")
        .parquet(ms.docmap_dir())
    )
    new_docmap_r = spark.read.parquet(ms.docmap_dir()).filter(
        F.col("split_id") == new_sid
    )
    write_fastfields(ms, config, new_docmap_r)
    mapped.unpersist()

    meta = _union_meta(config, inputs, new_sid)
    ms.stage_splits([meta])
    ms.publish_splits(
        [meta.split_id], replaced_split_ids=[s.split_id for s in inputs]
    )
    return meta
