"""Elasticsearch-style aggregations + search_stream column export.

The reference forwards an opaque ES-style JSON aggregation request to
tantivy 0.17 per segment and merges intermediate results across
splits (quickwit-search/src/collector.rs:289-296,337-353; demo:
range buckets + nested avg in quickwit-cli/tests/cli.rs:217-305).
tantivy 0.17 supports: bucket aggs ``range`` and ``histogram``,
metric aggs ``avg`` and ``stats`` (+ min/max/sum/value_count as
stats components). Same surface here plus the ``terms`` bucket agg
(the JSON DSL's next addition upstream), executed Spark-first:

    matching docs (operators/search.matches_df — no top-k)
      ⋈ docmap fast-field columns (shuffle join — the match set is
        unbounded, never broadcast; fetch_docs bounded=False)
      → groupBy(bucket expr: when-chains / floor(col/interval))
      → agg(count, avg, min, max, sum)

— i.e. the partial-per-segment + merge structure of the reference IS
Spark's partial/final hash aggregation; nothing custom is needed.

search_stream (search_stream/leaf.rs:119-255): export ONE fast-field
value of EVERY matching doc, optionally grouped by a partition
field → a filter + project + optional groupBy, streamed by the sink.

ES response shape: ``{"name": {"buckets": [{"key": …, "doc_count":
…, "sub": {...}}, …]}}`` with unbounded range edges as ``"*"``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.operators.search import (
    SearchRequest,
    fetch_docs,
    get_searcher,
    matches_df,
)

_METRIC_AGGS = ("avg", "stats", "min", "max", "sum", "value_count")


def _metric_cols(name: str, spec: dict) -> list:
    (kind, body), = spec.items()
    if kind not in _METRIC_AGGS:
        raise ValueError(f"unsupported metric aggregation {kind!r}")
    col = F.col(body["field"])
    if kind == "avg":
        return [F.avg(col).alias(f"{name}::avg")]
    if kind == "min":
        return [F.min(col).alias(f"{name}::min")]
    if kind == "max":
        return [F.max(col).alias(f"{name}::max")]
    if kind == "sum":
        return [F.sum(col).alias(f"{name}::sum")]
    if kind == "value_count":
        return [F.count(col).alias(f"{name}::value_count")]
    # stats
    return [
        F.count(col).alias(f"{name}::count"),
        F.min(col).alias(f"{name}::min"),
        F.max(col).alias(f"{name}::max"),
        F.sum(col).alias(f"{name}::sum"),
        F.avg(col).alias(f"{name}::avg"),
    ]


def _metric_result(name: str, spec: dict, row) -> object:
    (kind, _), = spec.items()
    if kind == "stats":
        return {
            "count": row[f"{name}::count"],
            "min": row[f"{name}::min"],
            "max": row[f"{name}::max"],
            "sum": row[f"{name}::sum"],
            "avg": row[f"{name}::avg"],
        }
    return {"value": row[f"{name}::{kind}"]}


def _range_key(lo, hi) -> str:
    l = "*" if lo is None else f"{lo:g}"
    h = "*" if hi is None else f"{hi:g}"
    return f"{l}-{h}"


def terms_buckets(
    docs: DataFrame,
    field: str,
    size: int = 10,
    sub_cols: list | None = None,
) -> DataFrame:
    """ES ``terms`` bucket aggregation over already-fetched matching
    docs: one bucket per distinct value, top ``size`` by doc_count
    desc (ties: key asc).

    tantivy added the terms aggregation right after the reference's
    pin (same JSON surface); included here because the range/histogram
    DSL is incomplete for real dashboards without it. Plan shape: one
    hash aggregation with map-side partials, then a global
    TakeOrderedAndProject of ``size`` rows — never a full sort of the
    bucket set.

    ES/tantivy terms semantics: docs MISSING the field are ignored —
    they produce no bucket and don't count toward
    ``sum_other_doc_count`` (no ``{"key": null}`` bucket, which no
    ES-compatible client expects).
    """
    grouped = (
        docs.filter(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"), *(sub_cols or []))
    )
    return grouped.orderBy(F.col("doc_count").desc(), F.col("key").asc()).limit(size)


def run_aggregations(
    spark: SparkSession,
    index_dir: str,
    req: SearchRequest,
    aggs: dict,
) -> dict:
    """Run the aggregation request over all docs matching ``req``."""
    # one snapshot spans match + fetch: no torn read across a publish
    snap = get_searcher(spark, index_dir).snapshot()
    matches = matches_df(spark, index_dir, req, tables=snap)
    needed: set[str] = set()
    for spec in aggs.values():
        for kind, body in spec.items():
            if kind in ("range", "histogram", "terms"):
                needed.add(body["field"])
            elif kind in _METRIC_AGGS:
                needed.add(body["field"])
            elif kind == "aggs":
                for sub in body.values():
                    for k2, b2 in sub.items():
                        if k2 in _METRIC_AGGS:
                            needed.add(b2["field"])
    docs = fetch_docs(
        spark, index_dir, matches, columns=sorted(needed), bounded=False,
        docmap=snap["docmap"],
    )
    # each agg spec runs >=1 job over the matched-docs lineage (terms
    # runs 2: top-N + the non-missing total); persist it whenever more
    # than one job will execute so the expensive match+fetch join is
    # computed once, the way the reference's single collector pass is
    n_jobs = len(aggs) + sum(1 for spec in aggs.values() if "terms" in spec)
    persisted = n_jobs > 1
    if persisted:
        docs = docs.persist()

    out: dict = {}
    for name, spec in aggs.items():
        sub_aggs = spec.get("aggs", {})
        sub_cols = []
        for sname, sspec in sub_aggs.items():
            sub_cols += _metric_cols(sname, sspec)
        if "range" in spec:
            body = spec["range"]
            col = F.col(body["field"])
            ranges = [(r.get("from"), r.get("to")) for r in body["ranges"]]
            bucket = F.lit(None).cast("string")
            for lo, hi in ranges:
                cond = F.lit(True)
                if lo is not None:
                    cond = cond & (col >= F.lit(lo))
                if hi is not None:
                    cond = cond & (col < F.lit(hi))
                bucket = F.when(cond & bucket.isNull(), F.lit(_range_key(lo, hi))).otherwise(bucket)
            grouped = (
                docs.withColumn("__bucket", bucket)
                .filter(F.col("__bucket").isNotNull())
                .groupBy("__bucket")
                .agg(F.count("*").alias("doc_count"), *sub_cols)
            )
            rows = {r["__bucket"]: r for r in grouped.collect()}
            buckets = []
            for lo, hi in ranges:
                key = _range_key(lo, hi)
                r = rows.get(key)
                b = {"key": key, "doc_count": int(r["doc_count"]) if r else 0}
                if lo is not None:
                    b["from"] = float(lo)
                if hi is not None:
                    b["to"] = float(hi)
                for sname, sspec in sub_aggs.items():
                    b[sname] = (
                        _metric_result(sname, sspec, r) if r else {"value": None}
                    )
                buckets.append(b)
            out[name] = {"buckets": buckets}
        elif "terms" in spec:
            body = spec["terms"]
            size = int(body.get("size", 10))
            # ES semantics: sum_other_doc_count counts docs WITH the
            # field that fell outside the top buckets
            total = docs.filter(F.col(body["field"]).isNotNull()).count()
            top = terms_buckets(docs, body["field"], size, sub_cols).collect()
            buckets = []
            in_top = 0
            for r in top:
                b = {"key": r["key"], "doc_count": int(r["doc_count"])}
                in_top += int(r["doc_count"])
                for sname, sspec in sub_aggs.items():
                    b[sname] = _metric_result(sname, sspec, r)
                buckets.append(b)
            out[name] = {
                "buckets": buckets,
                "sum_other_doc_count": int(total - in_top),
                "doc_count_error_upper_bound": 0,
            }
        elif "histogram" in spec:
            body = spec["histogram"]
            col = F.col(body["field"]).cast("double")
            interval = float(body["interval"])
            bucket = F.floor(col / F.lit(interval)) * F.lit(interval)
            grouped = (
                docs.withColumn("__bucket", bucket)
                .groupBy("__bucket")
                .agg(F.count("*").alias("doc_count"), *sub_cols)
                .orderBy("__bucket")
            )
            buckets = []
            for r in grouped.collect():
                b = {"key": float(r["__bucket"]), "doc_count": int(r["doc_count"])}
                for sname, sspec in sub_aggs.items():
                    b[sname] = _metric_result(sname, sspec, r)
                buckets.append(b)
            out[name] = {"buckets": buckets}
        else:
            cols = []
            for kind in spec:
                if kind in _METRIC_AGGS:
                    cols = _metric_cols(name, spec)
                    break
            row = docs.agg(*cols).collect()[0]
            out[name] = _metric_result(name, spec, row)
    if persisted:
        docs.unpersist()
    return out


def search_stream(
    spark: SparkSession,
    index_dir: str,
    req: SearchRequest,
    fast_field: str,
    partition_by_field: str | None = None,
) -> DataFrame:
    """Export the fast-field value of EVERY matching doc (no top-k),
    optionally with a partition column (PartionnedFastFieldCollector
    analogue)."""
    snap = get_searcher(spark, index_dir).snapshot()
    matches = matches_df(spark, index_dir, req, tables=snap)
    cols = [fast_field]
    if partition_by_field and partition_by_field != fast_field:
        cols.append(partition_by_field)
    docs = fetch_docs(
        spark, index_dir, matches, columns=cols, bounded=False,
        docmap=snap["docmap"],
    )
    return docs.select(*cols)
