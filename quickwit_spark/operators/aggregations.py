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

_METRIC_AGGS = (
    "avg", "stats", "min", "max", "sum", "value_count", "cardinality",
    "percentiles", "extended_stats", "missing",
)

# ES percentiles default percents
_DEFAULT_PERCENTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)


def _metric_cols(name: str, spec: dict, col=None) -> list:
    """Aggregate Columns for one metric spec. ``col`` overrides the
    input column (the ``filters`` agg masks it with a predicate so a
    filter bucket's sub-metrics ride the same shared pass)."""
    (kind, body), = spec.items()
    if kind not in _METRIC_AGGS:
        raise ValueError(f"unsupported metric aggregation {kind!r}")
    if col is None:
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
    if kind == "cardinality":
        # ES's cardinality is an HLL estimate; default here is EXACT
        # (count distinct — Spark plans it as a two-phase partial
        # distinct aggregation, no driver materialization), because an
        # exact answer that DuckDB can oracle beats a sketch when the
        # engine can afford it. ``"approx": true`` opts into Spark's
        # HLL++ (approx_count_distinct, ES-equivalent behavior) for
        # ultra-high-cardinality fields where the exact distinct's
        # shuffle of every distinct value would dominate.
        if body.get("approx"):
            rsd = body.get("rsd")
            acd = (
                F.approx_count_distinct(col, rsd)
                if rsd is not None
                else F.approx_count_distinct(col)
            )
            return [acd.alias(f"{name}::cardinality")]
        return [F.countDistinct(col).alias(f"{name}::cardinality")]
    if kind == "percentiles":
        # ES's percentiles is a t-digest estimate; default here is
        # EXACT (Spark's `percentile`, linear interpolation between
        # closest ranks — the same definition DuckDB's quantile_cont
        # uses, so it oracles). ``"approx": true`` opts into Spark's
        # approx_percentile for cases where the exact sort-based
        # aggregation is too heavy. One aggregate computes the whole
        # percents array.
        pcts = [float(p) for p in body.get("percents", _DEFAULT_PERCENTS)]
        if not pcts or any(not (0.0 <= p <= 100.0) for p in pcts):
            raise ValueError(f"bad percents {pcts!r}")
        arr = F.array(*[F.lit(p / 100.0) for p in pcts])
        fn = F.approx_percentile if body.get("approx") else F.percentile
        return [fn(col, arr).alias(f"{name}::percentiles")]
    if kind == "missing":
        # ES ``missing`` single-bucket agg: docs whose field is absent.
        # One conditional count inside the shared pass — never a
        # second scan.
        return [
            F.count(F.when(col.isNull(), F.lit(1)))
            .alias(f"{name}::missing")
        ]
    # stats / extended_stats share the base five; extended adds the
    # sum of squares (natural column type: integer fields stay
    # integer-exact through Spark's bigint sum; double fields match
    # ES's double arithmetic). variance/std_deviation derive from
    # (count, avg, sos) at response-assembly time — ES's own naive
    # formula (MetricAggregator's sumOfSqrs/count - avg^2), so no
    # extra aggregate column is needed.
    cols = [
        F.count(col).alias(f"{name}::count"),
        F.min(col).alias(f"{name}::min"),
        F.max(col).alias(f"{name}::max"),
        F.sum(col).alias(f"{name}::sum"),
        F.avg(col).alias(f"{name}::avg"),
    ]
    if kind == "extended_stats":
        cols.append(F.sum(col * col).alias(f"{name}::sos"))
    return cols


def _metric_result(name: str, spec: dict, row) -> object:
    (kind, body), = spec.items()
    if kind == "percentiles":
        pcts = [float(p) for p in body.get("percents", _DEFAULT_PERCENTS)]
        vals = row[f"{name}::percentiles"]
        # ES response shape: {"values": {"50.0": v, ...}} (keys are
        # the percent doubles' default rendering, e.g. "25.0")
        return {
            "values": {
                str(p): (None if vals is None else vals[i])
                for i, p in enumerate(pcts)
            }
        }
    if kind == "missing":
        return {"doc_count": int(row[f"{name}::missing"])}
    if kind in ("stats", "extended_stats"):
        out = {
            "count": row[f"{name}::count"],
            "min": row[f"{name}::min"],
            "max": row[f"{name}::max"],
            "sum": row[f"{name}::sum"],
            "avg": row[f"{name}::avg"],
        }
        if kind == "extended_stats":
            n, avg = out["count"], out["avg"]
            sos = row[f"{name}::sos"]
            out["sum_of_squares"] = sos
            if n and avg is not None and sos is not None:
                # ES's population variance: E[x^2] - E[x]^2 (naive
                # sum-of-squares form, matching its response exactly)
                var = float(sos) / n - float(avg) * float(avg)
                std = math.sqrt(max(var, 0.0))
            else:
                var = std = None
            out["variance"] = var
            out["std_deviation"] = std
            sigma = float(body.get("sigma", 2.0))
            out["std_deviation_bounds"] = {
                "upper": None if std is None else float(avg) + sigma * std,
                "lower": None if std is None else float(avg) - sigma * std,
            }
        return out
    return {"value": row[f"{name}::{kind}"]}


_INTERVAL_US = {
    "ms": 1_000, "s": 1_000_000, "m": 60_000_000,
    "h": 3_600_000_000, "d": 86_400_000_000,
}


def _parse_fixed_interval(v) -> int:
    """ES ``fixed_interval`` ("30s", "5m", "1h", "7d", "500ms") or a
    plain number of seconds → microseconds."""
    if isinstance(v, (int, float)):
        us = int(v * 1_000_000)
    else:
        s = str(v).strip().lower()
        unit = "ms" if s.endswith("ms") else s[-1]
        if unit not in _INTERVAL_US:
            raise ValueError(f"bad fixed_interval {v!r}")
        us = int(s[: -len(unit)]) * _INTERVAL_US[unit]
    if us <= 0:
        raise ValueError(f"fixed_interval must be positive, got {v!r}")
    return us


def _date_bucket_us(field: str, interval_us: int):
    """Epoch-aligned fixed-interval bucket start in epoch MICROS —
    pure int64 arithmetic (``x - pmod(x, n)`` == floor-to-multiple,
    correct for pre-epoch timestamps too; a double division would go
    inexact past 2^53 µs ≈ year 2255)."""
    epoch = F.unix_micros(F.col(field).cast("timestamp"))
    return epoch - F.pmod(epoch, F.lit(interval_us))


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


def date_histogram_buckets(
    df: DataFrame,
    field: str,
    fixed_interval,
    sub_cols: list | None = None,
) -> DataFrame:
    """ES ``date_histogram`` (fixed_interval flavor) over a DataFrame:
    one bucket per epoch-aligned interval containing ≥1 doc (ES omits
    empty buckets unless min_doc_count=0). Plan shape: a narrow int64
    bucket expression + ONE hash aggregation with map-side partials —
    time-bucketing 10^12 rows is exactly this one exchange.

    Returns ``(bucket_us bigint, doc_count, *sub_cols)`` — the bucket
    start in epoch MICROS as an integer-exact cell (callers wanting a
    timestamp wrap it in ``F.timestamp_micros``)."""
    us = _parse_fixed_interval(fixed_interval)
    return (
        df.filter(F.col(field).isNotNull())
        .groupBy(_date_bucket_us(field, us).alias("bucket_us"))
        .agg(F.count(F.lit(1)).alias("doc_count"), *(sub_cols or []))
    )


def _filter_cond(body: dict):
    """Predicate Column for one named ``filters`` entry. Supported
    (the subset the engine's fast fields express): ``term``, ``range``
    (half-open [from, to) like the range agg), ``exists``,
    ``match_all``."""
    (kind, spec), = body.items()
    if kind == "term":
        return F.col(spec["field"]) == F.lit(spec["value"])
    if kind == "range":
        col = F.col(spec["field"])
        cond = col.isNotNull()
        if spec.get("from") is not None:
            cond = cond & (col >= F.lit(spec["from"]))
        if spec.get("to") is not None:
            cond = cond & (col < F.lit(spec["to"]))
        return cond
    if kind == "exists":
        return F.col(spec["field"]).isNotNull()
    if kind == "match_all":
        return F.lit(True)
    raise ValueError(f"unsupported filters predicate {kind!r}")


def _filter_fields(body: dict) -> list:
    (kind, spec), = body.items()
    return [spec["field"]] if kind != "match_all" else []


def _bucket_expr(spec: dict):
    """The grouping-key Column for a bucket agg spec, or None for a
    metric-only spec. NULL key == "doc contributes to no bucket"
    (null field, or value outside every range)."""
    if "range" in spec:
        body = spec["range"]
        col = F.col(body["field"])
        bucket = F.lit(None).cast("string")
        for r in body["ranges"]:
            lo, hi = r.get("from"), r.get("to")
            cond = col.isNotNull()
            if lo is not None:
                cond = cond & (col >= F.lit(lo))
            if hi is not None:
                cond = cond & (col < F.lit(hi))
            bucket = F.when(
                cond & bucket.isNull(), F.lit(_range_key(lo, hi))
            ).otherwise(bucket)
        return bucket
    if "histogram" in spec:
        body = spec["histogram"]
        col = F.col(body["field"])
        if "missing" in body:
            # ES `missing` param: substitute for absent values so those
            # docs land in a real bucket instead of being dropped
            col = F.coalesce(col, F.lit(body["missing"]))
        col = col.cast("double")
        interval = float(body["interval"])
        # null field -> null bucket -> dropped (ES semantics; the
        # range/terms branches already ignore missing-field docs)
        return F.floor(col / F.lit(interval)) * F.lit(interval)
    if "date_histogram" in spec:
        body = spec["date_histogram"]
        # null ts -> null bucket -> dropped, same as histogram/terms
        return _date_bucket_us(
            body["field"], _parse_fixed_interval(body["fixed_interval"])
        )
    if "terms" in spec:
        body = spec["terms"]
        col = F.col(body["field"])
        if "missing" in body:
            col = F.coalesce(col, F.lit(body["missing"]))
        return col
    return None


def _top_hits_fields(body: dict) -> set:
    """Doc columns a top_hits body needs: _source fields + the sort
    field (unless sorting on _score, which rides the hit rows)."""
    fields = set(body.get("_source", []))
    for s in body.get("sort", []):
        (sf, _), = s.items()
        if sf != "_score":
            fields.add(sf)
    return fields


def _top_hits_order(body: dict):
    """Ordering columns for a top_hits body: primary sort (default
    _score desc; one sort field supported) + the engine's global
    tie-break (split_id asc, doc_id asc), matching search()'s rank."""
    sorts = body.get("sort") or [{"_score": "desc"}]
    if len(sorts) > 1:
        raise ValueError("top_hits: only one sort field is supported")
    (sf, sd), = sorts[0].items()
    col = F.col("score") if sf == "_score" else F.col(sf)
    o = col.desc() if sd == "desc" else col.asc()
    return [o, F.col("split_id").asc(), F.col("doc_id").asc()], sf


def _top_hits_hit(row, body: dict) -> dict:
    """One ES-shaped hit: {_source, sort[, _score]}."""
    src = {f: row[f] for f in body.get("_source", [])}
    sorts = body.get("sort") or [{"_score": "desc"}]
    (sf, _), = sorts[0].items()
    hit: dict = {"_source": src}
    if sf == "_score":
        hit["_score"] = float(row["score"])
        hit["sort"] = [hit["_score"]]
    else:
        hit["sort"] = [row[sf]]
    return hit


def run_aggregations(
    spark: SparkSession,
    index_dir: str,
    req: SearchRequest,
    aggs: dict,
    tables: dict | None = None,
) -> dict:
    """Run the aggregation request over all docs matching ``req``.

    SINGLE PASS: every bucket spec becomes one GROUPING SETS set over
    one shared scan of the matched docs — the reference evaluates all
    aggs of a request in one collector walk per segment
    (collector.rs:289-353), and this is the Spark spelling of that.
    One Expand + one partial/final hash aggregation + one collect; a
    3-agg request never re-joins matches against the doc store.
    Exception: ``top_hits`` returns document ROWS, not aggregates, so
    it adds one bounded fetch job (rank-window group-limited to
    `size` per bucket) after the fused pass — the same query-phase /
    fetch-phase split ES itself makes for this agg.

    ``tables``: a ``Searcher.snapshot()`` to evaluate against, so a
    caller holding hits from one snapshot gets buckets from the SAME
    index state (serve.search_endpoint threads its snapshot here).
    """
    import functools
    import operator as _op

    from pyspark.sql.window import Window

    snap = tables if tables is not None else get_searcher(
        spark, index_dir
    ).snapshot()
    matches = matches_df(spark, index_dir, req, tables=snap)
    needed: set[str] = set()
    for spec in aggs.values():
        for kind, body in spec.items():
            if kind in ("range", "histogram", "date_histogram", "terms"):
                needed.add(body["field"])
            elif kind == "composite":
                for src in body["sources"]:
                    (_, sdef), = src.items()
                    (_, sbody), = sdef.items()
                    needed.add(sbody["field"])
            elif kind == "filters":
                for fbody in body["filters"].values():
                    needed.update(_filter_fields(fbody))
            elif kind in _METRIC_AGGS:
                needed.add(body["field"])
            elif kind == "top_hits":
                needed.update(_top_hits_fields(body))
            elif kind == "aggs":
                for sub in body.values():
                    for k2, b2 in sub.items():
                        if k2 in _METRIC_AGGS:
                            needed.add(b2["field"])
                        elif k2 == "top_hits":
                            needed.update(_top_hits_fields(b2))
    docs = fetch_docs(
        spark, index_dir, matches, columns=sorted(needed), bounded=False,
        docmap=snap["docmap"],
    )

    specs = list(aggs.items())
    # metric columns are namespaced "{spec_idx}|{name}" — two specs may
    # reuse a sub-agg name with different bodies
    agg_cols = [F.count(F.lit(1)).alias("doc_count")]
    bucket_idx: list[int] = []   # spec indices that have a bucket kind
    need_global = False
    docs2 = docs
    for i, (name, spec) in enumerate(specs):
        if "composite" in spec:
            # composite paginates high-cardinality buckets: its own
            # bounded job (one hash agg + TakeOrdered) at assembly —
            # ES also evaluates composite separately from sibling aggs
            continue
        if "filters" in spec:
            # docs may match SEVERAL named filters, so these are not
            # grouping keys: each bucket is a conditional count (plus
            # predicate-masked sub-metrics) in the shared global pass
            for fname, fbody in spec["filters"]["filters"].items():
                cond = _filter_cond(fbody)
                agg_cols.append(
                    F.count(F.when(cond, F.lit(1)))
                    .alias(f"{i}|{fname}::fcount")
                )
                for sname, sspec in spec.get("aggs", {}).items():
                    if "top_hits" in sspec:
                        raise ValueError(
                            "top_hits under a filters agg is not "
                            "supported (buckets overlap)"
                        )
                    (_, sbody), = sspec.items()
                    masked = F.when(cond, F.col(sbody["field"]))
                    agg_cols += _metric_cols(
                        f"{i}|{fname}|{sname}", sspec, col=masked
                    )
            need_global = True
            continue
        for sname, sspec in spec.get("aggs", {}).items():
            if "top_hits" in sspec:
                continue  # fetch-phase job at assembly, not an agg col
            agg_cols += _metric_cols(f"{i}|{sname}", sspec)
        if "top_hits" in spec:
            # top-level top_hits: total rides the global doc_count row;
            # the (bounded) hit fetch is a separate job at assembly —
            # the same split ES makes (aggs in the query phase,
            # top_hits docs in the fetch phase)
            need_global = True
            continue
        bexpr = _bucket_expr(spec)
        if bexpr is not None:
            docs2 = docs2.withColumn(f"__b{i}", bexpr)
            bucket_idx.append(i)
        else:
            agg_cols += _metric_cols(f"{i}|{name}", spec)
            need_global = True
        if "terms" in spec:
            # docs WITH the field (in or out of the top buckets) feed
            # sum_other_doc_count — a global count(field), same pass;
            # with `missing` set EVERY doc has a bucket, so count(*)
            agg_cols.append(
                (
                    F.count(F.lit(1))
                    if "missing" in spec["terms"]
                    else F.count(F.col(spec["terms"]["field"]))
                ).alias(f"__total{i}")
            )
            need_global = True

    def _filters_result(i: int, spec: dict, row) -> dict:
        """ES keyed-filters response: named buckets of doc_count +
        sub-metrics, all read from the shared global row."""
        buckets = {}
        for fname in spec["filters"]["filters"]:
            if row is not None:
                b = {"doc_count": int(row[f"{i}|{fname}::fcount"])}
                for sname, sspec in spec.get("aggs", {}).items():
                    b[sname] = _metric_result(
                        f"{i}|{fname}|{sname}", sspec, row
                    )
            else:
                b = {"doc_count": 0}
                for sname in spec.get("aggs", {}):
                    b[sname] = {"value": None}
            buckets[fname] = b
        return {"buckets": buckets}

    def _th_global(body: dict, total: int) -> dict:
        """Top-level top_hits: one bounded orderBy-limit job (the
        fetch phase); ``total`` comes from the shared global row."""
        order, _ = _top_hits_order(body)
        size = int(body.get("size", 3))
        rows = docs2.orderBy(*order).limit(size).collect()
        return {"hits": {"total": {"value": total, "relation": "eq"},
                         "hits": [_top_hits_hit(r, body) for r in rows]}}

    def _composite_result(spec: dict) -> dict:
        """ES composite agg: multi-source bucket keys, keyset (`after`)
        pagination. One hash aggregation on the source tuple + a
        TakeOrdered of `size` rows — Spark's sort-limit does map-side
        partial top-N, so the driver never sees the full bucket
        cardinality (the entire point of composite at 10^12 rows)."""
        body = spec["composite"]
        size = int(body.get("size", 10))
        srcs = []
        for src in body["sources"]:
            (sname, sdef), = src.items()
            (skind, sbody), = sdef.items()
            if skind == "terms":
                col = F.col(sbody["field"])
            elif skind == "histogram":
                interval = float(sbody["interval"])
                col = (
                    F.floor(
                        F.col(sbody["field"]).cast("double")
                        / F.lit(interval)
                    )
                    * F.lit(interval)
                )
            else:
                raise ValueError(
                    f"composite source kind {skind!r} not supported"
                )
            srcs.append((sname, col))
        base = docs2
        for sname, col in srcs:
            base = base.withColumn(f"__c_{sname}", col)
        ccols = [f"__c_{s}" for s, _ in srcs]
        for c in ccols:
            # ES drops docs missing any source (no missing_bucket)
            base = base.filter(F.col(c).isNotNull())
        aggexprs = [F.count(F.lit(1)).alias("doc_count")]
        for mname, mspec in spec.get("aggs", {}).items():
            aggexprs += _metric_cols(f"c|{mname}", mspec)
        grouped = base.groupBy(*ccols).agg(*aggexprs)
        after = body.get("after")
        if after:
            conds = []
            prev_eq = F.lit(True)
            for (sname, _), c in zip(srcs, ccols):
                a = F.lit(after[sname])
                conds.append(prev_eq & (F.col(c) > a))
                prev_eq = prev_eq & (F.col(c) == a)
            grouped = grouped.filter(
                functools.reduce(_op.or_, conds)
            )
        rows = (
            grouped.orderBy(*[F.col(c).asc() for c in ccols])
            .limit(size)
            .collect()
        )
        buckets = []
        for r in rows:
            key = {s: r[c] for (s, _), c in zip(srcs, ccols)}
            b = {"key": key, "doc_count": int(r["doc_count"])}
            for mname, mspec in spec.get("aggs", {}).items():
                b[mname] = _metric_result(f"c|{mname}", mspec, r)
            buckets.append(b)
        res: dict = {"buckets": buckets}
        if buckets:
            res["after_key"] = dict(buckets[-1]["key"])
        return res

    bcols = [f"__b{i}" for i in bucket_idx]
    if not bcols:
        # metric-only request: plain global aggregate (one job already;
        # skipped entirely when every spec is composite/top-hits-free)
        row = None
        if any("composite" not in s for _, s in specs):
            row = docs2.agg(*agg_cols).collect()[0]
        return {
            name: (
                _filters_result(i, spec, row)
                if "filters" in spec
                else _composite_result(spec)
                if "composite" in spec
                else _th_global(spec["top_hits"], int(row["doc_count"]))
                if "top_hits" in spec
                else _metric_result(f"{i}|{name}", spec, row)
            )
            for i, (name, spec) in enumerate(specs)
        }

    # grouping_id bit j (MSB = leftmost grouping column) set == that
    # column is aggregated away; a spec's own rows have only its bit 0
    full_mask = (1 << len(bcols)) - 1
    gid_of = {
        i: full_mask & ~(1 << (len(bcols) - 1 - j))
        for j, i in enumerate(bucket_idx)
    }
    sets = [[F.col(c)] for c in bcols]
    if need_global:
        sets.append([])
    agged = docs2.groupingSets(sets, *[F.col(c) for c in bcols]).agg(
        F.grouping_id().alias("__gid"), *agg_cols
    )
    # drop null-key buckets per set (a null grouping cell inside a
    # spec's own gid is a real NULL key, not a rolled-up column)
    keep = F.lit(need_global) & (F.col("__gid") == full_mask)
    for i in bucket_idx:
        keep = keep | (
            (F.col("__gid") == gid_of[i]) & F.col(f"__b{i}").isNotNull()
        )
    result = agged.filter(keep)

    terms_sizes = {
        i: int(spec["terms"].get("size", 10))
        for i, (_, spec) in enumerate(specs)
        if "terms" in spec
    }
    if terms_sizes:
        # top-N per terms set without a second job: rank inside each
        # grouping set. Each spec gets its own rank column so the ES
        # `order` knob (_count / _key / a sub-metric name) works per
        # spec; extra windows share the __gid partitioning, so this
        # adds per-partition sorts but never another exchange.
        for i, sz in terms_sizes.items():
            body = specs[i][1]["terms"]
            (okey, odir), = body.get("order", {"_count": "desc"}).items()
            if okey == "_count":
                ocol = F.col("doc_count")
            elif okey == "_key":
                ocol = F.col(f"__b{i}")
            else:
                sspec = specs[i][1].get("aggs", {}).get(okey)
                if sspec is None:
                    raise ValueError(
                        f"terms order references unknown sub-agg {okey!r}"
                    )
                (skind, _), = sspec.items()
                ocol = F.col(f"{i}|{okey}::{skind}")
            ocol = ocol.desc() if odir == "desc" else ocol.asc()
            w = Window.partitionBy("__gid").orderBy(
                ocol, F.col(f"__b{i}").asc()
            )
            result = result.withColumn(
                f"__rk{i}", F.row_number().over(w)
            )
        non_terms = ~F.col("__gid").isin(
            [gid_of[i] for i in terms_sizes]
        )
        result = result.filter(functools.reduce(
            _op.or_,
            [
                (F.col("__gid") == gid_of[i]) & (F.col(f"__rk{i}") <= sz)
                for i, sz in terms_sizes.items()
            ],
            non_terms,
        ))

    all_rows = result.collect()          # the ONE action
    by_gid: dict[int, list] = {}
    for r in all_rows:
        by_gid.setdefault(r["__gid"], []).append(r)
    grow = (by_gid.get(full_mask) or [None])[0]

    out: dict = {}
    for i, (name, spec) in enumerate(specs):
        # top_hits sub-specs are fetch-phase (injected below), not
        # grouping-set metric cells
        sub_aggs = {
            k: v for k, v in spec.get("aggs", {}).items()
            if "top_hits" not in v
        }
        if "composite" in spec:
            out[name] = _composite_result(spec)
            continue
        if "top_hits" in spec:
            out[name] = _th_global(
                spec["top_hits"],
                int(grow["doc_count"]) if grow is not None else 0,
            )
            continue
        if "filters" in spec:
            out[name] = _filters_result(i, spec, grow)
        elif "range" in spec:
            rows = {r[f"__b{i}"]: r for r in by_gid.get(gid_of[i], [])}
            buckets = []
            for rng in spec["range"]["ranges"]:
                lo, hi = rng.get("from"), rng.get("to")
                key = _range_key(lo, hi)
                r = rows.get(key)
                b = {"key": key, "doc_count": int(r["doc_count"]) if r else 0}
                if lo is not None:
                    b["from"] = float(lo)
                if hi is not None:
                    b["to"] = float(hi)
                for sname, sspec in sub_aggs.items():
                    b[sname] = (
                        _metric_result(f"{i}|{sname}", sspec, r)
                        if r else {"value": None}
                    )
                buckets.append(b)
            if spec["range"].get("keyed"):
                # ES keyed form: buckets as an object, "key" folded out
                out[name] = {"buckets": {
                    b.pop("key"): b for b in buckets
                }}
            else:
                out[name] = {"buckets": buckets}
        elif "terms" in spec:
            top = sorted(
                by_gid.get(gid_of[i], []), key=lambda r: r[f"__rk{i}"]
            )
            buckets, in_top = [], 0
            for r in top:
                b = {"key": r[f"__b{i}"], "doc_count": int(r["doc_count"])}
                in_top += int(r["doc_count"])
                for sname, sspec in sub_aggs.items():
                    b[sname] = _metric_result(f"{i}|{sname}", sspec, r)
                buckets.append(b)
            total = int(grow[f"__total{i}"]) if grow is not None else 0
            out[name] = {
                "buckets": buckets,
                "sum_other_doc_count": total - in_top,
                "doc_count_error_upper_bound": 0,
            }
        elif "histogram" in spec:
            body = spec["histogram"]
            interval = float(body["interval"])
            # ES/tantivy semantics: min_doc_count defaults to 0 and the
            # bucket range [first, last] is GAP-FILLED with empty
            # buckets; extended_bounds widens that range (grid-aligned),
            # hard_bounds clips observed buckets.
            mdc = int(body.get("min_doc_count", 0))
            hard = body.get("hard_bounds")
            rows = {}
            for r in by_gid.get(gid_of[i], []):
                k = float(r[f"__b{i}"])
                if hard is not None and not (
                    float(hard["min"]) <= k < float(hard["max"])
                ):
                    continue
                rows[round(k / interval)] = r
            keys = sorted(rows)
            if body.get("extended_bounds") is not None:
                eb = body["extended_bounds"]
                import math as _math

                keys_ext = [
                    int(_math.floor(float(eb["min"]) / interval)),
                    int(_math.floor(float(eb["max"]) / interval)),
                ]
                keys = sorted(set(keys) | set(keys_ext))
            buckets = []
            if keys:
                lo, hi = keys[0], keys[-1]
                idx_range = (
                    range(lo, hi + 1) if mdc == 0 else sorted(rows)
                )
                for ki in idx_range:
                    r = rows.get(ki)
                    dc = int(r["doc_count"]) if r is not None else 0
                    if dc < mdc:
                        continue
                    b = {"key": ki * interval, "doc_count": dc}
                    for sname, sspec in sub_aggs.items():
                        b[sname] = (
                            _metric_result(f"{i}|{sname}", sspec, r)
                            if r is not None else {"value": None}
                        )
                    buckets.append(b)
            if body.get("keyed"):
                # ES keyed form: "150.0"-style string keys
                out[name] = {"buckets": {
                    str(b.pop("key")): b for b in buckets
                }}
            else:
                out[name] = {"buckets": buckets}
        elif "date_histogram" in spec:
            from datetime import datetime, timezone

            body = spec["date_histogram"]
            step = _parse_fixed_interval(body["fixed_interval"])
            # same ES/tantivy gap-fill semantics as histogram, in µs
            mdc = int(body.get("min_doc_count", 0))
            rows = {
                int(r[f"__b{i}"]) // step: r
                for r in by_gid.get(gid_of[i], [])
            }
            keys = sorted(rows)
            buckets = []
            if keys:
                idx_range = (
                    range(keys[0], keys[-1] + 1) if mdc == 0
                    else keys
                )
                for ki in idx_range:
                    r = rows.get(ki)
                    dc = int(r["doc_count"]) if r is not None else 0
                    if dc < mdc:
                        continue
                    us = ki * step
                    iso = datetime.fromtimestamp(
                        us / 1_000_000, tz=timezone.utc
                    ).strftime("%Y-%m-%dT%H:%M:%S") + (
                        f".{(us // 1000) % 1000:03d}Z"
                    )
                    # ES date_histogram keys: epoch millis + string
                    b = {"key": us // 1000, "key_as_string": iso,
                         "doc_count": dc}
                    for sname, sspec in sub_aggs.items():
                        b[sname] = (
                            _metric_result(f"{i}|{sname}", sspec, r)
                            if r is not None else {"value": None}
                        )
                    buckets.append(b)
            out[name] = {"buckets": buckets}
        else:
            if grow is not None:
                out[name] = _metric_result(f"{i}|{name}", spec, grow)
            else:
                # zero matching docs: Spark's empty global agg shape
                (kind, _), = spec.items()
                if kind == "stats":
                    out[name] = {"count": 0, "min": None, "max": None,
                                 "sum": None, "avg": None}
                elif kind == "extended_stats":
                    out[name] = {
                        "count": 0, "min": None, "max": None,
                        "sum": None, "avg": None,
                        "sum_of_squares": None, "variance": None,
                        "std_deviation": None,
                        "std_deviation_bounds": {"upper": None,
                                                 "lower": None},
                    }
                elif kind == "missing":
                    out[name] = {"doc_count": 0}
                else:
                    out[name] = {"value": 0 if kind == "value_count"
                                 else None}

    # ---- per-bucket top_hits injection (ES fetch phase) ----
    # One bounded rank-window job per top_hits-bearing bucket spec:
    # WindowGroupLimit caps per-bucket state at `size` BEFORE the
    # window exchange, and terms specs additionally pre-filter to the
    # response's top-N keys, so the collect is |buckets|·size rows.
    for i, (name, spec) in enumerate(specs):
        ths = {
            sn: ss["top_hits"]
            for sn, ss in spec.get("aggs", {}).items()
            if "top_hits" in ss
        }
        if not ths or i not in bucket_idx:
            continue
        kind = next(
            k for k in ("range", "histogram", "date_histogram", "terms")
            if k in spec
        )
        if spec[kind].get("keyed"):
            raise ValueError("top_hits with keyed buckets not supported")
        bcol = f"__b{i}"
        buckets = out[name]["buckets"]
        # raw __b value -> response-bucket resolver, per bucket kind
        if kind in ("terms", "range"):
            def _slot(raw):
                return raw
            want = {b["key"]: b for b in buckets}
        elif kind == "histogram":
            interval = float(spec["histogram"]["interval"])

            def _slot(raw):
                return round(float(raw) / interval)
            want = {round(b["key"] / interval): b for b in buckets}
        else:  # date_histogram
            step = _parse_fixed_interval(
                spec["date_histogram"]["fixed_interval"]
            )

            def _slot(raw):
                return int(raw) // step
            want = {(b["key"] * 1000) // step: b for b in buckets}
        for sname, body in ths.items():
            order, sf = _top_hits_order(body)
            size = int(body.get("size", 3))
            base = docs2.filter(F.col(bcol).isNotNull())
            if kind == "terms":
                base = base.filter(
                    F.col(bcol).isin([b["key"] for b in buckets])
                )
            w = Window.partitionBy(bcol).orderBy(*order)
            cols = sorted(_top_hits_fields(body) | {bcol, "score"})
            rows = (
                base.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= size)
                .select(*cols, "__rn")
                .collect()
            )
            perb: dict = {}
            for r in sorted(rows, key=lambda r: r["__rn"]):
                perb.setdefault(_slot(r[bcol]), []).append(
                    _top_hits_hit(r, body)
                )
            for slot, b in want.items():
                b[sname] = {"hits": {
                    "total": {"value": b["doc_count"], "relation": "eq"},
                    "hits": perb.get(slot, []),
                }}
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
