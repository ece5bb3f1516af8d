"""Distributed search: the root/leaf lifecycle as Spark stages.

Reference lifecycle (SURVEY.md §3.1): root parses + prunes splits →
leaf per split opens the needed posting lists + fast fields only →
per-segment heap top-k → leaf/root merges → fetch-docs join. Here:

- driver parses the query and prunes splits from the metastore
  (plans/pruning.py) — no data touched;
- one Spark scan reads ONLY the pruned splits' partitions of the
  postings table, filtered to the query's (field, term) pairs —
  partition pruning + predicate pushdown on the term-sorted Parquet
  give the reference's "exact-needed-bytes" warmup (leaf.rs:125-195)
  for free;
- a cogrouped ``applyInPandas`` over (postings, fastfields) per
  split runs the numpy evaluator (operators/eval.py): per-split
  top-(k+offset) heap + exact num_hits;
- the global merge is ``ORDER BY score DESC, split_id, doc_id LIMIT
  k+offset`` — Spark's TakeOrderedAndProject, one tiny shuffle
  (collector.rs:306-398 / root.rs:305-320 pagination folding);
- hit materialization broadcast-joins the top-k keys back to the
  docmap (fetch_docs.rs:97-125 analogue).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quickwit_spark.operators.eval import SplitContext, evaluate_split
from quickwit_spark.plans.metastore import open_metastore
from quickwit_spark.plans.parser import parse_query, query_terms, resolve_query
from quickwit_spark.plans.pruning import prune_splits, split_fully_inside

HITS_SCHEMA = (
    "split_id int, doc_id long, score double, sort_long long, "
    "split_num_hits long"
)


class Searcher:
    """Warm per-index search context — the searcher/hotcache analogue
    (quickwit-search keeps split metadata + index footers cached in the
    searcher process, leaf.rs:125-195). Here the costly per-query
    driver work is re-resolving the postings/fastfields/docmap parquet
    DataFrames (file listing + footer schema inference), so one
    Searcher caches them per (SparkSession, index_dir) and is
    invalidated whenever the metastore's ``state_token()`` changes
    (every split mutation — publish/merge/demux/GC — bumps it on both
    backends: manifest rewrite for file-backed, commit version for the
    table-backed log, so the token covers data-file changes too)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.ms = open_metastore(index_dir)
        self._stamp = self.ms.state_token()
        self._dfs: dict[str, DataFrame] = {}

    def fresh(self) -> bool:
        return self._stamp is not None and self._stamp == self.ms.state_token()

    def snapshot(self) -> dict[str, DataFrame]:
        """All three tables ('postings', 'fastfields', 'docmap')
        resolved under ONE state-token check — a request-consistent
        view. A request must take one snapshot up front and read every
        table from it: re-validating per ``table()`` call would let a
        publish landing mid-request mix tables from two index states
        (pre-publish postings joined against post-publish fastfields
        silently drops every hit of a replaced split)."""
        tok = self.ms.state_token()
        if tok != self._stamp or len(self._dfs) < 4:
            paths = {
                "postings": self.ms.postings_dir(),
                "fastfields": os.path.join(self.ms.index_dir, "fastfields"),
                "docmap": self.ms.docmap_dir(),
            }
            dfs: dict = {
                name: self.spark.read.parquet(p) for name, p in paths.items()
            }
            # the published-splits list belongs to the same state: a
            # list from a different token than the file listings would
            # prune against splits whose files the scans don't have
            dfs["splits"] = self.ms.list_published()
            self._dfs = dfs
            self._stamp = tok
        return dict(self._dfs)

    def table(self, name: str) -> DataFrame:
        """Single resolved table, re-validated against the metastore
        state token on every call (a DataFrame's file listing is frozen
        at ``spark.read.parquet`` time, so a Searcher held across a
        concurrent publish/merge/demux/GC would otherwise keep reading
        a replaced split's files). For multi-table requests use
        ``snapshot()`` — mixing per-call ``table()`` reads can tear
        across a concurrent publish."""
        return self.snapshot()[name]


_searchers: dict[tuple[str, str], Searcher] = {}


def get_searcher(spark: SparkSession, index_dir: str) -> Searcher:
    key = (spark.sparkContext.applicationId, os.path.abspath(index_dir))
    s = _searchers.get(key)
    if s is None or not s.fresh():
        s = Searcher(spark, index_dir)
        _searchers[key] = s
    return s


def _to_micros(ts) -> int | None:
    if ts is None:
        return None
    if isinstance(ts, (int, np.integer)):
        return int(ts)
    return int(pd.Timestamp(ts).value // 1000)


@dataclass
class SearchRequest:
    query: str
    k: int = 20  # reference default max hits (rest_handler.rs:44-46)
    offset: int = 0
    start_ts: object = None
    end_ts: object = None
    search_fields: tuple[str, ...] | None = None
    sort_field: str | None = None
    sort_asc: bool = False


def _split_infos(splits, config, start_micros, end_micros):
    return {
        int(s.split_id): {
            "num_docs": s.num_docs,
            "total_tokens": s.total_tokens,
            "inside": split_fully_inside(s.time_range, start_micros, end_micros),
        }
        for s in splits
    }


#: above this many contiguous id runs, a literal predicate stops
#: paying for itself — switch to a broadcast semi-join (runtime
#: partition pruning instead of a 10^5-literal In-list in the plan)
_MAX_SPLIT_ID_RUNS = 64


def _split_id_runs(split_ids) -> list[tuple[int, int]]:
    """Sorted unique ids → maximal contiguous [lo, hi] runs."""
    a = np.unique(np.asarray(list(split_ids), dtype=np.int64))
    if a.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(a) > 1)
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [a.size - 1]))
    return [(int(a[s]), int(a[e])) for s, e in zip(starts, ends)]


def filter_split_ids(df: DataFrame, split_ids) -> DataFrame:
    """Restrict a split-partitioned scan to the pruned id set in a
    form that survives web scale (a hot query can keep 10^4-10^5 of
    ~10^5 splits after pruning):

    - split ids are dense ints, so the set compresses to a handful of
      contiguous runs → OR of BETWEEN range predicates, constant plan
      size, statically partition-prunable;
    - a genuinely fragmented large set (> _MAX_SPLIT_ID_RUNS runs)
      becomes a broadcast LEFT SEMI join against a tiny id DataFrame —
      dynamic partition pruning does the scan-side work instead of a
      giant In-list bloating plan serialization and the parquet filter.
    """
    runs = _split_id_runs(split_ids)
    if not runs:
        return df.filter(F.lit(False))
    if len(runs) <= _MAX_SPLIT_ID_RUNS:
        pred = F.col("split_id").between(runs[0][0], runs[0][1])
        for lo, hi in runs[1:]:
            pred = pred | F.col("split_id").between(lo, hi)
        return df.filter(pred)
    ids_df = df.sparkSession.createDataFrame(
        [(int(i),) for i in sorted(set(int(x) for x in split_ids))],
        "split_id int",
    )
    return df.join(F.broadcast(ids_df), "split_id", "left_semi")


def _scan_inputs(
    tables: dict,
    ast,
    split_ids: list[int],
    need_ts: str | None,
    extra_ff: list[str] = (),
):
    """Pruned scans of postings + fastfields for the query.

    ``tables`` is one ``Searcher.snapshot()`` — both scans come from
    the same index state by construction."""
    terms = query_terms(ast)
    fields = sorted({t.field for t in terms})
    term_strs = sorted({t.term for t in terms})
    postings = filter_split_ids(tables["postings"], split_ids).filter(
        F.col("field").isin(fields) & F.col("term").isin(term_strs)
    )
    ff_names = [f"norm_{f}" for f in fields]
    if need_ts:
        ff_names.append(f"ts_{need_ts}")
    ff_names += list(extra_ff)
    fastfields = filter_split_ids(tables["fastfields"], split_ids).filter(
        F.col("name").isin(ff_names)
    )
    return postings, fastfields


def _make_evaluator(
    ast,
    infos: dict,
    k: int,
    start_micros,
    end_micros,
    ts_name: str | None,
    sort_field: str | None,
    sort_asc: bool,
    emit_all: bool,
    count_exact: bool,
):
    """Closure run per split by applyInPandas (numpy inside)."""

    def evaluate(key, postings_pdf: pd.DataFrame, ff_pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        info = infos.get(sid)
        if info is None or len(ff_pdf) == 0:
            return pd.DataFrame(
                columns=[
                    "split_id", "doc_id", "score", "sort_long",
                    "split_num_hits",
                ]
            )
        norms = {}
        ts_arr = None
        sort_vals = None
        for _, r in ff_pdf.iterrows():
            name, data = r["name"], r["data"]
            if name.startswith("norm_"):
                norms[name[5:]] = np.frombuffer(data, dtype=np.uint8)
            elif ts_name and name == f"ts_{ts_name}":
                ts_arr = np.frombuffer(data, dtype=np.int64)
            if sort_field and name == sort_field:
                sort_vals = np.frombuffer(
                    data,
                    dtype=np.uint8 if name.startswith("norm_") else np.int64,
                )
        post = {}
        for _, r in postings_pdf.iterrows():
            post[(r["field"], r["term"])] = {
                "doc_freq": r["doc_freq"],
                "doc_bytes": r["doc_bytes"],
                "tf_bytes": r["tf_bytes"],
                "skip_bytes": r["skip_bytes"],
                "pos_bytes": r["pos_bytes"],
            }
        ctx = SplitContext(
            num_docs=info["num_docs"],
            total_tokens=info["total_tokens"],
            postings=post,
            norms=norms,
            ts=ts_arr,
        )
        docs, vals, num_hits = evaluate_split(
            ctx,
            ast,
            k,
            start_micros,
            end_micros,
            apply_ts_filter=not info["inside"],
            sort_field=sort_field,
            sort_values=sort_vals,
            sort_asc=sort_asc,
            emit_all=emit_all,
            count_exact=count_exact,
        )
        # integer sort values (fast-field / ts / norm sorts) also ride
        # in an EXACT int64 column — `score` is float64, which rounds
        # |v| > 2^53 (a 64-bit id would corrupt there)
        if np.issubdtype(vals.dtype, np.integer):
            sort_long = pd.Series(vals.astype(np.int64), dtype="Int64")
        else:
            sort_long = pd.Series([pd.NA] * docs.size, dtype="Int64")
        return pd.DataFrame(
            {
                "split_id": np.full(docs.size, sid, dtype=np.int32),
                "doc_id": docs.astype(np.int64),
                "score": vals.astype(np.float64),
                "sort_long": sort_long,
                "split_num_hits": np.full(docs.size, num_hits, dtype=np.int64),
            }
        )

    return evaluate


def _evaluate(
    spark: SparkSession,
    index_dir: str,
    req: SearchRequest,
    emit_all: bool,
    count_exact: bool = True,
    tables: dict | None = None,
) -> tuple[DataFrame | None, object, Metastore]:
    """Shared plan: prune → scan → per-split evaluate. Returns the
    per-split hits DataFrame (None when all splits pruned).

    ``tables`` lets a caller that ALSO fetches docs pass one
    ``Searcher.snapshot()`` spanning the whole request, so the
    evaluate and fetch sides cannot straddle a concurrent publish."""
    searcher = get_searcher(spark, index_dir)
    ms = searcher.ms
    config = ms.config()
    # one request-consistent snapshot: split list + all table file
    # listings resolved under a single metastore state token
    if tables is None:
        tables = searcher.snapshot()
    ast = resolve_query(parse_query(req.query), config, req.search_fields)
    start_micros = _to_micros(req.start_ts)
    end_micros = _to_micros(req.end_ts)
    splits = prune_splits(
        tables["splits"], config, ast, start_micros, end_micros
    )
    if not splits:
        return None, ast, ms
    sids = [int(s.split_id) for s in splits]
    need_ts = config.timestamp_field if (
        start_micros is not None or end_micros is not None
    ) else None
    sort_field = req.sort_field
    if sort_field is not None:
        if sort_field == config.timestamp_field:
            sort_field = f"ts_{sort_field}"
        elif not sort_field.startswith(("ts_", "norm_", "ff_")):
            # general fast field → packed int64 blob (sort_by.rs:80-113)
            if sort_field not in config.fast_fields:
                raise ValueError(
                    f"sort field {sort_field!r} is not a declared fast field"
                )
            # only integer-typed fast fields are packed as ff_ blobs
            # (build.write_fastfields numeric_ff rule) — fail fast on
            # the driver instead of a NoneType crash in the executor.
            dtypes = dict(tables["docmap"].dtypes)
            if dtypes.get(sort_field) not in (
                "tinyint", "smallint", "int", "bigint"
            ):
                raise ValueError(
                    f"sort field {sort_field!r} has type "
                    f"{dtypes.get(sort_field)!r}; only integer fast "
                    "fields are engine-sortable"
                )
            sort_field = f"ff_{sort_field}"
        extra = [sort_field]
    else:
        extra = []
    postings, fastfields = _scan_inputs(tables, ast, sids, need_ts, extra)
    infos = _split_infos(splits, config, start_micros, end_micros)
    evaluator = _make_evaluator(
        ast,
        infos,
        req.k + req.offset,
        start_micros,
        end_micros,
        config.timestamp_field,
        sort_field,
        req.sort_asc,
        emit_all,
        count_exact,
    )
    hits = (
        postings.groupBy("split_id")
        .cogroup(fastfields.groupBy("split_id"))
        .applyInPandas(evaluator, HITS_SCHEMA)
    )
    return hits, ast, ms


def search_df(
    spark: SparkSession,
    index_dir: str,
    req: SearchRequest,
    tables: dict | None = None,
) -> DataFrame:
    """Top-k hits as (split_id, doc_id, score), globally ordered with
    pagination applied."""
    # top-k only: the evaluator may use block-max WAND (no exact count)
    hits, _, _ = _evaluate(
        spark, index_dir, req, emit_all=False, count_exact=False,
        tables=tables,
    )
    if hits is None:
        return spark.createDataFrame(
            [], "split_id int, doc_id long, score double, sort_long long"
        )
    asc = req.sort_asc and req.sort_field is not None
    # fast-field sorts merge on the exact int64 column, not the
    # possibly-rounded double
    sort_col = F.col("sort_long") if req.sort_field is not None else F.col("score")
    score_order = sort_col.asc() if asc else sort_col.desc()
    ordered = hits.select("split_id", "doc_id", "score", "sort_long").orderBy(
        score_order, F.col("split_id").asc(), F.col("doc_id").asc()
    )
    limited = ordered.limit(req.k + req.offset)
    if req.offset:
        w = Window.orderBy(score_order, F.col("split_id").asc(), F.col("doc_id").asc())
        limited = (
            limited.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > req.offset)
            .drop("_rn")
        )
    return limited


def search_after_df(
    spark: SparkSession,
    index_dir: str,
    req: SearchRequest,
    cursor: tuple,
    tables: dict | None = None,
) -> DataFrame:
    """ES-style ``search_after`` keyset pagination: the next ``req.k``
    hits strictly AFTER ``cursor`` in global rank order.

    ``cursor`` is ``(value, split_id, doc_id)`` — the last hit of the
    previous page in the request's sort mode: the raw float64 BM25
    score on the default path, the exact int64 fast-field value when
    ``req.sort_field`` is set (ints make the cursor comparison exact;
    prefer that mode for deep, resumable exports).

    Versus offset pagination (re-fetch offset+k rows, fold offset at
    the merge): the cursor filter applies per split BEFORE the global
    merge, so page depth adds nothing to the exchange — but the
    evaluation takes the exact all-matches path, because a cursor can
    sit at any rank and block-max top-k pruning could drop
    post-cursor docs (the same trade ES makes for scored
    search_after). ``req.offset`` is ignored — the cursor IS the
    offset.
    """
    v, sp, d = cursor
    hits, _, _ = _evaluate(
        spark, index_dir, req, emit_all=True, tables=tables
    )
    if hits is None:
        return spark.createDataFrame(
            [], "split_id int, doc_id long, score double, sort_long long"
        )
    asc = req.sort_asc and req.sort_field is not None
    sort_col = (
        F.col("sort_long") if req.sort_field is not None else F.col("score")
    )
    lit_v = F.lit(v)
    primary_after = (sort_col > lit_v) if asc else (sort_col < lit_v)
    tie = (sort_col == lit_v) & (
        (F.col("split_id") > F.lit(sp))
        | ((F.col("split_id") == F.lit(sp)) & (F.col("doc_id") > F.lit(d)))
    )
    score_order = sort_col.asc() if asc else sort_col.desc()
    return (
        hits.select("split_id", "doc_id", "score", "sort_long")
        .filter(primary_after | tie)
        .orderBy(score_order, F.col("split_id").asc(), F.col("doc_id").asc())
        .limit(req.k)
    )


def highlight_terms(
    config,
    query: str,
    search_fields: tuple[str, ...] | None = None,
    field: str | None = None,
) -> list[str]:
    """The analyzed POSITIVE terms of a query (must + should leaves,
    phrase words included; must_not excluded) — what a highlighter
    marks. ``field`` restricts to leaves bound to that field."""
    from quickwit_spark.plans.parser import Bool, PhraseQ, TermQ

    node = resolve_query(parse_query(query), config, search_fields)
    out: list[str] = []

    def walk(n):
        if isinstance(n, TermQ):
            if field is None or n.field == field:
                out.append(n.term)
        elif isinstance(n, PhraseQ):
            if field is None or n.field == field:
                out.extend(n.terms)
        elif isinstance(n, Bool):
            for c in n.must + n.should:
                walk(c)

    walk(node)
    return list(dict.fromkeys(out))


def with_highlight(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    window: int = 5,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """Add a ``highlight`` column: a ±``window``-token fragment of the
    ORIGINAL (cased) text around the first occurrence of any analyzed
    query term, matches wrapped in the tags; NULL when no term occurs
    in the field (ES returns no highlight for such hits).

    Implementation is pure codegen string expressions — one
    shuffle-free projection, run over the ALREADY-FETCHED hit rows
    (bounded k on the top-k path), never over the corpus. Terms come
    from the analyzer (lowercase \\p{L}\\p{N} runs), so the
    case-insensitive word-boundary alternation needs no escaping;
    the fragment window is whitespace-token based, so tags are never
    cut mid-piece.
    """
    if not terms:
        return df.withColumn("highlight", F.lit(None).cast("string"))
    pat = r"(?i)\b(" + "|".join(terms) + r")\b"
    marked = F.regexp_replace(F.col(text_col), pat, pre_tag + "$1" + post_tag)
    pieces = F.filter(F.split(marked, r"\s+"), lambda p: p != "")
    idxs = F.filter(
        F.transform(
            pieces,
            lambda p, i: F.when(
                p.contains(F.lit(pre_tag)), i + 1
            ).otherwise(F.lit(-1)),
        ),
        lambda x: x != -1,
    )
    first = F.try_element_at(idxs, F.lit(1))
    start = F.greatest(first - window, F.lit(1))
    frag = F.array_join(F.slice(pieces, start, 2 * window + 1), " ")
    return df.withColumn(
        "highlight", F.when(first.isNotNull(), frag)
    )


def count_hits(spark: SparkSession, index_dir: str, req: SearchRequest) -> int:
    """Exact num_hits (collector.rs:189 semantics)."""
    hits, _, _ = _evaluate(
        spark, index_dir, SearchRequest(**{**vars(req), "k": 1}), emit_all=False
    )
    if hits is None:
        return 0
    row = (
        hits.groupBy("split_id")
        .agg(F.max("split_num_hits").alias("h"))
        .agg(F.sum("h").alias("total"))
        .collect()[0]
    )
    return int(row["total"] or 0)


def search_with_count(
    spark: SparkSession,
    index_dir: str,
    req: SearchRequest,
    tables: dict | None = None,
) -> tuple[list, int]:
    """Top-k hit rows AND exact num_hits from ONE per-split evaluation
    pass (the reference returns both in a single leaf response,
    collector.rs:189). count_exact=True disables WAND pruning — same
    trade tantivy makes when a count is requested. The cogrouped
    evaluation is persisted so the top-k collect and the count agg
    don't run it twice."""
    wanted = req.k + req.offset
    # evaluate with k ≥ 1 so every matching split emits ≥1 row — the
    # per-split num_hits rides on hit rows (k=0 would drop the count)
    eval_req = SearchRequest(**{**vars(req), "k": max(wanted, 1), "offset": 0})
    hits, _, _ = _evaluate(
        spark, index_dir, eval_req, emit_all=False, count_exact=True,
        tables=tables,
    )
    if hits is None:
        return [], 0
    hits = hits.persist()
    try:
        asc = req.sort_asc and req.sort_field is not None
        sort_col = (
            F.col("sort_long") if req.sort_field is not None else F.col("score")
        )
        score_order = sort_col.asc() if asc else sort_col.desc()
        rows = (
            hits.select("split_id", "doc_id", "score", "sort_long")
            .orderBy(score_order, F.col("split_id").asc(), F.col("doc_id").asc())
            .limit(wanted)
            .collect()
        )[req.offset:]
        total = (
            hits.groupBy("split_id")
            .agg(F.max("split_num_hits").alias("h"))
            .agg(F.sum("h").alias("total"))
            .collect()[0]["total"]
        )
    finally:
        hits.unpersist()
    return rows, int(total or 0)


def matches_df(
    spark: SparkSession,
    index_dir: str,
    req: SearchRequest,
    tables: dict | None = None,
) -> DataFrame:
    """ALL matching docs (split_id, doc_id, score) — the
    search_stream / aggregation input (no top-k)."""
    hits, _, _ = _evaluate(spark, index_dir, req, emit_all=True, tables=tables)
    if hits is None:
        return spark.createDataFrame([], "split_id int, doc_id long, score double")
    return hits.select("split_id", "doc_id", "score")


def fetch_docs(
    spark: SparkSession,
    index_dir: str,
    hits: DataFrame,
    columns: list[str] | None = None,
    bounded: bool = True,
    docmap: DataFrame | None = None,
) -> DataFrame:
    """Materialize hits by joining their keys back to the docmap
    (fetch_docs.rs analogue).

    ``bounded=True`` (the top-k path): the hit set is ≤ k+offset rows,
    so broadcast it to every docmap partition — no shuffle of the doc
    store. ``bounded=False`` (the search_stream / aggregation path):
    the hit set is EVERY matching doc — at web scale that's billions
    of rows, so it must NOT be broadcast; use a plain equi-join and
    let Spark shuffle on (split_id, doc_id) (or auto-broadcast when
    the runtime size happens to be small — AQE's call, not a hint).
    The reference never centralizes this set either: search_stream
    leaves stream their own split's matches (leaf.rs:119-255).

    ``docmap``: pass the docmap from the SAME ``Searcher.snapshot()``
    that produced ``hits`` — resolving it here (the fallback) opens a
    window where a publish between evaluate and fetch joins hits
    against a newer doc store and silently drops replaced splits."""
    if docmap is None:
        docmap = get_searcher(spark, index_dir).table("docmap")
    if columns:
        docmap = docmap.select("split_id", "doc_id", *columns)
    right = F.broadcast(hits) if bounded else hits
    return docmap.join(right, ["split_id", "doc_id"], "inner")


def search(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 20,
    highlight: bool = False,
    **kwargs,
) -> DataFrame:
    """Convenience: top-k search with materialized doc keys.
    ``highlight=True`` adds an ES-style ``highlight`` fragment column
    over the first default search field (NULL for hits whose match
    came from another field)."""
    req = SearchRequest(query=query, k=k, **kwargs)
    snap = get_searcher(spark, index_dir).snapshot()
    hits = search_df(spark, index_dir, req, tables=snap)
    out = fetch_docs(spark, index_dir, hits, docmap=snap["docmap"])
    if highlight:
        config = open_metastore(index_dir).config()
        fld = (req.search_fields or config.default_search_fields)[0]
        # ES highlights from the stored document: use the raw column
        # when the docmap carries it, else pull the field out of the
        # stored `_source` JSON (store_source=true)
        if fld in out.columns:
            txt = F.col(fld)
        elif "_source" in out.columns:
            txt = F.get_json_object(F.col("_source"), f"$.{fld}")
        else:
            raise ValueError(
                f"highlight needs the {fld!r} field stored — build the "
                "index with store_source=true (or a stored column)"
            )
        out = with_highlight(
            out.withColumn("__hl_text", txt),
            highlight_terms(config, query, req.search_fields, field=fld),
            text_col="__hl_text",
        ).drop("__hl_text")
    # rank on the exact int64 fast-field lane when sorting by a fast
    # field — the float64 `score` copy loses precision above 2^53 and
    # could disagree with the engine ranking search_df just computed
    if req.sort_field is not None:
        rank = F.col("sort_long").asc() if req.sort_asc else F.col("sort_long").desc()
    else:
        rank = F.col("score").desc()
    return out.orderBy(rank, F.col("split_id").asc(), F.col("doc_id").asc())
