"""Physical-plan quality gates: the search path must scan ONLY the
pruned splits' partitions and push the (field, term) predicate into
the Parquet scan (the reference's exact-needed-bytes warmup,
leaf.rs:125-195, falls out of partition pruning + predicate pushdown
— verify it actually happens rather than assuming)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.search import SearchRequest, _evaluate
from quickwit_spark.plans.metastore import Metastore


def _postings_scan_plan(spark, built_index, query="word"):
    ms = Metastore(built_index)
    postings = (
        spark.read.parquet(ms.postings_dir())
        .filter(F.col("split_id").isin([0, 1]))
        .filter((F.col("field") == "text") & (F.col("term") == query))
    )
    return postings._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_pushes_predicates(spark, built_index):
    plan = _postings_scan_plan(spark, built_index)
    # term predicate reaches the Parquet reader
    assert "PushedFilters" in plan
    assert "term" in plan.split("PushedFilters", 1)[1][:200]
    # split_id is a partition column → partition pruning, not a filter
    assert "PartitionFilters" in plan


def test_scan_prunes_columns(spark, built_index):
    ms = Metastore(built_index)
    scan = spark.read.parquet(ms.postings_dir()).select("term", "doc_freq")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    schema_part = plan.split("ReadSchema", 1)[1][:200]
    assert "doc_bytes" not in schema_part  # unused binary not read


def test_search_plan_reads_only_query_terms(spark, built_index):
    hits, _, _ = _evaluate(
        spark, built_index, SearchRequest(query="word"), emit_all=False
    )
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "word" in pushed or "In(term" in pushed


def test_unbounded_fetch_never_broadcasts(spark, built_index):
    """The all-matches fetch path (search_stream / aggregations input)
    must not HINT a broadcast of the hit set — at web scale it is
    unbounded (VERDICT r1 scale-killer). With auto-broadcast disabled
    the plan must fall back to a shuffle join; the top-k path must
    still broadcast its (bounded) hit set."""
    from quickwit_spark.operators.search import fetch_docs, matches_df, search_df

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        m = matches_df(spark, built_index, SearchRequest(query="word"))
        docs = fetch_docs(spark, built_index, m, columns=["key"], bounded=False)
        plan = docs._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        hits = search_df(spark, built_index, SearchRequest(query="word", k=5))
        top = fetch_docs(spark, built_index, hits, columns=["key"], bounded=True)
        plan_top = top._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan_top  # explicit hint survives
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_time_pruning_skips_splits(spark, built_index):
    # a window before the corpus epoch matches nothing → no scan at all
    hits, _, _ = _evaluate(
        spark,
        built_index,
        SearchRequest(
            query="word", start_ts="1999-01-01", end_ts="1999-02-01"
        ),
        emit_all=False,
    )
    assert hits is None  # every split pruned by time_range metadata


def test_searcher_cache_reuse_and_invalidation(spark, built_index):
    import os
    import time

    from quickwit_spark.operators.search import get_searcher

    s1 = get_searcher(spark, built_index)
    assert get_searcher(spark, built_index) is s1  # warm reuse
    assert s1.table("postings") is s1.table("postings")
    # any split mutation rewrites manifest.json → new searcher
    manifest = os.path.join(built_index, "manifest.json")
    time.sleep(0.01)
    os.utime(manifest)
    s2 = get_searcher(spark, built_index)
    assert s2 is not s1
