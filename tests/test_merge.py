"""Merge correctness + policy math + resume/checkpoint semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.operators.build import build_index
from quickwit_spark.operators.merge import merge_splits
from quickwit_spark.operators.search import (
    SearchRequest,
    count_hits,
    fetch_docs,
    matches_df,
)
from quickwit_spark.plans.config import IndexConfig, webpages_config
from quickwit_spark.plans.merge_policy import garbage_collect, plan_merges
from quickwit_spark.plans.metastore import CheckpointError, Metastore, SplitMetadata


@pytest.fixture(scope="module")
def merged_index(spark, corpus_rows, tmp_path_factory):
    """Build 4 splits, merge 2 of them; return index_dir."""
    index_dir = str(tmp_path_factory.mktemp("merge_idx"))
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    build_index(spark, df, index_dir, webpages_config(), num_splits=4)
    return index_dir


def _match_scores(spark, index_dir, query):
    """All matching docs as {key: score}."""
    m = matches_df(spark, index_dir, SearchRequest(query=query))
    rows = fetch_docs(spark, index_dir, m, columns=["key"]).collect()
    return {r["key"]: r["score"] for r in rows}


QUERIES = ["the", "word hot", "hot OR one", '"of the"', "qw_marker_1"]


def test_merge_preserves_matches_and_counts(spark, merged_index):
    before = {q: _match_scores(spark, merged_index, q) for q in QUERIES}
    counts_before = {
        q: count_hits(spark, merged_index, SearchRequest(query=q)) for q in QUERIES
    }
    ms = Metastore(merged_index)
    sids = [s.split_id for s in ms.list_published()][:2]
    meta = merge_splits(spark, merged_index, sids)
    published = {s.split_id for s in ms.list_published()}
    assert meta.split_id in published and not (set(sids) & published)

    for q in QUERIES:
        after = _match_scores(spark, merged_index, q)
        assert set(after) == set(before[q]), q
        assert counts_before[q] == count_hits(
            spark, merged_index, SearchRequest(query=q)
        ), q


def test_merged_scores_equal_single_split_oracle(spark, corpus_rows, tmp_path_factory):
    """Merging ALL splits into one must reproduce per-doc scores of a
    single-split index (BM25 stats unify exactly: N, avgdl, df)."""
    from quickwit_spark.oracle import OracleIndex

    index_dir = str(tmp_path_factory.mktemp("merge_all"))
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    build_index(spark, df, index_dir, webpages_config(), num_splits=3)
    ms = Metastore(index_dir)
    merge_splits(spark, index_dir, [s.split_id for s in ms.list_published()])
    oracle1 = OracleIndex(corpus_rows, webpages_config(), num_splits=1)

    for q in ["the", "word hot", '"of the"', "qw_marker_1"]:
        got = _match_scores(spark, index_dir, q)
        ast_scores = {}
        sp = oracle1.splits[0]
        from quickwit_spark.plans.parser import parse_query, resolve_query

        ast = resolve_query(parse_query(q), oracle1.config)
        for d, s in oracle1._eval(sp, ast).items():
            ast_scores[sp.doc_keys[d]] = float(np.float32(s))
        assert set(got) == set(ast_scores), q
        for k in got:
            assert np.float32(got[k]) == np.float32(ast_scores[k]), (q, k)


def test_salted_build_produces_identical_postings(spark, corpus_rows, tmp_path_factory):
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    plain_dir = str(tmp_path_factory.mktemp("plain"))
    salt_dir = str(tmp_path_factory.mktemp("salted"))
    build_index(spark, df, plain_dir, webpages_config(), num_splits=2)
    build_index(
        spark, df, salt_dir, webpages_config(), num_splits=2, salt_chunk=64
    )
    cols = ["split_id", "field", "term", "doc_freq", "total_tf", "doc_bytes", "tf_bytes"]
    a = {
        (r["split_id"], r["field"], r["term"]): (r["doc_freq"], r["total_tf"], bytes(r["doc_bytes"]), bytes(r["tf_bytes"]))
        for r in spark.read.parquet(Metastore(plain_dir).postings_dir()).select(cols).collect()
    }
    b = {
        (r["split_id"], r["field"], r["term"]): (r["doc_freq"], r["total_tf"], bytes(r["doc_bytes"]), bytes(r["tf_bytes"]))
        for r in spark.read.parquet(Metastore(salt_dir).postings_dir()).select(cols).collect()
    }
    assert a == b


def test_resume_noop_and_checkpoint_guard(spark, corpus_rows, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("resume"))
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    metas = build_index(spark, df, index_dir, webpages_config(), num_splits=2)
    assert len(metas) == 2
    assert build_index(spark, df, index_dir, webpages_config(), num_splits=2) == []
    ms = Metastore(index_dir)
    with pytest.raises(CheckpointError):
        ms.publish_splits(
            ["0"], source_id="default", checkpoint_delta={"0": "docs:" + "0" * 20}
        )


def test_merge_policy_levels():
    cfg = IndexConfig(
        fields=(),
        split_num_docs_target=10_000_000,
        merge_factor=10,
        max_merge_factor=12,
        min_level_num_docs=100_000,
    )
    young = [
        SplitMetadata(split_id=str(i), num_docs=50_000, time_range=(0, i))
        for i in range(25)
    ]
    ops = plan_merges(young, cfg)
    assert len(ops) == 2 and len(ops[0]) == 12 and len(ops[1]) == 12
    # candidates grow from the OLDEST end (reverse end-time order)
    assert ops[0] == [str(i) for i in range(11, -1, -1)]
    # mature splits never planned
    mature = [
        SplitMetadata(split_id="m", num_docs=10_000_000, time_range=(0, 1))
    ] * 15
    assert plan_merges(mature, cfg) == []
    # reference behavior: young splits merge toward the doc target even
    # across sizes — an over-target candidate is accepted and becomes a
    # mature split (merge_policy.rs:446-494), so two 5M splits (plus
    # whatever small split the window includes) merge into one ~10M
    mixed = young[:5] + [
        SplitMetadata(split_id=f"b{i}", num_docs=5_000_000, time_range=(0, i))
        for i in range(5)
    ]
    mixed_ops = plan_merges(mixed, cfg)
    assert [set(op) for op in mixed_ops] == [
        {"b1", "0", "b0"},        # oldest window first
        {"b3", "2", "b2", "1"},   # next fixpoint pass
    ]


def test_gc_removes_retired_split_data(spark, merged_index):
    import os

    ms = Metastore(merged_index)
    retired = [
        s.split_id
        for s in ms.splits(("MarkedForDeletion",))
    ]
    assert retired, "merge should have retired splits"
    victims = garbage_collect(merged_index, grace=False)
    assert set(retired) <= set(victims)
    for sid in retired:
        assert not os.path.isdir(
            os.path.join(merged_index, "postings", f"split_id={sid}")
        )
    assert not ms.splits(("MarkedForDeletion",))


def test_crash_before_publish_resume_bitwise_identical(
    spark, corpus_rows, tmp_path_factory
):
    """F5 resume fixture: a build that dies before the atomic publish
    leaves nothing published; the re-run must produce an index
    bitwise-identical to an uninterrupted build (determinism is what
    makes 10^12-doc resume safe)."""
    import quickwit_spark.plans.metastore as metastore_mod

    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    dir_a = str(tmp_path_factory.mktemp("uninterrupted"))
    metas_a = build_index(spark, df, dir_a, webpages_config(), num_splits=2)

    dir_b = str(tmp_path_factory.mktemp("crashed"))
    orig = metastore_mod.Metastore.publish_splits

    def boom(self, *a, **k):
        raise RuntimeError("simulated crash before publish")

    metastore_mod.Metastore.publish_splits = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            build_index(spark, df, dir_b, webpages_config(), num_splits=2)
    finally:
        metastore_mod.Metastore.publish_splits = orig
    assert Metastore(dir_b).list_published() == []  # atomic: all or nothing

    metas_b = build_index(spark, df, dir_b, webpages_config(), num_splits=2)
    assert [(m.split_id, m.num_docs) for m in metas_b] == [
        (m.split_id, m.num_docs) for m in metas_a
    ]
    for sub in ("postings", "docmap"):
        pa_df = spark.read.parquet(f"{dir_a}/{sub}")
        rows_a = sorted(map(str, pa_df.orderBy(*pa_df.columns).collect()))
        pb_df = spark.read.parquet(f"{dir_b}/{sub}")
        rows_b = sorted(map(str, pb_df.orderBy(*pb_df.columns).collect()))
        assert rows_a == rows_b, sub


def test_searcher_self_validates_across_publish(
    spark, corpus_rows, tmp_path_factory
):
    """A Searcher held across a concurrent publish must not keep the
    pre-publish file listing: ``table()`` re-checks the metastore state
    token per call and re-resolves on staleness (round-3 verdict
    'What's wrong' #3). Without this, the merged split's parquet files
    — written AFTER the DataFrame was resolved — would be invisible to
    the held Searcher and every post-merge query would come back
    empty."""
    from quickwit_spark.operators.search import Searcher

    index_dir = str(tmp_path_factory.mktemp("held_searcher"))
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    build_index(spark, df, index_dir, webpages_config(), num_splits=3)

    held = Searcher(spark, index_dir)
    pre_sids = {
        r["split_id"]
        for r in held.table("docmap").select("split_id").distinct().collect()
    }
    ms = Metastore(index_dir)
    old_sids = [s.split_id for s in ms.list_published()]
    assert pre_sids == {int(s) for s in old_sids}

    merged = merge_splits(spark, index_dir, old_sids)  # publish happens here
    assert not held.fresh()

    post_sids = {
        r["split_id"]
        for r in held.table("docmap").select("split_id").distinct().collect()
    }
    # the newly published split's files must be visible through the SAME
    # Searcher object (old files may linger until GC — that's fine, the
    # query planner prunes to published split ids)
    assert int(merged.split_id) in post_sids
    assert held.fresh()  # stamp re-synced by the table() call


def test_searcher_snapshot_is_request_consistent(
    spark, corpus_rows, tmp_path_factory
):
    """snapshot() resolves the split list AND all three table file
    listings under ONE state-token check, so a publish landing between
    two table reads of the same request cannot mix index states
    (pre-publish postings joined to post-publish fastfields would
    silently drop every hit of a replaced split)."""
    from quickwit_spark.operators.search import Searcher

    index_dir = str(tmp_path_factory.mktemp("snap_searcher"))
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    build_index(spark, df, index_dir, webpages_config(), num_splits=3)

    held = Searcher(spark, index_dir)
    snap = held.snapshot()
    pre_sids = {int(s.split_id) for s in snap["splits"]}

    ms = Metastore(index_dir)
    merged = merge_splits(spark, index_dir, [s.split_id for s in ms.list_published()])

    # the held snapshot stays internally coherent: its split list and
    # its postings file listing are both PRE-merge (old files linger
    # until GC), so a request planned from it still answers correctly
    snap_post_sids = {
        r["split_id"]
        for r in snap["postings"].select("split_id").distinct().collect()
    }
    assert pre_sids <= snap_post_sids
    assert int(merged.split_id) not in {int(s.split_id) for s in snap["splits"]}

    # a NEW snapshot moves wholesale to the post-merge state
    snap2 = held.snapshot()
    new_sids = {int(s.split_id) for s in snap2["splits"]}
    assert new_sids == {int(merged.split_id)}
    assert int(merged.split_id) in {
        r["split_id"]
        for r in snap2["postings"].select("split_id").distinct().collect()
    }


@pytest.mark.parametrize("backend", ["file", "table"])
def test_full_lifecycle_both_backends(
    spark, corpus_rows, tmp_path_factory, backend
):
    """Round-3 verdict item #7: the whole split lifecycle — bootstrap
    build → incremental add_documents (with exactly-once replay) →
    merge-policy-planned compaction → GC → search — end-to-end on BOTH
    metastore backends. The contract tests cover each op in isolation;
    this drives them in sequence against one index."""
    from quickwit_spark.operators.build import add_documents
    from quickwit_spark.plans.metastore import open_metastore

    cfg = webpages_config(
        metastore_backend=backend,
        merge_factor=3,
        max_merge_factor=4,
    )
    index_dir = str(tmp_path_factory.mktemp(f"lifecycle_{backend}"))
    pdf = pd.DataFrame(corpus_rows)
    half = len(pdf) // 2
    build_index(
        spark, spark.createDataFrame(pdf.iloc[:half]), index_dir, cfg,
        num_splits=2,
    )
    added = add_documents(
        spark, spark.createDataFrame(pdf.iloc[half:]), index_dir,
        source_id="s1", position="0001", num_splits=2,
    )
    assert len(added) == 2
    # micro-batch replay at the same position is an exactly-once no-op
    assert add_documents(
        spark, spark.createDataFrame(pdf.iloc[half:]), index_dir,
        source_id="s1", position="0001", num_splits=2,
    ) == []

    before = {q: set(_match_scores(spark, index_dir, q)) for q in QUERIES}
    counts = {
        q: count_hits(spark, index_dir, SearchRequest(query=q))
        for q in QUERIES
    }
    assert any(before.values()), "corpus queries must match something"

    ms = open_metastore(index_dir)
    ops = plan_merges(ms.list_published(), cfg)
    assert ops, "4 level-0 splits with merge_factor=3 must plan a merge"
    for op in ops:
        merge_splits(spark, index_dir, op)
    victims = garbage_collect(index_dir, grace=False)
    assert victims, "compaction must retire the merged inputs"

    after_published = {s.split_id for s in ms.list_published()}
    assert not (set(victims) & after_published)
    for q in QUERIES:
        assert set(_match_scores(spark, index_dir, q)) == before[q], q
        assert counts[q] == count_hits(
            spark, index_dir, SearchRequest(query=q)
        ), q
