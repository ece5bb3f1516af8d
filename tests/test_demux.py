"""Demux: bin-packing invariants + index equivalence after the
rewrite + tag-pruning payoff."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.build import build_index
from quickwit_spark.operators.demux import demux_splits, next_fit_bins
from quickwit_spark.operators.search import (
    SearchRequest,
    fetch_docs,
    matches_df,
)
from quickwit_spark.plans.config import webpages_config
from quickwit_spark.plans.metastore import Metastore
from quickwit_spark.plans.parser import parse_query, resolve_query
from quickwit_spark.plans.pruning import prune_splits
from quickwit_spark.sources.corpus import gen_batch


def test_next_fit_respects_order_and_bins():
    counts = [("a", 50), ("b", 30), ("c", 30), ("d", 40)]
    bins = next_fit_bins(counts, 3)  # capacity = ceil(150/3) = 50
    assert bins == {"a": 0, "b": 1, "c": 2, "d": 2}
    # one giant value cannot exceed the last bin ordinal
    bins = next_fit_bins([("x", 100), ("y", 1)], 2)
    assert set(bins.values()) <= {0, 1}


def test_next_fit_single_bin():
    assert next_fit_bins([("a", 5), ("b", 5)], 1) == {"a": 0, "b": 0}


@pytest.fixture(scope="module")
def demuxed(spark, corpus_rows, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("demux") / "idx")
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    build_index(spark, df, index_dir, webpages_config(), num_splits=4)
    before = {
        q: _match_keys(spark, index_dir, q)
        for q in ["word", "lang:de the", "qw_marker_1 OR qw_marker_2"]
    }
    new = demux_splits(spark, index_dir, "lang", num_out_splits=2)
    return index_dir, before, new


def _match_keys(spark, idx, query):
    m = matches_df(spark, idx, SearchRequest(query=query))
    return {
        r["key"] for r in fetch_docs(spark, idx, m, columns=["key"]).collect()
    }


def test_demux_preserves_docs_and_matches(spark, demuxed, corpus_rows):
    index_dir, before, new = demuxed
    ms = Metastore(index_dir)
    pub = ms.list_published()
    assert {s.split_id for s in pub} == {m.split_id for m in new}
    assert sum(s.num_docs for s in pub) == len(corpus_rows)
    for q, want in before.items():
        assert _match_keys(spark, index_dir, q) == want, q


def test_demux_groups_values(spark, demuxed, corpus_rows):
    index_dir, _, new = demuxed
    # each lang lives in exactly one output split
    seen: dict[str, set] = {}
    for m in new:
        for v in m.tags["lang"]:
            seen.setdefault(v, set()).add(m.split_id)
    assert all(len(s) == 1 for s in seen.values()), seen
    # and the docmap agrees with the metadata tag sets
    ms = Metastore(index_dir)
    docmap = spark.read.parquet(ms.docmap_dir()).filter(
        F.col("split_id").isin([int(m.split_id) for m in new])
    )
    got = {
        (r["split_id"], r["lang"])
        for r in docmap.select("split_id", "lang").distinct().collect()
    }
    want = {
        (int(m.split_id), v) for m in new for v in m.tags["lang"]
    }
    assert got == want


def test_demux_enables_tag_pruning(spark, demuxed):
    index_dir, _, new = demuxed
    ms = Metastore(index_dir)
    config = ms.config()
    ast = resolve_query(parse_query("lang:de the"), config, None)
    pruned = prune_splits(ms.list_published(), config, ast)
    assert len(pruned) < len(new)  # query touches only the 'de' split(s)
    assert all("de" in s.tags["lang"] for s in pruned)


def test_demux_null_field_values_survive(spark, corpus_rows, tmp_path_factory):
    """ADVICE r1 (high): docs with a NULL demux value must neither be
    lost nor corrupt the postings remap; the docmap column keeps its
    original type (no in-place string cast persisted)."""
    index_dir = str(tmp_path_factory.mktemp("demux_null") / "idx")
    rows = [dict(r) for r in corpus_rows[:60]]
    for r in rows[::9]:  # 7 docs with null lang
        r["lang"] = None
    df = spark.createDataFrame(pd.DataFrame(rows))
    build_index(spark, df, index_dir, webpages_config(), num_splits=2)
    before = _match_keys(spark, index_dir, "word OR the")
    new = demux_splits(spark, index_dir, "lang", num_out_splits=2)
    ms = Metastore(index_dir)
    pub = ms.list_published()
    assert sum(s.num_docs for s in pub) == len(rows)  # nothing lost
    assert _match_keys(spark, index_dir, "word OR the") == before
    # null group recorded in no split's tag set
    assert all(None not in m.tags.get("lang", []) for m in new)
    assert all("\x00null" not in m.tags.get("lang", []) for m in new)
    # docmap column type unchanged (string in this corpus, but the
    # write path must not add a cast column or drop rows)
    docmap = spark.read.parquet(ms.docmap_dir()).filter(
        F.col("split_id").isin([int(m.split_id) for m in new])
    )
    assert docmap.count() == len(rows)
    assert docmap.filter(F.col("lang").isNull()).count() == 7
    assert "__demux_key" not in docmap.columns


def test_cli_demux_plan_batches(spark, corpus_rows, tmp_path_factory, capsys):
    """`demux --plan` routes through the reference demux planning
    (merge_policy.rs:330-407): with split_num_docs_target shrunk so
    every split qualifies, one batch covers all splits and the demuxed
    index replaces them."""
    import json as _json

    from quickwit_spark import cli

    index_dir = str(tmp_path_factory.mktemp("demux_plan") / "idx")
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    cfg = webpages_config(split_num_docs_target=50)
    build_index(spark, df, index_dir, cfg, num_splits=4)

    rc = cli.main(
        ["demux", "--index", index_dir, "--field", "lang", "--plan",
         "--demux-factor", "4", "--num-splits", "2"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    payload = _json.loads(out[-1])
    assert payload["batches"], "all splits qualify -> at least one batch"
    ms = Metastore(index_dir)
    published = {s.split_id for s in ms.list_published()}
    assert set(payload["new_splits"]) <= published
    planned = {sid for batch in payload["batches"] for sid in batch}
    assert not (planned & published), "planned inputs were replaced"
    # demuxed outputs are mature for demux: a second --plan is a no-op
    rc = cli.main(
        ["demux", "--index", index_dir, "--field", "lang", "--plan",
         "--demux-factor", "4"]
    )
    assert rc == 0
    payload2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload2["batches"] == []
