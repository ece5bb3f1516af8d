"""Metastore contract suite — the analogue of the reference's
``metastore_test_suite!`` macro (quickwit-metastore/src/tests.rs),
which runs ONE set of behavioral tests against every backend
(file-backed + PostgreSQL there; file-backed + table/commit-log here).

The table-specific tests additionally cover what the reference gets
from PostgreSQL transactions: concurrent writers serializing through
optimistic concurrency instead of corrupting each other
(postgresql_metastore.rs publish/stage transactional semantics).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os

import pytest

from quickwit_spark.plans.config import webpages_config
from quickwit_spark.plans.metastore import (
    MARKED_FOR_DELETION,
    PUBLISHED,
    STAGED,
    CheckpointError,
    Metastore,
    SplitMetadata,
    open_metastore,
)
from quickwit_spark.plans.table_metastore import TableMetastore


BACKENDS = ["file", "table"]


def make_ms(backend: str, index_dir: str):
    return Metastore(index_dir) if backend == "file" else TableMetastore(index_dir)


@pytest.fixture(params=BACKENDS)
def ms(request, tmp_path):
    m = make_ms(request.param, str(tmp_path / "idx"))
    m.create(webpages_config())
    return m


def meta(sid: str, **kw) -> SplitMetadata:
    return SplitMetadata(split_id=sid, num_docs=kw.pop("num_docs", 10), **kw)


# -- contract: identical behavior on both backends ----------------------

@pytest.mark.parametrize("backend", BACKENDS)
def test_create_exists_config_roundtrip(backend, tmp_path):
    m = make_ms(backend, str(tmp_path / "idx"))
    assert not m.exists()
    cfg = webpages_config(sort_by_field="warc_ts")
    m.create(cfg)
    assert m.exists()
    assert m.config().to_dict() == cfg.to_dict()
    with pytest.raises(FileExistsError):
        m.create(cfg)


def test_stage_publish_lifecycle(ms):
    ms.stage_splits([meta("0"), meta("1")])
    assert {s.split_id for s in ms.splits((STAGED,))} == {"0", "1"}
    assert ms.list_published() == []
    ms.publish_splits(["0", "1"])
    pub = ms.list_published()
    assert {s.split_id for s in pub} == {"0", "1"}
    assert all(s.state == PUBLISHED for s in pub)
    assert all(s.update_timestamp >= s.create_timestamp for s in pub)


def test_restage_staged_supersedes_but_published_conflicts(ms):
    ms.stage_splits([meta("0", num_docs=5)])
    # crash-resume path: re-staging a leftover Staged split supersedes
    ms.stage_splits([meta("0", num_docs=7)])
    assert [s.num_docs for s in ms.splits()] == [7]
    ms.publish_splits(["0"])
    with pytest.raises(ValueError):
        ms.stage_splits([meta("0")])


def test_publish_unknown_split_raises(ms):
    with pytest.raises(KeyError):
        ms.publish_splits(["nope"])


def test_checkpoint_advances_and_rejects_regression(ms):
    ms.stage_splits([meta("0")])
    ms.publish_splits(["0"], source_id="s", checkpoint_delta={"p0": "000005"})
    assert ms.checkpoint("s") == {"p0": "000005"}
    ms.stage_splits([meta("1")])
    with pytest.raises(CheckpointError):
        ms.publish_splits(["1"], source_id="s", checkpoint_delta={"p0": "000004"})
    # failed publish must not have leaked partial state
    assert ms.checkpoint("s") == {"p0": "000005"}
    assert {s.split_id for s in ms.list_published()} == {"0"}
    ms.publish_splits(["1"], source_id="s", checkpoint_delta={"p0": "000009"})
    assert ms.checkpoint("s") == {"p0": "000009"}


def test_replace_marks_merged_away_inputs(ms):
    ms.stage_splits([meta("0"), meta("1")])
    ms.publish_splits(["0", "1"])
    ms.stage_splits([meta("2", num_docs=20)])
    ms.publish_splits(["2"], replaced_split_ids=["0", "1"])
    assert {s.split_id for s in ms.list_published()} == {"2"}
    assert {
        s.split_id for s in ms.splits((MARKED_FOR_DELETION,))
    } == {"0", "1"}


def test_delete_requires_marked(ms):
    ms.stage_splits([meta("0")])
    ms.publish_splits(["0"])
    with pytest.raises(ValueError):
        ms.delete_splits(["0"])
    ms.mark_for_deletion(["0"])
    ms.delete_splits(["0"])
    assert ms.splits() == []


def test_state_token_bumps_on_mutation_only(ms):
    t0 = ms.state_token()
    assert t0 is not None
    assert ms.state_token() == t0  # reads don't bump
    ms.stage_splits([meta("0")])
    t1 = ms.state_token()
    assert t1 != t0
    ms.publish_splits(["0"])
    assert ms.state_token() != t1


# -- backend resolution -------------------------------------------------

def test_open_metastore_detects_backend(tmp_path):
    f_dir, t_dir = str(tmp_path / "f"), str(tmp_path / "t")
    open_metastore(f_dir, webpages_config()).create(webpages_config())
    cfg_t = webpages_config(metastore_backend="table")
    open_metastore(t_dir, cfg_t).create(cfg_t)
    assert isinstance(open_metastore(f_dir), Metastore)
    assert isinstance(open_metastore(t_dir), TableMetastore)
    # config only matters pre-create; detection wins afterwards
    assert isinstance(open_metastore(t_dir, webpages_config()), TableMetastore)
    with pytest.raises(ValueError):
        open_metastore(str(tmp_path / "x"), webpages_config(metastore_backend="bogus"))


# -- table-backed specifics ---------------------------------------------

def _worker(index_dir: str, wid: int, n: int, q) -> None:
    try:
        m = TableMetastore(index_dir)
        for i in range(n):
            sid = f"{wid}-{i}"
            m.stage_splits([SplitMetadata(split_id=sid, num_docs=1)])
            m.publish_splits(
                [sid],
                source_id="src",
                checkpoint_delta={f"p{wid}": f"{i:06d}"},
            )
        q.put((wid, None))
    except BaseException as e:  # surface the failure to the parent
        q.put((wid, repr(e)))


def test_concurrent_writers_serialize_via_cas(tmp_path):
    """The PostgreSQL-transaction guarantee: N independent processes
    stage+publish interleaved; every mutation lands exactly once."""
    index_dir = str(tmp_path / "idx")
    m = TableMetastore(index_dir)
    m.create(webpages_config())
    nw, per = 4, 6
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(index_dir, w, per, q))
        for w in range(nw)
    ]
    for p in procs:
        p.start()
    errs = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    assert all(e is None for _, e in errs), errs
    pub = m.list_published()
    assert len(pub) == nw * per
    # every per-partition checkpoint reached its final position
    cp = m.checkpoint("src")
    assert cp == {f"p{w}": f"{per - 1:06d}" for w in range(nw)}
    # log is dense: versions 0..N with no gaps, one commit per mutation
    assert m._latest_version() == 2 * nw * per  # create + (stage+publish)*N


def test_checkpoint_fold_equals_full_replay(tmp_path):
    index_dir = str(tmp_path / "idx")
    m = TableMetastore(index_dir)
    m.create(webpages_config())
    for i in range(m.CHECKPOINT_INTERVAL + 3):  # cross a snapshot point
        sid = str(i)
        m.stage_splits([meta(sid)])
        m.publish_splits([sid])
    assert os.path.exists(m.last_ckpt_path)
    folded = m._load_state()
    # a reader still holding the PREVIOUS checkpoint pointer (the
    # retention grace case) must fold to the same state
    ckpts = sorted(
        int(n.split(".", 1)[0])
        for n in os.listdir(m.ckpt_dir)
        if n.endswith(".state.json")
    )
    with open(m.last_ckpt_path, "w") as f:
        json.dump({"version": ckpts[0]}, f)
    replayed = TableMetastore(index_dir)._load_state()
    assert folded == replayed


def test_log_pruning_bounds_listing_but_keeps_state(tmp_path):
    index_dir = str(tmp_path / "idx")
    m = TableMetastore(index_dir)
    m.create(webpages_config())
    n_mut = 2 * m.CHECKPOINT_INTERVAL + 2  # cross two snapshot points
    for i in range(n_mut):
        m.stage_splits([meta(str(i))])
    # second checkpoint pruned everything <= first checkpoint version
    assert not os.path.exists(m._commit_path(0))
    retained = len(os.listdir(m.log_dir))
    assert retained <= m.CHECKPOINT_INTERVAL + 2
    # state fully intact from snapshot + retained tail
    assert m.exists()
    assert m.config().to_dict() == webpages_config().to_dict()
    assert len(m.splits()) == n_mut
    with pytest.raises(FileExistsError):
        m.create(webpages_config())  # pruned commit 0 can't be re-taken


def test_noop_mutation_burns_no_version(tmp_path):
    index_dir = str(tmp_path / "idx")
    m = TableMetastore(index_dir)
    m.create(webpages_config())
    v = m.state_token()
    m.mark_for_deletion(["does-not-exist"])
    assert m.state_token() == v


@pytest.mark.parametrize("backend", BACKENDS)
def test_allocate_split_ids_contiguous_and_disjoint(backend, tmp_path):
    m = make_ms(backend, str(tmp_path / "idx"))
    m.create(webpages_config())
    a = m.allocate_split_ids(3)
    b = m.allocate_split_ids(2)
    assert a == ["0", "1", "2"] and b == ["3", "4"]
    # ids of a crashed (never-staged) run stay burnt
    c = m.allocate_split_ids(1)
    assert c == ["5"]
    # directly-staged ids are accounted for
    m.stage_splits([meta("9")])
    assert m.allocate_split_ids(1) == ["10"]
    with pytest.raises(ValueError):
        m.allocate_split_ids(0)


def _alloc_worker(index_dir: str, wid: int, n_rounds: int, q) -> None:
    try:
        m = TableMetastore(index_dir)
        got = []
        for _ in range(n_rounds):
            got.extend(m.allocate_split_ids(3))
        q.put((wid, None, got))
    except BaseException as e:
        q.put((wid, repr(e), []))


def test_concurrent_allocation_is_globally_disjoint(tmp_path):
    index_dir = str(tmp_path / "idx")
    m = TableMetastore(index_dir)
    m.create(webpages_config())
    nw, rounds = 4, 5
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_alloc_worker, args=(index_dir, w, rounds, q))
        for w in range(nw)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    assert all(e is None for _, e, _ in results), results
    all_ids = [i for _, _, got in results for i in got]
    assert len(all_ids) == len(set(all_ids)) == nw * rounds * 3


def test_splits_parquet_checkpoint_is_queryable(tmp_path):
    import pyarrow.parquet as pq

    index_dir = str(tmp_path / "idx")
    m = TableMetastore(index_dir)
    m.create(webpages_config())
    for i in range(m.CHECKPOINT_INTERVAL):
        sid = str(i)
        m.stage_splits(
            [meta(sid, time_range=(i * 100, i * 100 + 99), tags={"lang": ["en"]})]
        )
        m.publish_splits([sid])
    path = m.splits_table_path()
    assert path is not None and os.path.exists(path)
    t = pq.read_table(path)
    rows = {r["split_id"]: r for r in t.to_pylist()}
    # the parquet reflects state AT the checkpoint version, which is
    # <= current; every row it has must agree with live state
    live = {s.split_id: s for s in m.splits()}
    assert set(rows) <= set(live)
    some = rows[next(iter(rows))]
    assert some["state"] in (STAGED, PUBLISHED)
    assert json.loads(some["tags"]) == {"lang": ["en"]}


def test_table_metastore_index_end_to_end(spark, tmp_path):
    """build → search → merge-style mutation on the table backend."""
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.operators.search import SearchRequest, count_hits, search
    from quickwit_spark.sources.corpus import webpages_df
    from quickwit_spark.sources.extract import with_extracted_text

    index_dir = str(tmp_path / "idx")
    cfg = webpages_config(metastore_backend="table")
    pages = with_extracted_text(webpages_df(spark, 300, seed=3).drop("text"))
    metas = build_index(spark, pages, index_dir, cfg, num_splits=2)
    assert metas and isinstance(open_metastore(index_dir), TableMetastore)
    hits = search(spark, index_dir, "the", k=5)
    assert hits.count() == 5
    n = count_hits(spark, index_dir, SearchRequest(query="the"))
    assert n > 0
    # mutation invalidates the warm Searcher via state_token
    m = open_metastore(index_dir)
    t0 = m.state_token()
    m.stage_splits([meta("99")])
    assert m.state_token() != t0
