"""Streaming ingest: file-source micro-batches → incremental splits,
exactly-once on replay, searchable results identical to a batch
build over the same rows."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.build import add_documents, build_index
from quickwit_spark.operators.search import SearchRequest, search
from quickwit_spark.plans.config import webpages_config
from quickwit_spark.plans.metastore import Metastore
from quickwit_spark.sources.corpus import gen_batch
from quickwit_spark.streaming.ingest import file_stream_source, ingest_stream

import numpy as np

N_DOCS = 300

STREAM_SCHEMA = "url string, warc_ts timestamp, text string, lang string"


def _rows(lo: int, hi: int) -> list[dict]:
    pdf = gen_batch(np.arange(lo, hi), seed=42)
    out = []
    for r in pdf.itertuples(index=False):
        out.append(
            {
                "url": r.url,
                "warc_ts": r.warc_ts.isoformat(),
                "text": r.text,
                "lang": r.lang,
            }
        )
    return out


@pytest.fixture(scope="module")
def stream_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = root / "in"
    src.mkdir()
    index_dir = str(root / "idx")
    cp = str(root / "cp")
    cfg = webpages_config(
        fields=(
            webpages_config().fields[0],
            webpages_config().fields[1],
        ),
        fast_fields=("warc_ts",),
    )
    # two ndjson files → (at least) two micro-batches
    for i, (lo, hi) in enumerate([(0, 150), (150, N_DOCS)]):
        with open(src / f"part{i}.json", "w") as f:
            for row in _rows(lo, hi):
                f.write(json.dumps(row) + "\n")

    stream = file_stream_source(
        spark, str(src), STREAM_SCHEMA, max_files_per_trigger=1
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    q = ingest_stream(
        stream,
        index_dir,
        cfg,
        checkpoint_dir=cp,
        trigger_available_now=True,
        num_splits_per_batch=2,
    )
    q.awaitTermination(300)
    return index_dir


def test_stream_builds_all_docs(spark, stream_index):
    ms = Metastore(stream_index)
    pub = ms.list_published()
    assert sum(s.num_docs for s in pub) == N_DOCS
    assert len(pub) >= 2  # >= one split per micro-batch
    # checkpoint advanced to the last batch
    assert "position" in ms.checkpoint("stream")


def test_stream_matches_batch_build(spark, stream_index, tmp_path_factory):
    batch_dir = str(tmp_path_factory.mktemp("batch") / "idx")
    pdf = gen_batch(np.arange(0, N_DOCS), seed=42)
    df = spark.createDataFrame(pdf[["url", "warc_ts", "text", "lang"]])
    cfg = Metastore(stream_index).config()
    build_index(spark, df, batch_dir, cfg, num_splits=2)

    # BM25 scores depend on per-split collection stats, so a different
    # split layout may permute scored top-k; the layout-independent
    # contract is the exhaustive MATCH SET (doc keys).
    from quickwit_spark.operators.search import fetch_docs, matches_df

    def match_keys(idx: str, query: str) -> set[str]:
        m = matches_df(spark, idx, SearchRequest(query=query))
        return {
            r["key"] for r in fetch_docs(spark, idx, m, columns=["key"]).collect()
        }

    for query in ["word", "hot the", "qw_marker_1 OR qw_marker_2"]:
        assert match_keys(stream_index, query) == match_keys(batch_dir, query), query


def test_replay_is_noop(spark, stream_index):
    ms = Metastore(stream_index)
    before = {s.split_id for s in ms.list_published()}
    pdf = gen_batch(np.arange(0, 10), seed=42)
    df = spark.createDataFrame(pdf[["url", "warc_ts", "text", "lang"]])
    # replaying an already-committed position must be a no-op
    pos = ms.checkpoint("stream")["position"]
    out = add_documents(spark, df, stream_index, source_id="stream", position=pos)
    assert out == []
    assert {s.split_id for s in ms.list_published()} == before


def test_incremental_add_advances(spark, stream_index):
    ms = Metastore(stream_index)
    pdf = gen_batch(np.arange(N_DOCS, N_DOCS + 20), seed=42)
    df = spark.createDataFrame(pdf[["url", "warc_ts", "text", "lang"]])
    pos = ms.checkpoint("stream")["position"]
    new_pos = f"{int(pos) + 1:020d}"
    metas = add_documents(
        spark, df, stream_index, source_id="stream", position=new_pos
    )
    assert sum(m.num_docs for m in metas) == 20
    assert ms.checkpoint("stream")["position"] == new_pos


def _kafka_available(spark) -> bool:
    # py4j resolves missing classes lazily — probe via the class loader
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_source_wiring(spark):
    """KafkaSource adapter (availability-gated like the Iceberg one):
    without the connector jar, plan construction must fail with the
    standard missing-data-source error (not silently misbehave); with
    it, the stream must expose Kafka's (key, value, topic, partition,
    offset, ...) schema the downstream from_json parse relies on."""
    from quickwit_spark.streaming.ingest import kafka_stream_source

    if not _kafka_available(spark):
        with pytest.raises(Exception, match="(?i)failed to find data source: kafka"):
            kafka_stream_source(spark, "localhost:9092", "topic")
        return
    df = kafka_stream_source(spark, "localhost:9092", "topic")
    cols = set(df.columns)
    assert {"key", "value", "topic", "partition", "offset"} <= cols


def test_dedup_exact_stream_matches_batch_canonicals(spark):
    """Streaming dropDuplicates-on-hash emits exactly the batch
    canonical set (first arrival == min doc_id under time-ordered
    feeding), across micro-batch boundaries."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from quickwit_spark.functions.dedup import (
        dedup_exact_stream,
        exact_dup_groups,
    )

    rows = []
    for i in range(30):
        if i % 5 == 2:
            text = "shared boilerplate page body"      # cross-batch dups
        elif i % 7 == 3:
            text = "Shared BOILERPLATE page body!!"    # normalizes equal
        else:
            text = f"unique content number {i} with words"
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    with tempfile.TemporaryDirectory(prefix="qws_dds_") as d:
        src = os.path.join(d, "src")
        ckpt = os.path.join(d, "ckpt")
        for b in range(3):                            # 3 ordered batches
            df.filter(
                (F.col("doc_id") >= b * 10) & (F.col("doc_id") < (b + 1) * 10)
            ).coalesce(1).write.parquet(os.path.join(src, f"b{b}"))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = (
            dedup_exact_stream(stream)
            .writeStream.format("memory")
            .queryName("dds_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["key"], r["content_hash"])
            for r in spark.table("dds_out").collect()
        }

    want = {
        (r["key"], r["content_hash"])
        for r in exact_dup_groups(df).filter("is_canonical").collect()
    }
    assert got == want
    assert len(got) < 30  # dups actually collapsed
