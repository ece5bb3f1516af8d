"""Streaming ingestion — the reference's source actors re-expressed
as Structured Streaming.

Reference semantics (SURVEY.md §2.1, §3.2): FileSource tails ndjson
in ~500 KB batches and KafkaSource resumes per-partition offsets from
the metastore checkpoint; each pipeline commit cuts splits and
publishes them ATOMICALLY together with the checkpoint delta
(quickwit-indexing/src/source/file_source.rs:54-140,
kafka_source.rs:129-157; publisher.rs:87-111; exactly-once contract
in docs/design/indexing.md §Checkpoint).

Spark-native mapping:

- the source is a ``readStream`` DataFrame (file dir / Kafka / rate);
  Spark's own WAL checkpoint (``checkpointLocation``) replays
  unfinished micro-batches;
- each micro-batch runs ``foreachBatch`` → :func:`add_documents`,
  which cuts NEW splits for the batch and publishes them with a
  checkpoint position = the zero-padded batch id;
- exactly-once: on micro-batch REPLAY (crash between our publish and
  Spark's WAL commit) the recorded position makes ``add_documents`` a
  no-op, mirroring the reference's rejection of non-advancing
  checkpoint deltas (checkpoint.rs:160-178). Split publication and
  checkpoint advance are one atomic manifest rename.

No watermarks/event-time windows — the reference has none
(SURVEY.md §2.7); event time only feeds per-split ``time_range``
metadata for pruning, which ``add_documents`` records per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from quickwit_spark.operators.build import add_documents
from quickwit_spark.plans.config import IndexConfig
from quickwit_spark.plans.metastore import open_metastore


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """FileSource analogue: tail a directory of ndjson/parquet files
    (file_source.rs:54-108 — batch size bound becomes
    ``maxFilesPerTrigger``)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def kafka_stream_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """KafkaSource analogue (kafka_source.rs:129-231): per-partition
    offsets live in Spark's checkpoint instead of the metastore. The
    payload arrives as ``value: binary`` — parse with ``from_json``
    downstream. Requires the Kafka connector on the cluster
    classpath (not bundled in this sandbox)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def ingest_stream(
    stream_df: DataFrame,
    index_dir: str,
    config: IndexConfig | None = None,
    checkpoint_dir: str | None = None,
    source_id: str = "stream",
    num_splits_per_batch: int | None = None,
    trigger_available_now: bool = False,
    processing_time: str | None = None,
):
    """Run the indexing pipeline over a streaming DataFrame.

    Returns the StreamingQuery. ``trigger_available_now=True``
    processes everything currently available then stops (the batch
    "ingest" CLI semantics, quickwit-cli index.rs:749-810);
    ``processing_time`` (e.g. ``"60 seconds"``) mirrors
    ``commit_timeout_secs`` (index_config.rs:157-159) — each trigger
    interval cuts one batch of splits.
    """
    spark = stream_df.sparkSession
    ms = open_metastore(index_dir, config)
    if not ms.exists():
        if config is None:
            raise ValueError("config required to create a new index")
        ms.create(config)

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        add_documents(
            spark,
            batch_df,
            index_dir,
            source_id=source_id,
            position=f"{batch_id:020d}",  # lexicographic == numeric order
            num_splits=num_splits_per_batch,
        )

    writer = stream_df.writeStream.foreachBatch(_commit).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
