from quickwit_spark.streaming.ingest import (  # noqa: F401
    file_stream_source,
    ingest_stream,
    kafka_stream_source,
)
