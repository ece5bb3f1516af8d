"""SparkSession factory tuned for this engine.

Local-mode defaults follow the public PySpark guidance: AQE on,
shuffle partitions sized to cores (not 200), Arrow enabled for the
vectorized UDF path, UTC session timezone so timestamp semantics are
deterministic across environments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "quickwit_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. On a real
    cluster callers pass master/conf via spark-submit and this just
    returns the active session.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(env) if env else (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark 4's default 64MB arrow-batch byte cap makes every
        # grouped applyInPandas/applyInArrow input call
        # ArrowWriter.sizeInBytes() PER ROW (an O(#vectors) walk —
        # measured ~60% of executor CPU in the posting-encode stage).
        # The walk is skipped only when the cap is exactly
        # Int.MaxValue; batch memory stays bounded by
        # maxRecordsPerBatch (default 10k records).
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(2**31 - 1))
        .config("spark.ui.enabled", "false")
        # v2 committer: tasks move their own output files on commit —
        # no driver-serial rename pass at the end of every write job
        # (a non-scaling tail that grows with output file count)
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
