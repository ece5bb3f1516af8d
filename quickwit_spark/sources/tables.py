"""Input-table adapter: Iceberg tables and Parquet paths behind one
call.

BASELINE.json's ``input_hint`` mandates an *Iceberg table of
Common-Crawl-style web pages* as the primary input. This module is
the single entry point the CLI and build pipeline use:

- ``format="iceberg"`` (or an auto-detected ``catalog.db.table``
  identifier) → ``spark.read.format("iceberg")`` / ``spark.table``.
  Iceberg gives the scan the same pushdown surface as Parquet
  (Catalyst filters/column pruning reach the file scan) PLUS
  snapshot isolation and hidden-partition pruning — the build
  pipeline is agnostic: it consumes a DataFrame.
- ``format="parquet"`` (or a path) → plain Parquet directory.

The Iceberg runtime jar is not bundled with Spark; on a real cluster
run with::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver> \
        --conf spark.sql.catalog.cc=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.cc.type=hadoop \
        --conf spark.sql.catalog.cc.warehouse=<warehouse-uri> ...

When the runtime is absent, :func:`read_table` raises a clear error
for iceberg sources instead of an opaque ClassNotFoundException.

Why the index's own artifacts stay Parquet + manifest (ICEBERG.md has
the full argument): every split write is an idempotent dynamic
partition overwrite of a split_id directory, and visibility is
governed solely by the metastore manifest, which is published with a
single atomic ``os.replace`` — the same commit discipline as an
Iceberg snapshot swap (readers see the old or the new manifest, never
a mix), without dragging a JVM catalog into the read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _looks_like_table_ident(source: str) -> bool:
    return "/" not in source and not source.endswith(".parquet") and "." in source


def read_table(
    spark: SparkSession, source: str, format: str = "auto"
) -> DataFrame:
    """Load the input table: Iceberg identifier/path or Parquet path."""
    if format == "auto":
        format = "iceberg" if _looks_like_table_ident(source) else "parquet"
    if format == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg source requested but the Iceberg Spark runtime is "
                "not on the classpath; launch with --packages "
                "org.apache.iceberg:iceberg-spark-runtime-<spark>_<scala>:<ver> "
                "and a spark.sql.catalog.* configuration"
            )
        if _looks_like_table_ident(source):
            return spark.table(source)
        return spark.read.format("iceberg").load(source)
    return spark.read.format(format).load(source)
