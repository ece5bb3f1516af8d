"""Input-table adapter: parquet path today, Iceberg when the runtime
jar is present (availability-gated — see ICEBERG.md)."""

from __future__ import annotations

import pytest

from quickwit_spark.sources.tables import (
    _looks_like_table_ident,
    iceberg_available,
    read_table,
)


def test_ident_detection():
    assert _looks_like_table_ident("cc.web.pages")
    assert not _looks_like_table_ident("/data/pages.parquet")
    assert not _looks_like_table_ident("s3://bucket/pages.parquet")
    assert not _looks_like_table_ident("pages")


def test_read_parquet_path(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(5).write.parquet(p)
    assert read_table(spark, p).count() == 5
    assert read_table(spark, p, format="parquet").count() == 5


def test_iceberg_clear_error_when_runtime_absent(spark):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present; error path not applicable")
    with pytest.raises(RuntimeError, match="--packages"):
        read_table(spark, "cc.web.pages", format="iceberg")


def test_iceberg_roundtrip_when_available(spark, tmp_path):
    """Runs only where the Iceberg Spark runtime is on the classpath
    (not in this sandbox): create → append → read back through the
    adapter."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on classpath in this sandbox")
    spark.conf.set("spark.sql.catalog.qws_test", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.qws_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.qws_test.warehouse", str(tmp_path))
    spark.range(7).writeTo("qws_test.db.t").create()
    assert read_table(spark, "qws_test.db.t", format="iceberg").count() == 7
    assert read_table(spark, "qws_test.db.t").count() == 7  # auto-detect
