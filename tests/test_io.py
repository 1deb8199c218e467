"""Table-reference resolution: catalog identifiers, Iceberg layout gating,
parquet paths."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rify_spark import io as rio  # noqa: E402


def test_parquet_path_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    rio.write_table(df, p)
    got = rio.read_table(spark, p)
    assert got.count() == 10 and set(got.columns) == {"id", "v"}


def test_catalog_identifier_resolves_via_read_table(spark):
    """Identifiers route through spark.read.table — the same call that
    resolves Iceberg catalog tables on a configured cluster (here a temp
    view stands in, exercising the identical code path)."""
    spark.range(7).createOrReplaceTempView("io_code_files_v")
    assert rio.is_table_identifier("io_code_files_v")
    assert rio.read_table(spark, "io_code_files_v").count() == 7


def test_identifier_detection(spark, tmp_path):
    assert rio.is_table_identifier("catalog.db.code_files")
    assert not rio.is_table_identifier(str(tmp_path))  # existing dir
    assert not rio.is_table_identifier("/a/b/c.parquet")
    assert not rio.is_table_identifier("s3://bucket/key")


def test_iceberg_layout_without_runtime_is_refused(spark, tmp_path):
    """An Iceberg directory must not be read as bare parquet (that would
    resurrect deleted rows); without the runtime jar the error says what
    to install. This sandbox has no Iceberg jar, so the gate is live."""
    d = tmp_path / "icetable"
    (d / "metadata").mkdir(parents=True)
    (d / "data").mkdir()
    assert not rio.iceberg_available(spark)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        rio.read_table(spark, str(d))


def test_write_table_append(spark, tmp_path):
    p = str(tmp_path / "a.parquet")
    rio.write_table(spark.range(3), p)
    rio.write_table(spark.range(3), p, mode="append")
    assert rio.read_table(spark, p).count() == 6
