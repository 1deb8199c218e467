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
    # a new RELATIVE path with a data-file suffix is a path, not table
    # `parquet` in namespace `out` (write_table would misroute to the
    # catalog and never produce the file)
    assert not rio.is_table_identifier("out.parquet")
    assert not rio.is_table_identifier("corpus.JSON")
    assert not rio.is_table_identifier("a-b")  # not a SQL identifier


def test_new_relative_parquet_path_roundtrip(spark, tmp_path, monkeypatch):
    # monkeypatch.chdir moves only the PYTHON cwd; Spark resolves relative
    # paths against the JVM's user.dir (fixed at session start), so the
    # artifact must be cleaned up there, not under tmp_path
    import shutil

    monkeypatch.chdir(tmp_path)
    jvm_cwd = spark._jvm.java.lang.System.getProperty("user.dir")
    try:
        rio.write_table(spark.range(4), "out.parquet")
        assert rio.read_table(spark, "out.parquet").count() == 4
    finally:
        for base in (jvm_cwd, str(tmp_path)):
            shutil.rmtree(
                os.path.join(base, "out.parquet"), ignore_errors=True
            )


def test_iceberg_layout_without_runtime_is_refused(spark, tmp_path):
    """An Iceberg directory must not be read as bare parquet (that would
    resurrect deleted rows); without the runtime jar the error says what
    to install. Skipped where the jar exists — the refusal branch is only
    live without it."""
    if rio.iceberg_available(spark):
        pytest.skip("Iceberg runtime present: refusal branch not live")
    d = tmp_path / "icetable"
    (d / "metadata").mkdir(parents=True)
    (d / "data").mkdir()
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        rio.read_table(spark, str(d))
    # the layout check resolves through the Hadoop FS of the path, so an
    # explicit file:// URI (the local stand-in for s3a/hdfs) is gated too
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        rio.read_table(spark, f"file://{d}")


def test_write_table_append(spark, tmp_path):
    p = str(tmp_path / "a.parquet")
    rio.write_table(spark.range(3), p)
    rio.write_table(spark.range(3), p, mode="append")
    assert rio.read_table(spark, p).count() == 6
