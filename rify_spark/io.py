"""Table I/O resolution: catalog tables (Iceberg included), Iceberg paths,
plain parquet — one entry point for every job that takes an `--input`.

The north rule's corpus lives in an Iceberg table; this sandbox ships no
Iceberg runtime jar, so the module is capability-gated rather than stubbed:

  * **catalog identifiers** (`catalog.db.table`, no path separator) go
    through ``spark.read.table`` / ``DataFrame.writeTo`` — Spark's catalog
    API, which IS the documented Iceberg access path once the runtime jar
    and a catalog conf (``spark.sql.catalog.<name>``) are on the cluster.
    Nothing here is Iceberg-version-specific; the same identifiers resolve
    temp views and Hive tables, which is also how the fallback tests run
    without the jar;
  * **directories with an Iceberg ``metadata/`` layout** load via
    ``format("iceberg")`` when the runtime is present, and raise an
    actionable error (install the runtime, or point at the data files)
    when it is not — never silently reading an Iceberg table's parquet
    files WITHOUT the metadata layer, which would resurrect deleted rows
    and read uncommitted files;
  * **everything else** is a plain parquet path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.catalog.Catalog"
        )
        return True
    except Exception:
        return False


def _is_iceberg_dir(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "metadata")) and os.path.isdir(
        os.path.join(path, "data")
    )


def is_table_identifier(ref: str) -> bool:
    """A catalog reference rather than a filesystem path: no path
    separators, no scheme, not an existing local file/dir."""
    if os.path.sep in ref or "/" in ref or "://" in ref:
        return False
    return not os.path.exists(ref)


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Load ``ref`` by what it is: catalog identifier -> ``read.table``
    (Iceberg/Hive/view — the cluster's catalog decides); Iceberg directory
    layout -> ``format("iceberg")`` (runtime required); else parquet."""
    if is_table_identifier(ref):
        return spark.read.table(ref)
    if _is_iceberg_dir(ref):
        if not iceberg_available(spark):
            raise RuntimeError(
                f"{ref} has an Iceberg metadata/ layout but the Iceberg "
                "runtime jar is not on the classpath; add "
                "iceberg-spark-runtime to spark.jars (reading the bare "
                "data/ parquet would bypass snapshot isolation and "
                "delete files)"
            )
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """Write ``df`` to a catalog table (``writeTo`` — Iceberg's documented
    write path, atomic per-commit) or a parquet path."""
    if is_table_identifier(ref):
        writer = df.writeTo(ref)
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        else:
            raise ValueError(f"unsupported mode for catalog table: {mode}")
        return
    df.write.mode(mode).parquet(ref)
