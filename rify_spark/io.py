"""Table I/O resolution: catalog tables (Iceberg included), Iceberg paths,
plain parquet — one entry point for every job that takes an `--input`.

The north rule's corpus lives in an Iceberg table; this sandbox ships no
Iceberg runtime jar, so the module is capability-gated rather than stubbed:

  * **catalog identifiers** (`catalog.db.table` — dotted identifiers, no
    path separator, no data-file extension) go through ``spark.read.table``
    / ``DataFrame.writeTo`` — Spark's catalog API, which IS the documented
    Iceberg access path once the runtime jar and a catalog conf
    (``spark.sql.catalog.<name>``) are on the cluster. Nothing here is
    Iceberg-version-specific; the same identifiers resolve temp views and
    Hive tables, which is also how the fallback tests run without the jar.
    Caveat (documented contract): a bare identifier that also names an
    existing file in the working directory is treated as the file;
  * **directories with an Iceberg ``metadata/`` layout** — checked through
    the Hadoop filesystem of the path, so the gate holds for s3a/hdfs/abfss
    URIs too, not just local disk — load via ``format("iceberg")`` when the
    runtime is present, and raise an actionable error (install the runtime,
    or point at the data files) when it is not: silently reading an Iceberg
    table's parquet files WITHOUT the metadata layer would resurrect
    deleted rows and read uncommitted files;
  * **everything else** is a plain parquet path.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

# dotted chain of SQL identifiers: catalog.db.table / db.table / view
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")
# a final segment that is a data-file suffix means "path", not "table":
# write_table(df, "out.parquet") must write a file even though the string
# also parses as table `parquet` in namespace `out`
_FILE_SUFFIXES = (
    "parquet", "json", "csv", "orc", "avro", "txt",
    "nt", "nq", "ntriples", "nquads",
)
# line-format RDF suffixes routed through rify_spark.rdf
_RDF_SUFFIXES = (".nt", ".nq", ".ntriples", ".nquads")
# subject-grouped Turtle/TriG (the format_turtle line subset)
_TTL_SUFFIXES = (".ttl", ".trig", ".turtle")


def _is_rdf_path(ref: str) -> bool:
    return ref.rstrip("/").lower().endswith(_RDF_SUFFIXES)


def _is_ttl_path(ref: str) -> bool:
    return ref.rstrip("/").lower().endswith(_TTL_SUFFIXES)


def _is_trig_path(ref: str) -> bool:
    return ref.rstrip("/").lower().endswith(".trig")


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is loadable by SPARK's classloader —
    jars added via spark.jars/--packages live in Spark's
    MutableURLClassLoader, which the plain one-arg ``Class.forName`` (system
    classloader) cannot see, so probe through Spark's own Utils."""
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.iceberg.catalog.Catalog", False, False
        )
        return True
    except Exception:
        pass
    try:  # fallback for Spark builds without that Utils signature
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def _is_iceberg_dir(spark: SparkSession, path: str) -> bool:
    """True when ``path`` has Iceberg's metadata/ + data/ layout, resolved
    through the path's own Hadoop filesystem so object-store URIs
    (s3a://...) are checked, not silently skipped."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.isDirectory(
            jvm.org.apache.hadoop.fs.Path(path, "metadata")
        ) and fs.isDirectory(jvm.org.apache.hadoop.fs.Path(path, "data"))
    except Exception:
        # unresolvable filesystem (missing connector, bad scheme): let the
        # downstream reader raise its own, more specific error
        return False


def is_table_identifier(ref: str) -> bool:
    """A catalog reference rather than a filesystem path: a dotted
    identifier chain whose final segment is not a data-file suffix, no
    scheme, and nothing by that name on local disk."""
    if not _IDENT_RE.match(ref):
        return False
    if ref.rsplit(".", 1)[-1].lower() in _FILE_SUFFIXES:
        return False
    return not os.path.exists(ref)


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Load ``ref`` by what it is: catalog identifier -> ``read.table``
    (Iceberg/Hive/view — the cluster's catalog decides); Iceberg directory
    layout (any filesystem) -> ``format("iceberg")`` (runtime required);
    else parquet."""
    if is_table_identifier(ref):
        return spark.read.table(ref)
    if _is_rdf_path(ref):
        from .rdf import read_nquads

        return read_nquads(spark, ref)
    if _is_ttl_path(ref):
        from .rdf import read_turtle

        return read_turtle(spark, ref)
    if _is_iceberg_dir(spark, ref):
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
    if _is_rdf_path(ref):
        from .rdf import write_nquads

        write_nquads(df, ref, mode=mode)
        return
    if _is_ttl_path(ref):
        from .rdf import write_trig, write_turtle

        writer = write_trig if _is_trig_path(ref) else write_turtle
        writer(df, ref, mode=mode)
        return
    df.write.mode(mode).parquet(ref)
