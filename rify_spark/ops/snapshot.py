"""Versioned-corpus snapshot selection (latest / as-of per file).

The north-star input is an Iceberg table of source-code repositories
``(repo, path, commit, lang, content)`` carrying EVERY commit's version
of every file; KG construction runs over ONE consistent snapshot — the
latest version of each ``(repo, path)``, or the latest at/under a pinned
point ("as of").

The scale-correct shape is a single partial-aggregating shuffle:
``groupBy(repo, path).agg(max_by(payload_struct, version))``.  Map-side
combine reduces each scan partition to at most one candidate row per
key before the exchange, so shuffle volume is O(distinct files), not
O(versions) — a window ``row_number() ... ORDER BY version DESC`` over
the same key would shuffle every version AND sort inside each hash
partition, paying O(versions log versions) for the same answer.  An
as-of bound is a plain pre-aggregation filter (pushable to the scan /
partition pruning when the table is version-partitioned).

Determinism: ``max_by`` ties are unspecified in both engines, so the
``version_col`` values MUST be a total order per key (unique commits /
a commit sequence number); the gate's o_orderkey versions are globally
unique.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEYS = ("repo", "path")


def latest_snapshot(
    files: DataFrame,
    keys: Sequence[str] = KEYS,
    version_col: str = "commit",
    asof: Optional[Column] = None,
) -> DataFrame:
    """One row per ``keys`` tuple: the payload of the maximal
    ``version_col`` (restricted to ``version_col <= asof`` when given).
    Column order and names are preserved."""
    keys = list(keys)
    payload = [c for c in files.columns if c not in keys]
    if version_col not in files.columns:
        raise ValueError(f"version column {version_col!r} not in input")
    if asof is not None:
        files = files.filter(F.col(version_col) <= asof)
    picked = files.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]), F.col(version_col)
        ).alias("__r")
    )
    return picked.select(
        *[
            F.col(c) if c in keys else F.col(f"__r.{c}").alias(c)
            for c in files.columns
        ]
    )


# ---------------------------------------------------------------------------
# Gate: a deterministic versioned corpus derived from the orders table.
# Each customer key is one file; each of its orders is one committed
# version (o_orderkey is globally unique -> a total version order), and
# the snapshot is taken AS OF a fixed version cut so the op's bound is
# exercised, not just the max.

def versioned_corpus(spark, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.select(
        F.concat(F.lit("repo_"), F.col("o_custkey") % 10).alias("repo"),
        F.concat(F.lit("src/f_"), F.col("o_custkey"), F.lit(".py")).alias(
            "path"
        ),
        F.col("o_orderkey").cast("long").alias("commit"),
        F.lit("python").alias("lang"),
        F.concat(
            F.lit("def f_"), F.col("o_custkey"), F.lit("(): return "),
            F.col("o_orderkey"),
        ).alias("content"),
    )


def corpus_snapshot(spark, sf_dir: str) -> DataFrame:
    """As-of snapshot with the cut at 3/4 of the max version, so the
    bound provably excludes a tail of commits at every sf.  The cut is
    one tiny max() aggregate (a metadata-only read at real scale when
    the table tracks column bounds) — identical arithmetic to the SQL
    twin's scalar subquery."""
    corpus = versioned_corpus(spark, sf_dir)
    cut = corpus.agg(F.max("commit")).first()[0] * 3 // 4
    return latest_snapshot(corpus, asof=F.lit(cut))


def corpus_snapshot_sql() -> str:
    return """
      WITH v AS (
        SELECT 'repo_' || (o_custkey % 10) AS repo,
               'src/f_' || o_custkey || '.py' AS path,
               CAST(o_orderkey AS BIGINT) AS commit,
               'python' AS lang,
               'def f_' || o_custkey || '(): return ' || o_orderkey
                 AS content
        FROM orders
        WHERE o_orderkey <= (SELECT MAX(o_orderkey) * 3 // 4 FROM orders)
      )
      SELECT repo, path,
             max_by(commit, commit) AS commit,
             max_by(lang, commit) AS lang,
             max_by(content, commit) AS content
      FROM v GROUP BY repo, path
    """


def corpus_diff(
    files: DataFrame,
    v_old: Column,
    v_new: Column,
    keys: Sequence[str] = KEYS,
    version_col: str = "commit",
    content_col: str = "content",
) -> DataFrame:
    """Change set between two as-of snapshots -> ``(*keys, change)``
    with ``change`` in {'added', 'removed', 'modified'}.

    This is the feed for incremental KG maintenance: 'added'/'modified'
    files re-enter extraction, 'removed'/'modified' files drive
    retraction of their previously-derived triples (the streaming
    retract path) — at 10^12 files the diff is what makes a daily
    update O(changed), not O(corpus).  The contract is pinned end to
    end by tests/test_incremental_corpus.py: diff -> re-extract ->
    signed-batch assert/retract lands on exactly the batch closure of
    the new snapshot.  Scope note: the canonical-ID mapping is treated
    as stable across the two cuts (entities are path-level); if a diff
    merges or splits link components, re-canonicalization of the
    affected components is a separate (batch) step — stated, not
    approximated.

    One shuffle total: both snapshots share the ``groupBy(keys)``
    hash partitioning, computed as a SINGLE aggregate with two
    conditional ``max_by`` branches over one scan (never two passes +
    a join).  Files changing between the cuts compare by content."""
    keys = list(keys)
    if version_col not in files.columns:
        raise ValueError(f"version column {version_col!r} not in input")
    vc, cc = F.col(version_col), F.col(content_col)
    agg = files.groupBy(*keys).agg(
        F.max_by(
            F.when(vc <= v_old, cc), F.when(vc <= v_old, vc)
        ).alias("_old"),
        F.max_by(
            F.when(vc <= v_new, cc), F.when(vc <= v_new, vc)
        ).alias("_new"),
    )
    change = (
        F.when(F.col("_old").isNull() & F.col("_new").isNotNull(), "added")
        .when(F.col("_old").isNotNull() & F.col("_new").isNull(), "removed")
        .when(F.col("_old") != F.col("_new"), "modified")
    )
    return (
        agg.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def corpus_diff_gate(spark, sf_dir: str) -> DataFrame:
    """Gate: diff the versioned orders-corpus between the half-max and
    3/4-max version cuts.  Every content embeds its version, so any
    file with a commit inside the window diffs 'modified' (or 'added'
    when its FIRST commit lands there) — the oracle reproduces both
    cuts with windowed arg_max."""
    corpus = versioned_corpus(spark, sf_dir)
    mx = corpus.agg(F.max("commit")).first()[0]
    return corpus_diff(
        corpus, F.lit(mx // 2), F.lit(mx * 3 // 4)
    )


def corpus_diff_sql() -> str:
    return """
      WITH cuts AS (
        SELECT MAX(o_orderkey) // 2 AS v_old,
               MAX(o_orderkey) * 3 // 4 AS v_new
        FROM orders
      ),
      v AS (
        SELECT 'repo_' || (o_custkey % 10) AS repo,
               'src/f_' || o_custkey || '.py' AS path,
               CAST(o_orderkey AS BIGINT) AS commit,
               'def f_' || o_custkey || '(): return ' || o_orderkey
                 AS content
        FROM orders
      ),
      snap AS (
        SELECT repo, path,
               max_by(CASE WHEN commit <= (SELECT v_old FROM cuts)
                           THEN content END,
                      CASE WHEN commit <= (SELECT v_old FROM cuts)
                           THEN commit END) AS c_old,
               max_by(CASE WHEN commit <= (SELECT v_new FROM cuts)
                           THEN content END,
                      CASE WHEN commit <= (SELECT v_new FROM cuts)
                           THEN commit END) AS c_new
        FROM v GROUP BY repo, path
      )
      SELECT repo, path,
             CASE WHEN c_old IS NULL THEN 'added'
                  WHEN c_new IS NULL THEN 'removed'
                  ELSE 'modified' END AS change
      FROM snap
      WHERE (c_old IS NULL) != (c_new IS NULL) OR c_old != c_new
    """
