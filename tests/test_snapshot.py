"""Versioned-corpus snapshot selection (ops/snapshot.py)."""

import pytest
from pyspark.sql import functions as F

from rify_spark.ops.snapshot import latest_snapshot

ROWS = [
    # repo, path, commit, lang, content
    ("r1", "a.py", 3, "python", "v3"),
    ("r1", "a.py", 7, "python", "v7"),
    ("r1", "a.py", 5, "python", "v5"),
    ("r1", "b.py", 2, "python", "b2"),
    ("r2", "a.py", 9, "python", "x9"),
    ("r2", "c.py", 11, "python", "c11"),
    ("r2", "c.py", 4, "python", "c4"),
]
SCHEMA = "repo string, path string, commit long, lang string, content string"


@pytest.fixture(scope="module")
def files(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_latest_per_file(files):
    got = {
        (r.repo, r.path): (r.commit, r.content)
        for r in latest_snapshot(files).collect()
    }
    assert got == {
        ("r1", "a.py"): (7, "v7"),
        ("r1", "b.py"): (2, "b2"),
        ("r2", "a.py"): (9, "x9"),
        ("r2", "c.py"): (11, "c11"),
    }


def test_asof_bound(files):
    got = {
        (r.repo, r.path): r.commit
        for r in latest_snapshot(files, asof=F.lit(5)).collect()
    }
    # a.py rolls back to commit 5; c.py to 4; b.py unchanged; r2/a.py
    # (only version 9) has NO version at/under the cut and disappears
    assert got == {
        ("r1", "a.py"): 5,
        ("r1", "b.py"): 2,
        ("r2", "c.py"): 4,
    }


def test_schema_preserved(files):
    out = latest_snapshot(files)
    assert out.columns == files.columns
    assert dict(out.dtypes) == dict(files.dtypes)


def test_missing_version_column(files):
    with pytest.raises(ValueError, match="version column"):
        latest_snapshot(files, version_col="nope")


def test_single_partial_aggregate_plan(files):
    """The snapshot is ONE hash-aggregate exchange with map-side combine
    (partial_max_by before the shuffle), never a sort-window."""
    plan = (
        latest_snapshot(files)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_max_by" in plan


# --- corpus_diff -------------------------------------------------------------

from rify_spark.ops.snapshot import corpus_diff  # noqa: E402


def test_corpus_diff_classifies_changes(spark):
    rows = [
        # unchanged: only version <= v_old
        ("r", "same.py", 1, "python", "s1"),
        # modified: new content after the old cut
        ("r", "mod.py", 2, "python", "m-old"),
        ("r", "mod.py", 7, "python", "m-new"),
        # added: first commit lands between the cuts
        ("r", "new.py", 6, "python", "n6"),
        # invisible: first commit after BOTH cuts
        ("r", "later.py", 99, "python", "l99"),
        # content identical across cuts despite a new commit -> no diff
        ("r", "touch.py", 3, "python", "t"),
        ("r", "touch.py", 8, "python", "t"),
    ]
    files = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string, content string"
    )
    got = {
        r.path: r.change
        for r in corpus_diff(files, F.lit(5), F.lit(10)).collect()
    }
    assert got == {"mod.py": "modified", "new.py": "added"}


def test_corpus_diff_removed_needs_tombstone_free_semantics(spark):
    # a file visible at v_old whose every version is > v_new is
    # impossible under append-only versions (v_old < v_new), so
    # 'removed' only arises when v_old > v_new is passed reversed —
    # diff is directional and reports it
    rows = [("r", "a.py", 3, "python", "x")]
    files = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string, content string"
    )
    got = [
        (r.path, r.change)
        for r in corpus_diff(files, F.lit(5), F.lit(1)).collect()
    ]
    assert got == [("a.py", "removed")]


def test_corpus_diff_single_shuffle_plan(spark):
    files = spark.createDataFrame(
        [("r", "a.py", 1, "python", "x")],
        "repo string, path string, commit long, lang string, content string",
    )
    plan = (
        corpus_diff(files, F.lit(1), F.lit(2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both snapshots ride ONE aggregate: a single exchange, no join
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
