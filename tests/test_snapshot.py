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
