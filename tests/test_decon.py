"""Benchmark decontamination: planted-leak recall, threshold behavior,
DuckDB-oracle parity."""

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rify_spark.ops import decon  # noqa: E402
from rify_spark.ops.params import (  # noqa: E402
    DECON_EVAL_RATE,
    DECON_EXCERPT_LEN,
    DECON_EXCERPT_START,
    DECON_N,
)

FLOOR_HITS = DECON_EXCERPT_LEN - DECON_N + 1  # 16: hits of a planted source


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _eval_ids(ids):
    cut = int(DECON_EVAL_RATE * (1 << 28))
    return {i for i in ids if _h28(f"eval:{i}") < cut}


@pytest.fixture(scope="module")
def corpus(spark):
    # 400 docs of 40 unique-per-doc tokens: no two docs share any n-gram,
    # so the ONLY contamination is the derived eval excerpts themselves
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_planted_sources_flagged_exactly(spark, corpus):
    docs, rows = corpus
    got = {r["doc_id"]: r["eval_hits"] for r in decon.decontaminate(docs).collect()}
    expect = _eval_ids(range(400))
    assert expect, "eval sample is empty — rate/corpus mismatch"
    assert set(got) == expect
    # unique-token corpus: every flagged doc sits exactly at the floor
    assert all(h == FLOOR_HITS for h in got.values())


def test_copied_excerpt_is_caught_partial_overlap_is_not(spark, corpus):
    _, rows = corpus
    src = sorted(_eval_ids(range(400)))[0]
    toks = rows[src][1].split(" ")
    exc = toks[DECON_EXCERPT_START - 1 : DECON_EXCERPT_START - 1 + DECON_EXCERPT_LEN]
    leak = (10_000, " ".join(["q0"] * 10 + exc[:10] + ["q1"] * 10))  # 6 n-grams
    graze = (10_001, " ".join(["q2"] * 10 + exc[:DECON_N] + ["q3"] * 10))  # 1
    # the added ids must not enter the eval sample and shift the n-gram set
    assert not _eval_ids({10_000, 10_001})
    docs = spark.createDataFrame(
        rows + [leak, graze], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["eval_hits"] for r in decon.decontaminate(docs).collect()}
    assert got[10_000] == 6
    assert 10_001 not in got


def test_short_docs_and_repartition_invariance(spark, corpus):
    docs, _ = corpus
    with_short = docs.unionByName(
        spark.createDataFrame([(20_000, "a b c")], "doc_id long, text string")
    )
    a = sorted(map(tuple, decon.decontaminate(with_short).collect()))
    b = sorted(map(tuple, decon.decontaminate(with_short.repartition(13)).collect()))
    assert a == b
    assert all(d != 20_000 for d, _ in a)


def test_oracle_parity_on_synthetic(spark, corpus):
    duckdb = pytest.importorskip("duckdb")
    docs, rows = corpus
    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]),
    )
    orows = sorted(map(tuple, con.execute(decon.decontaminate_sql()).fetchall()))
    srows = sorted(map(tuple, decon.decontaminate(docs).collect()))
    assert srows == orows
