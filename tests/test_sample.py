"""Deterministic stratified sampling: per-stratum hash-threshold keep."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rify_spark.ops import sample  # noqa: E402


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 3 else "de", f"text {i}") for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_rates_apply_per_stratum(spark, corpus):
    kept = sample.docs_sample_stratified(corpus, rates={"en": 0.25}).collect()
    en = sum(1 for r in kept if r["lang"] == "en")
    de = sum(1 for r in kept if r["lang"] == "de")
    assert de == 1000  # default rate 1.0 keeps the whole stratum
    assert 0.20 * 2000 < en < 0.30 * 2000  # ~binomial around 0.25


def test_sampling_is_deterministic_and_stable(spark, corpus):
    a = {tuple(r) for r in sample.docs_sample_stratified(corpus, rates={"en": 0.5}).collect()}
    b = {
        tuple(r)
        for r in sample.docs_sample_stratified(
            corpus.repartition(17), rates={"en": 0.5}
        ).collect()
    }
    assert a == b  # no RNG state, no partitioning dependence


def test_changing_one_rate_leaves_other_strata_untouched(spark, corpus):
    base = {
        r["doc_id"]
        for r in sample.docs_sample_stratified(corpus, rates={"en": 0.5}).collect()
        if r["lang"] == "de"
    }
    after = {
        r["doc_id"]
        for r in sample.docs_sample_stratified(
            corpus, rates={"en": 0.1, "de": 1.0}
        ).collect()
        if r["lang"] == "de"
    }
    assert base == after


def test_rate_subsets_nest(spark, corpus):
    """Halving a rate keeps a SUBSET of the docs the higher rate kept —
    the hash-threshold property that makes sweeps reproducible."""
    hi = {tuple(r) for r in sample.docs_sample_stratified(corpus, rates={"en": 0.6}).collect()}
    lo = {tuple(r) for r in sample.docs_sample_stratified(corpus, rates={"en": 0.3}).collect()}
    assert lo < hi


def test_docs_shuffle_rank_is_a_reproducible_permutation(spark):
    from rify_spark.ops.sample import docs_shuffle_rank

    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    got = {
        r["doc_id"]: r["shuffle_rank"]
        for r in docs_shuffle_rank(docs).collect()
    }
    # a bijection onto 1..n, and genuinely shuffled (not identity order)
    assert sorted(got.values()) == list(range(1, 501))
    assert [got[i] for i in range(500)] != list(range(1, 501))
    # identical under re-run AND input partitioning (no RNG state)
    again = {
        r["doc_id"]: r["shuffle_rank"]
        for r in docs_shuffle_rank(docs.repartition(7)).collect()
    }
    assert again == got
    # a different seed is a different permutation
    other = {
        r["doc_id"]: r["shuffle_rank"]
        for r in docs_shuffle_rank(docs, seed="epoch1").collect()
    }
    assert sorted(other.values()) == list(range(1, 501))
    assert other != got
