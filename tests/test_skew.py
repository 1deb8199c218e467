"""Salted-join correctness: plain join == salted join on skewed data, for
every supported join type (the skew *benchmark* lives in scripts/skew_bench.py;
these tests pin semantics)."""

import pytest
from pyspark.sql import functions as F

from rify_spark.skew import exploded_salts, key_skew_stats, salted_join, with_salt


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # one hot key carries 90% of the left side
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(300).select(
        F.when(F.col("id") % 3 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k"),
        (F.col("id") * 7).alias("rv"),
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, skewed_pair, how):
    left, right = skewed_pair
    plain = left.join(right, ["k"], how)
    salted = salted_join(left, right, ["k"], n_salts=8, how=how)
    assert sorted(salted.columns) == sorted(plain.columns)
    p = sorted(map(tuple, plain.collect()))
    s = sorted(map(tuple, salted.collect()))
    assert p == s, f"{how}: salted join diverges ({len(p)} vs {len(s)} rows)"


def test_salt_is_deterministic_and_bounded(spark, skewed_pair):
    left, _ = skewed_pair
    a = with_salt(left, 8)
    vals = [r["__salt"] for r in a.select("__salt").distinct().collect()]
    assert all(0 <= v < 8 for v in vals)
    # equal rows get equal salts (stable under retries)
    b = with_salt(left, 8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_exploded_salts_multiplicity(spark, skewed_pair):
    _, right = skewed_pair
    n = right.count()
    assert exploded_salts(right, 5).count() == 5 * n


def test_key_skew_stats(spark, skewed_pair):
    left, _ = skewed_pair
    stats = key_skew_stats(left, ["k"], top=1)
    assert stats[0]["k"] == "hot"
    assert stats[0]["share"] > 0.85
