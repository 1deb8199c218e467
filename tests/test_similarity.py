"""ANN structural tests beyond the oracle gate: IVF cell assignment is a
partition of the corpus, nprobe search stays within probed cells, and Lloyd
refinement produces valid centroids that (weakly) reduce assignment cost."""

import pytest
from pyspark.sql import functions as F

from rify_spark.ops.similarity import (
    IVF_NLIST,
    _int_l2,
    _ivf_centroids,
    _ivf_rank_cells,
    _quantized,
    ivf_refine_centroids,
    knn_ivf,
    knn_ivf_cells,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ivf_cells_partition_the_corpus(spark, emb):
    cells = knn_ivf_cells(emb)
    n = emb.count()
    assert cells.count() == n  # every vector assigned exactly once
    assert cells.select("vec_id").distinct().count() == n
    used = {r["cell"] for r in cells.select("cell").distinct().collect()}
    assert used <= set(range(IVF_NLIST))
    assert len(used) > 1  # the sample centroids do split the corpus


def test_ivf_topk_shape_and_self_exclusion(spark, emb):
    out = knn_ivf(emb, n_queries=5, k=3).collect()
    assert {r["query_id"] for r in out} <= set(range(5))
    for r in out:
        assert r["vec_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 3
    # ranks are dense per query
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def _assignment_cost(quant, cents):
    ranked = _ivf_rank_cells(quant, cents)
    return (
        ranked.filter(F.col("cell_rank") == 1)
        .crossJoin(F.broadcast(cents.withColumnRenamed("cent_id", "c2")))
        .filter(F.col("c2") == F.col("cent_id"))
        .agg(F.sum(_int_l2(F.col("ce"), F.col("cvec"))).alias("cost"))
        .collect()[0]["cost"]
    )


def test_ivf_lloyd_refinement_reduces_cost(spark, emb):
    quant = emb.select("vec_id", _quantized(F.col("embedding")).alias("ce"))
    sample = _ivf_centroids(quant)
    refined = ivf_refine_centroids(emb, iters=1)
    assert refined.count() <= IVF_NLIST
    dim = len(refined.select("cvec").first()["cvec"])
    assert dim == len(quant.select("ce").first()["ce"])
    # Lloyd step never increases the k-means objective (integer rounding
    # can only perturb it negligibly relative to the measured gap)
    assert _assignment_cost(quant, refined) <= _assignment_cost(quant, sample)


# --- SQ8 scalar quantization -------------------------------------------------

from rify_spark.ops.similarity import (  # noqa: E402
    SQ8_LEVELS,
    emb_sq8_codes,
    knn_sq8_recall,
)


def test_sq8_codes_bounded_and_complete(spark, emb):
    codes = emb_sq8_codes(emb)
    n = emb.count()
    assert codes.count() == n * 64  # one code per (vector, dim)
    lo, hi = codes.agg(F.min("code"), F.max("code")).first()
    assert -SQ8_LEVELS <= lo and hi <= SQ8_LEVELS
    # the per-dimension max magnitude saturates the code range exactly
    assert (
        codes.groupBy("dim")
        .agg(F.max(F.abs(F.col("code"))).alias("mx"))
        .filter(F.col("mx") != SQ8_LEVELS)
        .count()
        == 0
    )


def test_sq8_sign_and_zero_dimension(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, -2.0] + [0.0] * 61),
            (1, [-1.0, 0.0, 2.0] + [0.0] * 61),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.vec_id, r.dim): r.code
        for r in emb_sq8_codes(emb).filter(F.col("dim") < 3).collect()
    }
    # symmetric: opposite inputs -> opposite codes; all-zero dim -> 0
    assert got[(0, 0)] == SQ8_LEVELS and got[(1, 0)] == -SQ8_LEVELS
    assert got[(0, 1)] == 0 and got[(1, 1)] == 0
    assert got[(0, 2)] == -SQ8_LEVELS and got[(1, 2)] == SQ8_LEVELS
    # half-magnitude codes to floor(|xq|*127/m)
    emb2 = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 63), (1, [0.5] + [0.0] * 63)],
        "vec_id long, embedding array<float>",
    )
    got2 = {
        (r.vec_id, r.dim): r.code
        for r in emb_sq8_codes(emb2).filter(F.col("dim") == 0).collect()
    }
    assert got2[(0, 0)] == SQ8_LEVELS
    assert got2[(1, 0)] == (500 * SQ8_LEVELS) // 1000


def test_sq8_recall_summary_well_formed(spark, emb):
    r = knn_sq8_recall(emb, n_queries=5, k=5).first()
    assert r.n_expected == 25
    assert 0 <= r.n_hits <= 25
    assert abs(r.recall - r.n_hits / 25) < 1e-12
    # int8 keeps most of the ranking on this corpus
    assert r.recall >= 0.6


def test_sq8_refined_recall_not_worse_and_exact_when_cands_cover(spark, emb):
    from rify_spark.ops.similarity import knn_sq8_refined_recall

    r = knn_sq8_refined_recall(emb, n_queries=5, k=5, refine=3).first()
    assert r.n_expected == 25
    assert r.not_worse
    assert r.n_hits_refined >= r.n_hits_sq8
    # a candidate budget >= corpus size makes the refine a full exact
    # re-rank: recall must be exactly 1
    n = emb.count()
    full = knn_sq8_refined_recall(
        emb, n_queries=3, k=5, refine=(n // 5) + 1
    ).first()
    assert full.recall_refined == 1.0
