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
