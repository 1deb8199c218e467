"""Similarity search over the embeddings table.

Brute-force exact top-k (integer-quantized dot product, so the DuckDB
oracle matches bit-for-bit) plus a sign-random-projection LSH variant —
the scale path: bucket by projection signs first, rerank only within
buckets, so the candidate set is O(bucket size) not O(n).

Float dot products are deliberately avoided in oracle-checked results:
cross-engine float summation order is unspecifiable, integer math is exact.
A cosine convenience wrapper is provided for API users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .params import EMB_DIM, HYPERPLANES, KNN_K, KNN_N_QUERIES, KNN_QUANT


def _quantized(col):
    """float32 embedding -> int64 vector (round(x * KNN_QUANT))."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * KNN_QUANT).cast("long")
    )


def _int_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def knn_bruteforce(emb: DataFrame, n_queries: int = KNN_N_QUERIES, k: int = KNN_K) -> DataFrame:
    """Exact top-k neighbors (by quantized dot product) for the first
    ``n_queries`` vectors. Broadcast the tiny query side; the corpus side
    streams — one pass, no shuffle except the final per-query top-k."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), _quantized(F.col("embedding")).alias("qe")
    )
    corpus = emb.select("vec_id", _quantized(F.col("embedding")).alias("ce"))
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        _int_dot(F.col("ce"), F.col("qe")).alias("dot"),
    ).filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot", F.col("rank").cast("long").alias("rank"))
    )


def knn_bruteforce_sql(n_queries: int = KNN_N_QUERIES, k: int = KNN_K) -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(round(x::DOUBLE * {KNN_QUANT}) AS BIGINT)) AS qe
      FROM embeddings WHERE vec_id < {n_queries}
    ),
    c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(x::DOUBLE * {KNN_QUANT}) AS BIGINT)) AS ce
      FROM embeddings
    ),
    scored AS (
      SELECT q.query_id, c.vec_id,
             list_sum(list_transform(range(1, {EMB_DIM} + 1), i -> ce[i] * qe[i])) AS dot
      FROM c, q WHERE q.query_id != c.vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, dot,
             row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, CAST(dot AS BIGINT) AS dot, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _bucket_expr(vec_col):
    """Sign-random-projection bucket id: one bit per hyperplane."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(HYPERPLANES):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(v).cast("long") for v in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def knn_lsh_buckets(emb: DataFrame) -> DataFrame:
    """Assign each vector its sign-projection bucket (the ANN index)."""
    return emb.select(
        "vec_id", _bucket_expr(_quantized(F.col("embedding"))).alias("bucket")
    )


def knn_lsh_buckets_sql() -> str:
    cases = []
    for b, plane in enumerate(HYPERPLANES):
        terms = " + ".join(
            f"({v}) * qe[{d + 1}]" for d, v in enumerate(plane)
        )
        cases.append(f"CASE WHEN ({terms}) > 0 THEN {1 << b} ELSE 0 END")
    bucket = " + ".join(cases)
    return f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(x::DOUBLE * {KNN_QUANT}) AS BIGINT)) AS qe
      FROM embeddings
    )
    SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM c
    """


def knn_lsh(emb: DataFrame, n_queries: int = KNN_N_QUERIES, k: int = KNN_K) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket, exact rerank
    inside the bucket. At corpus scale the bucket join replaces the cross
    join — candidates per query ≈ n / 2^bits."""
    buckets = knn_lsh_buckets(emb)
    withb = emb.join(buckets, "vec_id").select(
        "vec_id", "bucket", _quantized(F.col("embedding")).alias("ce")
    )
    q = withb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("qbucket"),
        F.col("ce").alias("qe"),
    )
    cand = withb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id", "vec_id", _int_dot(F.col("ce"), F.col("qe")).alias("dot")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot", F.col("rank").cast("long").alias("rank"))
    )


def knn_lsh_sql(n_queries: int = KNN_N_QUERIES, k: int = KNN_K) -> str:
    return f"""
    WITH b AS ({knn_lsh_buckets_sql()}),
    c AS (
      SELECT e.vec_id, b.bucket,
             list_transform(e.embedding, x -> CAST(round(x::DOUBLE * {KNN_QUANT}) AS BIGINT)) AS ce
      FROM embeddings e JOIN b ON e.vec_id = b.vec_id
    ),
    q AS (
      SELECT vec_id AS query_id, bucket AS qbucket, ce AS qe FROM c WHERE vec_id < {n_queries}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id,
             list_sum(list_transform(range(1, {EMB_DIM} + 1), i -> ce[i] * qe[i])) AS dot
      FROM c JOIN q ON c.bucket = q.qbucket AND c.vec_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id, dot,
             row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, CAST(dot AS BIGINT) AS dot, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def cosine_topk(emb: DataFrame, n_queries: int = KNN_N_QUERIES, k: int = KNN_K) -> DataFrame:
    """Float cosine top-k for API users (not oracle-checked: float sum order
    is engine-specific)."""
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        "vec_id",
        (
            dot(F.col("embedding"), F.col("qe"))
            / (
                F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(dot(F.col("qe"), F.col("qe")))
            )
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
