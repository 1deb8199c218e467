"""Graph materialization: canonical quads -> vertex/edge tables.

The north rule's final pipeline stage ("graph materialize"): after
extraction, linking, canonicalization and inference, the quad store is
published as a property-graph-shaped pair of tables — an edge table and a
vertex table with degree statistics — for downstream consumers. No
reference analog (rify returns quad lists; its claim graph lives only in
RAM, src/reasoner.rs:87-95).

Spark-first and 100-TB-shaped:
  * the edge table is a pure projection (no shuffle, column-pruned);
  * vertex degrees use ONE shuffle: s- and o-occurrences are unioned as
    (node, out, in) indicator rows and summed in a single groupBy — not a
    groupBy-per-side + outer join (two shuffles + a join);
  * everything is whole-stage-codegen JVM expressions, partitioned by the
    (graph, node) composite key, so a hot node in one graph does not own a
    partition globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_table(quads: DataFrame) -> DataFrame:
    """Quads as a property-graph edge table (src, rel, dst, graph)."""
    return quads.select(
        F.col("s").alias("src"),
        F.col("p").alias("rel"),
        F.col("o").alias("dst"),
        F.col("g").alias("graph"),
    )


def vertices_table(quads: DataFrame) -> DataFrame:
    """Per (graph, node) vertex table with degree statistics.

    out_degree counts quads where the node is subject, in_degree where it
    is object; both in one shuffle via indicator-row union + sum.
    """
    occ = quads.select(
        F.col("g").alias("graph"),
        F.col("s").alias("node"),
        F.lit(1).alias("__out"),
        F.lit(0).alias("__in"),
    ).unionByName(
        quads.select(
            F.col("g").alias("graph"),
            F.col("o").alias("node"),
            F.lit(0).alias("__out"),
            F.lit(1).alias("__in"),
        )
    )
    return occ.groupBy("graph", "node").agg(
        F.sum("__out").alias("out_degree"),
        F.sum("__in").alias("in_degree"),
    )


def materialize_graph(quads: DataFrame) -> tuple:
    """(vertices, edges) of the quad store — the publishable KG shape."""
    return vertices_table(quads), edges_table(quads)


# --- driver-gate query + DuckDB oracle --------------------------------------

def graph_vertices(spark, sf_dir: str) -> DataFrame:
    """Gate query: vertex/degree table of the customer-key tree graph."""
    from .quads import tree_edges

    return vertices_table(tree_edges(spark, sf_dir))


def graph_vertices_sql() -> str:
    from .quads import TREE_G

    # sums are CAST to BIGINT: DuckDB types sum(INTEGER) as HUGEINT, and
    # the driver's value hash is dtype-sensitive
    return f"""
      WITH e AS (
        SELECT 'node:' || c_custkey AS s, 'node:' || (c_custkey // 2) AS o
        FROM customer WHERE c_custkey >= 1
      ),
      occ AS (
        SELECT s AS node, 1 AS o_, 0 AS i_ FROM e
        UNION ALL
        SELECT o AS node, 0 AS o_, 1 AS i_ FROM e
      )
      SELECT '{TREE_G}' AS graph, node,
             CAST(sum(o_) AS BIGINT) AS out_degree,
             CAST(sum(i_) AS BIGINT) AS in_degree
      FROM occ GROUP BY node
    """
