"""Engine-operator queries over the driver's TPC-H-ish tables.

These express the fixpoint engine's constituent operators (SURVEY.md §2:
dictionary build/encode, dedup insert, membership, pattern scan, conjunctive
match, head projection, one semi-naive delta round, full closure) as
standalone queries over quads derived from orders/customer/nation — each
with a DuckDB oracle twin so the driver's correctness gate covers the
engine's building blocks one by one.

Quad derivations (deterministic projections of the driver tables):
  * fact graph: order placed_by customer, customer in_nation nation,
    nation in_region region — all in graph://tpch;
  * parent tree: customer k -> parent k//2 (k >= 1) in graph://tree — a
    binary tree whose ancestor closure is the flagship fixpoint query
    (DuckDB oracle: WITH RECURSIVE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

G = "graph://tpch"
TREE_G = "graph://tree"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tpch_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("order:"), F.col("o_orderkey")).alias("s"),
        F.lit("placed_by").alias("p"),
        F.concat(F.lit("cust:"), F.col("o_custkey")).alias("o"),
        F.lit(G).alias("g"),
    )
    customer = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("cust:"), F.col("c_custkey")).alias("s"),
        F.lit("in_nation").alias("p"),
        F.concat(F.lit("nation:"), F.col("c_nationkey")).alias("o"),
        F.lit(G).alias("g"),
    )
    nation = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("s"),
        F.lit("in_region").alias("p"),
        F.concat(F.lit("region:"), F.col("n_regionkey")).alias("o"),
        F.lit(G).alias("g"),
    )
    return orders.unionByName(customer).unionByName(nation)


TPCH_QUADS_SQL = f"""
  SELECT 'order:' || o_orderkey AS s, 'placed_by' AS p,
         'cust:' || o_custkey AS o, '{G}' AS g FROM orders
  UNION ALL
  SELECT 'cust:' || c_custkey, 'in_nation',
         'nation:' || c_nationkey, '{G}' FROM customer
  UNION ALL
  SELECT 'nation:' || n_nationkey, 'in_region',
         'region:' || n_regionkey, '{G}' FROM nation
"""


def tree_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer-key binary tree: node k -> parent k//2, k >= 1."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= 1)
        .select(
            F.concat(F.lit("node:"), F.col("c_custkey")).alias("s"),
            F.lit("parent").alias("p"),
            F.concat(F.lit("node:"), F.floor(F.col("c_custkey") / 2).cast("long")).alias("o"),
            F.lit(TREE_G).alias("g"),
        )
    )


TREE_EDGES_SQL = f"""
  SELECT 'node:' || c_custkey AS s, 'parent' AS p,
         'node:' || (c_custkey // 2) AS o, '{TREE_G}' AS g
  FROM customer WHERE c_custkey >= 1
"""


# --- O1: dictionary build (dense rank ids for cross-engine determinism) ----

def dict_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    quads = tpch_quads(spark, sf_dir)
    terms = quads.select(
        F.explode(F.array("s", "p", "o", "g")).alias("term")
    ).distinct()
    return terms.select(
        "term",
        F.row_number().over(Window.orderBy("term")).cast("long").alias("id"),
    )


DICT_BUILD_SQL = f"""
  WITH quads AS ({TPCH_QUADS_SQL}),
  terms AS (
    SELECT DISTINCT term FROM (
      SELECT s AS term FROM quads UNION
      SELECT p FROM quads UNION
      SELECT o FROM quads UNION
      SELECT g FROM quads
    )
  )
  SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS id FROM terms
"""


# --- O2: encode quads through the dictionary -------------------------------

def encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    quads = tpch_quads(spark, sf_dir)
    d = dict_build(spark, sf_dir)
    out = quads
    for c in ("s", "p", "o", "g"):
        dc = d.select(F.col("term").alias(f"__t_{c}"), F.col("id").alias(f"{c}_id"))
        out = out.join(dc, out[c] == dc[f"__t_{c}"], "inner")
    return out.select("s_id", "p_id", "o_id", "g_id")


ENCODE_SQL = f"""
  WITH quads AS ({TPCH_QUADS_SQL}),
  d AS ({DICT_BUILD_SQL})
  SELECT ds.id AS s_id, dp.id AS p_id, do_.id AS o_id, dg.id AS g_id
  FROM quads
  JOIN d ds ON quads.s = ds.term
  JOIN d dp ON quads.p = dp.term
  JOIN d do_ ON quads.o = do_.term
  JOIN d dg ON quads.g = dg.term
"""


# --- O3: decode (encode -> dictionary-join decode roundtrip) ---------------

def decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-encode the quad store then decode it back through the
    materialized dictionary — O2+O3 as one verifiable roundtrip (the oracle
    is simply the original quads: decode(encode(x)) == x)."""
    from .. import dictionary as D

    quads = tpch_quads(spark, sf_dir)
    enc = D.encode_quads(quads)
    d = D.build_dict(spark, quads)
    return D.decode_quads(enc, d)


DECODE_ROUNDTRIP_SQL = TPCH_QUADS_SQL


# --- O4: insert with dedup -------------------------------------------------

def insert_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    quads = tpch_quads(spark, sf_dir)
    return quads.unionByName(quads).dropDuplicates(["s", "p", "o", "g"])


INSERT_DEDUP_SQL = f"""
  SELECT DISTINCT s, p, o, g FROM (
    {TPCH_QUADS_SQL}
    UNION ALL
    {TPCH_QUADS_SQL}
  )
"""


# --- O5: membership (semi-join) --------------------------------------------

def membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which candidate quads (cust:k in_nation nation:k%25) are actually in
    the store? Exactly the left_semi membership test of the engine."""
    quads = tpch_quads(spark, sf_dir)
    cand = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select(
            F.concat(F.lit("cust:"), F.col("c_custkey")).alias("s"),
            F.lit("in_nation").alias("p"),
            F.concat(F.lit("nation:"), (F.col("c_custkey") % 25)).alias("o"),
            F.lit(G).alias("g"),
        )
    )
    return cand.join(quads, ["s", "p", "o", "g"], "left_semi")


MEMBERSHIP_SQL = f"""
  WITH quads AS ({TPCH_QUADS_SQL}),
  cand AS (
    SELECT 'cust:' || c_custkey AS s, 'in_nation' AS p,
           'nation:' || (c_custkey % 25) AS o, '{G}' AS g
    FROM customer WHERE c_custkey < 200
  )
  SELECT s, p, o, g FROM cand
  WHERE EXISTS (
    SELECT 1 FROM quads q
    WHERE q.s = cand.s AND q.p = cand.p AND q.o = cand.o AND q.g = cand.g
  )
"""


# --- O6: pattern scan (constant-bound slots) -------------------------------

def pattern_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_quads(spark, sf_dir).filter(
        (F.col("p") == "in_nation") & (F.col("o") == "nation:3")
    )


PATTERN_SCAN_SQL = f"""
  SELECT * FROM ({TPCH_QUADS_SQL})
  WHERE p = 'in_nation' AND o = 'nation:3'
"""


# --- O7: conjunctive match (two-atom rule body) ----------------------------

def conjunctive_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bindings of (?ord placed_by ?c ?g) ∧ (?c in_nation ?n ?g)."""
    quads = tpch_quads(spark, sf_dir)
    a1 = quads.filter(F.col("p") == "placed_by").select(
        F.col("s").alias("v_ord"), F.col("o").alias("v_c"), F.col("g").alias("v_g")
    )
    a2 = quads.filter(F.col("p") == "in_nation").select(
        F.col("s").alias("v_c"), F.col("o").alias("v_n"), F.col("g").alias("v_g")
    )
    return a1.join(a2, ["v_c", "v_g"], "inner").select("v_ord", "v_c", "v_n", "v_g")


CONJUNCTIVE_MATCH_SQL = f"""
  WITH quads AS ({TPCH_QUADS_SQL})
  SELECT a1.s AS v_ord, a1.o AS v_c, a2.o AS v_n, a1.g AS v_g
  FROM quads a1 JOIN quads a2
    ON a1.o = a2.s AND a1.g = a2.g
  WHERE a1.p = 'placed_by' AND a2.p = 'in_nation'
"""


# --- O10: head projection --------------------------------------------------

def head_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project head (?n has_customer ?c ?g) from O7's bindings, deduped."""
    b = conjunctive_match(spark, sf_dir)
    return b.select(
        F.col("v_n").alias("s"),
        F.lit("has_customer").alias("p"),
        F.col("v_c").alias("o"),
        F.col("v_g").alias("g"),
    ).dropDuplicates(["s", "p", "o", "g"])


HEAD_PROJECTION_SQL = f"""
  SELECT DISTINCT v_n AS s, 'has_customer' AS p, v_c AS o, v_g AS g
  FROM ({CONJUNCTIVE_MATCH_SQL})
"""


# --- O9: one semi-naive delta round ----------------------------------------

def delta_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 2 of the transitive closure: with facts = delta = direct
    ancestor edges, derive (Δ ⋈ F) ∪ (F ⋈ Δ) minus known — one iteration of
    the engine's delta-restricted evaluation, as a standalone query."""
    anc = tree_edges(spark, sf_dir).select(
        "s", F.lit("ancestor").alias("p"), "o", "g"
    )
    l = anc.select(F.col("s").alias("a"), F.col("o").alias("b"), "g")
    r = anc.select(F.col("s").alias("b"), F.col("o").alias("c"), "g")
    derived = (
        l.join(r, ["b", "g"], "inner")
        .select(
            F.col("a").alias("s"),
            F.lit("ancestor").alias("p"),
            F.col("c").alias("o"),
            "g",
        )
        .dropDuplicates(["s", "p", "o", "g"])
    )
    return derived.join(anc, ["s", "p", "o", "g"], "left_anti")


DELTA_ROUND_SQL = f"""
  WITH anc AS (
    SELECT s, 'ancestor' AS p, o, g FROM ({TREE_EDGES_SQL})
  ),
  derived AS (
    SELECT DISTINCT l.s, 'ancestor' AS p, r.o, l.g
    FROM anc l JOIN anc r ON l.o = r.s AND l.g = r.g
  )
  SELECT d.s, d.p, d.o, d.g FROM derived d
  WHERE NOT EXISTS (
    SELECT 1 FROM anc a
    WHERE a.s = d.s AND a.p = d.p AND a.o = d.o AND a.g = d.g
  )
"""


# --- O11: full fixpoint (flagship) -----------------------------------------

ANCESTRY_CLOSURE_SQL = f"""
  WITH RECURSIVE edge AS (
    SELECT c_custkey AS child, c_custkey // 2 AS par
    FROM customer WHERE c_custkey >= 1
  ),
  anc AS (
    SELECT child, par AS anc FROM edge
    UNION
    SELECT a.child, e.par AS anc
    FROM anc a JOIN edge e ON a.anc = e.child
  )
  SELECT 'node:' || child AS s, 'ancestor' AS p, 'node:' || anc AS o,
         '{TREE_G}' AS g
  FROM anc
"""


def ancestry_closure(spark: SparkSession, sf_dir: str, config=None) -> DataFrame:
    """The real engine: parent quads -> infer_df with the two ancestry rules
    (the reference's own benchmark shape, benches/src/lib.rs:18-45) ->
    derived ancestor quads. Oracle: DuckDB WITH RECURSIVE."""
    from ..api import infer_df
    from ..infer import InferConfig
    from ..rules import Bound as B, Rule, Unbound as U

    edges = tree_edges(spark, sf_dir)
    rules = [
        Rule.create(
            [[U("a"), B("parent"), U("b"), U("g")]],
            [[U("a"), B("ancestor"), U("b"), U("g")]],
        ),
        Rule.create(
            [
                [U("a"), B("ancestor"), U("b"), U("g")],
                [U("b"), B("ancestor"), U("c"), U("g")],
            ],
            [[U("a"), B("ancestor"), U("c"), U("g")]],
        ),
    ]
    derived, _ = infer_df(spark, edges, rules, config or InferConfig())
    return derived
