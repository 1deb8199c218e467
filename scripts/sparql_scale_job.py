"""One SPARQL-scaling worker: the query layer at a given parallelism.

Runs three representative SPARQL SELECT shapes (join-chain, skewed
aggregate, OPTIONAL+filter) over a pre-materialized quad store on
local[$RIFY_SPARQL_CPUS] and prints one JSON line with walls, result
cardinalities (a cross-parallelism correctness check), and throughput
(input quads / total query wall).  Invoked at N and 4N cores by
scripts/sparql_scale.py on the SAME parquet input — the sandbox proxy
for the north rule's two-cluster-size criterion, applied to the round-5
SPARQL surface specifically (the fixpoint and pipeline already have
their own SCALING artifacts; this isolates the query compiler's plans:
two shuffle joins, one partial-aggregating groupBy, one left join).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("RIFY_SPARQL_CPUS", "8"))
STORE_PATH = os.environ.get("RIFY_SPARQL_STORE", "")

# each query names its dominant plan shape; results are counted (the
# driver-side action) and the counts must agree across parallelisms
QUERIES = {
    # two-hop join chain with a pushed constant-predicate filter: the
    # matcher's join-order heuristic + two shuffle hash joins
    "join2": """
      SELECT ?a ?c WHERE {
        ?a <knows> ?b . ?b <knows> ?c . ?c <in_group> <group:7>
      }
    """,
    # skewed aggregate (one hot group holds ~30% of members): one
    # partial-aggregating shuffle; map-side combine absorbs the hot key
    "agg": """
      SELECT ?g (COUNT(*) AS ?n) (COUNT(DISTINCT ?b) AS ?d) WHERE {
        ?a <in_group> ?g . ?a <knows> ?b
      } GROUP BY ?g HAVING (COUNT(*) > 5)
    """,
    # OPTIONAL left join + error-semantics filter over the maybe-bound var
    "optional": """
      SELECT ?a ?age WHERE {
        ?a <in_group> <group:hot>
        OPTIONAL { ?a <age> ?age }
        FILTER (!bound(?age) || ?age >= 40)
      }
    """,
}


def main() -> None:
    from rify_spark.session import get_spark
    from rify_spark.sparql import sparql_select

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name=f"rify-sparql-scaling-{CPUS}",
        shuffle_partitions=2 * CPUS,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    from pyspark.sql import functions as F

    store = spark.read.parquet(STORE_PATH)
    n_quads = store.count()  # primes the file-listing cache
    # warm the OS page cache over the DATA pages (count() alone is served
    # from row-group metadata after column pruning): a full four-column
    # scan, so neither measured side pays the cold read. Order fairness
    # on top: RIFY_SPARQL_CTL_FIRST flips which side runs first — the
    # parent alternates it per repeat.
    store.select(
        F.max("s"), F.max("p"), F.max("o"), F.max("g")
    ).collect()

    k = store.filter(F.col("p") == "knows").select("s", "o")
    grp = store.filter(F.col("p") == "in_group").select(
        F.col("s").alias("m"), F.col("o").alias("grp")
    )
    controls = {
        # selective-first join order (what a careful engineer writes by
        # hand — and what the matcher's heuristic picks on its own; the
        # big-join-first ordering was measured 4.6x slower)
        "join2": lambda: k.alias("l")
        .join(
            k.alias("r")
            .join(
                grp.filter(F.col("grp") == "group:7"),
                F.col("r.o") == F.col("m"),
            )
            .select(F.col("r.s").alias("mid")),
            F.col("l.o") == F.col("mid"),
        )
        .count(),
        "agg": lambda: grp.join(k, grp.m == k.s)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o").alias("d"),
        )
        .filter(F.col("n") > 5)
        .count(),
        "optional": lambda: grp.filter(F.col("grp") == "group:hot")
        .join(
            store.filter(F.col("p") == "age").select(
                F.col("s").alias("m"), F.col("o").alias("age")
            ),
            "m",
            "left",
        )
        .filter(
            F.col("age").isNull()
            | (F.col("age").cast("long") >= 40)
        )
        .count(),
    }
    out = {
        "cpus": CPUS,
        "quads": n_quads,
        "ctl_first": os.environ.get("RIFY_SPARQL_CTL_FIRST") == "1",
        "queries": {},
        "control": {},
    }

    def run_engine():
        total = 0.0
        for name, q in QUERIES.items():
            t0 = time.time()
            rows = sparql_select(store, q).count()
            wall = time.time() - t0
            total += wall
            out["queries"][name] = {"wall_s": round(wall, 2), "rows": rows}
        out["total_wall_s"] = round(total, 2)
        out["quads_per_sec"] = round(len(QUERIES) * n_quads / total, 1)

    def run_control():
        ctotal = 0.0
        for name, fn in controls.items():
            t0 = time.time()
            rows = fn()
            wall = time.time() - t0
            ctotal += wall
            out["control"][name] = {"wall_s": round(wall, 2), "rows": rows}
        out["control_total_wall_s"] = round(ctotal, 2)
        out["control_quads_per_sec"] = round(
            len(controls) * n_quads / ctotal, 1
        )

    if out["ctl_first"]:
        run_control()
        run_engine()
    else:
        run_engine()
        run_control()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
