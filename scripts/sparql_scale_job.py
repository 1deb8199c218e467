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

    store = spark.read.parquet(STORE_PATH)
    n_quads = store.count()  # also primes the file-listing cache

    out = {"cpus": CPUS, "quads": n_quads, "queries": {}}
    total = 0.0
    for name, q in QUERIES.items():
        t0 = time.time()
        rows = sparql_select(store, q).count()
        wall = time.time() - t0
        total += wall
        out["queries"][name] = {"wall_s": round(wall, 2), "rows": rows}
    out["total_wall_s"] = round(total, 2)
    out["quads_per_sec"] = round(len(QUERIES) * n_quads / total, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
