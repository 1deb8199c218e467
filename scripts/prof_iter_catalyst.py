"""Decompose the pipeline fixpoint's per-iteration driver floor: how much
of each iteration's wall is Catalyst compile (analysis + optimization +
physical planning, driver-serial, core-count-invariant) vs everything else
(scheduling + execution)?

This answers whether VERDICT r4 ask #5's "cache each rule's bindings join
as a compiled plan" lever has headroom: if catalyst_s is a small slice of
the per-iteration wall, plan caching cannot buy the 0.521 -> 0.6 pipeline
efficiency and the result is documented as negative with numbers.

Run once per core count (RIFY_SCALING_CPUS); compare catalyst_s across
core counts — a serial floor shows up as the same absolute seconds on
both.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["RIFY_PROF_CATALYST"] = "1"

CPUS = int(os.environ.get("RIFY_SCALING_CPUS", "8"))
CORPUS_PATH = os.environ.get(
    "RIFY_SCALING_CORPUS", "/tmp/rify_scaling_corpus_10000x10"
)


def main() -> None:
    from rify_spark.pipeline import run_pipeline
    from rify_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name=f"prof-catalyst-{CPUS}",
        shuffle_partitions=2 * CPUS,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.time()
    res = run_pipeline(spark, spark.read.parquet(CORPUS_PATH))
    n = res.derived.count()
    wall = time.time() - t0
    iters = [
        {
            "iteration": m.get("iteration"),
            "wall_s": m.get("wall_s"),
            "catalyst_s": m.get("catalyst_s"),
            "delta_rows": m.get("delta_rows"),
        }
        for m in res.metrics.get("iteration_metrics", [])
    ]
    cat = sum(i["catalyst_s"] or 0 for i in iters)
    walls = sum(i["wall_s"] or 0 for i in iters)
    print(
        json.dumps(
            {
                "cpus": CPUS,
                "corpus": CORPUS_PATH,
                "derived_rows": n,
                "pipeline_wall_s": round(wall, 2),
                "stage_walls": res.metrics.get("stage_walls", {}),
                "iters": iters,
                "catalyst_total_s": round(cat, 2),
                "iter_wall_total_s": round(walls, 2),
                "catalyst_share_of_iters": round(cat / walls, 3) if walls else None,
            }
        )
    )


if __name__ == "__main__":
    main()
