"""One scaling-run worker: the full KG job at a given parallelism.

Runs (a) the KG-construction pipeline over a pre-materialized corpus and
(b) the ancestry-closure fixpoint over a large synthetic tree, on
local[$RIFY_SCALING_CPUS], and prints one JSON line with walls and
throughputs. Invoked twice (N and 4N cores) by scripts/scaling.py on the
SAME inputs — the sandbox proxy for a two-cluster-size run.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Under `spark-submit --py-files` (RIFY_SCALING_SUBMIT=1) the repo must NOT
# be importable: rify_spark and __spark_entry__ resolve from the shipped
# zip, and the output JSON records where the import actually landed.
SUBMIT = os.environ.get("RIFY_SCALING_SUBMIT") == "1"
if not SUBMIT:
    sys.path.insert(0, REPO)

CPUS = int(os.environ.get("RIFY_SCALING_CPUS", "32"))
CORPUS_PATH = os.environ.get("RIFY_SCALING_CORPUS", "")
TREE_N = int(os.environ.get("RIFY_SCALING_TREE_N", "1000000"))
# fixpoint-only mode: skip the KG pipeline (used for the supplementary
# large-tree measurement where only fixpoint scaling is under test)
SKIP_PIPELINE = os.environ.get("RIFY_SCALING_SKIP_PIPELINE") == "1"
# pipeline-only mode: skip the fixpoint + control (used for cheap extra
# interleaved pipeline reps when a measurement window is visibly stolen —
# a full pair costs ~90 s instead of ~8 min)
SKIP_FIXPOINT = os.environ.get("RIFY_SCALING_SKIP_FIXPOINT") == "1"


def main() -> None:
    from pyspark.sql import functions as F

    from rify_spark.pipeline import run_pipeline
    from rify_spark.rules import Bound as B, Rule, Unbound as U
    from rify_spark.api import infer_df
    from rify_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name=f"rify-scaling-{CPUS}",
        shuffle_partitions=2 * CPUS,
    )
    if not SUBMIT:
        # interpreter launch: ship the package to python workers ourselves;
        # under spark-submit the --py-files zip already rides every worker.
        entrymod._ship(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    # python-worker warmup (identical at both parallelisms): the first
    # Arrow-UDF stage pays ~2 s of worker fork + pandas import — JIT-class
    # startup cost, not pipeline throughput
    def _ident(it):
        for pdf in it:
            yield pdf

    spark.range(0, 1000, 1, 2 * CPUS).mapInPandas(_ident, "id long").count()

    import rify_spark

    out = {
        "cpus": CPUS,
        "launcher": "spark-submit" if SUBMIT else "python",
        # provenance: under --py-files this points INSIDE the zip
        "rify_spark_origin": rify_spark.__file__,
    }

    # (a) KG pipeline over the shared corpus
    if not SKIP_PIPELINE:
        t0 = time.time()
        res = run_pipeline(spark, spark.read.parquet(CORPUS_PATH))
        derived = res.derived.count()
        wall = time.time() - t0
        out["pipeline_wall_s"] = round(wall, 2)
        out["pipeline_derived"] = derived
        out["pipeline_triples_per_sec"] = round(derived / wall, 1)
        out["pipeline_stage_walls"] = res.metrics.get("stage_walls", {})

    if SKIP_FIXPOINT:
        print(json.dumps(out))
        return

    # (b) ancestry fixpoint over a synthetic k -> k//2 tree (same shape as
    # the reference's ancestry bench, scaled)
    edges = spark.range(1, TREE_N, 1, 2 * CPUS).select(
        F.concat(F.lit("node:"), F.col("id")).alias("s"),
        F.lit("parent").alias("p"),
        F.concat(F.lit("node:"), (F.col("id") / 2).cast("long")).alias("o"),
        F.lit("graph://tree").alias("g"),
    )
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
    t0 = time.time()
    derived_df, fx = infer_df(spark, edges, rules)
    n = derived_df.count()
    wall = time.time() - t0
    out["fixpoint_wall_s"] = round(wall, 2)
    out["fixpoint_derived"] = n
    out["fixpoint_iterations"] = fx.iterations
    out["fixpoint_triples_per_sec"] = round(n / wall, 1)
    # per-iteration walls: the gap between their sum and fixpoint_wall_s is
    # driver-serial time (plan compile, checkpoint bookkeeping) — the
    # Amdahl term that caps strong scaling
    out["fixpoint_iter_walls"] = [m.get("wall_s") for m in fx.metrics]
    out["fixpoint_iter_wall_sum"] = round(
        sum(m.get("wall_s", 0) for m in fx.metrics), 2
    )

    # (c) machine control LAST: a raw Spark shuffle (no engine code). Runs
    # after the workloads because its 100M-row shuffle measurably pollutes
    # the JVM for subsequent small-stage jobs. Its own 2->8 scaling here is
    # ~0.75 when quiet (and super-linear under the per-core-constant heap
    # proxy, since the low-core JVM is memory-tight) — read engine
    # efficiencies against it, not against 1.0.
    t0 = time.time()
    ctl = spark.range(0, 100_000_000, 1, 2 * CPUS).select(
        ((F.col("id") * 2654435761) % 20_000_000).alias("k")
    )
    ctl.groupBy("k").count().selectExpr("sum(count)", "count(*)").collect()
    out["control_shuffle_wall_s"] = round(time.time() - t0, 2)
    out["control_rows_per_sec"] = round(100_000_000 / out["control_shuffle_wall_s"], 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
