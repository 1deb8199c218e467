"""Round-6 profiling: per-iteration walls for the two fixpoint headline
queries (ancestry smart-TC, kg_pipeline generic loop) at the bench scale.

    python scripts/prof_r6.py ancestry|pipeline
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "ancestry"
    from rify_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="prof-r6",
        shuffle_partitions=max(8, 2 * CPUS),
    )
    entrymod._ship(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if which == "ancestry":
        from rify_spark.api import infer_df
        from rify_spark.infer import InferConfig
        from rify_spark.ops.quads import tree_edges
        from rify_spark.rules import Bound as B, Rule, Unbound as U

        edges = tree_edges(spark, SF_DIR)
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
        for rep in range(2):
            t0 = time.time()
            derived, fx = infer_df(spark, edges, rules, InferConfig())
            derived = derived.persist()
            derived.write.mode("overwrite").format("noop").save()
            n = derived.count()
            derived.unpersist()
            wall = round(time.time() - t0, 3)
            print(json.dumps({
                "rep": rep, "wall_s": wall, "rows": n,
                "iterations": fx.iterations,
                "metrics": fx.metrics,
            }))
    elif which == "pipeline":
        from rify_spark.pipeline import run_pipeline

        import tempfile
        corpus_path = os.path.join(tempfile.gettempdir(), "rify_bench_corpus_150x8")
        if not os.path.exists(corpus_path):
            from rify_spark.extract import code_files_df_distributed
            code_files_df_distributed(
                spark, n_repos=150, n_modules=8, partitions=2 * CPUS
            ).write.mode("overwrite").parquet(corpus_path)
        for rep in range(2):
            t0 = time.time()
            res = run_pipeline(
                spark, spark.read.parquet(corpus_path), time_stages=True
            )
            d = res.derived.persist()
            d.write.mode("overwrite").format("noop").save()
            n = d.count()
            d.unpersist()
            wall = round(time.time() - t0, 3)
            print(json.dumps({
                "rep": rep, "wall_s": wall, "rows": n,
                "stage_walls": res.metrics.get("stage_walls"),
                "iterations": res.metrics.get("fixpoint_iterations"),
                "iteration_metrics": res.metrics.get("iteration_metrics"),
                "stage_checkpoints": res.metrics.get("stage_checkpoints"),
            }))


if __name__ == "__main__":
    main()
