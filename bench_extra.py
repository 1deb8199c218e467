"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file exists so optimization work can isolate queries without touching it).

Runs the same headline queries as bench.py in ONE warm session, each
repeated N times through the noop sink, and can dump .explain("formatted")
per query. Usage:

    python bench_extra.py [query ...] [--repeats N] [--explain DIR]
                          [--fixpoint-metrics]

With no query names, runs all ten. Prints one JSON line with per-query
[samples] and min/median.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_REPOS = int(os.environ.get("RIFY_BENCH_KG_REPOS", "150"))
KG_MODULES = int(os.environ.get("RIFY_BENCH_KG_MODULES", "8"))


def _force(df) -> int:
    df = df.persist()
    df.write.mode("overwrite").format("noop").save()
    n = df.count()
    df.unpersist()
    return n


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    explain_dir = None
    want_fx_metrics = False
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif args[i] == "--fixpoint-metrics":
            want_fx_metrics = True; i += 1
        else:
            names.append(args[i]); i += 1

    from rify_spark.ops import dedup, quads, similarity, text
    from rify_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="rify-spark-bench-extra",
        shuffle_partitions=max(8, 2 * CPUS),
    )
    entrymod._ship(spark)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    import tempfile

    corpus_path = os.path.join(
        tempfile.gettempdir(), f"rify_bench_corpus_{KG_REPOS}x{KG_MODULES}"
    )
    if not os.path.exists(corpus_path):
        from rify_spark.extract import code_files_df_distributed

        code_files_df_distributed(
            spark, n_repos=KG_REPOS, n_modules=KG_MODULES, partitions=2 * CPUS
        ).write.mode("overwrite").parquet(corpus_path)

    fx_metrics: dict = {}

    def ancestry(s, d):
        res = quads.ancestry_closure(s, d)
        return res

    def kg_pipeline(s, d):
        from rify_spark.pipeline import run_pipeline

        res = run_pipeline(s, s.read.parquet(corpus_path))
        if want_fx_metrics:
            fx_metrics["kg_pipeline"] = {
                "stage_walls": res.metrics.get("stage_walls", {}),
                "iterations": res.metrics.get("fixpoint_iterations"),
                "iteration_metrics": res.metrics.get("iteration_metrics"),
            }
        return res.derived

    def _sparql_agg(s, d):
        from rify_spark.sparql import sparql_agg_count_gate

        return sparql_agg_count_gate(s, d)

    headline = {
        "ancestry_fixpoint": ancestry,
        "kg_pipeline": kg_pipeline,
        "conjunctive_match": quads.conjunctive_match,
        "dedup_minhash": lambda s, d: dedup.minhash_signatures(docs),
        "dedup_lsh_pairs": lambda s, d: dedup.lsh_candidate_pairs(docs),
        "dedup_clusters": lambda s, d: dedup.neardup_clusters(docs),
        "text_quality": lambda s, d: text.quality_score(docs),
        "sparql_agg": _sparql_agg,
        "knn_bruteforce": lambda s, d: similarity.knn_bruteforce(emb),
        "knn_lsh": lambda s, d: similarity.knn_lsh(emb),
    }
    if not names:
        names = list(headline)

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        for name in names:
            df = headline[name](spark, SF_DIR)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    def _steal() -> int:
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except Exception:
            return 0

    out: dict = {"sf": SF_DIR, "cpus": CPUS, "repeats": repeats, "queries": {}}
    s0, w0 = _steal(), time.time()
    for name in names:
        samples = []
        rows = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            rows = _force(headline[name](spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        ss = sorted(samples)
        out["queries"][name] = {
            "samples": samples,
            "min": ss[0],
            "median": ss[len(ss) // 2],
            "rows": rows,
        }
    out["steal_cpu_fraction"] = round(
        (_steal() - s0) / 100.0 / max(time.time() - w0, 1e-9) / CPUS, 4
    )
    if fx_metrics:
        out["fixpoint_metrics"] = fx_metrics
    print(json.dumps(out))


if __name__ == "__main__":
    main()
