"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Execution is forced through the noop sink (not .count()) so column pruning
cannot skip the measured compute. The fixpoint queries also report
triples-derived/sec — the BASELINE.json throughput metric.
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
# KG corpus scale for the pipeline benchmark (files = repos * modules)
KG_REPOS = int(os.environ.get("RIFY_BENCH_KG_REPOS", "150"))
KG_MODULES = int(os.environ.get("RIFY_BENCH_KG_MODULES", "8"))


def _force(df) -> int:
    """Fully execute a DataFrame (noop sink defeats pruning); return rows."""
    df = df.persist()
    df.write.mode("overwrite").format("noop").save()
    n = df.count()
    df.unpersist()
    return n


def main() -> None:
    from rify_spark.ops import dedup, quads, similarity, text
    from rify_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="rify-spark-bench",
        shuffle_partitions=max(8, 2 * CPUS),
    )
    entrymod._ship(spark)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # setup (untimed): materialize the synthetic corpus as parquet — the
    # pipeline's contract is a stored table (Iceberg-style), not a generator
    # UDF; fusing generation into the extraction stage both distorts timing
    # and chains two pandas UDFs into one pathological stage.
    import tempfile

    corpus_path = os.path.join(
        tempfile.gettempdir(), f"rify_bench_corpus_{KG_REPOS}x{KG_MODULES}"
    )
    if not os.path.exists(corpus_path):
        from rify_spark.extract import code_files_df_distributed

        code_files_df_distributed(
            spark, n_repos=KG_REPOS, n_modules=KG_MODULES, partitions=2 * CPUS
        ).write.mode("overwrite").parquet(corpus_path)

    def _sparql_agg(s, d):
        from rify_spark.sparql import sparql_agg_count_gate

        return sparql_agg_count_gate(s, d)

    kg_stage_walls: dict = {}

    def kg_pipeline(s, d):
        from rify_spark.pipeline import run_pipeline

        res = run_pipeline(s, s.read.parquet(corpus_path))
        # stage walls ride into the bench JSON so a pipeline regression is
        # attributed to extract / link+CC / fixpoint without a rerun
        kg_stage_walls.update(res.metrics.get("stage_walls", {}))
        return res.derived

    headline = {
        "ancestry_fixpoint": lambda s, d: quads.ancestry_closure(s, d),
        "kg_pipeline": kg_pipeline,
        "conjunctive_match": quads.conjunctive_match,
        "dedup_minhash": lambda s, d: dedup.minhash_signatures(docs),
        "dedup_lsh_pairs": lambda s, d: dedup.lsh_candidate_pairs(docs),
        # added round 5 (not in the round-1 baseline table): LSH -> CC
        # clustering — totals before/after r5 differ by this query's wall
        "dedup_clusters": lambda s, d: dedup.neardup_clusters(docs),
        "text_quality": lambda s, d: text.quality_score(docs),
        # added round 5: the SPARQL layer's aggregate gate (join + grouped
        # COUNT/COUNT DISTINCT over the TPC-H quad view) — not in the
        # round-1 baseline table
        "sparql_agg": _sparql_agg,
        "knn_bruteforce": lambda s, d: similarity.knn_bruteforce(emb),
        "knn_lsh": lambda s, d: similarity.knn_lsh(emb),
    }

    # JVM/codegen warmup on a trivial job so q1 isn't charged for startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _steal_jiffies() -> int:
        # /proc/stat cpu field 8: jiffies this VM was runnable but the
        # hypervisor ran a neighbor — the window-quality signal (walls on
        # this box have varied 3-4x between quiet and stolen windows)
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except Exception:
            return 0

    times: dict = {}
    rows: dict = {}
    steal0, wall0 = _steal_jiffies(), time.time()
    for name, fn in headline.items():
        t0 = time.time()
        rows[name] = _force(fn(spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)
    steal = _steal_jiffies() - steal0
    steal_per_cpu_s = steal / 100.0 / max(time.time() - wall0, 1e-9) / CPUS

    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "rows": rows,
        "fixpoint_triples_per_sec": round(
            rows["ancestry_fixpoint"] / times["ancestry_fixpoint"], 1
        ),
        "kg_pipeline_triples_per_sec": round(
            rows["kg_pipeline"] / times["kg_pipeline"], 1
        ),
        "kg_pipeline_stage_walls": kg_stage_walls,
        "steal_jiffies_during_run": steal,
        "steal_cpu_fraction": round(steal_per_cpu_s, 4),
    }
    # two-parallelism scaling evidence (the north rule's N vs 4N criterion,
    # measured by scripts/scaling.py into SCALING.json) rides along so each
    # round's BENCH_r{N}.json is self-contained
    keys = (
        "tree_nodes",
        "cpus_lo",
        "cpus_hi",
        "best_lo_fixpoint_tps",
        "best_hi_fixpoint_tps",
        "fixpoint_scaling_efficiency",
        "pipeline_scaling_efficiency",
        "control_scaling_efficiency",
    )
    weak_keys = (
        "tree_lo",
        "tree_hi",
        "cpus_lo",
        "cpus_hi",
        "best_percore_lo_tps",
        "best_percore_hi_tps",
        "weak_scaling_efficiency",
        "control_scaling_efficiency",
    )
    pipe_keys = keys + ("corpus_files", "best_lo_pipeline_tps", "best_hi_pipeline_tps")
    tail_keys = (
        "rows_per_core",
        "cpus_lo",
        "cpus_hi",
        "best_percore_lo_rps",
        "best_percore_hi_rps",
        "weak_scaling_efficiency",
    )
    retract_keys = (
        "tree_n",
        "cpus_lo",
        "cpus_hi",
        "best_lo_cone_rows_per_sec",
        "best_hi_cone_rows_per_sec",
        "retract_scaling_efficiency",
        "soak_scaling_efficiency",
    )
    for fname, field, ks in (
        # pre-smart-TC strong pair (generic loop; kept for the strategy A/B)
        ("SCALING.json", "scaling", keys),
        # current engine: the pure TC pair delegates to smart TC (tc.py) —
        # ~1.9x the absolute throughput at both core counts, 6 rounds vs 19
        ("SCALING_SMART_TC.json", "scaling_smart_tc", keys),
        ("SCALING_BIG.json", "scaling_big", keys),
        ("SCALING_WEAK.json", "scaling_weak", weak_keys),
        ("SCALING_WEAK_SMART.json", "scaling_weak_smart", weak_keys),
        ("SCALING_PIPE300K.json", "scaling_pipe300k", pipe_keys),
        ("SCALING_PIPE1M.json", "scaling_pipe1m", pipe_keys),
        ("TAIL_CONTROL.json", "tail_control", tail_keys),
        ("GRAPH_SCALING.json", "scaling_graph", (
            "nodes", "edges", "cpus_lo", "cpus_hi",
            "pagerank_scaling_efficiency", "triangles_scaling_efficiency",
            "nquads_parse_scaling_efficiency",
            "bfs_scaling_efficiency", "kcore_scaling_efficiency",
            "scan_control_scaling_efficiency",
            "shuffle_control_scaling_efficiency", "best_lo", "best_hi",
        )),
        ("BFS_AMORTIZE.json", "scaling_bfs_amortize", (
            "nodes", "cpus_lo", "cpus_hi", "best_lo_nodes_per_sec",
            "best_hi_nodes_per_sec", "scaling_efficiency",
            "efficiency_at_5m_nodes",
        )),
        ("RETRACT_SCALING_2M.json", "scaling_retract", retract_keys),
        ("RETRACT_CONTROL.json", "retract_control", ("store_rows", "cpus_lo", "cpus_hi", "control_scaling_efficiency")),
        # round 5: the SPARQL query layer's own two-parallelism pair with a
        # raw-DataFrame control twin (scripts/sparql_scale.py)
        ("SPARQL_SCALING.json", "scaling_sparql", (
            "entities", "quads", "cpu_lo", "cpu_hi",
            "best_quads_per_sec", "scaling_efficiency",
            "control_best_quads_per_sec", "control_scaling_efficiency",
        )),
    ):
        p = os.path.join(REPO, fname)
        if os.path.exists(p):
            with open(p) as f:
                sc = json.load(f)
            out[field] = {k: sc[k] for k in ks if k in sc}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
