"""Two-parallelism scaling evidence for the graph-analytics and N-Quads
operators (sandbox proxy for the north rule's N vs 4N executors).

Workloads, all on a deterministic synthetic mesh (node k -> k//2 and
k -> k-1, max degree 5, JVM-generated from spark.range so both parallelism
levels see byte-identical input with zero storage cost):

  * pagerank: 3 integer-exact iterations over ~2N edges
    (throughput = edge-iterations/sec);
  * triangles: degree-oriented wedge join (throughput = edges/sec);
  * nquads_parse: parse a pre-materialized ~2N-line N-Quads text file
    (throughput = lines/sec), with a raw text-scan control so parse cost
    separates from IO;
  * bfs: frontier BFS over the REVERSED mesh from node:0 (~log2 N
    levels of the semi-naive fixpoint family — the round-5 graph ops'
    iteration shape; throughput = reached nodes/sec);

Protocol mirrors scripts/scaling.py: fresh JVM per (cpus, rep) via
subprocess, interleaved lo/hi reps to equalize neighbor noise, efficiency
from each level's best sample, steal-jiffies recorded per run. Writes
GRAPH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_NODES = int(os.environ.get("RIFY_GRAPH_N", "5000000"))
CPU_LO = int(os.environ.get("RIFY_GRAPH_LO", "2"))
CPU_HI = int(os.environ.get("RIFY_GRAPH_HI", "8"))
REPEATS = int(os.environ.get("RIFY_GRAPH_REPEATS", "3"))
HEAP_PER_CORE = int(os.environ.get("RIFY_GRAPH_HEAP_PER_CORE", "2"))
OUT_PATH = os.environ.get(
    "RIFY_GRAPH_OUT", os.path.join(REPO, "GRAPH_SCALING.json")
)
WORKER = os.environ.get("RIFY_GRAPH_WORKER") == "1"


def _mesh(spark, n):
    from pyspark.sql import functions as F

    r = spark.range(1, n + 1)
    parent = r.select(
        F.concat(F.lit("node:"), F.col("id")).alias("s"),
        F.concat(
            F.lit("node:"), F.floor(F.col("id") / 2).cast("long")
        ).alias("o"),
    )
    prev = r.filter(F.col("id") >= 2).select(
        F.concat(F.lit("node:"), F.col("id")).alias("s"),
        F.concat(F.lit("node:"), F.col("id") - 1).alias("o"),
    )
    return parent.unionByName(prev)


def _force(df) -> int:
    df = df.persist()
    df.write.mode("overwrite").format("noop").save()
    n = df.count()
    df.unpersist()
    return n


def _lines_path() -> str:
    return os.path.join(
        tempfile.gettempdir(), f"rify_graph_nquads_{N_NODES}"
    )


def worker() -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from rify_spark.ops.graph import (
        PR_ITERS,
        bfs_levels,
        kcore,
        pagerank,
        sssp_distances,
        triangle_counts,
    )
    from rify_spark.rdf import parse_nquads
    from rify_spark.session import get_spark

    cpus = int(os.environ["RIFY_GRAPH_CPUS"])
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"rify-graph-scale-{cpus}",
        shuffle_partitions=2 * cpus,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    # optional arm filter for targeted runs (e.g. the BFS amortization
    # pair at a larger N): RIFY_GRAPH_ARMS=bfs skips everything else
    arms = set(
        os.environ.get(
            "RIFY_GRAPH_ARMS", "pagerank,triangles,kcore,bfs,sssp,nquads"
        ).split(",")
    )

    edges = _mesh(spark, N_NODES)
    n_edges = 2 * N_NODES - 2
    out: dict = {"cpus": cpus, "nodes": N_NODES, "edges": n_edges}

    if "pagerank" in arms:
        t0 = time.time()
        n_ranked = _force(pagerank(edges))
        w = time.time() - t0
        out["pagerank_wall"] = round(w, 2)
        out["pagerank_nodes"] = n_ranked
        out["pagerank_edge_iters_per_sec"] = round(
            n_edges * PR_ITERS / w, 1
        )

    if "triangles" in arms:
        t0 = time.time()
        n_tri_nodes = _force(triangle_counts(edges))
        w = time.time() - t0
        out["triangles_wall"] = round(w, 2)
        out["triangles_nodes"] = n_tri_nodes
        out["triangles_edges_per_sec"] = round(n_edges / w, 1)

    # k-core at k=2 on the mesh: a shallow peel (node 0 then node 1, the
    # rest is 2-core), so the measured cost is the op's symmetrize +
    # full-degree aggregate + delta rounds over ~2x the edge volume —
    # the shuffle-bound shape whose scaling the shuffle control yardsticks
    if "kcore" in arms:
        t0 = time.time()
        n_core = _force(kcore(edges, 2))
        w = time.time() - t0
        out["kcore_wall"] = round(w, 2)
        out["kcore_nodes"] = n_core
        out["kcore_edges_per_sec"] = round(n_edges / w, 1)

    if "bfs" in arms:
        rev = edges.select(F.col("o").alias("s"), F.col("s").alias("o"))
        bfs_src = spark.createDataFrame([("node:0",)], "node string")
        t0 = time.time()
        n_reached = _force(bfs_levels(rev, bfs_src))
        w = time.time() - t0
        out["bfs_wall"] = round(w, 2)
        out["bfs_nodes"] = n_reached
        out["bfs_nodes_per_sec"] = round(n_reached / w, 1)

    # weighted shortest paths over the reversed mesh (parent edges cost
    # 3, prev edges cost 2 — same shape as the graph_sssp gate): the
    # semi-naive Bellman-Ford whose per-round cost is the improved
    # frontier against the once-partitioned edge cache
    if "sssp" in arms:
        wrev = edges.withColumn(
            "w",
            F.when(F.col("o") == F.expr("concat('node:', CAST(FLOOR("
                   "CAST(substring(s, 6, 32) AS BIGINT) / 2) AS BIGINT))"),
                   F.lit(3)).otherwise(F.lit(2)),
        ).select(F.col("o").alias("s"), F.col("s").alias("o"), "w")
        sssp_src = spark.createDataFrame([("node:0",)], "node string")
        t0 = time.time()
        n_settled = _force(sssp_distances(wrev, sssp_src))
        w = time.time() - t0
        out["sssp_wall"] = round(w, 2)
        out["sssp_nodes"] = n_settled
        out["sssp_nodes_per_sec"] = round(n_settled / w, 1)

    if "nquads" not in arms:
        spark.stop()
        print(json.dumps(out))
        return

    lines = spark.read.text(_lines_path())
    t0 = time.time()
    parsed = parse_nquads(lines).filter(~F.col("malformed"))
    n_parsed = _force(parsed.select("s", "p", "o", "g"))
    w = time.time() - t0
    out["nquads_parse_wall"] = round(w, 2)
    out["nquads_parsed_rows"] = n_parsed
    out["nquads_lines_per_sec"] = round(n_parsed / w, 1)

    # control: raw text scan + length sum (IO + row pipeline, no parse)
    t0 = time.time()
    lines.select(F.sum(F.length("value"))).collect()
    out["scan_control_wall"] = round(time.time() - t0, 2)
    out["scan_control_lines_per_sec"] = round(
        n_parsed / max(out["scan_control_wall"], 1e-9), 1
    )

    # control: engine-free shuffle at the same row volume and key width
    # (the box's own groupBy-scaling ceiling — pagerank/triangles are
    # shuffle-bound, so THIS, not the scan, is their fair yardstick)
    t0 = time.time()
    edges.groupBy("s").agg(F.count("*")).write.mode("overwrite").format(
        "noop"
    ).save()
    out["shuffle_control_wall"] = round(time.time() - t0, 2)
    out["shuffle_control_rows_per_sec"] = round(
        n_edges / max(out["shuffle_control_wall"], 1e-9), 1
    )

    spark.stop()
    print(json.dumps(out))


def materialize_lines() -> None:
    if os.path.exists(os.path.join(_lines_path(), "_SUCCESS")):
        return
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from rify_spark.rdf import format_nquads
    from rify_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPU_HI}]", app_name="rify-graph-scale-gen"
    )
    quads = _mesh(spark, N_NODES).select(
        "s", F.lit("linked").alias("p"), "o", F.lit("graph://mesh").alias("g")
    )
    format_nquads(quads).repartition(4 * CPU_HI).write.mode(
        "overwrite"
    ).text(_lines_path())
    spark.stop()


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    materialize_lines()
    samples: dict = {CPU_LO: [], CPU_HI: []}
    for rep in range(REPEATS):
        for cpus in (CPU_LO, CPU_HI):
            env = dict(
                os.environ,
                RIFY_GRAPH_WORKER="1",
                RIFY_GRAPH_CPUS=str(cpus),
                RIFY_DRIVER_MEMORY=f"{max(4, cpus * HEAP_PER_CORE)}g",
                PYTHONPATH=REPO,
            )
            s0 = _steal_jiffies()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"worker cpus={cpus} failed:\n{proc.stderr[-3000:]}"
                )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            r["steal_jiffies_during_run"] = _steal_jiffies() - s0
            samples[cpus].append(r)
            print(json.dumps({"rep": rep, **r}), file=sys.stderr)

    ratio = CPU_HI / CPU_LO

    def best(cpus, metric):
        return max(s[metric] for s in samples[cpus])

    def eff(metric):
        return round((best(CPU_HI, metric) / best(CPU_LO, metric)) / ratio, 3)

    out = {
        "nodes": N_NODES,
        "edges": 2 * N_NODES - 2,
        "cpus_lo": CPU_LO,
        "cpus_hi": CPU_HI,
        "repeats": REPEATS,
        "samples": {str(k): v for k, v in samples.items()},
        "pagerank_scaling_efficiency": eff("pagerank_edge_iters_per_sec"),
        "triangles_scaling_efficiency": eff("triangles_edges_per_sec"),
        "nquads_parse_scaling_efficiency": eff("nquads_lines_per_sec"),
        "bfs_scaling_efficiency": eff("bfs_nodes_per_sec"),
        "sssp_scaling_efficiency": eff("sssp_nodes_per_sec"),
        "kcore_scaling_efficiency": eff("kcore_edges_per_sec"),
        "scan_control_scaling_efficiency": eff("scan_control_lines_per_sec"),
        "shuffle_control_scaling_efficiency": eff(
            "shuffle_control_rows_per_sec"
        ),
        "best_lo": {
            m: best(CPU_LO, m)
            for m in (
                "pagerank_edge_iters_per_sec",
                "triangles_edges_per_sec",
                "nquads_lines_per_sec",
                "bfs_nodes_per_sec",
                "sssp_nodes_per_sec",
                "kcore_edges_per_sec",
            )
        },
        "best_hi": {
            m: best(CPU_HI, m)
            for m in (
                "pagerank_edge_iters_per_sec",
                "triangles_edges_per_sec",
                "nquads_lines_per_sec",
                "bfs_nodes_per_sec",
                "sssp_nodes_per_sec",
                "kcore_edges_per_sec",
            )
        },
    }
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "samples"}))


if __name__ == "__main__":
    worker() if WORKER else main()
