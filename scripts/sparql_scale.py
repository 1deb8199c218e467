"""Two-parallelism scaling harness for the SPARQL query layer.

Materializes one shared synthetic quad store (deterministic LCG social
graph: ~10 `knows` edges per entity, skewed `in_group` membership with
one hot group holding ~30% of entities, an `age` literal per entity),
then runs scripts/sparql_scale_job.py at local[LO] and local[HI]
(fresh JVM each, interleaved repeats, best-of — the same noise protocol
as scripts/scaling.py) and reports per-query walls, throughput at both
parallelism levels, and scaling efficiency:

    eff = (quads_per_sec_hi / quads_per_sec_lo) / (HI / LO)

Result cardinalities are asserted identical across every run — a
cross-parallelism correctness check on the query compiler.

Writes SPARQL_SCALING.json at the repo root; BASELINE.md cites it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_ENTITIES = int(os.environ.get("RIFY_SPARQL_ENTITIES", "400000"))
N_GROUPS = int(os.environ.get("RIFY_SPARQL_GROUPS", "1000"))
KNOWS_DEG = int(os.environ.get("RIFY_SPARQL_DEG", "10"))
CPU_LO = int(os.environ.get("RIFY_SPARQL_LO", "2"))
CPU_HI = int(os.environ.get("RIFY_SPARQL_HI", "8"))
REPEATS = int(os.environ.get("RIFY_SPARQL_REPEATS", "3"))
HEAP_PER_CORE = int(os.environ.get("RIFY_SPARQL_HEAP_PER_CORE", "2"))
OUT_PATH = os.environ.get(
    "RIFY_SPARQL_OUT", os.path.join(REPO, "SPARQL_SCALING.json")
)


def materialize_store(path: str) -> None:
    """Deterministic quad store, written once with a fixed partition
    count so both parallelism levels read byte-identical input."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from rify_spark.rdf import DEFAULT_GRAPH
    from rify_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPU_HI}]", app_name="rify-sparql-scaling-gen"
    )
    ids = spark.range(0, N_ENTITIES, 1, 32)
    ent = F.concat(F.lit("ent:"), F.col("id"))
    # knows: KNOWS_DEG LCG-derived out-edges per entity (self-loops fine)
    knows = (
        ids.select(
            F.col("id"),
            F.explode(
                F.array(*[F.lit(k) for k in range(KNOWS_DEG)])
            ).alias("k"),
        )
        .select(
            ent.alias("s"),
            F.lit("knows").alias("p"),
            F.concat(
                F.lit("ent:"),
                ((F.col("id") * 2654435761 + F.col("k") * 40503) % N_ENTITIES),
            ).alias("o"),
        )
    )
    # in_group: ~30% of entities land in group:hot, the rest uniform
    group = (
        ids.select(
            ent.alias("s"),
            F.lit("in_group").alias("p"),
            F.when(F.col("id") % 10 < 3, F.lit("group:hot"))
            .otherwise(F.concat(F.lit("group:"), F.col("id") % N_GROUPS))
            .alias("o"),
        )
    )
    age = ids.select(
        ent.alias("s"),
        F.lit("age").alias("p"),
        ((F.col("id") * 48271) % 90).cast("string").alias("o"),
    )
    quads = (
        knows.unionByName(group)
        .unionByName(age)
        .withColumn("g", F.lit(DEFAULT_GRAPH))
        .select("s", "p", "o", "g")
    )
    quads.repartition(32).write.mode("overwrite").parquet(path)
    spark.stop()


def run_one(cpus: int, store: str, ctl_first: bool = False) -> dict:
    mem = f"{max(4, cpus * HEAP_PER_CORE)}g"
    env = dict(
        os.environ,
        RIFY_SPARQL_CPUS=str(cpus),
        RIFY_SPARQL_STORE=store,
        RIFY_DRIVER_MEMORY=mem,
        PYTHONPATH=REPO,
        RIFY_SPARQL_CTL_FIRST="1" if ctl_first else "0",
    )
    job = os.path.join(REPO, "scripts", "sparql_scale_job.py")
    proc = subprocess.run(
        [sys.executable, job],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"sparql scaling job cpus={cpus} failed:\n{proc.stderr[-3000:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    store = os.path.join(
        tempfile.gettempdir(),
        f"rify_sparql_store_{N_ENTITIES}x{KNOWS_DEG}",
    )
    materialize_store(store)

    samples: dict = {CPU_LO: [], CPU_HI: []}
    for rep in range(REPEATS):
        for cpus in (CPU_LO, CPU_HI):
            s0 = _steal_jiffies()
            # engine/control order alternates per repeat so neither side
            # systematically inherits the other's warmed JVM/page cache
            r = run_one(cpus, store, ctl_first=rep % 2 == 1)
            r["steal_jiffies_during_run"] = _steal_jiffies() - s0
            samples[cpus].append(r)
            print(json.dumps({"rep": rep, **r}), file=sys.stderr)

    # cross-parallelism correctness: every run must agree on every
    # query's result cardinality
    counts = {
        name: {s["queries"][name]["rows"] for c in samples for s in samples[c]}
        for name in samples[CPU_LO][0]["queries"]
    }
    mismatched = {k: sorted(v) for k, v in counts.items() if len(v) != 1}
    if mismatched:
        raise RuntimeError(f"result cardinality mismatch: {mismatched}")

    # engine vs control: identical result cardinalities (the raw twin
    # computes the same answer) — a second independent correctness check
    for c in samples:
        for s in samples[c]:
            for name, rec in s.get("control", {}).items():
                if rec["rows"] != s["queries"][name]["rows"]:
                    raise RuntimeError(
                        f"engine/control row mismatch on {name}: "
                        f"{s['queries'][name]['rows']} vs {rec['rows']}"
                    )

    ratio = CPU_HI / CPU_LO
    best_lo = max(s["quads_per_sec"] for s in samples[CPU_LO])
    best_hi = max(s["quads_per_sec"] for s in samples[CPU_HI])
    ctl_lo = max(s["control_quads_per_sec"] for s in samples[CPU_LO])
    ctl_hi = max(s["control_quads_per_sec"] for s in samples[CPU_HI])
    out = {
        "entities": N_ENTITIES,
        "quads": samples[CPU_LO][0]["quads"],
        "cpu_lo": CPU_LO,
        "cpu_hi": CPU_HI,
        "repeats": REPEATS,
        "rows_per_query": {k: sorted(v)[0] for k, v in counts.items()},
        "best_quads_per_sec": {CPU_LO: best_lo, CPU_HI: best_hi},
        "scaling_efficiency": round((best_hi / best_lo) / ratio, 3),
        "control_best_quads_per_sec": {CPU_LO: ctl_lo, CPU_HI: ctl_hi},
        "control_scaling_efficiency": round((ctl_hi / ctl_lo) / ratio, 3),
        "per_query_best_wall_s": {
            name: {
                c: min(s["queries"][name]["wall_s"] for s in samples[c])
                for c in (CPU_LO, CPU_HI)
            }
            for name in counts
        },
        "samples": samples,
    }
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "samples"}))


if __name__ == "__main__":
    main()
