"""Tail-sized raw-shuffle control for the weak-scaling pair ->
TAIL_CONTROL.json (VERDICT r3 item 2, control-measurement arm).

The weak-scaling run (SCALING_WEAK.json) shows iterations 1-5 at ~0.95-1.0
per-core efficiency and only the two heaviest tail iterations degrading.
Hypothesis (BASELINE.md): the tail is bandwidth-bound and this box's
"executors" share ONE memory bus / tmpfs — a real 4N-executor cluster
brings 4x shuffle bandwidth. This control measures exactly that ceiling,
with NO engine code, at the tail's own shape and volume:

  * quad-shaped rows (four ~10-20 byte strings — the fixpoint's shuffle
    payload, not longs);
  * per-core-constant volume: ROWS_PER_CORE rows at CPU_LO and CPU_HI
    (default 15M/core ~= the 4M-tree tail iteration's candidate volume);
  * the tail's operation: hash exchange + dedup aggregation
    (dropDuplicates over s,p,o,g);
  * per-core-constant heap, separate JVMs, interleaved reps — same
    methodology as scripts/scaling_weak.py.

weak_eff(control) = (rows/s/core at HI) / (rows/s/core at LO). If the
control degrades like the engine's tail, the residual is the machine,
not the engine.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPU_LO = int(os.environ.get("RIFY_SCALING_LO", "2"))
CPU_HI = int(os.environ.get("RIFY_SCALING_HI", "8"))
ROWS_PER_CORE = int(os.environ.get("RIFY_TAIL_ROWS_PER_CORE", "15000000"))
REPEATS = int(os.environ.get("RIFY_SCALING_REPEATS", "2"))
HEAP_PER_CORE = int(os.environ.get("RIFY_SCALING_HEAP_PER_CORE", "4"))
OUT = os.environ.get("RIFY_TAIL_OUT", os.path.join(REPO, "TAIL_CONTROL.json"))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["RIFY_REPO"])
from pyspark.sql import functions as F
from rify_spark.session import get_spark
cpus = int(os.environ["RIFY_SCALING_CPUS"])
rows = int(os.environ["RIFY_TAIL_ROWS"])
spark = get_spark(master=f"local[{cpus}]", app_name=f"tail-control-{cpus}",
                  shuffle_partitions=2 * cpus)
spark.range(1_000_000).selectExpr("sum(id)").collect()
quads = spark.range(0, rows, 1, 2 * cpus).select(
    F.concat(F.lit("node:"), (F.col("id") * 2654435761) % (rows // 2)).alias("s"),
    F.lit("ancestor").alias("p"),
    F.concat(F.lit("node:"), (F.col("id") * 40503) % (rows // 2)).alias("o"),
    F.lit("graph://tree").alias("g"),
)
t0 = time.time()
n = quads.dropDuplicates(["s", "p", "o", "g"]).count()
wall = time.time() - t0
print(json.dumps({"cpus": cpus, "rows": rows, "out_rows": n,
                  "wall_s": round(wall, 2),
                  "rows_per_sec": round(rows / wall, 1)}))
"""


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run_one(cpus: int) -> dict:
    env = dict(
        os.environ,
        RIFY_REPO=REPO,
        RIFY_SCALING_CPUS=str(cpus),
        RIFY_TAIL_ROWS=str(ROWS_PER_CORE * cpus),
        PYTHONPATH=REPO,
        RIFY_DRIVER_MEMORY=f"{max(4, cpus * HEAP_PER_CORE)}g",
    )
    p = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True,
        text=True, timeout=3600,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-2000:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    samples: dict = {CPU_LO: [], CPU_HI: []}
    for rep in range(REPEATS):
        for cpus in (CPU_LO, CPU_HI):
            s0 = _steal()
            r = run_one(cpus)
            r["steal_jiffies_during_run"] = _steal() - s0
            samples[cpus].append(r)
            print(json.dumps({"rep": rep, **r}), file=sys.stderr)

    def best(c):
        return max(s["rows_per_sec"] for s in samples[c])

    out = {
        "mode": "tail-sized quad-shuffle control (per-core-constant volume)",
        "rows_per_core": ROWS_PER_CORE,
        "cpus_lo": CPU_LO,
        "cpus_hi": CPU_HI,
        "heap_per_core_gb": HEAP_PER_CORE,
        "samples": {str(k): v for k, v in samples.items()},
        "best_percore_lo_rps": round(best(CPU_LO) / CPU_LO, 1),
        "best_percore_hi_rps": round(best(CPU_HI) / CPU_HI, 1),
        "weak_scaling_efficiency": round(
            (best(CPU_HI) / CPU_HI) / (best(CPU_LO) / CPU_LO), 3
        ),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
