"""Weak-scaling harness (Gustafson curve): per-core-CONSTANT work at 2 vs
8 cores — the companion to scripts/scaling.py's strong-scaling pair.

The tree size scales with the core count (TREE_LO at CPU_LO, TREE_LO *
CPU_HI/CPU_LO at CPU_HI), so each configuration derives a near-constant
number of quads per core; ideal weak scaling holds per-core throughput
flat. Efficiency is reported as

    eff_weak = (tps_hi / cpus_hi) / (tps_lo / cpus_lo)

on each configuration's best (least-interfered) sample, interleaved like
the strong-scaling harness (this sandbox has bursty neighbors), with
steal-jiffy telemetry per sample. Heap is per-core-constant
(RIFY_SCALING_HEAP_PER_CORE, default 2 GB/core), mirroring N vs 4N
executors each bringing their own memory.

Writes SCALING_WEAK.json at the repo root; BASELINE.md cites the numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TREE_LO = int(os.environ.get("RIFY_WEAK_TREE_LO", "1000000"))
CPU_LO = int(os.environ.get("RIFY_SCALING_LO", "2"))
CPU_HI = int(os.environ.get("RIFY_SCALING_HI", "8"))
REPEATS = int(os.environ.get("RIFY_SCALING_REPEATS", "2"))
HEAP_PER_CORE = int(os.environ.get("RIFY_SCALING_HEAP_PER_CORE", "2"))
OUT_PATH = os.environ.get(
    "RIFY_WEAK_OUT", os.path.join(REPO, "SCALING_WEAK.json")
)

TREE_HI = TREE_LO * CPU_HI // CPU_LO


def run_one(cpus: int, tree_n: int) -> dict:
    env = dict(
        os.environ,
        RIFY_SCALING_CPUS=str(cpus),
        RIFY_SCALING_TREE_N=str(tree_n),
        RIFY_SCALING_SKIP_PIPELINE="1",
        PYTHONPATH=REPO,
        RIFY_DRIVER_MEMORY=f"{max(4, cpus * HEAP_PER_CORE)}g",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_job.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"weak-scaling job cpus={cpus} failed:\n{proc.stderr[-3000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    configs = [(CPU_LO, TREE_LO), (CPU_HI, TREE_HI)]
    samples: dict = {CPU_LO: [], CPU_HI: []}
    for rep in range(REPEATS):
        for cpus, tree_n in configs:
            s0 = _steal_jiffies()
            r = run_one(cpus, tree_n)
            r["steal_jiffies_during_run"] = _steal_jiffies() - s0
            samples[cpus].append(r)
            print(json.dumps({"rep": rep, **r}), file=sys.stderr)

    def best(cpus: int, metric: str) -> float:
        return max(s[metric] for s in samples[cpus])

    percore_lo = best(CPU_LO, "fixpoint_triples_per_sec") / CPU_LO
    percore_hi = best(CPU_HI, "fixpoint_triples_per_sec") / CPU_HI
    out = {
        "mode": "weak (per-core-constant tree)",
        "tree_lo": TREE_LO,
        "tree_hi": TREE_HI,
        "cpus_lo": CPU_LO,
        "cpus_hi": CPU_HI,
        "repeats": REPEATS,
        "samples": {str(k): v for k, v in samples.items()},
        "derived_lo": samples[CPU_LO][0]["fixpoint_derived"],
        "derived_hi": samples[CPU_HI][0]["fixpoint_derived"],
        "best_percore_lo_tps": round(percore_lo, 1),
        "best_percore_hi_tps": round(percore_hi, 1),
        "weak_scaling_efficiency": round(percore_hi / percore_lo, 3),
        "control_scaling_efficiency": round(
            (best(CPU_HI, "control_rows_per_sec") / best(CPU_LO, "control_rows_per_sec"))
            / (CPU_HI / CPU_LO),
            3,
        ),
    }
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
