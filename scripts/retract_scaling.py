"""Retraction scaling pair -> RETRACT_SCALING.json.

Runs the retract soak (scripts/retract_soak.py: interleaved insert +
retract batches over a k -> k//2 tree, exact closed-form final closure) at
local[LO] and local[HI] in separate processes (fresh JVM each) on the SAME
deterministic workload, and reports the retraction path's throughput at
both plus scaling efficiency — the sandbox proxy for the two-cluster-size
criterion, as for SCALING.json.

Metric: both legs execute an identical op sequence, so per-metric
throughput = work / wall with identical work across legs, and

    eff = (tput_hi / tput_lo) / (HI / LO) = (wall_lo / wall_hi) / (HI / LO)

computed separately for (a) retract ops only (sum of retract_batch walls;
the DRed work unit is the over-deleted cone + the O(store) subtract fold)
and (b) the full soak wall (inserts + retracts). Same noise handling as
scripts/scaling.py: bursty time-shared neighbors, so REPEATS interleaved
lo/hi reps, efficiency from each leg's best (least-interfered) wall, steal
jiffies recorded per leg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TREE_N = int(os.environ.get("RIFY_RSCALE_TREE_N", "200000"))
BATCHES = int(os.environ.get("RIFY_RSCALE_BATCHES", "8"))
RETRACT_EVERY = int(os.environ.get("RIFY_RSCALE_RETRACT_EVERY", "2"))
CPU_LO = int(os.environ.get("RIFY_RSCALE_LO", "2"))
CPU_HI = int(os.environ.get("RIFY_RSCALE_HI", "8"))
REPEATS = int(os.environ.get("RIFY_RSCALE_REPEATS", "2"))
OUT_PATH = os.environ.get(
    "RIFY_RSCALE_OUT", os.path.join(REPO, "RETRACT_SCALING.json")
)


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run_one(cpus: int, rep: int) -> dict:
    out = os.path.join(
        tempfile.gettempdir(), f"rify_rscale_{cpus}_{rep}.json"
    )
    env = dict(
        os.environ,
        RIFY_RSOAK_CPUS=str(cpus),
        RIFY_RSOAK_TREE_N=str(TREE_N),
        RIFY_RSOAK_BATCHES=str(BATCHES),
        RIFY_RSOAK_RETRACT_EVERY=str(RETRACT_EVERY),
        # the restart leg measures recovery, not scaling — skip it
        RIFY_RSOAK_RESTART_AT=str(BATCHES + 1),
        RIFY_RSOAK_OUT=out,
        PYTHONPATH=REPO,
        RIFY_DRIVER_MEMORY=os.environ.get(
            "RIFY_RSCALE_DRIVER_MEM", f"{max(4, cpus * 2)}g"
        ),
    )
    s0 = _steal_jiffies()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "retract_soak.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=5400,
    )
    steal = _steal_jiffies() - s0
    if proc.returncode != 0:
        raise RuntimeError(
            f"retract soak cpus={cpus} failed:\n{proc.stderr[-3000:]}"
        )
    with open(out) as f:
        r = json.load(f)
    assert r["exact"] and r["sampled_nodes_mismatched"] == 0
    retract_ops = [o for o in r["ops"] if o["op"] == "retract"]
    cone = sum(o["cone"] for o in retract_ops)
    rw = round(sum(o["wall_s"] for o in retract_ops), 3)
    return {
        "cpus": cpus,
        "exact": r["exact"],
        "total_wall_s": r["total_wall_s"],
        "retract_wall_s": rw,
        "retract_ops": len(retract_ops),
        "cone_rows": cone,
        "cone_rows_per_sec": round(cone / rw, 1),
        "insert_wall_s": round(
            sum(o["wall_s"] for o in r["ops"] if o["op"] == "insert"), 3
        ),
        "final_store_rows": r["got"]["premises"] + r["got"]["ancestor_pairs"],
        "steal_jiffies_during_run": steal,
    }


def main() -> None:
    samples: dict = {CPU_LO: [], CPU_HI: []}
    for rep in range(REPEATS):
        for cpus in (CPU_LO, CPU_HI):
            r = run_one(cpus, rep)
            samples[cpus].append(r)
            print(json.dumps({"rep": rep, **r}), file=sys.stderr, flush=True)

    ratio = CPU_HI / CPU_LO

    def best_wall(cpus: int, metric: str) -> float:
        return min(s[metric] for s in samples[cpus])

    def eff(metric: str) -> float:
        return round(
            (best_wall(CPU_LO, metric) / best_wall(CPU_HI, metric)) / ratio, 3
        )

    out = {
        "tree_n": TREE_N,
        "batches": BATCHES,
        "retract_every": RETRACT_EVERY,
        "cpus_lo": CPU_LO,
        "cpus_hi": CPU_HI,
        "repeats": REPEATS,
        "samples": {str(k): v for k, v in samples.items()},
        "best_lo_cone_rows_per_sec": max(
            s["cone_rows_per_sec"] for s in samples[CPU_LO]
        ),
        "best_hi_cone_rows_per_sec": max(
            s["cone_rows_per_sec"] for s in samples[CPU_HI]
        ),
        "retract_scaling_efficiency": eff("retract_wall_s"),
        "soak_scaling_efficiency": eff("total_wall_s"),
    }
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
