"""BFS amortization pair (VERDICT r5 #5 evidence): the bfs arm alone at a
larger N (default 20M nodes), 2 reps x {lo, hi} cores, fresh JVM per run
via the graph_scale worker. Writes BFS_AMORTIZE.json with the same keys
bench.py's rider expects; ``efficiency_at_5m_nodes`` is copied from the
current GRAPH_SCALING.json bfs arm."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("RIFY_BFS_AMORTIZE_N", "20000000"))
CPU_LO = int(os.environ.get("RIFY_GRAPH_LO", "2"))
CPU_HI = int(os.environ.get("RIFY_GRAPH_HI", "8"))
REPEATS = int(os.environ.get("RIFY_BFS_AMORTIZE_REPEATS", "2"))
OUT = os.path.join(REPO, "BFS_AMORTIZE.json")
WORKER_SCRIPT = os.path.join(REPO, "scripts", "graph_scale.py")


def main() -> None:
    samples = []
    for rep in range(REPEATS):
        for cpus in (CPU_LO, CPU_HI):
            env = dict(
                os.environ,
                RIFY_GRAPH_WORKER="1",
                RIFY_GRAPH_CPUS=str(cpus),
                RIFY_GRAPH_N=str(N),
                RIFY_GRAPH_ARMS="bfs",
                RIFY_DRIVER_MEMORY=f"{max(4, cpus * 2)}g",
                PYTHONPATH=REPO,
            )
            proc = subprocess.run(
                [sys.executable, WORKER_SCRIPT],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"worker cpus={cpus} failed:\n{proc.stderr[-3000:]}"
                )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            samples.append(r)
            print(json.dumps({"rep": rep, **r}), file=sys.stderr, flush=True)

    def best(cpus):
        return max(
            s["bfs_nodes_per_sec"] for s in samples if s["cpus"] == cpus
        )

    eff5 = None
    gs_path = os.path.join(REPO, "GRAPH_SCALING.json")
    if os.path.exists(gs_path):
        with open(gs_path) as f:
            eff5 = json.load(f).get("bfs_scaling_efficiency")
    out = {
        "arm": "bfs",
        "nodes": N,
        "cpus_lo": CPU_LO,
        "cpus_hi": CPU_HI,
        "repeats": REPEATS,
        "samples": samples,
        "best_lo_nodes_per_sec": best(CPU_LO),
        "best_hi_nodes_per_sec": best(CPU_HI),
        "scaling_efficiency": round(
            best(CPU_HI) / best(CPU_LO) / (CPU_HI / CPU_LO), 3
        ),
        "efficiency_at_5m_nodes": eff5,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "samples"}))


if __name__ == "__main__":
    main()
