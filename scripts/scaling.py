"""Two-parallelism scaling harness (sandbox proxy for N vs 4N executors).

Materializes one shared corpus, runs scripts/scaling_job.py at local[LO]
and local[HI] (HI = 4*LO) in separate processes (fresh JVM each), and
reports throughput at both plus scaling efficiency:

    eff = (throughput_hi / throughput_lo) / (HI / LO)

Noise handling: this sandbox is time-shared with bursty neighbors (the same
Spark job was observed at 7s and 134s minutes apart), so each configuration
runs REPEATS times, interleaved lo/hi to equalize exposure, and efficiency
is computed from each configuration's best (least-interfered) throughput;
all samples are recorded. The default pair is 2 -> 8 cores because measured
deliverable capacity of the advertised 32 CPUs is ~12-20 cores-equivalent
(multiprocess saturation test) — a pair whose HI exceeds real capacity
measures oversubscription, not the engine.

Writes SCALING.json at the repo root; BASELINE.md cites the numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_REPOS = int(os.environ.get("RIFY_SCALING_REPOS", "2000"))
N_MODULES = int(os.environ.get("RIFY_SCALING_MODULES", "10"))
TREE_N = int(os.environ.get("RIFY_SCALING_TREE_N", "100000"))
CPU_LO = int(os.environ.get("RIFY_SCALING_LO", "2"))
CPU_HI = int(os.environ.get("RIFY_SCALING_HI", "8"))
REPEATS = int(os.environ.get("RIFY_SCALING_REPEATS", "3"))
SKIP_PIPELINE = os.environ.get("RIFY_SCALING_SKIP_PIPELINE") == "1"
HEAP_PER_CORE = int(os.environ.get("RIFY_SCALING_HEAP_PER_CORE", "2"))
# Launch each worker via `spark-submit --py-files dist/rify_spark_pyfiles.zip`
# instead of a bare python interpreter with the repo on PYTHONPATH. This is
# the target cluster's actual invocation (north rule), and the per-run JSON
# records rify_spark.__file__ to prove the code ran from the zip.
SPARK_SUBMIT = os.environ.get("RIFY_SCALING_SPARK_SUBMIT") == "1"
OUT_PATH = os.environ.get(
    "RIFY_SCALING_OUT", os.path.join(REPO, "SCALING.json")
)


def materialize_corpus(path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    sys.path.insert(0, REPO)
    from rify_spark.extract import code_files_df_distributed
    from rify_spark.session import get_spark

    spark = get_spark(master=f"local[{CPU_HI}]", app_name="rify-scaling-gen")
    code_files_df_distributed(
        spark, n_repos=N_REPOS, n_modules=N_MODULES, partitions=2 * CPU_HI
    ).write.mode("overwrite").parquet(path)
    spark.stop()


def _pyfiles_zip() -> str:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_pyfiles_zip import build

    return build()


def run_one(cpus: int, corpus: str) -> dict:
    mem = f"{max(4, cpus * HEAP_PER_CORE)}g"
    env = dict(
        os.environ,
        RIFY_SCALING_CPUS=str(cpus),
        RIFY_SCALING_CORPUS=corpus,
        RIFY_SCALING_TREE_N=str(TREE_N),
        # heap scales with cores: N vs 4N executors each bring their own
        # memory; a fixed shared heap would measure memory contention.
        # HEAP_PER_CORE stays identical across the pair — raise it for
        # workloads whose per-core state exceeds 2 GB (e.g. the 3M-node
        # tree at 2 cores), which otherwise dies in shuffle writes.
        RIFY_DRIVER_MEMORY=mem,
    )
    job = os.path.join(REPO, "scripts", "scaling_job.py")
    if SPARK_SUBMIT:
        # the cluster invocation: no repo on PYTHONPATH — rify_spark and
        # __spark_entry__ resolve from the --py-files zip on the driver and
        # on every python worker. --driver-memory must ride the CLI (the
        # JVM is launched by spark-submit before the app's builder conf).
        env.pop("PYTHONPATH", None)
        env["RIFY_SCALING_SUBMIT"] = "1"
        submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
        cmd = [
            submit,
            "--master", f"local[{cpus}]",
            "--driver-memory", mem,
            "--py-files", _pyfiles_zip(),
            job,
        ]
    else:
        env["PYTHONPATH"] = REPO
        cmd = [sys.executable, job]
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=3600
    )
    if proc.returncode != 0:
        raise RuntimeError(f"scaling job cpus={cpus} failed:\n{proc.stderr[-3000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    corpus = os.path.join(
        tempfile.gettempdir(), f"rify_scaling_corpus_{N_REPOS}x{N_MODULES}"
    )
    if not SKIP_PIPELINE:
        materialize_corpus(corpus)

    samples: dict = {CPU_LO: [], CPU_HI: []}
    for rep in range(REPEATS):
        for cpus in (CPU_LO, CPU_HI):
            s0 = _steal_jiffies()
            r = run_one(cpus, corpus)
            r["steal_jiffies_during_run"] = _steal_jiffies() - s0
            samples[cpus].append(r)
            print(json.dumps({"rep": rep, **r}), file=sys.stderr)

    def best(cpus: int, metric: str) -> float:
        return max(s[metric] for s in samples[cpus])

    ratio = CPU_HI / CPU_LO

    def eff(metric: str) -> float:
        return round((best(CPU_HI, metric) / best(CPU_LO, metric)) / ratio, 3)

    out = {
        "launcher": "spark-submit --py-files" if SPARK_SUBMIT else "python",
        "corpus_files": None if SKIP_PIPELINE else N_REPOS * N_MODULES,
        "tree_nodes": TREE_N,
        "cpus_lo": CPU_LO,
        "cpus_hi": CPU_HI,
        "repeats": REPEATS,
        "samples": {str(k): v for k, v in samples.items()},
        "best_lo_fixpoint_tps": best(CPU_LO, "fixpoint_triples_per_sec"),
        "best_hi_fixpoint_tps": best(CPU_HI, "fixpoint_triples_per_sec"),
        "fixpoint_scaling_efficiency": eff("fixpoint_triples_per_sec"),
        # the machine's own ceiling on this run (raw Spark shuffle control)
        "control_scaling_efficiency": eff("control_rows_per_sec"),
    }
    if not SKIP_PIPELINE:
        out["best_lo_pipeline_tps"] = best(CPU_LO, "pipeline_triples_per_sec")
        out["best_hi_pipeline_tps"] = best(CPU_HI, "pipeline_triples_per_sec")
        out["pipeline_scaling_efficiency"] = eff("pipeline_triples_per_sec")
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
