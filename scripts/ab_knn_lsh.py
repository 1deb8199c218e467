"""A/B the knn_lsh wall against spark.sql.constraintPropagation.enabled
(VERDICT r4 "What's wrong" #3): the flag was turned off globally for the
fixpoint (session.py) but never measured on the ops queries, and knn_lsh
read 20-35% above r3 in both round-4 samples.

Interleaved best-of-N (the sandbox's bursty-neighbor methodology): each rep
measures OFF then ON back-to-back so a noise window hits both arms, plus
/proc/stat steal jiffies per rep. dedup_lsh_pairs rides as a same-shape
control. Prints one JSON line; write to AB_KNN_LSH.json."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _force(df) -> int:
    df = df.persist()
    df.write.mode("overwrite").format("noop").save()
    n = df.count()
    df.unpersist()
    return n


def main() -> None:
    from rify_spark.ops import dedup, similarity
    from rify_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="ab-knn-lsh",
        shuffle_partitions=max(8, 2 * CPUS),
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    queries = {
        "knn_lsh": lambda: similarity.knn_lsh(emb),
        "dedup_lsh_pairs": lambda: dedup.lsh_candidate_pairs(docs),
    }
    walls: dict = {q: {"off": [], "on": []} for q in queries}
    steals: list = []
    key = "spark.sql.constraintPropagation.enabled"
    for rep in range(REPS):
        # alternate arm order per rep: within-rep cache warmth must not
        # systematically favor the second arm
        order = ("off", "on") if rep % 2 == 0 else ("on", "off")
        for arm in order:  # interleaved: same window hits both arms
            spark.conf.set(key, "true" if arm == "on" else "false")
            s0 = _steal()
            for q, fn in queries.items():
                t0 = time.time()
                _force(fn())
                walls[q][arm].append(round(time.time() - t0, 3))
            steals.append(_steal() - s0)
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "reps": REPS,
        "walls": walls,
        "best": {
            q: {arm: min(v) for arm, v in arms.items()}
            for q, arms in walls.items()
        },
        "steal_jiffies_per_arm_run": steals,
        "r3_knn_lsh_wall": 3.407,
        "conf_key": key,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
