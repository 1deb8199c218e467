"""Fixpoint regression profiler: isolate FactStore vs 128-bit-id cost.

Runs the 1M-node ancestry closure (the scaling workload) in a fresh JVM per
variant and prints per-iteration walls:

  A  current engine (128-bit ids + blocked FactStore)
  B  plain store   (128-bit ids; blocks = bare localCheckpoints, single anti)
  C  64-bit ids    (blocked FactStore; term_id = one xxhash64 lane)
  D  lazy blocks   (current store, but no eager block materialization)

Usage: python scripts/profile_fixpoint.py VARIANT [CPUS] [TREE_N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "A"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
TREE_N = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000


def apply_variant(variant: str) -> None:
    import importlib

    inf = importlib.import_module("rify_spark.infer")
    dct = importlib.import_module("rify_spark.dictionary")
    from pyspark.sql import functions as F

    if variant == "B":
        def _mk_block(self, checkpointed_df):
            return checkpointed_df

        def _finalize(self, block):
            return None

        def anti(self, cand):
            return cand.join(self.union(), inf.SPOG, "left_anti")

        inf.FactStore._mk_block = _mk_block
        inf.FactStore._finalize_if_chained = _finalize
        inf.FactStore.anti = anti
    elif variant == "C":
        def term_id(col):
            c = F.col(col) if isinstance(col, str) else col
            return F.xxhash64(c)

        def hash_terms(spark, terms):
            terms = list(dict.fromkeys(terms))
            if not terms:
                return {}
            df = spark.createDataFrame([(t,) for t in terms], "term string")
            rows = df.select("term", term_id("term").alias("id")).collect()
            return {r["term"]: r["id"] for r in rows}

        dct.term_id = term_id
        dct.ID_TYPE = "bigint"
        dct.hash_terms = hash_terms
        api = importlib.import_module("rify_spark.api")
        if hasattr(api, "D"):
            pass  # api references the module, patched above
    elif variant == "D":
        inf.FactStore._finalize_if_chained = lambda self, block: None
    elif variant not in ("A", "E", "G"):
        raise SystemExit(f"unknown variant {variant}")


def main() -> None:
    os.environ.setdefault("RIFY_DRIVER_MEMORY", f"{max(4, CPUS * 2)}g")
    apply_variant(VARIANT)

    from pyspark.sql import functions as F

    from rify_spark.api import infer_df
    from rify_spark.rules import Bound as B, Rule, Unbound as U
    from rify_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name=f"rify-profile-{VARIANT}-{CPUS}",
        shuffle_partitions=2 * CPUS,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    edges = spark.range(1, TREE_N, 1, 2 * CPUS).select(
        F.concat(F.lit("node:"), F.col("id")).alias("s"),
        F.lit("parent").alias("p"),
        F.concat(F.lit("node:"), (F.col("id") / 2).cast("long")).alias("o"),
        F.lit("graph://tree").alias("g"),
    )
    rules = [
        Rule.create(
            [[U("a"), B("parent"), U("b"), U("g")]],
            [[U("a"), B("ancestor"), U("b"), U("g")]],
        ),
        Rule.create(
            [
                [U("a"), B("ancestor"), U("b"), U("g")],
                [U("b"), B("ancestor"), U("c"), U("g")],
            ],
            [[U("a"), B("ancestor"), U("c"), U("g")]],
        ),
    ]
    t0 = time.time()
    from rify_spark.infer import InferConfig

    cfg = InferConfig(salt_hot_values=False)
    if VARIANT == "E":  # all-shuffle: no delta broadcast at any size
        cfg.broadcast_delta_max_rows = 0
    elif VARIANT == "G":  # broadcast everything, even the 8M-row delta
        cfg.broadcast_delta_max_rows = 100_000_000

    derived_df, fx = infer_df(spark, edges, rules, config=cfg)
    n = derived_df.count()
    wall = time.time() - t0
    out = {
        "variant": VARIANT,
        "cpus": CPUS,
        "tree_n": TREE_N,
        "wall_s": round(wall, 2),
        "derived": n,
        "tps": round(n / wall, 1),
        "iters": [
            {
                "it": m.get("iteration"),
                "delta": m.get("delta_rows"),
                "wall": m.get("wall_s"),
                "compacted": m.get("compacted"),
            }
            for m in fx.metrics
        ],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
