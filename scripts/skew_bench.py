"""Skewed-join benchmark: one hot key vs salting vs AQE.

Synthetic shape from the fixpoint's worst case: a skewed-predicate quad set
where ONE object value ("hub") appears in 90% of the rows — the shape of a
real KG where one module is imported by everything. The benchmark joins a
large delta against a large fact set on that key (both sides too big to
broadcast) four ways:

  1. plain SMJ with AQE skew-join OFF     (the straggler baseline)
  2. salted_join with AQE skew-join OFF   (blanket salting)
  3. targeted_salted_join, AQE OFF        (hot-key-only salting — what
     matcher.bindings uses when the fixpoint detects a hot term)
  4. plain SMJ with AQE skew-join ON      (the engine default)

and prints one JSON line with walls and the max-task skew proxy (rows in
the hottest output partition). Run: python scripts/skew_bench.py [rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rify_spark.session import get_spark  # noqa: E402
from rify_spark.skew import (  # noqa: E402
    key_skew_stats,
    salted_join,
    targeted_salted_join,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
HOT_SHARE = 0.9
SALTS = 32


def skewed_quads(spark, n, tag):
    # 90% of rows point at the hub object; ids differ by tag so the join
    # produces hot-key pairs without being a pure self-join
    return spark.range(n).select(
        F.concat(F.lit(f"s{tag}:"), F.col("id")).alias("s"),
        F.lit("imports").alias("p"),
        F.when(F.col("id") % 10 < int(HOT_SHARE * 10), F.lit("mod://hub"))
        .otherwise(F.concat(F.lit("mod://m"), F.col("id") % 50_000))
        .alias("o"),
        F.lit("g0").alias("g"),
    )


def run(spark, left, right, salted):
    t0 = time.time()
    if salted == "blanket":
        joined = salted_join(left, right, ["o"], n_salts=SALTS, how="inner")
    elif salted == "targeted":
        joined = targeted_salted_join(
            left, right, ["o"], hot_values=[("mod://hub",)], n_salts=SALTS
        )
    else:
        joined = left.join(right, ["o"], "inner")
    # aggregate down so the measure is the join, not result materialization
    n = joined.select(F.count("*").alias("n")).collect()[0]["n"]
    return time.time() - t0, n


def main():
    out = {"rows_per_side": N, "hot_share": HOT_SHARE, "salts": SALTS, "modes": {}}
    for mode in ("plain_noaqe", "salted_noaqe", "targeted_noaqe", "plain_aqe"):
        aqe = mode.endswith("_aqe")
        spark = get_spark(
            app_name=f"skew-{mode}",
            extra_conf={
                "spark.sql.adaptive.skewJoin.enabled": str(aqe).lower(),
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )
        # hub rows dominate: right side deduped by object to keep the
        # output bounded (n_hot_left x 1), like the fixpoint's distinct
        # object table in a resolution join
        left = skewed_quads(spark, N, "l")
        right = skewed_quads(spark, N, "r").dropDuplicates(["o"]).select("o", F.col("s").alias("rs"))
        if mode == "plain_noaqe":
            out["key_stats"] = key_skew_stats(left, ["o"], top=2)
        salted = (
            "blanket"
            if mode.startswith("salted")
            else "targeted" if mode.startswith("targeted") else ""
        )
        wall, n = run(spark, left, right, salted=salted)
        out["modes"][mode] = {"wall_s": round(wall, 2), "result_rows": n}
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
