"""Debug harness for iteration fusion: explain + time one fused vs two
plain iterations on a mid-size chain closure."""
from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from rify_spark.api import infer_df
from rify_spark.infer import InferConfig
from rify_spark.rules import Bound as B, Rule, Unbound as U
from rify_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[8]", app_name="fuse-debug", shuffle_partitions=16)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    n = int(os.environ.get("N", "200000"))
    edges = spark.range(1, n, 1, 16).select(
        F.concat(F.lit("node:"), F.col("id")).alias("s"),
        F.lit("parent").alias("p"),
        F.concat(F.lit("node:"), (F.col("id") / 2).cast("long")).alias("o"),
        F.lit("graph://tree").alias("g"),
    ).localCheckpoint()
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
    for fuse in (1, 2):
        t0 = time.time()
        df, fx = infer_df(
            spark, edges, rules,
            config=InferConfig(fuse_rounds=fuse, fuse_below_rows=10**9),
        )
        cnt = df.count()
        print(
            f"fuse={fuse} wall={time.time()-t0:.2f} iters={fx.iterations} "
            f"derived={cnt} iter_walls={[m.get('wall_s') for m in fx.metrics]}"
        )


if __name__ == "__main__":
    main()
