"""Deterministic sf1 derived from the driver's sf0.1 (10x replication with
key remap + per-replica content salting) -> /tmp/rify_sf1.

The driver ships sf{0.001,0.01,0.1} only; VERDICT r3 item 5 asks for the
headline bench one order up. Construction (seedless, replica index i in
0..9):

  * customer: c_custkey' = c_custkey + i * maxkey — custkeys stay a
    contiguous 1..10*maxkey range, so the k -> k//2 benchmark tree is ONE
    binary tree with 10x the nodes (exactly the sf1 shape of the driver's
    generator, which keys customers densely);
  * orders: o_orderkey' remapped likewise; o_custkey' follows the customer
    remap so per-customer fan-out is preserved;
  * documents: doc_id' remapped; text salted with a per-replica letter
    ROTATION (a->b->c... by i) so replicas are dissimilar documents —
    plain duplication would give every doc 9 exact clones and turn the
    dedup benchmarks into a degenerate all-duplicates workload; rotation
    preserves lengths, token boundaries, case mix and punctuation ratios
    (the text-op workload) while destroying shingle overlap;
  * embeddings: vec_id' remapped; vector ROTATED by i positions (norms and
    pairwise-distance distribution within a replica preserved; replicas
    are distinct points so kNN candidate sets grow honestly).

nation/region are dimension tables and do not scale with sf (TPC-H
convention) — the bench queries read them via sf_dir so they are copied.
"""
from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("RIFY_SF1_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("RIFY_SF1_DST", "/tmp/rify_sf1")
REPLICAS = int(os.environ.get("RIFY_SF1_REPLICAS", "10"))
CPUS = int(os.environ.get("RIFY_SF1_CPUS", "16"))


def main() -> None:
    from pyspark.sql import functions as F

    from rify_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]", app_name="make-sf1", shuffle_partitions=2 * CPUS
    )
    os.makedirs(DST, exist_ok=True)

    def reps():
        return spark.range(REPLICAS).select(F.col("id").cast("int").alias("__rep"))

    def replicate(name: str, remap: dict, salt=None):
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        maxes = {
            c: df.agg(F.max(c)).first()[0] for c in remap
        }
        out = df.crossJoin(reps())
        for c, base in remap.items():
            out = out.withColumn(
                c, (F.col(c) + F.col("__rep") * F.lit(maxes[c])).cast("bigint")
            )
        if salt is not None:
            out = salt(out)
        out.drop("__rep").repartition(2 * CPUS).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )

    # letter rotation by replica index: translate(text, 'a..zA..Z', rotated)
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()

    def salt_text(out):
        expr = F.col("text")
        for i in range(1, REPLICAS):
            tgt = lower[i:] + lower[:i] + upper[i:] + upper[:i]
            expr = F.when(
                F.col("__rep") == i, F.translate(F.col("text"), lower + upper, tgt)
            ).otherwise(expr)
        return out.withColumn("text", expr)

    def salt_embedding(out):
        # rotate the vector by __rep positions: slice+concat
        n = F.size("embedding")
        rotated = F.concat(
            F.slice(F.col("embedding"), F.col("__rep") + 1, n),
            F.slice(F.col("embedding"), F.lit(1), F.col("__rep")),
        )
        return out.withColumn("embedding", rotated)

    replicate("customer", {"c_custkey": 1})
    replicate("orders", {"o_orderkey": 1, "o_custkey": 1})
    replicate("documents", {"doc_id": 1}, salt=salt_text)
    replicate("embeddings", {"vec_id": 1}, salt=salt_embedding)
    for name in ("nation", "region", "supplier", "part", "lineitem", "events"):
        src = f"{SRC}/{name}.parquet"
        dst = f"{DST}/{name}.parquet"
        if os.path.exists(src):
            if os.path.isdir(src):
                shutil.rmtree(dst, ignore_errors=True)
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    print("sf1 written to", DST)


if __name__ == "__main__":
    main()
