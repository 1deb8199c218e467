"""SparkSession factory with the engine's preferred configuration."""

from __future__ import annotations

import os
from typing import Mapping, Optional

from pyspark.sql import SparkSession


def get_spark(
    master: Optional[str] = None,
    app_name: str = "rify-spark",
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[Mapping[str, str]] = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the fixpoint workload.

    AQE is mandatory: it re-plans the per-iteration join DAGs at runtime
    (broadcast conversion once a delta shrinks, skew-join splitting on hot
    predicates, partition coalescing for the small early iterations).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("RIFY_SHUFFLE_PARTITIONS", str(min(64, 2 * cpus))))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow co-partitioned joins on a SUBSET of the join keys: the
        # bucketed fact store partitions by s (p/g literals fold out of
        # join keys in rule-head candidates), and with this off Spark 4
        # would re-exchange the store side every fixpoint iteration
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # NOTE: spark.sql.constraintPropagation.enabled stays at the Spark
        # default here. Disabling it helps only the fixpoint's
        # iteration-deep plans (~0.5 s/iteration of optimizer time) and was
        # measured to COST the shallow ops queries ~10% (knn_lsh A/B,
        # AB_KNN_LSH.json, round 5) — so infer.fixpoint() scopes the off
        # toggle to its own run and restores on exit.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("RIFY_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # shuffle/spill to RAM-backed storage when available: this box's /tmp is
    # disk-backed and becomes the bottleneck for shuffle-heavy fixpoints
    # (cluster nodes in the target deployment have NVMe/ram-disk local dirs).
    # Override with RIFY_SPARK_LOCAL_DIR; opt out with RIFY_SPARK_LOCAL_DIR=default.
    local_dir = os.environ.get("RIFY_SPARK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/rify-spark-local"
    if local_dir and local_dir != "default":
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
