"""Incremental inference over a quad stream (Structured Streaming).

The reference engine is batch-only (no streaming surface at all —
SURVEY.md §2.2), but its semi-naive worklist maps naturally onto Spark
Structured Streaming: every arriving micro-batch of quads IS a delta, and
the engine's delta-restricted evaluation (infer.py) is exactly the
incremental-view-maintenance step. This module wires that up:

    readStream (file source / any source producing s,p,o,g)
      -> foreachBatch(IncrementalReasoner.process_batch)
          batch quads = Δ; run the fixpoint seeded with Δ against the
          accumulated fact store; append novel facts to the store sink

State = the accumulated facts parquet directory (readable between batches,
atomically appended), which doubles as the resume checkpoint: restarting
the stream re-reads the store and Spark's own checkpointLocation replays
unprocessed source files. Use ``trigger(availableNow=True)`` for
catch-up-then-stop semantics (tested), or a processing-time trigger for
continuous operation.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..infer import SPOG, InferConfig, fixpoint, seed_facts
from ..rules import Rule, lower_rule

QUAD_SCHEMA = "s string, p string, o string, g string"


class IncrementalReasoner:
    """Maintains facts = fixpoint(premises-so-far, rules) under quad arrivals.

    Monotone (inserts only) — the natural streaming analog of a
    forward-chaining engine. The per-batch cost is the semi-naive step:
    joins of the batch delta against the accumulated store, never a full
    recompute.
    """

    def __init__(
        self,
        spark: SparkSession,
        rules: list,
        store_dir: str,
        config: Optional[InferConfig] = None,
    ):
        self.spark = spark
        self.rules = list(rules)
        self.store_dir = store_dir
        self.cfg = config or InferConfig(encode_terms=False)
        if self.cfg.encode_terms:
            # the stream store keeps raw string quads; encoding is an
            # inner detail of each batch's fixpoint
            raise ValueError("IncrementalReasoner stores string quads; use encode_terms=False")
        self.lrules = [lower_rule(r, i, lambda t: t) for i, r in enumerate(self.rules)]

    def facts(self) -> DataFrame:
        if os.path.exists(os.path.join(self.store_dir, "_SUCCESS")) or (
            os.path.isdir(self.store_dir) and os.listdir(self.store_dir)
        ):
            return self.spark.read.schema(QUAD_SCHEMA).parquet(self.store_dir)
        return self.spark.createDataFrame([], QUAD_SCHEMA)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: treat the micro-batch as the worklist delta."""
        batch = batch_df.select(*SPOG).dropDuplicates(SPOG)
        if batch.isEmpty():
            return
        store = self.facts()
        # novel premises only (arrivals may repeat facts already derived)
        novel = batch.join(store, SPOG, "left_anti")
        if novel.isEmpty():
            return
        combined = store.unionByName(novel)
        # incremental semi-naive: the store is already a fixpoint, so seed
        # the first round's worklist with only the novel arrivals. On the
        # very first batch the store is empty and unconditional-rule heads
        # are not yet materialized, so run a full first round instead.
        # (Rules are fixed for the lifetime of a stream.)
        first_batch = store.isEmpty()
        res = fixpoint(
            self.spark,
            seed_facts(self.spark, combined, self.lrules, "string"),
            self.lrules,
            self.cfg,
            delta0=None if first_batch else novel,
        )
        additions = res.facts.join(store, SPOG, "left_anti")
        additions.write.mode("append").parquet(self.store_dir)

    def start_file_stream(
        self,
        source_dir: str,
        checkpoint_dir: str,
        available_now: bool = True,
    ):
        stream = (
            self.spark.readStream.schema(QUAD_SCHEMA)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def quad_stream_from_files(
    spark: SparkSession, source_dir: str
) -> DataFrame:
    """Convenience: a streaming DataFrame of quads from a parquet directory."""
    return spark.readStream.schema(QUAD_SCHEMA).parquet(source_dir)
