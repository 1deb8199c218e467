"""Incremental inference over a quad stream (Structured Streaming).

The reference engine is batch-only (no streaming surface at all —
SURVEY.md §2.2), but its semi-naive worklist maps naturally onto Spark
Structured Streaming: every arriving micro-batch of quads IS a delta, and
the engine's delta-restricted evaluation (infer.py) is exactly the
incremental-view-maintenance step. This module wires that up:

    readStream (file source / any source producing s,p,o,g)
      -> foreachBatch(IncrementalReasoner.process_batch)
          batch quads = Δ; append novel quads to the LIVE FactStore; run
          the delta-restricted fixpoint against it; append this batch's
          additions to the durable bucketed parquet store

Scale design (what keeps per-batch wall flat in store size):
  * the FactStore persists ACROSS micro-batches (``fixpoint(reuse_store=)``)
    — the novelty anti-join and the semi-naive joins read the store's
    cached s-partitioned blocks in place; nothing re-reads the parquet
    store per batch (the round-2 design re-read + anti-joined the whole
    persisted store every batch);
  * the durable parquet store is hash-BUCKETED on s
    (``bucket=pmod(xxhash64(s), n_buckets)`` directory partitions), so a
    cold restart can prune its recovery scan and offline consumers join
    bucket-wise; per-batch appends write only this batch's additions
    (O(delta) files);
  * appends accumulate small files; :meth:`compact_store` rewrites each
    bucket into one file (atomic directory swap), auto-triggered every
    ``compact_files_every`` batches — amortized O(store / interval);
  * per-batch join-order stats / hot-key scans are OFF by default here:
    they re-scan the whole store each fixpoint call, which is exactly the
    per-batch O(store) work this design removes (streaming rule sets are
    fixed and small; the static join-order heuristic suffices).

State recovery: restart re-seeds the live store from the parquet store and
Spark's own checkpointLocation replays unprocessed source files. Use
``trigger(availableNow=True)`` for catch-up-then-stop semantics (tested),
or a processing-time trigger for continuous operation.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..infer import SPOG, FactStore, InferConfig, _union_all, fixpoint, seed_facts
from ..rules import Rule, lower_rule

QUAD_SCHEMA = "s string, p string, o string, g string"
BUCKET_COL = "bucket"


class IncrementalReasoner:
    """Maintains facts = fixpoint(premises-so-far, rules) under quad arrivals.

    Monotone (inserts only) — the natural streaming analog of a
    forward-chaining engine. The per-batch cost is the semi-naive step:
    joins of the batch delta against the accumulated store's cached blocks,
    never a full recompute and never a full re-read of persisted state.
    """

    def __init__(
        self,
        spark: SparkSession,
        rules: list,
        store_dir: str,
        config: Optional[InferConfig] = None,
        n_buckets: int = 64,
        compact_files_every: int = 16,
    ):
        self.spark = spark
        self.rules = list(rules)
        self.store_dir = store_dir
        self.n_buckets = n_buckets
        self.compact_files_every = max(1, compact_files_every)
        self._batches_since_compact = 0
        if config is None:
            # stats/hot-key scans are per-fixpoint-call full-store scans —
            # exactly the O(store)-per-batch work the live store removes
            config = InferConfig(
                encode_terms=False, use_stats=False, salt_hot_values=False
            )
        self.cfg = config
        if self.cfg.encode_terms:
            # the stream store keeps raw string quads; encoding is an
            # inner detail of each batch's fixpoint
            raise ValueError("IncrementalReasoner stores string quads; use encode_terms=False")
        self.lrules = [lower_rule(r, i, lambda t: t) for i, r in enumerate(self.rules)]
        self._store: Optional[FactStore] = None
        self._recover_compaction()

    # --- durable bucketed parquet ----------------------------------------

    def _compact_paths(self) -> tuple:
        base = self.store_dir.rstrip("/")
        return base + ".__compact__", base + ".__old__"

    def _recover_compaction(self) -> None:
        """Heal a crash inside :meth:`compact_store`'s directory swap.

        The swap window is: rename(store, old) -> rename(tmp, store) ->
        rmtree(old). A crash between the two renames leaves the data
        stranded in ``.__old__`` with no store directory — a restarted
        reasoner would otherwise see an empty store and silently start from
        nothing. Recovery: if the store is missing but ``.__old__`` exists,
        rename it back (the compacted ``.__compact__`` copy, if complete,
        holds the same rows — either directory is a correct store; the
        original is the conservative pick). Leftover side directories are
        then removed in both cases."""
        tmp, old = self._compact_paths()
        if not os.path.isdir(self.store_dir) and os.path.isdir(old):
            os.rename(old, self.store_dir)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    def _has_parquet(self) -> bool:
        return os.path.isdir(self.store_dir) and any(
            not e.startswith(".") for e in os.listdir(self.store_dir)
        )

    def facts(self) -> DataFrame:
        """The durable store (cold-read path: restart recovery / offline
        consumers). Bucket directory partitions allow bucket-pruned scans."""
        if self._has_parquet():
            return (
                self.spark.read.schema(f"{QUAD_SCHEMA}, {BUCKET_COL} int")
                .parquet(self.store_dir)
                .select(*SPOG)
            )
        return self.spark.createDataFrame([], QUAD_SCHEMA)

    def _append_parquet(self, df: DataFrame) -> None:
        # repartition on the bucket key first: partitionBy splits EVERY task
        # by bucket value, so an un-repartitioned append (novel + iteration
        # deltas ≈ hundreds of store-width partitions) writes tasks×buckets
        # tiny files — measured ~25k files/batch, 447k files after a 50-batch
        # soak, with the append wall growing to ~50 s/batch. One exchange of
        # O(delta) rows caps the append at n_buckets files per batch.
        (
            df.withColumn(
                BUCKET_COL,
                F.pmod(F.xxhash64("s"), F.lit(self.n_buckets)).cast("int"),
            )
            .repartition(self.n_buckets, BUCKET_COL)
            .write.mode("append")
            .partitionBy(BUCKET_COL)
            .parquet(self.store_dir)
        )

    def compact_store(self) -> None:
        """Rewrite the bucketed store with one file per bucket (atomic swap:
        write aside, then replace). Appends leave O(batches) small files per
        bucket; compaction returns the store to O(n_buckets) files."""
        if not self._has_parquet():
            return
        tmp, old = self._compact_paths()
        shutil.rmtree(tmp, ignore_errors=True)
        (
            self.spark.read.schema(f"{QUAD_SCHEMA}, {BUCKET_COL} int")
            .parquet(self.store_dir)
            .repartition(self.n_buckets, BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(tmp)
        )
        # swap window healed by _recover_compaction on the next startup
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.store_dir, old)
        os.rename(tmp, self.store_dir)
        shutil.rmtree(old, ignore_errors=True)

    # --- live store -------------------------------------------------------

    def _live_store(self) -> FactStore:
        """The cross-batch FactStore, seeded once (from the durable store on
        restart, empty otherwise)."""
        if self._store is None:
            self._store = FactStore(
                self.spark,
                fixed_partitions=self.cfg.store_partitions,
                compact_every=self.cfg.store_compact_every,
            )
            self._store.seed(self.facts())
        return self._store

    def _reset_live_store(self) -> None:
        """Drop the live FactStore; the next batch re-seeds from the durable
        parquet, i.e. from exactly the committed batch prefix."""
        if self._store is not None:
            for b in self._store.blocks:
                try:
                    b.unpersist()
                except Exception:
                    pass
        self._store = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: treat the micro-batch as the worklist delta.

        Failure atomicity: the live store is mutated (novel block appended,
        fixpoint derivations added) BEFORE the durable parquet append — if
        any step fails mid-batch, a replay against the mutated store would
        find the batch's premises already present, return early, and the
        batch's closure would never be computed nor persisted. The except
        path therefore rolls the live store back to the committed state by
        dropping it (re-seeded from parquet on the next call)."""
        store = self._live_store()
        batch = batch_df.select(*SPOG).dropDuplicates(SPOG)
        try:
            if store.total_rows == 0:
                # first facts: unconditional heads are not yet materialized —
                # run a full first round over seed_facts. The store was
                # seeded EMPTY (block width 1); re-seed it from the first
                # real batch so the width matches the data instead of
                # serializing every join until the first prefix compaction.
                for b in store.blocks:
                    b.unpersist()
                seed = seed_facts(self.spark, batch, self.lrules, "string")
                novel, n_novel = store.seed(seed)
                if n_novel == 0:
                    return
            else:
                # novelty against cached blocks (arrivals may repeat facts
                # already present or derived) — no parquet re-read
                novel = store.anti(
                    batch.repartition(store.partitions, "s")
                ).localCheckpoint(eager=True)
                blk = store.stage_block(novel)
                n_novel = blk.count()
                if n_novel == 0:
                    blk.unpersist()
                    return
                store.add_block(blk, rows=n_novel, src=novel)
            res = fixpoint(
                self.spark,
                novel,  # schema source only (reuse_store is authoritative)
                self.lrules,
                self.cfg,
                delta0=novel,
                reuse_store=store,
                track_deltas=True,
            )
            # durable append: exactly this batch's additions (novel premises
            # + tracked per-iteration deltas) — O(delta), never O(store)
            self._append_parquet(_union_all([novel] + res.delta_dfs))
        except BaseException:
            self._reset_live_store()
            raise
        # long-running stream: once the store dwarfs the typical batch, the
        # small-store single-anti path re-broadcasts the WHOLE store union
        # every batch (a serial HashedRelation build growing with the store).
        # Force the chained per-block anti from then on — the facts side
        # stays in place and per-batch cost tracks the batch, not the store.
        if (
            store.total_rows > 10 * max(n_novel, 1)
            and store.total_rows > 100_000
        ):
            store.single_anti_max_rows = min(store.single_anti_max_rows, 100_000)
        self._batches_since_compact += 1
        if self._batches_since_compact >= self.compact_files_every:
            self.compact_store()
            self._batches_since_compact = 0

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
