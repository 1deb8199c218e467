"""Incremental LSH index maintenance under streaming document ingest.

The MinHash/LSH dedup index is embarrassingly incremental: a document's
band keys depend only on its own text, so a micro-batch contributes its
band rows by pure append, and the batch's near-duplicate candidates are

    (new x historical) band-key equi-join  ∪  (new x new) in-batch pairs

— per-batch cost O(batch x collisions), never a recompute over history and
never all-pairs (same banding math as ops/dedup.lsh_candidate_pairs).

Idempotent by construction: each batch writes its band rows and pairs to a
``batch=<id>`` subdirectory with mode=overwrite, so a foreachBatch retry
after a crash rewrites the same state instead of duplicating it. At
cluster scale the index directory is a date/batch-partitioned table; the
historical side of the join stays in place (partition-pruned parquet),
only the small batch side shuffles/broadcasts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.dedup import _BAND_KEYS, _band_rows, minhash_signatures


class IncrementalLshIndex:
    """Maintains the banded MinHash index and emits candidate pairs per
    micro-batch. Attach with ``stream.writeStream.foreachBatch(ix.process_batch)``.
    """

    def __init__(self, spark: SparkSession, index_dir: str, pairs_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.pairs_dir = pairs_dir
        os.makedirs(index_dir, exist_ok=True)
        os.makedirs(pairs_dir, exist_ok=True)

    def _batch_dirs(self, root: str, exclude_batch: int | None = None) -> list:
        skip = f"batch={exclude_batch}" if exclude_batch is not None else None
        return [
            os.path.join(root, d)
            for d in sorted(os.listdir(root))
            if d.startswith("batch=") and d != skip
        ]

    def index(self, exclude_batch: int | None = None) -> DataFrame:
        """All band rows indexed so far (doc_id, band, k0..k{r-1}).
        ``exclude_batch`` drops one batch directory — used by a batch's own
        processing so a foreachBatch RETRY does not join the batch against
        its own previously-written rows (self-pairs)."""
        dirs = self._batch_dirs(self.index_dir, exclude_batch)
        if not dirs:
            schema = "doc_id long, " + ", ".join(
                f"{k} long" for k in _BAND_KEYS
            ).replace("band long", "band int")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*dirs)

    def pairs(self) -> DataFrame:
        """All candidate pairs emitted so far (doc_a, doc_b), doc_a < doc_b."""
        dirs = self._batch_dirs(self.pairs_dir)
        if not dirs:
            return self.spark.createDataFrame([], "doc_a long, doc_b long")
        return self.spark.read.parquet(*dirs).distinct()

    def process_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        """foreachBatch body: index the batch, emit its new candidate pairs."""
        if batch_docs.isEmpty():
            return
        bands = _band_rows(minhash_signatures(batch_docs)).localCheckpoint(
            eager=True
        )
        hist = self.index(exclude_batch=batch_id)

        def named(df, suffix):
            cols = [F.col("doc_id").alias(f"doc_{suffix}")] + [
                F.col(k).alias(f"{k}_{suffix}") for k in _BAND_KEYS
            ]
            return df.select(*cols)

        on_cross = [
            F.col(f"{k}_n") == F.col(f"{k}_h") for k in _BAND_KEYS
        ]
        cross = (
            named(bands, "n")
            .join(named(hist, "h"), on_cross)
            .filter(F.col("doc_n") != F.col("doc_h"))
            .select(
                F.least("doc_n", "doc_h").alias("doc_a"),
                F.greatest("doc_n", "doc_h").alias("doc_b"),
            )
        )
        on_in = [F.col(f"{k}_n") == F.col(f"{k}_m") for k in _BAND_KEYS] + [
            F.col("doc_n") < F.col("doc_m")
        ]
        inbatch = (
            named(bands, "n")
            .join(named(bands, "m"), on_in)
            .select(F.col("doc_n").alias("doc_a"), F.col("doc_m").alias("doc_b"))
        )
        pairs = cross.unionByName(inbatch).distinct()

        pairs.write.mode("overwrite").parquet(
            os.path.join(self.pairs_dir, f"batch={batch_id}")
        )
        bands.write.mode("overwrite").parquet(
            os.path.join(self.index_dir, f"batch={batch_id}")
        )

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        """Start the maintenance query on a streaming docs DataFrame."""
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
