"""Incremental LSH index: cross-batch near-duplicate discovery, append-only
index growth, idempotent batch replay."""

import os

from pyspark.sql import functions as F

from rify_spark.streaming.lsh_index import IncrementalLshIndex

SCHEMA = "doc_id long, text string"

TXT_A = "the quick brown fox jumps over the lazy dog near the river bank"
TXT_B = "completely different content about distributed query engines and shuffles"
TXT_C = "another unrelated document that talks about parquet files and pruning"


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, ix, src, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = ix.attach(stream, ckpt)
    q.awaitTermination(120)


def test_incremental_lsh_cross_batch_pairs(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ix = IncrementalLshIndex(
        spark, str(tmp_path / "index"), str(tmp_path / "pairs")
    )
    os.makedirs(src, exist_ok=True)

    # batch 1: A and B (no duplicates yet)
    _write(spark, src, [(1, TXT_A), (2, TXT_B)])
    _drain(spark, ix, src, ckpt)
    assert ix.pairs().count() == 0
    n_index_1 = ix.index().count()
    assert n_index_1 > 0  # band rows landed

    # batch 2: an exact near-dup of A (id 7) and one more unique doc ->
    # the cross-batch join finds (1, 7) without recomputing batch 1
    _write(spark, src, [(7, TXT_A), (8, TXT_C)])
    _drain(spark, ix, src, ckpt)
    pairs = {tuple(r) for r in ix.pairs().collect()}
    assert (1, 7) in pairs
    assert not any({a, b} == {1, 2} for a, b in pairs)
    assert ix.index().count() > n_index_1

    # batch 3: in-batch duplicate pair (20, 21) plus a dup of C (22) ->
    # both the in-batch pair and the cross-batch pair appear
    _write(spark, src, [(20, TXT_B), (21, TXT_B), (22, TXT_C)])
    _drain(spark, ix, src, ckpt)
    pairs = {tuple(r) for r in ix.pairs().collect()}
    assert (20, 21) in pairs
    assert (8, 22) in pairs
    assert (2, 20) in pairs and (2, 21) in pairs  # cross-batch to batch 1

    # idempotent replay: re-running a batch id overwrites, not duplicates
    batch_docs = spark.createDataFrame([(20, TXT_B), (21, TXT_B), (22, TXT_C)], SCHEMA)
    n_pairs = ix.pairs().count()
    n_index = ix.index().count()
    ix.process_batch(batch_docs, batch_id=2)  # same id as batch 3's replay
    assert ix.pairs().count() == n_pairs
    assert ix.index().count() == n_index
