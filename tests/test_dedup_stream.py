"""Streaming dedup semantics: first occurrence emitted once, duplicates
within the watermark dropped across batches, state retired after the
watermark (bounded-state contract, re-emission documented)."""

import os
from datetime import datetime

from rify_spark.streaming.dedup import dedup_stream

SCHEMA = "ts timestamp, doc_id long, text string"


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        dedup_stream(stream, watermark_delay="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _docs(spark, out):
    return sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    )


def test_streaming_dedup_bounded_state(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    os.makedirs(src, exist_ok=True)
    os.makedirs(out, exist_ok=True)

    # batch 1: A, dup-of-A, B -> A (first), B emitted; in-batch dup dropped
    spark.createDataFrame(
        [(_ts(10, 0), 1, "alpha"), (_ts(10, 5), 2, "alpha"), (_ts(10, 10), 3, "beta")],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    assert _docs(spark, out) == [(1, "alpha"), (3, "beta")]

    # batch 2: cross-batch dup of A within the watermark -> dropped; C emitted
    spark.createDataFrame(
        [(_ts(10, 30), 4, "alpha"), (_ts(10, 40), 5, "gamma")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    assert _docs(spark, out) == [(1, "alpha"), (3, "beta"), (5, "gamma")]

    # batch 3: an event at 20:00 advances the watermark to 19:00, retiring
    # every key's state; batch 4's re-arrival of "alpha" then RE-EMITS —
    # the documented bounded-state (at-least-once-distinct) contract
    spark.createDataFrame([(_ts(20, 0), 6, "delta")], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    spark.createDataFrame([(_ts(20, 1), 7, "alpha")], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    assert _docs(spark, out) == [
        (1, "alpha"),
        (3, "beta"),
        (5, "gamma"),
        (6, "delta"),
        (7, "alpha"),
    ]
