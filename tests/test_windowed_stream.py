"""Watermarked streaming aggregation: windows close exactly once when the
watermark passes; too-late events are dropped."""

import os
from datetime import datetime

from rify_spark.streaming.windowed import windowed_counts_stream

SCHEMA = "ts timestamp, event_type string, value double"
OUT_SCHEMA = (
    "window_start string, event_type string, n_events long, sum_value_milli long"
)


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        windowed_counts_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _rows(spark, out):
    return {
        tuple(r)
        for r in spark.read.schema(OUT_SCHEMA).parquet(out).collect()
    }


def test_windows_close_on_watermark_and_late_events_drop(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    os.makedirs(src, exist_ok=True)
    os.makedirs(out, exist_ok=True)

    # batch 1: two events in the 10:00 window — not emitted yet (watermark
    # hasn't passed 11:00)
    spark.createDataFrame(
        [(_ts(10, 5), "click", 1.0), (_ts(10, 40), "click", 2.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    assert _rows(spark, out) == set()

    # batch 2: an event at 13:00 pushes the watermark to 12:30 —
    # the 10:00 window closes and is emitted exactly once
    spark.createDataFrame([(_ts(13, 0), "view", 5.0)], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    assert _rows(spark, out) == {
        ("2024-01-01 10:00:00", "click", 2, 3000),
    }

    # batch 3: a too-late event for the already-closed 10:00 window is
    # dropped; a fresh event at 15:00 advances the watermark past 13:00
    spark.createDataFrame(
        [(_ts(10, 50), "click", 9.0), (_ts(15, 0), "view", 1.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    rows = _rows(spark, out)
    # 10:00 window unchanged (late event dropped, no duplicate emission);
    # 13:00 window emitted
    assert ("2024-01-01 10:00:00", "click", 2, 3000) in rows
    assert ("2024-01-01 13:00:00", "view", 1, 5000) in rows
    assert not any(r[0] == "2024-01-01 10:00:00" and r[2] != 2 for r in rows)
