"""Stateful streaming sessionization tests: sessions stitch across
micro-batches via explicit group state."""

import os

from rify_spark.streaming.sessionize import sessionize_stream

SCHEMA = "user_id long, ts_epoch long"


OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start long, session_end long"
)


def _run_stream(spark, src, ckpt, out_dir):
    # parquet sink (memory sink cannot recover from a checkpoint across
    # restarts, and restart-stitching is exactly what we test)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        sessionize_stream(stream, gap_min=30)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _out(spark, out_dir):
    return spark.read.schema(OUT_SCHEMA).parquet(out_dir)


def test_sessions_stitch_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)
    os.makedirs(out, exist_ok=True)
    H = 3600

    # batch 1: user 1 events at t=0 and t=10min (one open session)
    spark.createDataFrame([(1, 0), (1, 600)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, ckpt, out)
    assert _out(spark, out).count() == 0  # nothing closed yet

    # batch 2: user 1 event at t=15min (continues session across batches),
    # then t=2h (closes session 0); user 2 appears fresh
    spark.createDataFrame(
        [(1, 900), (1, 2 * H), (2, 0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, ckpt, out)
    rows = {
        (r["user_id"], r["session_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in _out(spark, out).collect()
    }
    # the closed session spans both batches: events at 0, 600, 900
    assert rows == {(1, 0, 3, 0, 900)}

    # batch 3: user 1 gap again -> closes the t=2h session (1 event)
    spark.createDataFrame([(1, 4 * H)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, ckpt, out)
    rows = {
        (r["user_id"], r["session_id"], r["n_events"])
        for r in _out(spark, out).collect()
    }
    assert rows == {(1, 0, 3), (1, 1, 1)}
