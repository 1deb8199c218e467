"""Watermarked windowed aggregation over an event stream.

The streaming twin of ops/events.windowed_counts: tumbling event-time
windows with a watermark bounding how late data may arrive. In append mode
a window's aggregate is emitted exactly once — when the watermark passes the
window end — and events later than the watermark are dropped (the bounded
-state contract that lets the aggregation run forever at 100 TB/day rates:
state per key is one window aggregate, retired at watermark + window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """events stream (ts: timestamp, event_type, value) -> windowed counts.

    Append-mode compatible: requires the watermark. Output columns match the
    batch op (window_start string, event_type, n_events, sum_value_milli)
    so batch/stream parity is directly testable.
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias(
                "sum_value_milli"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value_milli",
        )
    )
