"""Event-stream style operators over the events table (batch forms).

Windowed aggregation and gap-based sessionization — the batch equivalents
of the Structured Streaming operators (streaming/sessionize.py runs the
same sessionization statefully). Value sums are integer-quantized
(milli-units) so the DuckDB oracles are exact; window starts serialize as
UTC strings for cross-engine hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact milli-sum."""
    w = F.window("ts", "1 hour")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sum_value_milli"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_milli",
        )
    )


def windowed_counts_sql() -> str:
    return """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
    FROM events
    GROUP BY 1, 2
    """


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding windows (1-hour length, 30-minute slide) per event_type.

    Spark's F.window duplicates each row into length/slide = 2 window
    assignments before the groupBy — the standard hopping-window plan, one
    shuffle on (window, event_type). Window starts align to multiples of
    the slide (epoch-aligned), which the oracle reproduces exactly.
    """
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sum_value_milli"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_milli",
        )
    )


def sliding_counts_sql() -> str:
    """Each event belongs to exactly two hour-long windows whose starts are
    the two latest 30-minute marks <= ts; enumerate both via UNION ALL."""
    return """
    WITH marks AS (
      SELECT event_type, value,
             make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000)
               AS mark
      FROM events
    ),
    assigned AS (
      SELECT event_type, value, mark AS window_start FROM marks
      UNION ALL
      SELECT event_type, value, mark - INTERVAL 30 MINUTE AS window_start FROM marks
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
    FROM assigned
    GROUP BY 1, 2
    """


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to the
    previous event exceeds ``gap_min`` minutes.

    Classic two-window formulation (lag -> boundary flag -> running sum);
    both windows partition by user_id, so it is a single shuffle on the
    user key at any scale.
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_min * 60
    # ts is TIMESTAMP_NTZ: go NTZ -> timestamp -> epoch seconds (session tz
    # is pinned to UTC, so this matches DuckDB's epoch() on the naive value)
    epoch = F.col("ts").cast("timestamp").cast("long")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(epoch - F.lag(epoch).over(order) > gap_s, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    with_sid = flagged.withColumn(
        "session_id", F.sum("new_session").over(order).cast("long")
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


def sessionize_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    gap_s = gap_min * 60
    return f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > {gap_s}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sid AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sid
    GROUP BY user_id, session_id
    """
