"""Watermarked streaming deduplication: emit each document once, with
bounded state.

The streaming twin of ops/dedup.exact_dedup for a continuous ingest
pipeline (the 100 TB/day case: an unbounded `dropDuplicates` would
accumulate one state row per distinct document forever and OOM the state
store; a TTL is mandatory).

Built on ``dropDuplicatesWithinWatermark`` (Structured Streaming's
dedicated operator for exactly this): the first arrival of a key is
emitted immediately, later arrivals of the same key are dropped for as
long as the key's state lives, and state is retired once the watermark
passes first-seen + delay. The contract is therefore *at-least-once
distinct*: a duplicate arriving later than the watermark delay after its
first occurrence is re-emitted — the price of bounded state. Size the
delay to the pipeline's real reordering window and compact re-emissions
downstream with the batch exact_dedup if exactness is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    watermark_delay: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming docs (ts timestamp, doc_id, text) -> first-seen docs only.

    Keyed on md5(text) — same key as the batch exact_dedup, so the stream's
    output is a subset-with-first-occurrence of the batch representative
    set whenever every duplicate pair arrives within ``watermark_delay``.
    State per key: one timestamp, retired at watermark + delay.
    """
    return (
        docs.withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
