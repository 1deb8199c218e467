"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (`_decode_stub`) behind an import-try for
real libraries — but the Spark-side plumbing is real and tested: binary
columns, typed metadata structs, Arrow-batched `mapInPandas` with bounded
batch sizes, and a downstream schema identical to what a real decoder would
emit (so swapping in PIL/librosa later changes one function).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, head_hex string, "
    "width long, height long, mean_byte double"
)


def fake_media_df(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media: binary, kind, declared_w, declared_h).

    Deterministic stand-in for an image/audio blob column: the bytes are the
    utf-8 text, the declared dimensions derive from doc_id. At 100 TB the
    binary column dominates row size — everything downstream treats it as
    opaque bytes (never stringified, never exploded)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("kind"),
        (F.col("doc_id") % 64 + 1).alias("declared_w"),
        (F.col("doc_id") % 48 + 1).alias("declared_h"),
    )


def _decode_stub(media: bytes, kind: str, w: int, h: int) -> dict:
    """Deterministic fake decode. A real deployment replaces this body with
    PIL / soundfile decoding; the signature and output schema stay fixed."""
    # Real codecs (PIL / soundfile) are an explicit opt-in: flip this flag
    # and fill in the decode body when deploying somewhere with codecs.
    # The deterministic stub below runs regardless of what libraries happen
    # to be importable, so the pipeline never crashes on an incidental
    # Pillow install.
    USE_REAL_CODECS = False
    if USE_REAL_CODECS:  # pragma: no cover - deployment hook
        raise NotImplementedError(
            "real media decode not wired in this environment"
        )
    n = len(media)
    head = media[:4].hex()
    mean = (sum(media[:256]) / min(n, 256)) if n else 0.0
    return {
        "n_bytes": n,
        "head_hex": head,
        "width": int(w),
        "height": int(h),
        "mean_byte": float(mean),
    }


def extract_media_features(media_df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary media via mapInPandas.

    The iterator-of-batches shape is the real contract for heavy decode UDFs:
    bounded memory per batch, no driver collection, output schema declared
    up front."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(m, k, w, h)
                for m, k, w, h in zip(
                    pdf["media"], pdf["kind"], pdf["declared_w"], pdf["declared_h"]
                )
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out[
                ["doc_id", "kind", "n_bytes", "head_hex", "width", "height", "mean_byte"]
            ]

    return media_df.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def media_features_sql() -> str:
    """DuckDB oracle for the stubbed decode (bytes are deterministic, so the
    'decoded' features are SQL-expressible — exactly why the stub is a fair
    stand-in for plumbing tests)."""
    # the generated documents are ASCII, so utf-8 bytes == character codes;
    # the oracle reads them with ascii(substr(...)) instead of blob indexing
    return """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS head_hex,
           doc_id % 64 + 1 AS width,
           doc_id % 48 + 1 AS height,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE list_sum(list_transform(
                       range(1, least(length(text), 256) + 1),
                       i -> ascii(substr(text, i, 1))
                     )) / least(length(text), 256)
           END AS mean_byte
    FROM documents
    """
