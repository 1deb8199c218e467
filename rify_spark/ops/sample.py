"""Deterministic stratified sampling for corpus balancing.

A training corpus over-represents some strata (language, source); the
standard fix is per-stratum downsampling. ``DataFrame.sample``/``F.rand``
are not reproducible across runs or engines, so the keep decision here is
a pure hash threshold: keep a doc iff

    h28(lang || ':' || doc_id)  <  floor(rate(lang) * 2^28)

with the same md5-prefix arithmetic the dedup operators use (exactly
replicable in the DuckDB oracle). Properties that matter at 100 TB:

  * a NARROW filter — no shuffle, no counting pass, pushes to the scan;
  * stable under repartitioning, re-runs, and engine swaps (no RNG state);
  * per-stratum rates are independent: changing one language's rate does
    not reshuffle which docs of another language are kept;
  * thresholds are integer literals computed driver-side (never
    float-compared executor-side — Spark truncates double->long casts
    while DuckDB rounds, so a float threshold would diverge).
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _H28_SPARK, _H28_SQL

H28_MAX = 1 << 28
# default policy: downsample the over-represented stratum (the synthetic
# corpus is ~44% 'en'); everything else kept in full
DEFAULT_RATES: dict = {"en": 0.33}


def _thresholds(rates: Optional[Mapping[str, float]], default_rate: float):
    rates = DEFAULT_RATES if rates is None else dict(rates)
    return (
        {lang: int(r * H28_MAX) for lang, r in sorted(rates.items())},
        int(default_rate * H28_MAX),
    )


def docs_sample_stratified(
    docs: DataFrame,
    rates: Optional[Mapping[str, float]] = None,
    default_rate: float = 1.0,
) -> DataFrame:
    """(doc_id, lang) of documents kept by per-language hash sampling."""
    thr, dflt = _thresholds(rates, default_rate)
    h = _H28_SPARK(F.concat(F.col("lang"), F.lit(":"), F.col("doc_id").cast("string")))
    cutoff = F.lit(dflt)
    for lang, t in thr.items():
        cutoff = F.when(F.col("lang") == lang, F.lit(t)).otherwise(cutoff)
    return docs.filter(h < cutoff).select("doc_id", "lang")


def docs_sample_stratified_sql(
    table: str = "documents",
    rates: Optional[Mapping[str, float]] = None,
    default_rate: float = 1.0,
) -> str:
    thr, dflt = _thresholds(rates, default_rate)
    h = _H28_SQL.format(c="(lang || ':' || CAST(doc_id AS VARCHAR))")
    whens = " ".join(f"WHEN '{lang}' THEN {t}" for lang, t in thr.items())
    return f"""
    SELECT doc_id, lang FROM {table}
    WHERE {h} < CASE lang {whens} ELSE {dflt} END
    """
