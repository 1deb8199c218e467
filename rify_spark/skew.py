"""Skew-mitigation utilities: salted equi-joins for hot keys.

The fixpoint's hot joins are usually broadcast (delta side fits), which is
skew-immune: a broadcast hash join streams the big side, so one hot key
just streams through many tasks. Skew bites when BOTH sides are large —
an SMJ whose hot key lands every matching row in one task. AQE's skew-join
splitting (on by default, session.py) repairs the sort-merge case at
runtime; this module provides the explicit form for plans AQE cannot fix
(aggregation-feeding joins, anti-joins against a hot build side, or when a
deterministic plan is preferred over runtime re-planning).

Mechanics (classic salting):
  * the SKEWED side gets a salt column in [0, n_salts) derived from a hash
    of the whole row — deterministic, no RNG, spreads one hot key across
    n_salts partitions;
  * the OTHER side is exploded n_salts times (one copy per salt value);
  * the join adds the salt to the key list, then drops it.

Cost model: the exploded side pays n_salts x its size in shuffle; the
skewed side pays nothing extra. Use when hot-key concentration (top key
share x side size / parallelism) dominates that cost.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Attach a deterministic salt in [0, n_salts): hash of the full row,
    so equal rows get equal salts (safe under retries, unlike rand())."""
    return df.withColumn(
        _SALT, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def exploded_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row once per salt value."""
    return df.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on ``on``, spreading hot keys of
    the skewed side across ``n_salts`` partitions.

    Works for "inner", "left", "left_semi" and "left_anti" with ``skewed``
    as the left side: replication on the right side never duplicates or
    drops left rows for semi/anti because each left row carries exactly one
    salt and the right side covers all salts.

    For "inner"/"left", matching right rows appear once per left row (the
    left row joins only its own salt's copy) — same multiplicity as the
    plain join.
    """
    if how == "inner" or how.startswith("left"):
        left = with_salt(skewed, n_salts)
        right = exploded_salts(other, n_salts)
        out = left.join(right, [*on, _SALT], how)
        return out.drop(_SALT) if _SALT in out.columns else out
    raise ValueError(f"salted_join does not support how={how!r}")


def key_skew_stats(df: DataFrame, on: Sequence[str], top: int = 5) -> list:
    """Top key frequencies — the decision input for salting: if
    top_share * rows >> rows / parallelism, the plain join stragglers."""
    total = df.count()
    rows = (
        df.groupBy(*on)
        .count()
        .orderBy(F.desc("count"))
        .limit(top)
        .collect()
    )
    return [
        {**{k: r[k] for k in on}, "count": r["count"], "share": r["count"] / max(total, 1)}
        for r in rows
    ]
