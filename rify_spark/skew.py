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

from pyspark.sql import Column, DataFrame
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


def targeted_salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    hot_values: Sequence,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that salts ONLY rows whose key is in ``hot_values``.

    The blanket :func:`salted_join` replicates the entire ``other`` side
    ``n_salts`` times — fine for a dimension table, ruinous for a fact-fact
    join. The targeted form replicates only ``other``'s hot-key rows:

      * ``skewed`` rows with a hot key get salt = hash(row) % n_salts
        (spreading the hot key over n_salts partitions); cold rows salt 0;
      * ``other`` rows with a hot key are exploded over all salts (so every
        salted fragment of the hot key still sees all its matches); cold
        rows get salt 0.

    Result multiplicity is identical to the plain join. ``hot_values`` is a
    small driver-side list: one entry per hot key, each a tuple aligned with
    ``on`` whose elements are plain values or prebuilt literal Columns (use
    a struct literal for composite id types). Extra shuffle cost is
    |other ∩ hot| × (n_salts - 1) rows — pick ``other`` as the side with
    FEWER hot rows.
    """
    if not (how == "inner" or how.startswith("left")):
        raise ValueError(f"targeted_salted_join does not support how={how!r}")
    if not hot_values:
        return skewed.join(other, list(on), how)

    def _lit(v):
        return v if isinstance(v, Column) else F.lit(v)

    def is_hot(df: DataFrame):
        conds = []
        for hv in hot_values:
            hv = hv if isinstance(hv, (tuple, list)) else (hv,)
            eq = F.lit(True)
            for c, v in zip(on, hv):
                eq = eq & (df[c] == _lit(v))
            conds.append(eq)
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    left = skewed.withColumn(
        _SALT,
        F.when(
            is_hot(skewed),
            F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0).cast("int")),
    )
    all_salts = F.array(*[F.lit(i).cast("int") for i in range(n_salts)])
    right = other.withColumn(
        _SALT,
        F.explode(
            F.when(is_hot(other), all_salts).otherwise(
                F.array(F.lit(0).cast("int"))
            )
        ),
    )
    out = left.join(right, [*on, _SALT], how)
    return out.drop(_SALT) if _SALT in out.columns else out


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
