"""Term dictionary: string terms <-> 64-bit ids.

Analog of the reference's ``Translator`` (src/translator.rs:14-40), which
assigns dense ids by sorting and deduplicating all terms. Dense rank ids
require a global sort + row_number — a full shuffle whose only purpose is id
density, a property nothing downstream depends on (only bijectivity does).

Spark-first design: ids are ``xxhash64(term)`` computed as a narrow,
shuffle-free projection. Encoding premises is then embarrassingly parallel
(no dictionary join at all on the encode path), which is what makes the
scheme viable at 10^12-row scale: the "dictionary" table (term, id) is
materialized only for the decode direction and for novel-name checks.

Bijectivity is probabilistic (64-bit space) and guarded by
:func:`audit_collisions` — the salted-hash-id-space collision audit. At test
scale a collision is effectively impossible; at corpus scale the audit is a
cheap groupBy that runs alongside dictionary materialization.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import DictionaryCollision

SPOG = ["s", "p", "o", "g"]


def encode_quads(facts: DataFrame) -> DataFrame:
    """(s,p,o,g) string columns -> xxhash64 long columns. Narrow, no shuffle."""
    return facts.select(*[F.xxhash64(F.col(c)).alias(c) for c in SPOG])


def term_df(facts: DataFrame) -> DataFrame:
    """All distinct terms mentioned by a quad DataFrame, as one `term` column."""
    return (
        facts.select(F.explode(F.array(*[F.col(c) for c in SPOG])).alias("term"))
        .distinct()
    )


def build_dict(
    spark: SparkSession,
    facts: DataFrame | None = None,
    extra_terms: Iterable[str] = (),
) -> DataFrame:
    """Materialize the (term, id) dictionary for decode / membership checks.

    Sources mirror the reference's ``vertices`` (src/common.rs:111-123):
    every element of every premise quad plus every bound rule term.
    """
    parts = []
    if facts is not None:
        parts.append(term_df(facts))
    extra = [(t,) for t in extra_terms]
    if extra:
        parts.append(spark.createDataFrame(extra, "term string").distinct())
    if not parts:
        return spark.createDataFrame([], "term string, id long")
    terms = parts[0]
    for p in parts[1:]:
        terms = terms.unionByName(p)
    return terms.distinct().select("term", F.xxhash64("term").alias("id"))


def audit_collisions(dict_df: DataFrame, raise_on_collision: bool = True) -> int:
    """Count id collisions (distinct terms sharing an id). 0 is the invariant."""
    n = (
        dict_df.groupBy("id")
        .agg(F.countDistinct("term").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if n and raise_on_collision:
        raise DictionaryCollision(f"{n} colliding ids in term dictionary")
    return int(n)


def hash_terms(spark: SparkSession, terms: Iterable[str]) -> Mapping[str, int]:
    """Driver-side map term -> xxhash64 id, computed by one tiny Spark job.

    Used to lower rule constants into the encoded value space (rule tables
    are small by construction, so collecting is safe).
    """
    terms = list(dict.fromkeys(terms))
    if not terms:
        return {}
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select("term", F.xxhash64("term").alias("id")).collect()
    return {r["term"]: r["id"] for r in rows}


def decode_quads(enc: DataFrame, dict_df: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """(s,p,o,g) id columns -> term columns via four dictionary joins.

    The dictionary side is broadcast when small (left to AQE); at scale these
    are plain shuffle joins on the id column.
    """
    out = enc
    for c in SPOG:
        d = dict_df.select(
            F.col("id").alias(f"__id_{c}"), F.col("term").alias(f"__term_{c}")
        )
        out = out.join(d, out[c] == d[f"__id_{c}"], "left")
    keep = [F.col(f"__term_{c}").alias(c) for c in SPOG]
    if extra_cols:
        keep += [F.col(c) for c in extra_cols]
    return out.select(*keep)
