"""Benchmark decontamination: flag corpus documents that overlap an
evaluation set by shared word n-grams.

The standard large-corpus hygiene step (GPT-3 appendix C, The Pile,
Dolma): any training document sharing >= DECON_MIN_HITS distinct
DECON_N-gram(s) with a held-out benchmark is contaminated and must be
dropped before training. The eval set here is derived deterministically
from the corpus itself — a DECON_EVAL_RATE hash-sample of documents
contributes a DECON_EXCERPT_LEN-token excerpt each, exactly the
"benchmark question leaked into the crawl" shape the operator exists to
catch — so the gate is self-contained (no external data) and source docs
with non-degenerate excerpts are guaranteed true positives (a fully
repetitive excerpt collapses to <DECON_MIN_HITS distinct n-grams under
array_distinct and is not flagged — deliberate, as an all-identical
n-gram carries no benchmark signal; see decontaminate's docstring).

Shape at 100 TB: benchmarks are megabytes while the corpus is the 100 TB
side, so the eval n-gram set is BROADCAST — the corpus side is a narrow
map-side explode + broadcast-hash semi-join feeding one partial-aggregated
groupBy(doc_id) whose output is O(contaminated docs), not O(corpus). No
corpus-sized shuffle anywhere.

N-grams are compared by the shared 28-bit md5-prefix hash (ops.params), the
one hash both engines evaluate identically; production would widen to 64
bits, which changes only the two `_H28_*` call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _H28_SPARK, _H28_SQL
from .params import (
    DECON_EVAL_RATE,
    DECON_EXCERPT_LEN,
    DECON_EXCERPT_START,
    DECON_MIN_HITS,
    DECON_N,
)

H28_MAX = 1 << 28
_EVAL_CUTOFF = int(DECON_EVAL_RATE * H28_MAX)
_EXCERPT_END = DECON_EXCERPT_START + DECON_EXCERPT_LEN - 1


def _ngram_array(toks):
    """Distinct DECON_N-word n-grams of a token-array column (assumes
    size(toks) >= DECON_N; callers guard)."""
    from .ngrams import ngram_array

    return ngram_array(toks, DECON_N)


def _is_eval(docs: DataFrame):
    return (
        _H28_SPARK(F.concat(F.lit("eval:"), F.col("doc_id").cast("string")))
        < _EVAL_CUTOFF
    )


def _eval_ngram_hashes(docs: DataFrame) -> DataFrame:
    """(h) distinct n-gram hashes of the derived eval set: each hash-sampled
    doc with enough tokens contributes the excerpt
    toks[DECON_EXCERPT_START .. _EXCERPT_END] (1-based, inclusive)."""
    exc = (
        docs.filter(_is_eval(docs))
        .select(F.split(F.lower("text"), " ").alias("toks"))
        .filter(F.size("toks") >= _EXCERPT_END)
        .select(
            F.slice("toks", DECON_EXCERPT_START, DECON_EXCERPT_LEN).alias("exc")
        )
    )
    # excerpt length is fixed at DECON_EXCERPT_LEN >= DECON_N: no guard
    return (
        exc.select(F.explode(_ngram_array(F.col("exc"))).alias("ng"))
        .select(_H28_SPARK(F.col("ng")).alias("h"))
        .distinct()
    )


def _corpus_ngram_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h) for each distinct n-gram per document. Docs shorter than
    DECON_N words have no n-gram and cannot be contaminated. Tokens are
    materialized as a column before the transform (lambda bodies re-evaluate
    inline expressions per element — see dedup._mh_shingles)."""
    with_toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    ng = F.when(
        F.size("toks") >= DECON_N, _ngram_array(F.col("toks"))
    ).otherwise(F.array().cast("array<string>"))
    return with_toks.select("doc_id", F.explode(ng).alias("ng")).select(
        "doc_id", _H28_SPARK(F.col("ng")).alias("h")
    )


def decontaminate(docs: DataFrame) -> DataFrame:
    """(doc_id, eval_hits) of contaminated documents: those sharing at least
    DECON_MIN_HITS distinct n-grams with the eval set. A planted excerpt
    source scores DECON_EXCERPT_LEN - DECON_N + 1 when its excerpt's n-grams
    are pairwise distinct (the common case; the synthetic corpora satisfy
    it); an excerpt repetitive enough to collapse below DECON_MIN_HITS
    distinct n-grams is not flagged, matching the real-world contract that
    overlap is counted over distinct n-grams.

    Both join inputs are per-key distinct (array_distinct doc-side, DISTINCT
    eval-side), so the count is exactly |doc n-grams ∩ eval n-grams| in the
    28-bit hash universe on both engines.
    """
    hits = (
        _corpus_ngram_hashes(docs)
        .join(F.broadcast(_eval_ngram_hashes(docs)), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("eval_hits"))
    )
    return hits.filter(F.col("eval_hits") >= DECON_MIN_HITS).select(
        "doc_id", "eval_hits"
    )


def decontaminate_sql(table: str = "documents") -> str:
    from .ngrams import ngram_elems_sql

    elems = ngram_elems_sql(DECON_N, "t")
    h_ng = _H28_SQL.format(c="ng")
    h_eval = _H28_SQL.format(c="('eval:' || CAST(doc_id AS VARCHAR))")
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM {table}
    ),
    corpus_ng AS (
      SELECT doc_id, {h_ng} AS h FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(0, greatest(len(t) - {DECON_N} + 1, 0)),
                 i -> {elems}))) AS ng
        FROM toks
      )
    ),
    eval_ng AS (
      SELECT DISTINCT {h_ng} AS h FROM (
        SELECT unnest(list_distinct(list_transform(
                 range(0, {DECON_EXCERPT_LEN} - {DECON_N} + 1),
                 i -> {elems}))) AS ng
        FROM (
          SELECT t[{DECON_EXCERPT_START}:{_EXCERPT_END}] AS t
          FROM toks
          WHERE {h_eval} < {_EVAL_CUTOFF} AND len(t) >= {_EXCERPT_END}
        )
      )
    )
    SELECT c.doc_id, count(*) AS eval_hits
    FROM corpus_ng c JOIN eval_ng e ON c.h = e.h
    GROUP BY 1
    HAVING count(*) >= {DECON_MIN_HITS}
    """
