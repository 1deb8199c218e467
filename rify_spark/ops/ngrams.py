"""Shared word n-gram construction — one Spark transform + one DuckDB SQL
fragment builder for every operator that shingles text (minhash shingles,
jaccard shingles, decontamination, repetition).

Call-site contract, kept in ONE place so fixes don't need N synchronized
edits:

  * callers materialize the token split as its own COLUMN before calling
    (lambda bodies re-evaluate inline expressions per array element —
    measured 7x slower — and CollapseProject keeps multiply-referenced
    non-cheap aliases separate);
  * callers guard ``size(toks) >= n`` (``F.sequence(0, size-n)`` DESCENDS
    when size < n, and ANSI mode errors on out-of-bounds ``element_at``);
    the matching SQL guard is ``range(0, greatest(len(t)-n+1, 0))``.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def ngram_transform(toks, n: int):
    """Array of the n-word n-grams of token-array column ``toks``, in
    order, duplicates preserved."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(k + 1)) for k in range(n)]
        ),
    )


def ngram_array(toks, n: int):
    """Distinct n-grams of ``toks`` (set semantics — the dedup/overlap
    operators' universe)."""
    return F.array_distinct(ngram_transform(toks, n))


def ngram_elems_sql(n: int, var: str = "t") -> str:
    """DuckDB lambda body building one n-gram string from list ``var`` at
    1-based offset ``i`` — pair with ``range(0, greatest(len(t)-n+1, 0))``
    (or an exact ``range`` when the caller guarantees length)."""
    return " || ' ' || ".join(f"{var}[i + {k}]" for k in range(1, n + 1))
