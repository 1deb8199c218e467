"""Triple extraction from source code: mention detection as Arrow-batched
pandas UDFs (the north rule's "batched mention detection ... no per-row
Python" stage — this layer has no reference analog; rify consumes
already-extracted quads, src/infer.rs:9-12).

Entity IRI scheme (opaque to the engine, structured for humans):
    module IRI   repo://<repo>/<path>
    symbol IRI   repo://<repo>/<path>#<name>
    name node    name://<identifier>          (unresolved callee mention)
    import ref   mod://<module name>          (unresolved import mention)

Predicates: ``imports``, ``defines``, ``calls``, plus linking/inference
predicates added downstream (``same_as``, ``defined_in``, ``depends_on``).

The extractors emit *candidate* triples with unresolved name:// and mod://
objects; entity linking + canonicalization (canonicalize.py) resolve them to
module/symbol IRIs.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# DataType instance (not a DDL string): module import must not require an
# active SparkSession.
TRIPLE_SCHEMA = ArrayType(
    StructType(
        [
            StructField("s", StringType()),
            StructField("p", StringType()),
            StructField("o", StringType()),
        ]
    )
)

_IMPORT_RE = re.compile(r"^\s*import\s+([A-Za-z_][A-Za-z0-9_.]*)", re.M)
_FROM_IMPORT_RE = re.compile(
    r"^\s*from\s+([A-Za-z_][A-Za-z0-9_.]*)\s+import\s+([A-Za-z_][A-Za-z0-9_.]*)", re.M
)
_DEF_RE = re.compile(r"^\s*(?:def|class)\s+([A-Za-z_][A-Za-z0-9_]*)", re.M)
_CALL_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\s*\(")
_KEYWORDS = {
    "if", "for", "while", "return", "def", "class", "print", "with",
    "lambda", "yield", "assert", "import", "from", "raise", "except",
}


def assert_sha256(code_files: DataFrame, expected_col: str = "content_sha256") -> DataFrame:
    """Attach `content_sha256` computed JVM-side; if the column already
    exists (a reference hash shipped with the table), assert per-row
    equality — the ingest invariant. Returns the DF with the hash column."""
    if expected_col in code_files.columns:
        mismatches = code_files.filter(
            F.sha2(F.col("content"), 256) != F.col(expected_col)
        ).count()
        if mismatches:
            raise AssertionError(
                f"sha256 ingest invariant violated on {mismatches} rows"
            )
        return code_files
    return code_files.withColumn(expected_col, F.sha2(F.col("content"), 256))


@pandas_udf(TRIPLE_SCHEMA)
def _extract_triples_udf(
    repo: pd.Series, path: pd.Series, content: pd.Series
) -> pd.Series:
    out = []
    for r, p, c in zip(repo, path, content):
        mod = f"repo://{r}/{p}"
        triples = []
        if not c:
            out.append(triples)
            continue
        for m in _IMPORT_RE.findall(c):
            triples.append((mod, "imports", f"mod://{m}"))
        for pkg, name in _FROM_IMPORT_RE.findall(c):
            triples.append((mod, "imports", f"mod://{pkg}.{name}"))
        defs = _DEF_RE.findall(c)
        for name in defs:
            triples.append((f"{mod}#{name}", "defines", mod))
        # call edges: attribute each call to the enclosing def
        current = None
        for line in c.split("\n"):
            dm = _DEF_RE.match(line)
            if dm:
                current = dm.group(1)
                continue
            if current is None:
                continue
            for callee in _CALL_RE.findall(line):
                if callee in _KEYWORDS or callee == current:
                    continue
                triples.append((f"{mod}#{current}", "calls", f"name://{callee}"))
        out.append(triples)
    return pd.Series(out)


def extract_triples(code_files: DataFrame) -> DataFrame:
    """code_files -> candidate quads (s, p, o, g=repo graph).

    One narrow pandas-UDF pass per file (Arrow-batched), exploded to quad
    rows. No shuffle until the downstream dedup; extraction parallelism is
    the scan parallelism of the input table.
    """
    with_triples = code_files.select(
        F.col("repo"),
        _extract_triples_udf("repo", "path", "content").alias("triples"),
    )
    return (
        with_triples.select(
            F.col("repo"), F.explode("triples").alias("t")
        )
        .select(
            F.col("t.s").alias("s"),
            F.col("t.p").alias("p"),
            F.col("t.o").alias("o"),
            F.concat(F.lit("graph://"), F.col("repo")).alias("g"),
        )
        .dropDuplicates(["s", "p", "o", "g"])
    )


@pandas_udf(DoubleType())
def link_score_udf(mention: pd.Series, candidate: pd.Series) -> pd.Series:
    """Entity-link score between a mention node and a candidate entity IRI.

    Vectorized (pandas string ops). Exact identifier match on the IRI
    fragment scores 1.0; prefix match scores by relative overlap. The north
    rule's "entity-link scoring" stage; the pipeline keeps links with
    score >= threshold.
    """
    m = mention.str.replace(r"^(name|mod)://", "", regex=True)
    frag = candidate.str.extract(r"#([A-Za-z0-9_.]+)$", expand=False)
    frag = frag.fillna(
        candidate.str.extract(r"/([A-Za-z0-9_.]+)\.py$", expand=False)
    ).fillna("")
    exact = (m == frag).astype("float64")
    plen = pd.Series(
        _common_prefix_len(m, frag), index=m.index
    ).astype("float64")
    denom = m.str.len().clip(lower=1).astype("float64")
    return exact.where(exact == 1.0, (plen / denom) * 0.5)


def _common_prefix_len(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Vectorized common-prefix length between two aligned string Series.

    No per-row Python: both sides become fixed-width UTF-32 numpy arrays and
    the first-mismatch position is found with array compares (this sits in
    the entity-link hot path, batched over millions of candidate pairs)."""
    a_arr = np.asarray(a.fillna(""), dtype="U")
    b_arr = np.asarray(b.fillna(""), dtype="U")
    n = len(a_arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # pad both to a common width; \0 padding guarantees a mismatch at
    # min(len) when lengths differ
    width = max(a_arr.dtype.itemsize, b_arr.dtype.itemsize, 4) // 4
    a4 = a_arr.astype(f"<U{width}").view(np.uint32).reshape(n, width)
    b4 = b_arr.astype(f"<U{width}").view(np.uint32).reshape(n, width)
    neq = a4 != b4
    first = np.where(neq.any(axis=1), neq.argmax(axis=1), width)
    min_len = np.minimum(np.char.str_len(a_arr), np.char.str_len(b_arr))
    return np.minimum(first, min_len)
