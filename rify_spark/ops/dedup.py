"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the whole point of these designs):
  * exact dedup is one hash-groupBy — Spark's map-side partial aggregation
    makes it a single shuffle of (hash, min_id) pairs, not documents;
  * MinHash signatures are computed with an explode + groupBy whose key is
    doc_id — already uniformly distributed, no skew;
  * LSH banding turns all-pairs similarity into an equi-join on band keys:
    candidate generation is O(near-duplicates), never O(n²);
  * n-gram Jaccard joins on shingles *within a blocking key* (source) so the
    shingle join can't degenerate into a global cross product;
  * everything is md5-prefix arithmetic (see ops/params.py) so the DuckDB
    oracle can replicate results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .params import (
    JACCARD_THRESHOLD,
    LSH_BANDS,
    LSH_ROWS,
    MERSENNE_P,
    MINHASH_PERMS,
    NGRAM_N,
    SIMHASH_BITS,
)

# 28-bit portable token hash (md5 prefix): fits (A*h + B) in int64
_H28_SPARK = lambda c: F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")  # noqa: E731
_H28_SQL = "CAST(('0x' || substr(md5({c}), 1, 7)) AS BIGINT)"


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Representative (min doc_id) and duplicate count per exact text hash."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_docs"),
        )
    )


def exact_dedup_sql() -> str:
    return """
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_docs
    FROM documents GROUP BY md5(text)
    """


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, h) with the 28-bit token hash computed ONCE per distinct
    token in a projection before the aggregate — the md5/conv chain must not
    be re-evaluated per minhash permutation."""
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("tok"),
    ).select("doc_id", _H28_SPARK(F.col("tok")).alias("h"))


def _tokens_sql(table: str = "documents") -> str:
    h = _H28_SQL.format(c="tok")
    return f"""
  SELECT doc_id, {h} AS h FROM (
    SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
    FROM {table}
  )
"""


def _mh_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, h): 28-bit hash of each distinct NGRAM_N-word shingle.

    MinHash runs over word *shingles*, not unigram tokens: token vocabularies
    are tiny relative to documents (every pair of docs shares most of its
    token set), while shingle sets are discriminative — two unrelated docs
    share ~no shingles, so LSH candidates stay O(true near-duplicates).
    Docs shorter than NGRAM_N words contribute their whole text as a single
    shingle (never an empty feature set — every doc keeps a signature).

    The token split is materialized as a column BEFORE the shingle
    transform: a lambda body referencing the split expression directly
    would re-evaluate it per array element (measured 7x slower)."""
    with_toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    toks = F.col("toks")
    sh = F.when(
        F.size(toks) >= NGRAM_N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - NGRAM_N),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(toks, i + F.lit(k + 1)) for k in range(NGRAM_N)],
                ),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return with_toks.select("doc_id", F.explode(sh).alias("sh")).select(
        "doc_id", _H28_SPARK(F.col("sh")).alias("h")
    )


def _mh_shingles_sql(table: str = "documents") -> str:
    elems = " || ' ' || ".join(f"toks[i + {k}]" for k in range(1, NGRAM_N + 1))
    h = _H28_SQL.format(c="sh")
    return f"""
  SELECT doc_id, {h} AS h FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(toks) >= {NGRAM_N}
           THEN list_distinct(list_transform(
                  range(0, len(toks) - {NGRAM_N} + 1), i -> {elems}))
           ELSE [array_to_string(toks, ' ')]
      END) AS sh
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM {table})
  )
"""


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """K-permutation MinHash signature over word shingles, one column per
    permutation."""
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return _mh_shingles(docs).groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql(table: str = "documents") -> str:
    mins = ",\n           ".join(
        f"min((h * {a} + {b}) % {MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    return f"""
    SELECT doc_id,
           {mins}
    FROM ({_mh_shingles_sql(table)})
    GROUP BY doc_id
    """


_BAND_KEYS = ["band"] + [f"k{r}" for r in range(LSH_ROWS)]


def _band_rows(sig: DataFrame) -> DataFrame:
    """Explode a signature row into LSH_BANDS rows keyed by the band's raw
    minhash values (long columns, not a concatenated string — compact
    shuffle keys and no collision risk)."""
    bands = []
    for b in range(LSH_BANDS):
        cols = [f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                *[F.col(c).alias(f"k{r}") for r, c in enumerate(cols)],
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Near-duplicate candidate pairs: docs agreeing on any full LSH band.

    bands x rows over the minhash signature; the pair join is an equi-join
    on (band index, band minhash values) — the LSH trick that keeps
    candidate generation O(colliding docs), never all-pairs. With r=4 rows
    per band the collision probability at Jaccard s is 1-(1-s^4)^LSH_BANDS,
    so low-similarity pairs effectively never collide (see ops/params.py).
    """
    allb = _band_rows(minhash_signatures(docs))
    left = allb.alias("l")
    right = allb.alias("r")
    cond = F.col("l.doc_id") < F.col("r.doc_id")
    for k in _BAND_KEYS:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return (
        left.join(right, cond)
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def lsh_candidate_pairs_sql(table: str = "documents") -> str:
    band_selects = []
    for b in range(LSH_BANDS):
        cols = [f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS)]
        keys = ", ".join(f"{c} AS k{r}" for r, c in enumerate(cols))
        band_selects.append(f"SELECT doc_id, {b} AS band, {keys} FROM sig")
    bands_sql = "\n      UNION ALL\n      ".join(band_selects)
    on = " AND ".join(f"l.{k} = r.{k}" for k in _BAND_KEYS)
    return f"""
    WITH sig AS ({minhash_signatures_sql(table)}),
    bands AS (
      {bands_sql}
    )
    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
    FROM bands l JOIN bands r
      ON {on} AND l.doc_id < r.doc_id
    """


# --- planted-near-duplicate recall (LSH quality gate) -----------------------

PLANT_EVERY = 10          # plant a twin for every PLANT_EVERY-th eligible doc
PLANT_OFFSET = 10_000_000  # twin doc_id = original + PLANT_OFFSET
PLANT_MIN_TOKENS = 10     # only docs with >= this many distinct tokens
PLANT_SUFFIX = "zzplanteddup"


def _planted_docs(docs: DataFrame) -> DataFrame:
    """documents ∪ planted near-duplicate twins (append one token —
    Jaccard n/(n+1) >= 10/11 for eligible docs)."""
    ntok = F.size(F.array_distinct(F.split(F.lower("text"), " ")))
    twins = (
        docs.filter((F.col("doc_id") % PLANT_EVERY == 0) & (ntok >= PLANT_MIN_TOKENS))
        .select(
            (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" " + PLANT_SUFFIX)).alias("text"),
        )
    )
    return docs.select("doc_id", "text").unionByName(twins)


def _planted_docs_sql(table: str = "documents") -> str:
    return f"""
  SELECT doc_id, text FROM {table}
  UNION ALL
  SELECT doc_id + {PLANT_OFFSET} AS doc_id, text || ' {PLANT_SUFFIX}' AS text
  FROM {table}
  WHERE doc_id % {PLANT_EVERY} = 0
    AND len(list_distinct(string_split(lower(text), ' '))) >= {PLANT_MIN_TOKENS}
"""


def lsh_planted_recall(docs: DataFrame) -> DataFrame:
    """Recall of LSH candidate generation on planted near-duplicates: what
    fraction of (doc, twin) pairs show up as candidates? The oracle runs the
    identical construction in SQL, so this is both a correctness check and a
    quality gate (recall must stay high while candidates stay O(dups))."""
    aug = _planted_docs(docs)
    pairs = lsh_candidate_pairs(aug)
    planted = aug.filter(F.col("doc_id") >= PLANT_OFFSET).select(
        (F.col("doc_id") - PLANT_OFFSET).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
    )
    found = planted.join(pairs, ["doc_a", "doc_b"], "left_semi")
    return planted.agg(F.count("*").alias("n_planted")).crossJoin(
        found.agg(F.count("*").alias("n_found"))
    ).select(
        "n_planted",
        "n_found",
        (F.col("n_found") / F.col("n_planted")).alias("recall"),
    )


def lsh_planted_recall_sql(table: str = "documents") -> str:
    return f"""
    WITH aug AS ({_planted_docs_sql(table)}),
    pairs AS ({lsh_candidate_pairs_sql('aug')}),
    planted AS (
      SELECT doc_id - {PLANT_OFFSET} AS doc_a, doc_id AS doc_b
      FROM aug WHERE doc_id >= {PLANT_OFFSET}
    ),
    found AS (
      SELECT p.* FROM planted p
      WHERE EXISTS (
        SELECT 1 FROM pairs c WHERE c.doc_a = p.doc_a AND c.doc_b = p.doc_b
      )
    )
    SELECT (SELECT count(*) FROM planted) AS n_planted,
           (SELECT count(*) FROM found) AS n_found,
           CAST((SELECT count(*) FROM found) AS DOUBLE)
             / (SELECT count(*) FROM planted) AS recall
    """


def simhash(docs: DataFrame) -> DataFrame:
    """SIMHASH_BITS-bit SimHash: per bit, sign of the sum of ±1 token votes."""
    toks = _tokens(docs).select("doc_id", F.col("h").alias("hv"))
    bit_votes = [
        F.sum(
            (F.shiftright(F.col("hv"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = toks.groupBy("doc_id").agg(*bit_votes)
    sh = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sh = sh + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return votes.select("doc_id", sh.alias("simhash"))


def simhash_sql() -> str:
    votes = ",\n           ".join(
        f"sum((((h >> {j}) & 1) * 2 - 1)) AS v{j}" for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH votes AS (
      SELECT doc_id,
           {votes}
      FROM ({_tokens_sql()})
      GROUP BY doc_id
    )
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes
    """


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct word NGRAM_N-shingles per doc, with the doc's blocking key
    (source) and shingle count. Tokens are materialized as a column first
    (see _mh_shingles: lambda bodies re-evaluate inline expressions per
    element)."""
    docs = docs.select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("__toks")
    )
    toks = F.col("__toks")
    # guard short docs: no shingle may index past the token list (ANSI mode
    # errors on out-of-bounds element_at, and the oracle must agree on
    # empty-list semantics)
    sh = F.when(
        F.size(toks) >= NGRAM_N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - NGRAM_N),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(toks, i + F.lit(k + 1)) for k in range(NGRAM_N)],
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", "source", sh.alias("shingles"), F.size(sh).alias("n_sh")
    )


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Word-shingle Jaccard similarity for doc pairs within the same source
    block, keeping pairs above JACCARD_THRESHOLD."""
    base = _shingles(docs)
    exploded = base.select(
        "doc_id", "source", "n_sh", F.explode("shingles").alias("sh")
    )
    l, r = exploded.alias("l"), exploded.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.source") == F.col("r.source"))
            & (F.col("l.sh") == F.col("r.sh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.n_sh").alias("na"),
            F.col("r.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = inter.withColumn(
        "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    )
    return jac.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "jaccard"
    )


def ngram_jaccard_pairs_sql() -> str:
    elems = " || ' ' || ".join(f"toks[i + {k}]" for k in range(1, NGRAM_N + 1))
    return f"""
    WITH tk AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS toks FROM documents
    ),
    base AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(0, greatest(len(toks) - {NGRAM_N} + 1, 0)),
               i -> {elems}
             )) AS shingles
      FROM tk
    ),
    ex AS (
      SELECT doc_id, source, len(shingles) AS n_sh, unnest(shingles) AS sh FROM base
    ),
    inter AS (
      SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, l.n_sh AS na, r.n_sh AS nb,
             count(*) AS inter
      FROM ex l JOIN ex r
        ON l.source = r.source AND l.sh = r.sh AND l.doc_id < r.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, inter / (na + nb - inter) AS jaccard
    FROM inter
    WHERE inter / (na + nb - inter) >= {JACCARD_THRESHOLD}
    """


# --- embedding-cosine near-duplicate pairs -----------------------------------
# The fifth dedup modality (exact / minhash / simhash / ngram-jaccard /
# embedding): vectors whose cosine similarity clears COS_NEARDUP_THRESHOLD
# are duplicate candidates. Blocking reuses the sign-LSH buckets of the ANN
# index with Hamming-1 probe expansion — a bucket equi-join, never all
# pairs — and verification is EXACT integer math so the DuckDB oracle
# matches bit-for-bit: with quantized vectors a, b and threshold t = T/1000,
#     cos(a,b) >= t  <=>  dot >= 0 and 1e6 * dot^2 >= T^2 * |a|^2 * |b|^2.
# Magnitude audit: |quantized component| <= ~1000, dim 64 -> dot <= ~6.4e7,
# dot^2 <= ~4.1e15, * 1e6 overflows int64 — so the comparison is done in
# DECIMAL(38,0) on both engines (Spark and DuckDB agree exactly on int128
# products; floats are never compared).

COS_NEARDUP_MILLI = 990  # cosine threshold in millis (0.990)


def embedding_neardup_pairs(emb: DataFrame) -> DataFrame:
    """(vec_a, vec_b, dot) pairs with cosine >= threshold, vec_a < vec_b,
    discovered through the multi-probe LSH bucket join. On the synthetic
    corpus true near-dups are the planted twins (see
    similarity._planted_emb), which this op plants itself so the gate has
    positives to find."""
    from .similarity import (
        _bucketed,
        _int_dot,
        _planted_emb,
        _probe_buckets,
    )

    withb = _bucketed(_planted_emb(emb))
    left = withb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("ce").alias("ea"),
        F.explode(_probe_buckets(F.col("bucket"))).alias("pbucket"),
    )
    right = withb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("ce").alias("eb"),
        F.col("bucket").alias("pbucket"),
    )
    pairs = left.join(right, "pbucket").filter(F.col("vec_a") < F.col("vec_b"))
    dec = "decimal(38,0)"
    scored = pairs.select(
        "vec_a",
        "vec_b",
        _int_dot(F.col("ea"), F.col("eb")).alias("dot"),
        _int_dot(F.col("ea"), F.col("ea")).alias("na2"),
        _int_dot(F.col("eb"), F.col("eb")).alias("nb2"),
    ).dropDuplicates(["vec_a", "vec_b"])
    t2 = COS_NEARDUP_MILLI * COS_NEARDUP_MILLI
    keep = (F.col("dot") >= 0) & (
        F.lit(1_000_000).cast(dec) * F.col("dot").cast(dec) * F.col("dot").cast(dec)
        >= F.lit(t2).cast(dec) * F.col("na2").cast(dec) * F.col("nb2").cast(dec)
    )
    return scored.filter(keep).select("vec_a", "vec_b", "dot")


def embedding_neardup_pairs_sql() -> str:
    from .similarity import _planted_emb_sql, knn_lsh_buckets_sql  # noqa: F401
    from .params import EMB_DIM, HYPERPLANES, N_HYPERPLANES

    cases = []
    for b, plane in enumerate(HYPERPLANES):
        terms = " + ".join(f"({v}) * ce[{d + 1}]" for d, v in enumerate(plane))
        cases.append(f"CASE WHEN ({terms}) > 0 THEN {1 << b} ELSE 0 END")
    bucket = " + ".join(cases)
    probes = ", ".join(f"xor(bucket, {1 << b})" for b in range(N_HYPERPLANES))
    dot = f"list_sum(list_transform(range(1, {EMB_DIM} + 1), i -> l.ea[i] * r.eb[i]))"
    na2 = f"list_sum(list_transform(range(1, {EMB_DIM} + 1), i -> l.ea[i] * l.ea[i]))"
    nb2 = f"list_sum(list_transform(range(1, {EMB_DIM} + 1), i -> r.eb[i] * r.eb[i]))"
    t2 = COS_NEARDUP_MILLI * COS_NEARDUP_MILLI
    from .similarity import _planted_emb_sql as _pe

    return f"""
    WITH pe AS ({_pe()}),
    withb AS (
      SELECT vec_id, ce, CAST({bucket} AS BIGINT) AS bucket FROM pe
    ),
    lhs AS (
      SELECT vec_id AS vec_a, ce AS ea,
             unnest([bucket, {probes}]) AS pbucket
      FROM withb
    ),
    rhs AS (
      SELECT vec_id AS vec_b, ce AS eb, bucket AS pbucket FROM withb
    ),
    scored AS (
      SELECT DISTINCT ON (vec_a, vec_b) vec_a, vec_b,
             {dot} AS dot, {na2} AS na2, {nb2} AS nb2
      FROM lhs l JOIN rhs r USING (pbucket)
      WHERE l.vec_a < r.vec_b
    )
    SELECT vec_a, vec_b, CAST(dot AS BIGINT) AS dot
    FROM scored
    WHERE dot >= 0
      AND 1000000::HUGEINT * dot::HUGEINT * dot::HUGEINT
          >= {t2}::HUGEINT * na2::HUGEINT * nb2::HUGEINT
    """
