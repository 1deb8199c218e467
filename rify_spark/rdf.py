"""N-Triples / N-Quads line-format reader and writer.

The reference engine consumes claimgraphs as ``[s, p, o, g]`` string quads
(``src/translate.rs`` quad tuples; the JS binding feeds JSON arrays of four
strings, ``bindings/js_wasm/binding_tests/test.js:19-40``). The on-disk
interchange format for exactly that shape is W3C N-Quads: one statement per
line, whitespace-separated terms, ``.`` terminator. This module parses and
serializes it Spark-first:

  * **parsing is pure JVM regexp** over ``spark.read.text`` lines — one
    anchored pattern extracts the four raw term slots, then per-slot
    expressions classify (IRI / blank node / literal) and strip
    delimiters. No Python UDF anywhere, and a line-per-row text scan is
    embarrassingly parallel: at 100 TB the cost is the text read itself;
  * **malformed lines are flagged, not dropped** (``malformed`` column) so
    a corpus-scale ingest can route rejects to a quarantine sink instead
    of silently shrinking;
  * **literal escapes**: the five W3C ``ECHAR`` escapes that round-trip
    through pure string replacement (``\\\\ \\n \\r \\t \\"``) are decoded
    with a sentinel-protected replace chain (so ``\\\\n`` correctly decodes
    to backslash-n, not newline). Numeric ``\\uXXXX`` escapes are passed
    through verbatim (documented subset — decoding them needs a codepoint
    computation that plain SQL cannot express; a consumer that needs them
    can post-process with a pandas UDF).

The DuckDB oracle twin reproduces the same replace chain, so parsed
literals are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one raw term: IRI ref, blank-node label, or literal with optional
# datatype/lang suffix (W3C N-Quads grammar, simplified to the productions
# the reference's string-quad model can emit)
_TERM = (
    r'(?:<[^<>]*>'
    r'|_:\S+'
    r'|"(?:[^"\\]|\\.)*"(?:\^\^<[^<>]*>|@[A-Za-z][A-Za-z0-9-]*)?)'
)
# full statement: subject predicate object [graph] '.'
LINE_RE = (
    r'^\s*(' + _TERM + r')\s+(' + _TERM + r')\s+(' + _TERM + r')'
    r'(?:\s+(' + _TERM + r'))?\s*\.\s*$'
)

DEFAULT_GRAPH = "default_graph"

# protects literal '\\' while the single-char escapes decode (chr(1) cannot
# appear in a well-formed N-Quads literal: the grammar forbids raw control
# characters inside the quotes)
_SENTINEL = "\x01"


def _unescape(col: Column) -> Column:
    out = F.replace(col, F.lit("\\\\"), F.lit(_SENTINEL))
    for esc, ch in (("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t"), ('\\"', '"')):
        out = F.replace(out, F.lit(esc), F.lit(ch))
    return F.replace(out, F.lit(_SENTINEL), F.lit("\\"))


def _term_kind(raw: Column) -> Column:
    return (
        F.when(raw.startswith("<"), F.lit("iri"))
        .when(raw.startswith("_"), F.lit("blank"))
        .when(raw.startswith('"'), F.lit("literal"))
        .otherwise(F.lit(None).cast("string"))
    )


def _term_value(raw: Column) -> Column:
    """The term's lexical value: IRI without angle brackets, blank label
    as-is, literal unescaped without quotes/suffix."""
    return (
        F.when(raw.startswith("<"), F.regexp_extract(raw, r"^<([^<>]*)>", 1))
        .when(raw.startswith("_"), raw)
        .when(
            raw.startswith('"'),
            _unescape(F.regexp_extract(raw, r'^"((?:[^"\\]|\\.)*)"', 1)),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def parse_nquads(
    lines: DataFrame,
    line_col: str = "value",
    default_graph: str = DEFAULT_GRAPH,
) -> DataFrame:
    """Parse a DataFrame of N-Quads/N-Triples lines into
    ``(s, p, o, g, o_kind, o_datatype, o_lang, malformed)``.

    Comment lines (``#``-first) and blank lines are dropped; anything else
    that fails the statement grammar — or carries a non-IRI predicate —
    comes back with ``malformed = true`` and null terms, for quarantine
    routing. Statements without a graph label land in ``default_graph``
    (the reference's own default-graph name, src/common.rs).
    """
    src = lines.filter(
        ~F.regexp_like(F.col(line_col), F.lit(r"^\s*(#.*)?$"))
    )
    raw = src.select(
        F.col(line_col).alias("__line"),
        *[
            F.regexp_extract(F.col(line_col), LINE_RE, i).alias(f"__t{i}")
            for i in (1, 2, 3, 4)
        ],
    )
    matched = F.regexp_like(F.col("__line"), F.lit(LINE_RE))
    # regexp_extract returns '' both for "no match" and for "group absent";
    # the graph slot is the only optional one, and a REAL graph term is
    # never '' (the grammar requires delimiters), so '' there means
    # "default graph" — but only on matched lines
    ok = (
        matched
        & _term_kind(F.col("__t1")).isin("iri", "blank")
        & (_term_kind(F.col("__t2")) == "iri")
    )
    o_raw = F.col("__t3")
    g_val = F.when(
        F.col("__t4") == "", F.lit(default_graph)
    ).otherwise(_term_value(F.col("__t4")))
    return raw.select(
        F.when(ok, _term_value(F.col("__t1"))).alias("s"),
        F.when(ok, _term_value(F.col("__t2"))).alias("p"),
        F.when(ok, _term_value(o_raw)).alias("o"),
        F.when(ok, g_val).alias("g"),
        F.when(ok, _term_kind(o_raw)).alias("o_kind"),
        F.when(
            ok, F.regexp_extract(o_raw, r"\^\^<([^<>]*)>$", 1)
        ).alias("o_datatype"),
        F.when(
            ok,
            F.regexp_extract(o_raw, r'^"(?:[^"\\]|\\.)*"@([A-Za-z][A-Za-z0-9-]*)$', 1),
        ).alias("o_lang"),
        (~ok).alias("malformed"),
    )


def read_nquads(spark, path: str, default_graph: str = DEFAULT_GRAPH) -> DataFrame:
    """``spark.read.text`` + :func:`parse_nquads`; the text source splits
    large files on line boundaries, so a single 100 GB .nq file still
    parallelizes across the cluster."""
    return parse_nquads(
        spark.read.text(path), "value", default_graph=default_graph
    )


def format_nquads(quads: DataFrame) -> DataFrame:
    """Serialize engine quads ``(s, p, o, g)`` — opaque strings, the
    reference's term model — as IRI-termed N-Quads ``line``s.

    Contract (documented, mirrored by the round-trip gate): terms must be
    IRI-safe (no angle brackets, quotes, backslashes, or whitespace).
    Terms the engine mints (``iri://``-style ids, dictionary-decoded
    names) satisfy this; arbitrary literals should go through a literal-
    aware serializer instead.
    """
    return quads.select(
        F.concat(
            F.lit("<"), F.col("s"), F.lit("> <"), F.col("p"),
            F.lit("> <"), F.col("o"), F.lit("> <"), F.col("g"),
            F.lit("> ."),
        ).alias("line")
    )


def write_nquads(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    format_nquads(quads).write.mode(mode).text(path)


# --- driver-gate queries + DuckDB oracles -----------------------------------

# fixture: one statement per grammar feature the parser claims (escapes,
# typed literal, lang tag, blank nodes, default graph, comment, malformed)
PARSE_FIXTURE_LINES = [
    '<http://ex/s1> <http://ex/p> <http://ex/o1> <http://ex/g> .',
    '<http://ex/s2> <http://ex/p> "plain string" .',
    '<http://ex/s3> <http://ex/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> <http://ex/g> .',
    '<http://ex/s4> <http://ex/p> "bonjour"@fr .',
    '_:b1 <http://ex/p> _:b2 <http://ex/g> .',
    '<http://ex/s5> <http://ex/p> "tab\\there \\"q\\" back\\\\slash" .',
    '# a comment line',
    '',
    '<http://ex/s6> "not-an-iri-predicate" <http://ex/o> .',
    'garbage line without terms',
]

# the expected parse, pinned literally (the oracle is an independent
# hand-derivation of the grammar, not a second implementation)
PARSE_FIXTURE_SQL = r"""
  SELECT * FROM (VALUES
    ('http://ex/s1', 'http://ex/p', 'http://ex/o1', 'http://ex/g',
     'iri', '', '', false),
    ('http://ex/s2', 'http://ex/p', 'plain string', 'default_graph',
     'literal', '', '', false),
    ('http://ex/s3', 'http://ex/p', '42', 'http://ex/g',
     'literal', 'http://www.w3.org/2001/XMLSchema#integer', '', false),
    ('http://ex/s4', 'http://ex/p', 'bonjour', 'default_graph',
     'literal', '', 'fr', false),
    ('_:b1', 'http://ex/p', '_:b2', 'http://ex/g',
     'blank', '', '', false),
    ('http://ex/s5', 'http://ex/p',
     'tab' || chr(9) || 'here "q" back\slash', 'default_graph',
     'literal', '', '', false),
    (NULL, NULL, NULL, NULL, NULL, NULL, NULL, true),
    (NULL, NULL, NULL, NULL, NULL, NULL, NULL, true)
  ) AS t(s, p, o, g, o_kind, o_datatype, o_lang, malformed)
"""


def rdf_nquads_parse(spark, sf_dir: str) -> DataFrame:
    """Gate query: the grammar fixture through the real parser (sf_dir
    unused — a pinned-fixture gate, like the o14-o16 proof fixtures)."""
    lines = spark.createDataFrame(
        [(ln,) for ln in PARSE_FIXTURE_LINES], "value string"
    )
    return parse_nquads(lines)


def rdf_nquads_roundtrip(spark, sf_dir: str) -> DataFrame:
    """Gate query: serialize the customer-key tree graph to N-Quads lines
    and parse it back — the output must equal the input quad set exactly
    (oracle: the tree-edge derivation itself)."""
    from .ops.quads import tree_edges

    parsed = parse_nquads(format_nquads(tree_edges(spark, sf_dir)), "line")
    return parsed.filter(~F.col("malformed")).select("s", "p", "o", "g")


def rdf_nquads_roundtrip_sql() -> str:
    from .ops.quads import TREE_EDGES_SQL

    return TREE_EDGES_SQL


# --- Turtle / TriG serialization --------------------------------------------


def format_turtle(quads: DataFrame, trig: bool = False) -> DataFrame:
    """Serialize engine quads as subject-grouped Turtle (or TriG)
    ``line``s — ``<s> <p1> <o1> ; <p2> <o2> .``, one line per
    ``(graph, subject)`` group, predicate-object pairs sorted for
    determinism.

    Turtle has no graph slot, so plain Turtle output is the TRIPLES
    projection (the ``g`` column is dropped — callers wanting graphs use
    ``trig=True``). TriG output wraps each non-default-graph group in
    its own ``<g> { ... }`` block; a graph label may appear in any
    number of blocks (the TriG data model unions them), which is what
    makes the serializer embarrassingly parallel — no graph has to be
    assembled on one executor, so a 100 TB store writes as fast as its
    one groupBy shuffle.

    Same term contract as :func:`format_nquads` (documented there):
    terms must be IRI-safe engine lexemes. Terms containing the
    subset's structural sequence ``" ; "`` serialize but QUARANTINE on
    read-back (parse_turtle's pair gate) — they never silently
    mis-split.

    Plan shape: ONE partial-aggregating exchange (groupBy the group
    keys + collect_list; duplicates collapse INSIDE the aggregate via
    ``array_distinct``, so neither path pays a second dedup exchange),
    then pure JVM array/concat expressions under whole-stage codegen.
    """
    keys = ["g", "s"] if trig else ["s"]
    grouped = quads.groupBy(*keys).agg(
        F.array_sort(
            F.array_distinct(F.collect_list(F.struct("p", "o")))
        ).alias("po")
    )
    body = F.concat(
        F.lit("<"),
        F.col("s"),
        F.lit("> "),
        F.array_join(
            F.transform(
                "po",
                lambda x: F.concat(
                    F.lit("<"), x["p"], F.lit("> <"), x["o"], F.lit(">")
                ),
            ),
            " ; ",
        ),
        F.lit(" ."),
    )
    if not trig:
        return grouped.select(body.alias("line"))
    line = F.when(F.col("g") == DEFAULT_GRAPH, body).otherwise(
        F.concat(F.lit("<"), F.col("g"), F.lit("> { "), body, F.lit(" }"))
    )
    return grouped.select(line.alias("line"))


def write_turtle(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    format_turtle(quads).write.mode(mode).text(path)


def write_trig(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    format_turtle(quads, trig=True).write.mode(mode).text(path)


def rdf_trig_format(spark, sf_dir: str) -> DataFrame:
    """Gate query: TriG serialization of a two-graph nation-derived
    store — subject-grouped blocks with sorted predicate lists; the
    oracle reproduces every line with ``string_agg`` over the same
    grouping."""
    nation = spark.read.parquet(f"{sf_dir.rstrip('/')}/nation.parquet")
    quads = nation.select(
        F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("s"),
        F.lit("in_region").alias("p"),
        F.concat(F.lit("region:"), F.col("n_regionkey")).alias("o"),
        F.concat(F.lit("graph://"), F.col("n_nationkey") % 2).alias("g"),
    ).unionByName(
        nation.select(
            F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("s"),
            F.lit("label").alias("p"),
            F.concat(F.lit("name:"), F.col("n_name")).alias("o"),
            F.concat(
                F.lit("graph://"), F.col("n_nationkey") % 2
            ).alias("g"),
        )
    ).unionByName(
        nation.orderBy("n_nationkey").limit(3).select(
            F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("s"),
            F.lit("seen").alias("p"),
            F.lit("true").alias("o"),
            F.lit(DEFAULT_GRAPH).alias("g"),
        )
    )
    return format_turtle(quads, trig=True)


def rdf_trig_format_sql() -> str:
    return """
      WITH q AS (
        SELECT 'nation:' || n_nationkey AS s, 'in_region' AS p,
               'region:' || n_regionkey AS o,
               'graph://' || (n_nationkey % 2) AS g
        FROM nation
        UNION ALL
        SELECT 'nation:' || n_nationkey, 'label', 'name:' || n_name,
               'graph://' || (n_nationkey % 2)
        FROM nation
        UNION ALL
        SELECT * FROM (
          SELECT 'nation:' || n_nationkey AS s, 'seen' AS p,
                 'true' AS o, 'default_graph' AS g
          FROM nation ORDER BY n_nationkey LIMIT 3
        )
      ), grp AS (
        SELECT g, s,
               '<' || s || '> ' ||
               string_agg('<' || p || '> <' || o || '>', ' ; '
                          ORDER BY p, o) || ' .' AS body
        FROM q GROUP BY g, s
      )
      SELECT CASE WHEN g = 'default_graph' THEN body
                  ELSE '<' || g || '> { ' || body || ' }' END AS line
      FROM grp
    """


# the serializer's line grammar, one statement group per line:
# '<s> <p1> <o1> ; <p2> <o2> .', optionally wrapped in '<g> { ... }'.
# Two anchored forms (not one optional-group regex) so an unbalanced
# brace can never parse: the wrapper requires BOTH braces, the bare
# form neither.
_TTL_BODY = (
    r'<([^<>]*)> '               # subject
    r'(<[^<>]*> <[^<>]*>'        # first predicate-object pair
    r'(?: ; <[^<>]*> <[^<>]*>)*)'  # '; '-chained further pairs
    r' \.'
)
_TTL_TRIG_RE = r'^<([^<>]*)> \{ ' + _TTL_BODY + r' \}$'
_TTL_BARE_RE = r'^' + _TTL_BODY + r'$'
_TTL_PAIR_RE = r'^<([^<>]*)> <([^<>]*)>$'


def parse_turtle(
    lines: DataFrame,
    col: str = "value",
    default_graph: str = DEFAULT_GRAPH,
) -> DataFrame:
    """Parse the line-oriented Turtle/TriG SUBSET :func:`format_turtle`
    emits back to quads ``(s, p, o, g, malformed)`` — the write side's
    exact inverse, so ``.ttl``/``.trig`` round-trips through
    ``io.read_table`` like ``.nq`` does. General Turtle (multi-line
    statements, prefixes, literals) is out of scope by design: a
    distributed line reader needs statement-per-line framing, which is
    what the writer guarantees. All pure JVM: one regexp gate per line
    (two anchored forms — unbalanced TriG braces quarantine), a
    ``split`` + ``explode`` over the pair chain, one regexp GATE per
    pair (a term containing the structural ``" ; "`` sequence makes its
    pairs fail the pair grammar and quarantine rather than silently
    mis-split); comments/blank lines drop, anything else quarantines
    with ``malformed = true`` (the :func:`parse_nquads` contract). The
    TriG wrapper's presence is decided by its own form match, so an
    empty graph label ``<> { ... }`` keeps ``g = ""`` rather than
    collapsing into the default graph."""
    c = F.col(col)
    kept = lines.filter(
        (F.length(F.trim(c)) > 0) & ~F.trim(c).startswith("#")
    )
    is_trig = c.rlike(_TTL_TRIG_RE)
    is_bare = c.rlike(_TTL_BARE_RE)
    parsed = kept.select(
        (is_trig | is_bare).alias("_ok"),
        F.when(is_trig, F.regexp_extract(c, _TTL_TRIG_RE, 2))
        .otherwise(F.regexp_extract(c, _TTL_BARE_RE, 1))
        .alias("s"),
        F.when(is_trig, F.regexp_extract(c, _TTL_TRIG_RE, 3))
        .otherwise(F.regexp_extract(c, _TTL_BARE_RE, 2))
        .alias("_pairs"),
        F.when(is_trig, F.regexp_extract(c, _TTL_TRIG_RE, 1))
        .otherwise(F.lit(default_graph))
        .alias("g"),
    )
    pairs = parsed.filter(F.col("_ok")).select(
        "s",
        F.explode(F.split("_pairs", " ; ")).alias("_po"),
        "g",
    )
    ok = pairs.select(
        F.when(F.col("_po").rlike(_TTL_PAIR_RE), F.col("s")).alias("s"),
        F.when(
            F.col("_po").rlike(_TTL_PAIR_RE),
            F.regexp_extract("_po", _TTL_PAIR_RE, 1),
        ).alias("p"),
        F.when(
            F.col("_po").rlike(_TTL_PAIR_RE),
            F.regexp_extract("_po", _TTL_PAIR_RE, 2),
        ).alias("o"),
        F.when(F.col("_po").rlike(_TTL_PAIR_RE), F.col("g")).alias("g"),
        (~F.col("_po").rlike(_TTL_PAIR_RE)).alias("malformed"),
    )
    bad = parsed.filter(~F.col("_ok")).select(
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("string").alias("p"),
        F.lit(None).cast("string").alias("o"),
        F.lit(None).cast("string").alias("g"),
        F.lit(True).alias("malformed"),
    )
    return ok.unionByName(bad)


def read_turtle(
    spark, path: str, default_graph: str = DEFAULT_GRAPH
) -> DataFrame:
    """``spark.read.text`` + :func:`parse_turtle` — the text source
    splits on line boundaries, so one large ``.ttl``/``.trig`` document
    still parallelizes (the :func:`read_nquads` property)."""
    return parse_turtle(
        spark.read.text(path), "value", default_graph=default_graph
    )


def rdf_trig_roundtrip(spark, sf_dir: str) -> DataFrame:
    """Gate query: the two-graph nation store through format_turtle
    (TriG) and parse_turtle — must reproduce the quad set exactly
    (oracle: the store derivation itself)."""
    lines = rdf_trig_format(spark, sf_dir)
    parsed = parse_turtle(lines, "line")
    return parsed.filter(~F.col("malformed")).select("s", "p", "o", "g")


def rdf_trig_roundtrip_sql() -> str:
    return """
      SELECT 'nation:' || n_nationkey AS s, 'in_region' AS p,
             'region:' || n_regionkey AS o,
             'graph://' || (n_nationkey % 2) AS g
      FROM nation
      UNION ALL
      SELECT 'nation:' || n_nationkey, 'label', 'name:' || n_name,
             'graph://' || (n_nationkey % 2)
      FROM nation
      UNION ALL
      SELECT * FROM (
        SELECT 'nation:' || n_nationkey AS s, 'seen' AS p,
               'true' AS o, 'default_graph' AS g
        FROM nation ORDER BY n_nationkey LIMIT 3
      )
    """
