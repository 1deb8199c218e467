"""W3C SPARQL 1.1 Query Results serializers over solution DataFrames.

A solution DataFrame is what :func:`rify_spark.sparql.sparql_select`
returns — one column per selected variable, NULL = unbound. The engine's
term space is opaque strings (reference src/translator.rs generic
``Bound``), so every bound value serializes as a plain literal: CSV cells
are the raw lexemes (RFC 4180 quoting), TSV and JSON encode each binding
as a quoted literal term. All serializers are DISTRIBUTED: the per-row
encoding is built-in JVM expressions (``to_json`` / ``concat`` /
``regexp_replace`` under whole-stage codegen — no Python in the row
path), and the file writers are plain ``df.write`` sinks, so a 100-TB
result set streams straight from the executors. The one driver-side
convenience, :func:`results_json`, assembles the single-document W3C
JSON form and is row-capped for that reason.

Formats:
  * CSV (https://www.w3.org/TR/sparql11-results-csv-tsv/ §3): header =
    variable names, unbound = empty field, RFC 4180 quoting — exactly
    Spark's CSV writer contract.
  * TSV (§4): header = ``?var`` names, each bound value a quoted
    literal with ``\\ \\t \\n \\r \\"`` escapes, unbound = empty field.
  * JSON (https://www.w3.org/TR/sparql11-results-json/): the
    ``{"head": {"vars": [...]}, "results": {"bindings": [...]}}``
    document; each binding maps bound variables to
    ``{"type": "literal", "value": ...}`` (unbound variables are
    omitted from the binding object, per spec §3.2.2).
    :func:`results_json_lines` is the distributed form — one binding
    object per line (JSONL), the shape a 1000-executor export job
    actually wants.
  * XML (https://www.w3.org/TR/rdf-sparql-XMLres/): the ``<sparql>``
    document with ``<head>``/``<results>``; each row is one
    ``<result>`` element whose ``<binding name="...">`` children carry
    bound variables only (spec §2.3.1 — unbound bindings are omitted).
    :func:`results_xml_fragments` is the distributed form — one
    ``<result>`` element per line, built from pure JVM string
    expressions; :func:`results_xml` assembles the single document
    driver-side (row-capped, like :func:`results_json`), and
    :func:`results_xml_ask` emits the boolean document for ASK.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "results_json",
    "results_json_lines",
    "results_tsv_lines",
    "results_xml",
    "results_xml_ask",
    "results_xml_fragments",
    "write_results_csv",
    "write_results_tsv",
]


def write_results_csv(df: DataFrame, path: str, **options) -> None:
    """Write the W3C CSV results form (spec §3). Spark's CSV sink IS the
    format: header row of variable names, RFC 4180 quoting, NULL
    (unbound) as the empty field. Extra ``options`` pass through to the
    writer (e.g. ``compression="gzip"``)."""
    (
        df.write.option("header", True)
        .option("nullValue", "")
        .option("emptyValue", "")
        # RFC 4180 doubles embedded quotes; Spark's default is \" escaping
        .option("escape", '"')
        .options(**options)
        .csv(path)
    )


def _tsv_term(col):
    """One bound value -> a quoted-literal SPARQL term with the TSV
    escapes; NULL (unbound) -> the empty field (spec §4)."""
    esc = F.regexp_replace(col, r"\\", r"\\\\")
    esc = F.regexp_replace(esc, "\t", r"\\t")
    esc = F.regexp_replace(esc, "\n", r"\\n")
    esc = F.regexp_replace(esc, "\r", r"\\r")
    esc = F.regexp_replace(esc, '"', r'\\"')
    return F.when(
        col.isNotNull(), F.concat(F.lit('"'), esc, F.lit('"'))
    ).otherwise(F.lit(""))


def results_tsv_lines(df: DataFrame) -> DataFrame:
    """The W3C TSV results form (spec §4) as a DataFrame of lines
    (column ``line``) — distributed; write with ``.write.text(path)``.
    The header line (``?a\\t?b``) is a format concern of the assembled
    file, so :func:`write_results_tsv` prepends it per output file; this
    function returns the data lines only."""
    return df.select(
        F.concat_ws("\t", *[_tsv_term(F.col(c)) for c in df.columns]).alias(
            "line"
        )
    )


def write_results_tsv(df: DataFrame, path: str, **options) -> None:
    """Write the W3C TSV results form: ``?var`` header + quoted-literal
    terms. Values are pre-escaped by :func:`results_tsv_lines`'s term
    encoder, so the CSV sink runs with quoting disabled and a tab
    separator (header handling comes from the sink)."""
    cells = [_tsv_term(F.col(c)).alias(f"?{c}") for c in df.columns]
    (
        df.select(*cells)
        .write.option("header", True)
        .option("sep", "\t")
        .option("quote", "")
        .option("escape", "")
        .option("emptyValue", "")
        .options(**options)
        .csv(path)
    )


def _binding_struct(df: DataFrame):
    """Per-row binding object: bound vars -> {"type","value"} structs;
    ``to_json`` omits NULL fields, which is exactly the spec's
    unbound-variables-omitted rule."""
    return F.struct(
        *[
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit("literal").alias("type"), F.col(c).alias("value")
                ),
            ).alias(c)
            for c in df.columns
        ]
    )


def results_json_lines(df: DataFrame) -> DataFrame:
    """The distributed JSON form: one W3C binding object per line
    (column ``line``) — JSONL, the shape a large export job wants; the
    enclosing ``head``/``results`` document framing is two constant
    lines the consumer adds. Encoding is one ``to_json`` JVM projection
    per row."""
    return df.select(F.to_json(_binding_struct(df)).alias("line"))


#: the spec's result-set namespace (rdf-sparql-XMLres §2.1)
XML_NS = "http://www.w3.org/2005/sparql-results#"


def _xml_escape(col):
    """XML character-data escaping for a term lexeme: ``&`` first (so
    the entities it introduces survive), then the angle brackets, then
    CR/LF as character references — a raw ``\\r`` would be silently
    normalized to ``\\n`` by every conforming parser (XML 1.0 §2.11),
    and a raw ``\\n`` would break the fragment form's
    one-``<result>``-per-line contract. Quotes and tabs need no
    escaping in element content (tabs are preserved verbatim)."""
    esc = F.replace(col, F.lit("&"), F.lit("&amp;"))
    esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
    esc = F.replace(esc, F.lit(">"), F.lit("&gt;"))
    esc = F.replace(esc, F.lit("\r"), F.lit("&#13;"))
    return F.replace(esc, F.lit("\n"), F.lit("&#10;"))


def results_xml_fragments(df: DataFrame) -> DataFrame:
    """The distributed XML form: one ``<result>`` element per line
    (column ``line``) — the body of the document's ``<results>``
    element, built from pure JVM ``concat``/``replace`` expressions.
    The enclosing ``<sparql>``/``<head>`` framing is constant text the
    consumer (or :func:`results_xml`) adds; write with
    ``.write.text(path)`` for an executor-streamed export."""
    parts = []
    for c in df.columns:
        parts.append(
            F.when(
                F.col(c).isNotNull(),
                F.concat(
                    F.lit(f'<binding name="{c}"><literal>'),
                    _xml_escape(F.col(c)),
                    F.lit("</literal></binding>"),
                ),
            ).otherwise(F.lit(""))
        )
    return df.select(
        F.concat(F.lit("<result>"), *parts, F.lit("</result>")).alias("line")
    )


def results_xml(df: DataFrame, max_rows: int = 100_000) -> str:
    """The single-document W3C XML results form (rdf-sparql-XMLres),
    assembled driver-side (it IS one document — a multi-part distributed
    write cannot be one well-formed XML file). Row-capped like
    :func:`results_json`; use :func:`results_xml_fragments` +
    ``.write.text(path)`` for result sets that should never transit the
    driver."""
    rows = results_xml_fragments(df).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds max_rows={max_rows}; use "
            "results_xml_fragments for a distributed export"
        )
    head = "".join(f'<variable name="{c}"/>' for c in df.columns)
    body = "".join(r.line for r in rows)
    return (
        '<?xml version="1.0"?>\n'
        f'<sparql xmlns="{XML_NS}">'
        f"<head>{head}</head><results>{body}</results></sparql>"
    )


def results_xml_ask(value: bool) -> str:
    """The boolean (ASK) XML results document (spec §2.2: ``<boolean>``
    replaces ``<results>``; the lexical forms are ``true``/``false``)."""
    return (
        '<?xml version="1.0"?>\n'
        f'<sparql xmlns="{XML_NS}">'
        f"<head></head><boolean>{'true' if value else 'false'}</boolean>"
        "</sparql>"
    )


def results_json(df: DataFrame, max_rows: int = 100_000) -> dict:
    """The single-document W3C JSON results form, assembled driver-side
    (it IS one document). Row-capped: raises ``ValueError`` beyond
    ``max_rows`` — use :func:`results_json_lines` +
    ``.write.text(path)`` for result sets that should never transit the
    driver."""
    import json

    lines = results_json_lines(df).limit(max_rows + 1).collect()
    if len(lines) > max_rows:
        raise ValueError(
            f"result exceeds max_rows={max_rows}; use "
            "results_json_lines for a distributed export"
        )
    return {
        "head": {"vars": list(df.columns)},
        "results": {"bindings": [json.loads(r.line) for r in lines]},
    }
