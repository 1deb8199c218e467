"""N-Quads parse/serialize: grammar coverage, quarantine flagging, file
round-trip through the io routing."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rify_spark import io as rio  # noqa: E402
from rify_spark.rdf import (  # noqa: E402
    format_nquads,
    parse_nquads,
    read_nquads,
    write_nquads,
)


def _parse_one(spark, line: str) -> dict:
    df = spark.createDataFrame([(line,)], "value string")
    rows = parse_nquads(df).collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_iri_quad(spark):
    r = _parse_one(spark, "<http://a> <http://p> <http://b> <http://g> .")
    assert r == {
        "s": "http://a", "p": "http://p", "o": "http://b", "g": "http://g",
        "o_kind": "iri", "o_datatype": "", "o_lang": "",
        "malformed": False,
    }


def test_default_graph_triple(spark):
    r = _parse_one(spark, "<http://a> <http://p> <http://b> .")
    assert r["g"] == "default_graph"
    assert not r["malformed"]


def test_literal_escapes_decode(spark):
    r = _parse_one(
        spark, '<http://a> <http://p> "x\\ty\\n\\"z\\"\\\\u" .'
    )
    assert r["o"] == 'x\ty\n"z"\\u'
    assert r["o_kind"] == "literal"


def test_unicode_escape_passthrough(spark):
    # \\uXXXX is documented as pass-through, not decoded
    r = _parse_one(spark, '<http://a> <http://p> "snow \\u2603" .')
    assert r["o"] == "snow \\u2603"


def test_typed_and_lang_literals(spark):
    r = _parse_one(
        spark,
        '<http://a> <http://p> "7"^^<http://www.w3.org/2001/XMLSchema#int> .',
    )
    assert (r["o"], r["o_datatype"], r["o_lang"]) == (
        "7", "http://www.w3.org/2001/XMLSchema#int", ""
    )
    r = _parse_one(spark, '<http://a> <http://p> "hej"@sv-SE .')
    assert (r["o"], r["o_datatype"], r["o_lang"]) == ("hej", "", "sv-SE")


def test_blank_nodes_and_empty_literal(spark):
    r = _parse_one(spark, "_:x <http://p> _:y <http://g> .")
    assert (r["s"], r["o"], r["o_kind"]) == ("_:x", "_:y", "blank")
    r = _parse_one(spark, '<http://a> <http://p> "" .')
    assert (r["o"], r["o_kind"], r["malformed"]) == ("", "literal", False)


def test_malformed_flagged_not_dropped(spark):
    bad = [
        "no terms here",
        "<http://a> <http://p> <http://b>",  # missing terminator
        '<http://a> "literal-predicate" <http://b> .',
        '"literal-subject" <http://p> <http://b> .',
    ]
    df = spark.createDataFrame([(b,) for b in bad], "value string")
    out = parse_nquads(df).collect()
    assert len(out) == 4
    assert all(r.malformed and r.s is None for r in out)


def test_comments_and_blanks_dropped(spark):
    df = spark.createDataFrame(
        [("# header",), ("",), ("   ",), ("<http://a> <http://p> <http://b> .",)],
        "value string",
    )
    assert parse_nquads(df).count() == 1


def test_roundtrip_and_io_routing(spark, tmp_path):
    quads = spark.createDataFrame(
        [("iri://s%d" % i, "iri://p", "iri://o%d" % (i % 3), "iri://g")
         for i in range(50)],
        "s string, p string, o string, g string",
    )
    path = str(tmp_path / "quads.nq")
    write_nquads(quads, path)
    back = read_nquads(spark, path)
    assert back.filter("malformed").count() == 0
    assert sorted(map(tuple, back.select("s", "p", "o", "g").collect())) == \
        sorted(map(tuple, quads.collect()))
    # io.read_table routes *.nq through the RDF reader
    routed = rio.read_table(spark, path)
    assert "o_kind" in routed.columns and routed.count() == 50
    # and write_table the other way
    path2 = str(tmp_path / "quads2.nt")
    rio.write_table(quads, path2)
    assert read_nquads(spark, path2).count() == 50


def test_parse_is_pure_jvm(spark):
    """No Python UDF / RDD scan in the parse plan (100-TB hot path)."""
    df = spark.createDataFrame([("x",)], "value string")
    plan = parse_nquads(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_serializer_line_shape(spark):
    line = format_nquads(
        spark.createDataFrame(
            [("a", "b", "c", "g")], "s string, p string, o string, g string"
        )
    ).head().line
    assert line == "<a> <b> <c> <g> ."


# --- Turtle / TriG serialization --------------------------------------------


def _parse_turtle_subset(lines, default_g="default_graph"):
    """Independent driver-side reading of the serializer's subset —
    ``[<g> {] <s> <p1> <o1> ; <p2> <o2> . [}]`` — back to a quad set."""
    import re

    quads = set()
    for ln in lines:
        g = default_g
        m = re.fullmatch(r"<([^<>]*)> \{ (.*) \}", ln)
        if m:
            g, ln = m.group(1), m.group(2)
        m = re.fullmatch(r"<([^<>]*)> (.*) \.", ln)
        assert m, ln
        s, rest = m.group(1), m.group(2)
        for pair in rest.split(" ; "):
            pm = re.fullmatch(r"<([^<>]*)> <([^<>]*)>", pair)
            assert pm, pair
            quads.add((s, pm.group(1), pm.group(2), g))
    return quads


def test_trig_roundtrips_the_quad_set(spark):
    from rify_spark.rdf import format_turtle

    rows = [
        ("a", "p", "x", "default_graph"),
        ("a", "q", "y", "default_graph"),
        ("a", "p", "x", "g1"),
        ("b", "p", "z", "g1"),
        ("b", "p", "w", "g1"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    lines = [r[0] for r in format_turtle(df, trig=True).collect()]
    # one line per (graph, subject) group
    assert len(lines) == 3
    assert _parse_turtle_subset(lines) == set(rows)
    # predicate-object pairs are sorted inside a group (determinism)
    (bline,) = [ln for ln in lines if ln.startswith("<g1> { <b>")]
    assert bline == "<g1> { <b> <p> <w> ; <p> <z> . }"


def test_turtle_is_the_deduplicated_triples_projection(spark):
    from rify_spark.rdf import format_turtle

    df = spark.createDataFrame(
        [("a", "p", "x", "g1"), ("a", "p", "x", "g2"), ("a", "q", "y", "g1")],
        "s string, p string, o string, g string",
    )
    lines = [r[0] for r in format_turtle(df).collect()]
    # the same triple in two graphs serializes once; no graph blocks
    assert lines == ["<a> <p> <x> ; <q> <y> ."]


def test_write_turtle_and_trig(spark, tmp_path):
    from rify_spark.rdf import write_trig, write_turtle

    df = spark.createDataFrame(
        [("a", "p", "x", "g1"), ("b", "p", "y", "default_graph")],
        "s string, p string, o string, g string",
    )
    write_turtle(df, str(tmp_path / "t"))
    write_trig(df, str(tmp_path / "q"))
    ttl = set(
        r[0] for r in spark.read.text(str(tmp_path / "t")).collect()
    )
    trig = set(
        r[0] for r in spark.read.text(str(tmp_path / "q")).collect()
    )
    assert ttl == {"<a> <p> <x> .", "<b> <p> <y> ."}
    assert trig == {"<g1> { <a> <p> <x> . }", "<b> <p> <y> ."}


def test_turtle_plan_is_one_exchange_jvm_only(spark):
    from rify_spark.rdf import format_turtle

    df = spark.createDataFrame(
        [("a", "p", "x", "g1")], "s string, p string, o string, g string"
    )
    plan = (
        format_turtle(df, trig=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert plan.count("Exchange") <= 1


def test_parse_turtle_subset_inverse(spark):
    from rify_spark.rdf import format_turtle, parse_turtle

    rows = [
        ("a", "p", "x", "default_graph"),
        ("a", "q", "y", "default_graph"),
        ("a", "p", "x", "g1"),
        ("b", "p", "z", "g1"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    back = parse_turtle(format_turtle(df, trig=True), "line")
    got = {
        tuple(r)[:4]
        for r in back.filter(~F.col("malformed")).collect()
    }
    assert got == set(rows)


def test_parse_turtle_quarantines_malformed(spark):
    from rify_spark.rdf import parse_turtle

    lines = spark.createDataFrame(
        [
            ("<a> <p> <x> ; <q> <y> .",),
            ("<g1> { <b> <p> <z> . }",),
            ("# comment",),
            ("",),
            ("<a> <p> junk .",),
            ("no brackets at all",),
        ],
        "value string",
    )
    out = parse_turtle(lines).collect()
    good = [tuple(r)[:4] for r in out if not r["malformed"]]
    assert sorted(good) == [
        ("a", "p", "x", "default_graph"),
        ("a", "q", "y", "default_graph"),
        ("b", "p", "z", "g1"),
    ]
    assert sum(1 for r in out if r["malformed"]) == 2


def test_io_routes_ttl_and_trig(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "p", "x", "g1"), ("b", "q", "y", "default_graph")],
        "s string, p string, o string, g string",
    )
    trig = str(tmp_path / "store.trig")
    ttl = str(tmp_path / "store.ttl")
    rio.write_table(df, trig)
    rio.write_table(df, ttl)
    back = rio.read_table(spark, trig)
    got = {
        tuple(r)[:4]
        for r in back.filter(~F.col("malformed")).collect()
    }
    assert got == {tuple(r) for r in df.collect()}
    # .ttl drops the graph slot (triples projection), reads to default
    t = rio.read_table(spark, ttl).filter(~F.col("malformed"))
    assert {tuple(r)[:3] for r in t.collect()} == {
        ("a", "p", "x"), ("b", "q", "y")
    }


def test_parse_turtle_structural_edge_cases(spark):
    from rify_spark.rdf import format_turtle, parse_turtle

    # a term containing the structural ' ; ' sequence quarantines on
    # read-back instead of silently mis-splitting into garbage quads
    df = spark.createDataFrame(
        [("a", "p", "x ; y", "default_graph")],
        "s string, p string, o string, g string",
    )
    out = parse_turtle(format_turtle(df, trig=True), "line").collect()
    assert all(r["malformed"] for r in out)
    assert not any(r["p"] == "" for r in out)
    # unbalanced TriG braces quarantine (each form needs BOTH or NEITHER)
    lines = spark.createDataFrame(
        [
            ("<s> <p> <o> . }",),
            ("<g1> { <s> <p> <o> .",),
            ("<g1> { <s> <p> <o> . }",),
        ],
        "value string",
    )
    rows = parse_turtle(lines).collect()
    good = [tuple(r)[:4] for r in rows if not r["malformed"]]
    assert good == [("s", "p", "o", "g1")]
    assert sum(1 for r in rows if r["malformed"]) == 2
    # an empty TriG graph label stays '' (never collapses to default)
    empt = parse_turtle(
        spark.createDataFrame([("<> { <s> <p> <o> . }",)], "value string")
    ).collect()
    assert [tuple(r)[:4] for r in empt] == [("s", "p", "o", "")]


def test_trig_dedups_inside_the_aggregate(spark):
    from rify_spark.rdf import format_turtle

    df = spark.createDataFrame(
        [("a", "p", "x", "g1"), ("a", "p", "x", "g1"), ("a", "q", "y", "g1")],
        "s string, p string, o string, g string",
    )
    lines = [r[0] for r in format_turtle(df, trig=True).collect()]
    assert lines == ["<g1> { <a> <p> <x> ; <q> <y> . }"]
    # and the plain-Turtle path is ONE exchange (no dedup pre-shuffle)
    plan = (
        format_turtle(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1 and "Python" not in plan


def test_bfs_levels_ignores_null_endpoints(spark):
    from rify_spark.ops.graph import bfs_levels

    edges = spark.createDataFrame(
        [("a", None), ("a", "b"), ("b", None), ("b", "c")],
        "s string, o string",
    )
    src = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in bfs_levels(edges, src).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}
