"""SPARQL Update subset: the functional store-in/store-out contract,
delete-before-insert semantics, graph management, plan shapes, and the
documented error contract."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rify_spark.rdf import DEFAULT_GRAPH as G  # noqa: E402
from rify_spark.sparql import SparqlParseError  # noqa: E402
from rify_spark.update import parse_update, sparql_update  # noqa: E402

BASE = [
    ("a", "knows", "b", G),
    ("b", "knows", "c", G),
    ("a", "age", "3", G),
    ("x", "p", "y", "g2"),
]


@pytest.fixture(scope="module")
def store(spark):
    return spark.createDataFrame(
        BASE, "s string, p string, o string, g string"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_insert_data_set_semantics_and_graph_blocks(store):
    out = sparql_update(
        store,
        'INSERT DATA { <a> <knows> <b> . <new> <q> "v" . '
        "GRAPH <g2> { <n> <p> <m> } }",
    )
    got = _rows(out)
    # the duplicate quad is a no-op; two novel quads appended
    assert len(got) == len(BASE) + 2
    assert ("new", "q", "v", G) in got and ("n", "p", "m", "g2") in got
    # functional: the input store is untouched
    assert _rows(store) == sorted(BASE)


def test_delete_data_exact_matches_only(store):
    out = sparql_update(
        store, 'DELETE DATA { <a> <age> "3" . <zz> <q> <ww> }'
    )
    got = _rows(out)
    assert ("a", "age", "3", G) not in got and len(got) == len(BASE) - 1
    # graph slot matters: same triple in another graph is not touched
    out = sparql_update(store, "DELETE DATA { GRAPH <g9> { <a> <age> \"3\" } }")
    assert len(_rows(out)) == len(BASE)


def test_delete_where_pattern_is_its_own_template(store):
    out = sparql_update(store, "DELETE WHERE { ?x <knows> ?y }")
    assert _rows(out) == [("a", "age", "3", G), ("x", "p", "y", "g2")]
    # variable graph sweeps all graphs
    out = sparql_update(store, "DELETE WHERE { GRAPH ?g { ?x ?p ?y } }")
    assert _rows(out) == []


def test_modify_delete_before_insert_single_match(store):
    out = sparql_update(
        store,
        "DELETE { ?x <knows> ?y } "
        "INSERT { GRAPH <new> { ?x <met> ?y } } "
        'WHERE { ?x <knows> ?y FILTER (?x != "b") }',
    )
    got = _rows(out)
    assert ("a", "knows", "b", G) not in got
    assert ("a", "met", "b", "new") in got
    assert ("b", "knows", "c", G) in got  # filtered out of the match


def test_modify_insert_only_and_delete_only(store):
    out = sparql_update(
        store, "INSERT { ?y <known_by> ?x } WHERE { ?x <knows> ?y }"
    )
    got = _rows(out)
    assert ("b", "known_by", "a", G) in got and ("c", "known_by", "b", G) in got
    out = sparql_update(
        store, 'DELETE { ?x <age> "3" } WHERE { ?x <knows> ?y }'
    )
    assert ("a", "age", "3", G) not in _rows(out)


def test_where_matches_pre_operation_store_once(store):
    # the insert template writes quads the WHERE would match — they must
    # NOT feed back within the same operation (single evaluation)
    out = sparql_update(
        store, "INSERT { ?y <knows> ?x } WHERE { ?x <knows> ?y }"
    )
    got = _rows(out)
    assert ("b", "knows", "a", G) in got and ("c", "knows", "b", G) in got
    # a->b reversed to b->a, but b->a was NOT re-reversed to a->b twice:
    # count only the original 4 + 2 new
    assert len(got) == len(BASE) + 2


def test_insert_template_skips_incomplete_triples(store):
    # Update §3.1.3: a solution leaving a template var unbound omits
    # just the triples using it — the sure-bound triple still inserts
    out = sparql_update(
        store,
        'INSERT { ?x <aged> ?age . ?x <seen> "y" } '
        "WHERE { ?x <knows> ?y OPTIONAL { ?x <age> ?age } }",
    )
    got = _rows(out)
    assert ("a", "aged", "3", G) in got
    assert ("a", "seen", "y", G) in got and ("b", "seen", "y", G) in got
    # b has no age: no aged-triple, and nothing null-ish either
    assert not any(s == "b" and p == "aged" for s, p, o, g in got)
    assert len(got) == len(BASE) + 3


def test_sequence_applies_left_to_right(store):
    out = sparql_update(
        store,
        'INSERT DATA { <s1> <q> "1" } ; '
        'DELETE WHERE { ?x <q> "1" } ; '
        'INSERT DATA { <s2> <q> "2" }',
    )
    got = _rows(out)
    assert ("s1", "q", "1", G) not in got and ("s2", "q", "2", G) in got


def test_graph_management(store):
    out = sparql_update(store, "COPY DEFAULT TO GRAPH <bak>")
    got = _rows(out)
    assert ("a", "knows", "b", "bak") in got and ("a", "knows", "b", G) in got
    # COPY clears the target first
    out = sparql_update(store, "COPY GRAPH <g2> TO DEFAULT")
    assert _rows(out) == [("x", "p", "y", G), ("x", "p", "y", "g2")]
    # MOVE removes the source; ADD keeps both and dedups
    # MOVE clears the destination graph first (spec §3.2.5), then moves
    out = sparql_update(store, "MOVE DEFAULT TO GRAPH <g2>")
    got = _rows(out)
    assert all(g == "g2" for *_xs, g in got) and len(got) == 3
    assert ("x", "p", "y", "g2") not in got
    out = sparql_update(
        store, "ADD GRAPH <g2> TO GRAPH <g2>"
    )  # same graph: spec no-op
    assert _rows(out) == sorted(BASE)
    out = sparql_update(store, "CLEAR GRAPH <g2>")
    assert _rows(out) == sorted(q for q in BASE if q[3] != "g2")
    out = sparql_update(store, "DROP ALL")
    assert _rows(out) == []


def test_data_ops_never_shuffle_the_store(store):
    # the 100-TB contract: INSERT/DELETE DATA are broadcast probes of the
    # store — no Exchange over the store side of the plan
    out = sparql_update(store, 'DELETE DATA { <a> <age> "3" }')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan
    out = sparql_update(store, "INSERT DATA { <n1> <p> <n2> }")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_update_error_contract(store):
    for bad in [
        "INSERT DATA { ?x <p> <o> }",  # variable in DATA
        "DELETE DATA { [] <p> <o> }",  # bnode in DATA
        "INSERT { ?x <p> ?y } WHERE { ?x <q> ?z } ",  # unbound template var
        "DELETE { ?x <p> _:b } WHERE { ?x <p> ?y }",  # bnode in template
        "WITH <g> INSERT DATA { <a> <b> <c> }",  # WITH on non-modify
        "LOAD",  # missing document IRI
        "ADD ALL TO DEFAULT",  # ALL where a graph is needed
        "CLEAR",  # missing graph ref
        "SELECT ?x WHERE { ?x <p> ?y }",  # a query, not an update
        "DELETE WHERE { ?x <p> ?y FILTER (?x = \"a\") }",  # FILTER in pattern
    ]:
        with pytest.raises(SparqlParseError):
            sparql_update(store, bad)


def test_parse_update_shapes():
    ops = parse_update(
        "PREFIX : <base/> INSERT DATA { :s :p :o } ; CLEAR DEFAULT"
    )
    assert ops[0] == ("insert_data", [("base/s", "base/p", "base/o", G)])
    assert ops[1] == ("clear", G)


# --------------------------------------------------------------------------
# WITH / USING (spec §3.1.3, §3.1.3.2)
# --------------------------------------------------------------------------


def test_with_sets_template_and_pattern_default(store):
    # WITH <g2>: the unscoped pattern matches in g2 and the unscoped
    # insert template targets g2
    out = sparql_update(
        store,
        "WITH <g2> INSERT { ?s <p2> ?o } WHERE { ?s <p> ?o }",
    )
    assert _rows(out) == sorted(_rows(store) + [("x", "p2", "y", "g2")])
    # the default graph is untouched by the WITH-scoped match
    out2 = sparql_update(
        store,
        "WITH <g2> DELETE { ?s <knows> ?o } WHERE { ?s <knows> ?o }",
    )
    assert _rows(out2) == _rows(store)  # no knows-triples live in g2


def test_using_redatasets_the_match_side(store):
    # USING <g2>: the WHERE's default graph becomes g2's content while
    # the unscoped template still targets the WITH graph
    out = sparql_update(
        store,
        "WITH <derived> INSERT { ?s <from_g2> ?o } "
        "USING <g2> WHERE { ?s <p> ?o }",
    )
    assert _rows(out) == sorted(
        _rows(store) + [("x", "from_g2", "y", "derived")]
    )
    # USING NAMED: GRAPH patterns range over the named graphs only
    out2 = sparql_update(
        store,
        "INSERT { ?s <seen_in> ?g } USING NAMED <g2> "
        "WHERE { GRAPH ?g { ?s <p> ?o } }",
    )
    assert _rows(out2) == sorted(_rows(store) + [("x", "seen_in", "g2", G)])
    # ... and the USING default side is empty (no plain USING given)
    out3 = sparql_update(
        store,
        "INSERT { ?s <q> ?o } USING NAMED <g2> WHERE { ?s <knows> ?o }",
    )
    assert _rows(out3) == _rows(store)


def test_with_error_contract(store):
    for bad in [
        "WITH <g2> INSERT DATA { <a> <b> <c> }",
        "WITH <g2> DELETE WHERE { ?s <p> ?o }",
        "WITH <g2> CLEAR GRAPH <g2>",
    ]:
        with pytest.raises(SparqlParseError):
            parse_update(bad)


# --------------------------------------------------------------------------
# CLEAR NAMED / CREATE / SILENT (spec §3.2)
# --------------------------------------------------------------------------


def test_clear_named_keeps_only_the_default_graph(store):
    out = sparql_update(store, "CLEAR NAMED")
    assert _rows(out) == sorted(r for r in BASE if r[3] == G)
    # DROP is the documented alias
    out2 = sparql_update(store, "DROP NAMED")
    assert _rows(out2) == _rows(out)


def test_create_is_a_noop_and_silent_parses(store):
    assert _rows(sparql_update(store, "CREATE GRAPH <g9>")) == sorted(BASE)
    assert parse_update("CREATE SILENT GRAPH <g9>") == [("create", "g9")]
    # SILENT on the other graph-management forms
    out = sparql_update(
        store,
        "CLEAR SILENT GRAPH <g2> ; ADD SILENT GRAPH <missing> TO DEFAULT",
    )
    assert _rows(out) == sorted(r for r in BASE if r[3] == G)
    out2 = sparql_update(store, "COPY SILENT DEFAULT TO GRAPH <g2>")
    assert _rows(out2) == sorted(
        [r for r in BASE if r[3] == G]
        + [(s, p, o, "g2") for (s, p, o, g) in BASE if g == G]
    )


def test_graph_management_error_contract(store):
    for bad in [
        "CREATE GRAPH",  # missing IRI
        "ADD NAMED TO DEFAULT",  # NAMED is not a specific graph
        "MOVE DEFAULT TO NAMED",
        "LOAD <doc> INTO <g>",  # INTO needs the GRAPH keyword
    ]:
        with pytest.raises(SparqlParseError):
            parse_update(bad)


# --------------------------------------------------------------------------
# LOAD (spec §3.1.4) over the distributed N-Quads reader
# --------------------------------------------------------------------------


def test_load_document(store, tmp_path):
    from rify_spark.update import parse_update as _pu

    assert _pu("LOAD SILENT <file:///x> INTO GRAPH <g>") == [
        ("load", "file:///x", "g", True)
    ]
    doc = tmp_path / "doc.nq"
    doc.write_text(
        "<n1> <p> <n2> .\n"
        "# a comment\n"
        "<n3> <p> <n4> <gx> .\n"
    )
    out = sparql_update(store, f"LOAD <file://{doc}>")
    got = _rows(out)
    # graph labels honored; label-less statements land in the default
    assert ("n1", "p", "n2", G) in got and ("n3", "p", "n4", "gx") in got
    # INTO GRAPH retargets everything
    out = sparql_update(store, f"LOAD <file://{doc}> INTO GRAPH <dst>")
    got = _rows(out)
    assert ("n1", "p", "n2", "dst") in got and ("n3", "p", "n4", "dst") in got
    # a malformed line fails a plain LOAD and is dropped by SILENT
    bad = tmp_path / "bad.nq"
    bad.write_text("<n1> <p> <n2> .\nthis is not a statement\n")
    with pytest.raises(SparqlParseError, match="malformed"):
        sparql_update(store, f"LOAD <file://{bad}>")
    out = sparql_update(store, f"LOAD SILENT <file://{bad}>")
    assert ("n1", "p", "n2", G) in _rows(out)
    # SILENT: a missing document is a no-op; non-SILENT raises
    out = sparql_update(store, "LOAD SILENT <file:///nonexistent-doc.nq>")
    assert _rows(out) == sorted(BASE)
    with pytest.raises(Exception):
        _rows(sparql_update(store, "LOAD <file:///nonexistent-doc.nq>"))


# --------------------------------------------------------------------------
# blank nodes in INSERT DATA / INSERT templates (spec §3.1.1 / §3.1.3)
# --------------------------------------------------------------------------


def test_insert_data_bnodes_mint_fresh_coreferent_nodes(store):
    out = sparql_update(
        store,
        'INSERT DATA { _:w <type> <Widget> . _:w <label> "w" . '
        "[ <type> <Gadget> ] }",
    )
    got = _rows(out)
    assert len(got) == len(BASE) + 3
    widgets = [r for r in got if r[1:3] == ("type", "Widget")]
    labels = [r for r in got if r[1:3] == ("label", "w")]
    gadgets = [r for r in got if r[1:3] == ("type", "Gadget")]
    assert len(widgets) == len(labels) == len(gadgets) == 1
    # one label -> ONE node, shared by both its triples; the anonymous
    # [] mints a different node; all land in the _: namespace
    assert widgets[0][0] == labels[0][0] != gadgets[0][0]
    assert widgets[0][0].startswith("_:") and gadgets[0][0].startswith("_:")
    # deterministic under the default seed (oracle-reproducible) ...
    again = sparql_update(
        store,
        'INSERT DATA { _:w <type> <Widget> . _:w <label> "w" . '
        "[ <type> <Gadget> ] }",
    )
    assert _rows(again) == got
    # ... and a caller-supplied seed makes re-execution spec-fresh
    seeded = sparql_update(
        store, "INSERT DATA { _:w <type> <Widget> }", bnode_seed="run2"
    )
    mint = [r for r in _rows(seeded) if r[1:3] == ("type", "Widget")]
    assert mint[0][0] != widgets[0][0]


def test_insert_data_bnodes_disjoint_across_operations(store):
    # the op-index salt keeps the SAME label in two ;-separated DATA
    # blocks denoting two different fresh nodes (per-operation scope)
    out = sparql_update(
        store, "INSERT DATA { _:x <m> <a> } ; INSERT DATA { _:x <m> <b> }"
    )
    subs = {r[0] for r in _rows(out) if r[1] == "m"}
    assert len(subs) == 2


def test_insert_template_bnodes_mint_per_solution(store):
    import hashlib

    out = sparql_update(
        store,
        "INSERT { ?s <via> _:m . _:m <to> ?o } WHERE { ?s <knows> ?o }",
    )
    got = _rows(out)
    vias = {r[0]: r[2] for r in got if r[1] == "via"}
    tos = {r[0]: r[2] for r in got if r[1] == "to"}
    # one fresh node per solution, coreferent across the template's
    # two triples: a-via-m1/m1-to-b and b-via-m2/m2-to-c
    assert vias["a"] != vias["b"]
    assert tos[vias["a"]] == "b" and tos[vias["b"]] == "c"
    # the mint is the documented deterministic function: md5 over
    # (label, salt='#opidx', values in sorted-var order: ?o then ?s)
    expect = "_:" + hashlib.md5(
        "__bn_m\x1f#0\x1fc\x1fb".encode()
    ).hexdigest()
    assert vias["b"] == expect


def test_insert_template_bnode_label_may_not_appear_in_where(store):
    with pytest.raises(SparqlParseError, match="may not also appear"):
        sparql_update(
            store,
            "INSERT { ?s <via> _:o } WHERE { ?s <knows> ?o . ?x <p> _:o }",
        ).collect()
