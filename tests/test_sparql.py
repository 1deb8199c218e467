"""SPARQL SELECT subset: parser, compilation onto the matcher, modifiers,
and the documented error contract."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rify_spark.sparql import (  # noqa: E402
    RDF_TYPE,
    SparqlParseError,
    parse_select,
    sparql_select,
)

QUADS = [
    ("a", "knows", "b", "g1"),
    ("b", "knows", "c", "g1"),
    ("c", "knows", "a", "g2"),
    ("a", RDF_TYPE, "Person", "default_graph"),
    ("b", RDF_TYPE, "Person", "default_graph"),
    ("a", "age", "3", "default_graph"),
]


@pytest.fixture(scope="module")
def quads(spark):
    return spark.createDataFrame(
        QUADS, "s string, p string, o string, g string"
    )


def _run(quads_df, q):
    return sorted(tuple(r) for r in sparql_select(quads_df, q).collect())


def test_two_hop_bgp_scoped_to_graph(quads):
    got = _run(
        quads,
        "SELECT ?x ?z WHERE { GRAPH <g1> { ?x <knows> ?y . ?y <knows> ?z } }",
    )
    assert got == [("a", "c")]


def test_default_graph_outside_graph_clause(quads):
    # patterns outside GRAPH match only the engine default graph
    got = _run(quads, 'SELECT ?x WHERE { ?x <knows> ?y }')
    assert got == []


def test_graph_variable_binds(quads):
    got = _run(
        quads, "SELECT ?g WHERE { GRAPH ?g { ?x <knows> ?y } }"
    )
    assert got == [("g1",), ("g1",), ("g2",)]


def test_a_keyword_and_prefix_expansion(quads):
    q = """
      PREFIX foaf: <Per>
      SELECT ?x WHERE { ?x a foaf:son }
    """
    assert _run(quads, q) == [("a",), ("b",)]


def test_semicolon_comma_lists(quads):
    q = 'SELECT ?x WHERE { ?x a "Person" ; <age> "3" , "3" }'
    assert _run(quads, q) == [("a",)]


def test_filter_and_literal_object(quads):
    q = 'SELECT ?x WHERE { ?x a ?t FILTER (?t = "Person" && ?x != "a") }'
    assert _run(quads, q) == [("b",)]


def test_select_star_and_distinct(quads):
    q = "SELECT * WHERE { GRAPH ?g { ?x <knows> ?y } }"
    rows = _run(quads, q)
    assert len(rows) == 3 and len(rows[0]) == 3
    q = "SELECT DISTINCT ?t WHERE { ?x a ?t }"
    assert _run(quads, q) == [("Person",)]


def test_order_limit_offset(quads):
    q = ("SELECT ?x WHERE { GRAPH ?g { ?x <knows> ?y } } "
         "ORDER BY DESC(?x) LIMIT 2 OFFSET 1")
    got = [r.x for r in sparql_select(
        quads.sparkSession.createDataFrame(
            QUADS, "s string, p string, o string, g string"
        ), q
    ).collect()]
    assert got == ["b", "a"]


def test_existence_gate_constant_pattern(quads):
    # an all-constant pattern acts as an EXISTS gate on the rest
    q = ('SELECT ?x WHERE { GRAPH <g1> { <a> <knows> <b> . '
         '?x <knows> ?y } }')
    assert len(_run(quads, q)) == 2
    q = ('SELECT ?x WHERE { GRAPH <g1> { <a> <knows> <zzz> . '
         '?x <knows> ?y } }')
    assert _run(quads, q) == []


def test_literal_escapes_in_query(spark):
    df = spark.createDataFrame(
        [("s", "p", 'tab\tquote"', "default_graph")],
        "s string, p string, o string, g string",
    )
    got = _run(df, r'SELECT ?x WHERE { ?x <p> "tab\tquote\"" }')
    assert got == [("s",)]


@pytest.mark.parametrize(
    "bad",
    [
        "ASK { ?x ?y ?z }",  # wrong form for sparql_select
        "SELECT ?x WHERE { }",  # empty pattern
        "SELECT ?x WHERE { ?x foo:bar ?y }",  # undeclared prefix
        "SELECT ?q WHERE { ?x <p> ?y }",  # unbound selected var
        'SELECT ?x WHERE { ?x "lit" ?y }',  # literal predicate
        "SELECT ?x WHERE { ?x <p> ?y } ORDER BY ?y",  # order on unselected
        "SELECT ?x WHERE { ?x <p> ?y FILTER (?z = ?x) }",  # unbound filter var
        "SELECT ?x WHERE { OPTIONAL { ?x <p> ?y } }",  # OPTIONAL first in group
        "SELECT ?x WHERE { ?x <p> ?y } LIMIT ?x",  # bad LIMIT
    ],
)
def test_rejects_out_of_subset(quads, bad):
    with pytest.raises(SparqlParseError):
        sparql_select(quads, bad)


def test_parser_roundtrip_structure():
    q = parse_select(
        "PREFIX : <base/> SELECT DISTINCT ?x WHERE "
        "{ GRAPH <g> { ?x :p :o } } LIMIT 7"
    )
    assert q.distinct and q.limit == 7 and q.select == ["x"]
    (s, p, o, g), = q.patterns
    assert (p.value, o.value, g.value) == ("base/p", "base/o", "g")


def test_compiles_to_matcher_join_plan(quads):
    """The BGP runs through matcher.bindings: the plan is equi-joins with
    pushed constant filters, no python, no cartesian."""
    df = sparql_select(
        quads,
        "SELECT ?x ?z WHERE { GRAPH <g1> { ?x <knows> ?y . ?y <knows> ?z } }",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ask(quads):
    from rify_spark.sparql import sparql_ask

    yes = sparql_ask(quads, "ASK { GRAPH <g1> { <a> <knows> ?x } }").head()
    no = sparql_ask(quads, "ASK { GRAPH <g1> { <c> <knows> ?x } }").head()
    assert (yes.ask, no.ask) == (True, False)


def test_construct_is_one_shot_rule_application(quads):
    from rify_spark.sparql import sparql_construct

    q = """
      CONSTRUCT { GRAPH <closure> { ?x <reaches> ?z } }
      WHERE { GRAPH <g1> { ?x <knows> ?y . ?y <knows> ?z } }
    """
    got = sorted(tuple(r) for r in sparql_construct(quads, q).collect())
    assert got == [("a", "reaches", "c", "closure")]


def test_construct_default_graph_and_constants(quads):
    from rify_spark.sparql import sparql_construct

    q = ('CONSTRUCT { ?t <seen> "yes" } WHERE { ?x a ?t }')
    got = sorted(tuple(r) for r in sparql_construct(quads, q).collect())
    # set semantics: two Person bindings collapse to one derived quad
    assert got == [("Person", "seen", "yes", "default_graph")]


def test_construct_unbound_template_var_rejected(quads):
    from rify_spark.sparql import sparql_construct

    with pytest.raises(SparqlParseError, match="not bound"):
        sparql_construct(
            quads, "CONSTRUCT { ?q <p> ?x } WHERE { ?x <knows> ?y }"
        )
    with pytest.raises(SparqlParseError, match="FILTER"):
        sparql_construct(
            quads,
            'CONSTRUCT { ?x <p> ?x FILTER (?x = "a") } WHERE { ?x <knows> ?y }',
        )


def test_query_dispatch(quads):
    from rify_spark.sparql import sparql_query

    assert sparql_query(quads, "ASK { ?x a ?t }").head().ask is True
    assert set(sparql_query(
        quads, "SELECT ?t WHERE { ?x a ?t }"
    ).columns) == {"t"}
    assert set(sparql_query(
        quads, "CONSTRUCT { ?x <p> ?t } WHERE { ?x a ?t }"
    ).columns) == {"s", "p", "o", "g"}


def test_optional_left_join(quads):
    # every knower kept; age filled only where present
    q = """
      SELECT ?x ?age WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
      }
    """
    got = _run(quads, q)
    assert got == [("a", "3"), ("b", None), ("c", None)]


def test_optional_var_usable_in_filter_and_select(quads):
    q = """
      SELECT ?x ?age WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
        FILTER (?age != "99")
      }
    """
    # null comparisons exclude rows (SPARQL error-semantics == Spark nulls)
    assert _run(quads, q) == [("a", "3")]


def test_union_pads_missing_vars(quads):
    q = """
      SELECT ?x ?t ?y WHERE {
        { ?x a ?t } UNION { GRAPH <g2> { ?x <knows> ?y } }
      }
    """
    got = _run(quads, q)
    assert got == [("a", "Person", None), ("b", "Person", None),
                   ("c", None, "a")]


def test_union_then_join_on_common_var(quads):
    # ?x is bound in BOTH branches -> usable as a later join key
    q = """
      SELECT DISTINCT ?x ?g2 WHERE {
        { ?x a "Person" } UNION { ?x <age> "3" }
        GRAPH ?g2 { ?x <knows> ?anyone }
      }
    """
    assert _run(quads, q) == [("a", "g1"), ("b", "g1")]


def test_nested_group_equivalent_to_flat(quads):
    flat = _run(quads, "SELECT ?x ?z WHERE { GRAPH <g1> "
                       "{ ?x <knows> ?y . ?y <knows> ?z } }")
    nested = _run(quads, "SELECT ?x ?z WHERE { GRAPH <g1> "
                         "{ { ?x <knows> ?y } { ?y <knows> ?z } } }")
    assert flat == nested == [("a", "c")]


def test_filter_scopes_to_its_group(quads):
    # the inner group's filter must not see (or constrain) outer rows
    q = """
      SELECT ?x ?t WHERE {
        ?x a ?t
        { GRAPH ?g { ?x <knows> ?y } FILTER (?y != "b") }
      }
    """
    # a knows b (excluded by inner filter), b knows c (kept)
    assert _run(quads, q) == [("b", "Person")]


def test_compat_join_on_possibly_unbound_var(quads):
    # ?age is unbound for x=b,c after the OPTIONAL; SPARQL compatible-
    # mappings semantics: an unbound var matches ANY binding of ?age on
    # the other side, so all three ?x rows survive the join (with
    # ?age/?z filled from the right side for b and c)
    q = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
        ?z <age> ?age .
      }
    """
    assert _run(quads, q) == [("a",), ("b",), ("c",)]


def test_compat_join_merges_bound_value(quads):
    # after the join the merged ?age is the bound side's value
    q = """
      SELECT ?x ?age WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
        ?z <age> ?age .
      }
    """
    assert _run(quads, q) == [("a", "3"), ("b", "3"), ("c", "3")]


def test_compat_join_with_sure_key_stays_selective(quads):
    # shared ?x is definitely bound on both sides (the equi key); the
    # possibly-unbound ?age rides as a compatibility predicate
    q = """
      SELECT ?x ?y ?age WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
        ?x <age> ?age .
      }
    """
    assert _run(quads, q) == [("a", "b", "3")]


def test_compat_optional_on_possibly_unbound_var(quads):
    # a second OPTIONAL whose only shared var is possibly-unbound: the
    # null rows are compatible with the sub-solution, so every row fills
    q = """
      SELECT ?x ?age ?w WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
        OPTIONAL { ?w <age> ?age }
      }
    """
    assert _run(quads, q) == [
        ("a", "3", "a"), ("b", "3", "a"), ("c", "3", "a")
    ]


def test_minus_disjoint_domain_rows_survive(quads):
    # MINUS removes only rows whose domains INTERSECT the sub-solution's
    # (spec §18.5): x=a has ?age bound (removed); x=b,c have ?age unbound
    # — compatible, but the per-row domain intersection is empty, so they
    # survive. FILTER NOT EXISTS has no domain condition: it removes all.
    base = """
      SELECT ?x WHERE {{
        GRAPH ?g {{ ?x <knows> ?y }}
        OPTIONAL {{ ?x <age> ?age }}
        {neg}
      }}
    """
    got = _run(quads, base.format(neg="MINUS { ?z <age> ?age }"))
    assert got == [("b",), ("c",)]
    got = _run(
        quads, base.format(neg="FILTER NOT EXISTS { ?z <age> ?age }")
    )
    assert got == []
    got = _run(quads, base.format(neg="FILTER EXISTS { ?z <age> ?age }"))
    assert got == [("a",), ("b",), ("c",)]


def test_construct_skips_incomplete_triples(quads):
    # spec §16.2: a solution leaving a template var unbound omits just
    # the triples that use it — the sure-bound triple still instantiates
    from rify_spark.sparql import sparql_construct

    q = """
      CONSTRUCT { ?x <aged> ?age . ?x <seen> "y" } WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
      }
    """
    got = sorted(tuple(r) for r in sparql_construct(quads, q).collect())
    assert got == [
        ("a", "aged", "3", "default_graph"),
        ("a", "seen", "y", "default_graph"),
        ("b", "seen", "y", "default_graph"),
        ("c", "seen", "y", "default_graph"),
    ]


def test_construct_skip_incomplete_union_branch_var(quads):
    # a var missing from one UNION branch is possibly-unbound: branch
    # solutions without it skip only its triple
    from rify_spark.sparql import sparql_construct

    q = """
      CONSTRUCT { ?x <aged> ?age } WHERE {
        { GRAPH <g1> { ?x <knows> ?y } }
        UNION
        { ?x <age> ?age }
      }
    """
    got = sorted(tuple(r) for r in sparql_construct(quads, q).collect())
    assert got == [("a", "aged", "3", "default_graph")]


def test_optional_without_shared_var_rejected(quads):
    q = ("SELECT ?x WHERE { GRAPH ?g { ?x <knows> ?y } "
         "OPTIONAL { ?a <age> ?b } }")
    with pytest.raises(SparqlParseError, match="share at least one"):
        sparql_select(quads, q)


def test_filter_bound_and_negation(quads):
    base = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
        FILTER (%s)
      }
    """
    assert _run(quads, base % "bound(?age)") == [("a",)]
    assert _run(quads, base % "!bound(?age)") == [("b",), ("c",)]


def test_filter_regex(quads):
    q = 'SELECT ?x ?y WHERE { GRAPH <g1> { ?x <knows> ?y } FILTER (regex(?y, "^[bc]$")) }'
    assert _run(quads, q) == [("a", "b"), ("b", "c")]
    q = 'SELECT ?x ?y WHERE { GRAPH <g1> { ?x <knows> ?y } FILTER (!regex(?y, "^b") && ?x != "q") }'
    assert _run(quads, q) == [("b", "c")]


def test_filter_fn_errors(quads):
    with pytest.raises(SparqlParseError, match="needs a variable"):
        sparql_select(quads, 'SELECT ?x WHERE { ?x <p> ?y FILTER (bound("c")) }')
    with pytest.raises(SparqlParseError, match="string pattern"):
        sparql_select(quads, "SELECT ?x WHERE { ?x <p> ?y FILTER (regex(?y, ?x)) }")
    with pytest.raises(SparqlParseError, match="negates"):
        sparql_select(quads, "SELECT ?x WHERE { ?x <p> ?y FILTER (!42) }")


def test_filter_not_exists_negation(quads):
    # people with no outgoing knows edge in g1
    q = """
      SELECT ?x WHERE {
        ?x a "Person"
        FILTER NOT EXISTS { GRAPH <g1> { ?x <knows> ?y } }
      }
    """
    assert _run(quads, q) == []
    q = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y }
        FILTER NOT EXISTS { ?x <age> ?n }
      }
    """
    assert _run(quads, q) == [("b",), ("c",)]


def test_filter_exists(quads):
    q = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y }
        FILTER EXISTS { ?x <age> ?n }
      }
    """
    assert _run(quads, q) == [("a",)]
    # EXISTS with no shared vars gates on the sub-pattern matching at all
    q = """
      SELECT ?x WHERE {
        GRAPH <g2> { ?x <knows> ?y }
        FILTER EXISTS { <a> <age> "3" }
      }
    """
    assert _run(quads, q) == [("c",)]
    q = """
      SELECT ?x WHERE {
        GRAPH <g2> { ?x <knows> ?y }
        FILTER EXISTS { <a> <age> "99" }
      }
    """
    assert _run(quads, q) == []


def test_exists_as_boolean_operand(quads):
    # spec §17.4.1.4: EXISTS inside the filter expression tree —
    # disjunctions/conjunctions no semi-join alone can express
    q = """
      SELECT ?x ?y WHERE {
        GRAPH ?g { ?x <knows> ?y }
        FILTER (EXISTS { ?x <age> ?n } || ?y = <a>)
      }
    """
    assert _run(quads, q) == [("a", "b"), ("c", "a")]
    q = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y }
        FILTER (NOT EXISTS { ?x <age> ?n } && ?x != <c>)
      }
    """
    assert _run(quads, q) == [("b",)]
    # !( ... EXISTS ... ) group negation
    q = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y }
        FILTER (!(EXISTS { ?x <age> ?n } || ?x = <b>))
      }
    """
    assert _run(quads, q) == [("c",)]
    # a bare parenthesised EXISTS keeps the semi-join plan
    q = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y } FILTER (EXISTS { ?x <age> ?n })
      }
    """
    df = sparql_select(quads, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert _run(quads, q) == [("a",)]
    # no shared vars: a broadcast one-row gate
    q = """
      SELECT ?x WHERE {
        GRAPH <g2> { ?x <knows> ?y }
        FILTER (EXISTS { <a> <age> ?n } && ?x = <c>)
      }
    """
    assert _run(quads, q) == [("c",)]
    # EXISTS stays FILTER-only: IF() conditions reject it
    with pytest.raises(SparqlParseError):
        _run(
            quads,
            'SELECT (IF(EXISTS { ?x <p> ?y }, "t", "f") AS ?z) '
            "WHERE { GRAPH ?g { ?x <knows> ?y } }",
        )


def test_exists_operand_compat_mappings(quads):
    # spec §18.5: an EXISTS operand sharing a possibly-unbound
    # (OPTIONAL-introduced) variable — an unbound value is compatible
    # with ANY sub-pattern binding, so every null-?n row passes as long
    # as the sub-pattern is non-empty
    q = """
      SELECT ?x ?n WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?n }
        FILTER (EXISTS { ?z <age> ?n } || ?x = <b>)
      }
    """
    assert _run(quads, q) == [("a", "3"), ("b", None), ("c", None)]
    # empty sub-pattern: compat-EXISTS is false even for unbound rows,
    # the disjunction's other arm decides
    q = """
      SELECT ?x ?n WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?n }
        FILTER (EXISTS { ?z <missing> ?n } || ?x = <b>)
      }
    """
    assert _run(quads, q) == [("b", None)]
    # mixed sure (?x) + maybe (?n) shared vars: the sure var stays an
    # equi key, so only rows whose ?x appears in the sub-pattern pass
    q = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?n }
        FILTER (EXISTS { ?x <age> ?n } || ?y = <a>)
      }
    """
    assert _run(quads, q) == [("a",), ("c",)]


def test_exists_operand_compat_plan_shape(quads):
    # the membership semi decomposes on the maybe-var's null split: the
    # dominant bound=bound leg must be a HASH (or merge) LeftSemi on the
    # shared var — never a cartesian product; the back join is the
    # null-safe equi rewrite (coalesce/isnull keys), also hash-planned
    q = """
      SELECT ?x WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?n }
        FILTER (EXISTS { ?z <age> ?n } || ?x = <b>)
      }
    """
    df = sparql_select(quads, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    import re

    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[n#\d+\],"
        r" \[__x_n#\d+\], LeftSemi",
        plan,
    ), plan


def test_exists_operand_compat_no_multiplication(quads):
    # multiple sub-pattern solutions compatible with one null-?n row
    # must mark the row once, not duplicate it (membership is decided
    # per distinct key tuple and rejoined null-safely)
    q = """
      SELECT ?x ?y WHERE {
        GRAPH ?g { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?n }
        FILTER (EXISTS { ?z a <Person> . ?w <age> ?n } || ?x = <b>)
      }
    """
    assert _run(quads, q) == [("a", "b"), ("b", "c"), ("c", "a")]


def test_minus(quads):
    q = """
      SELECT ?x ?y WHERE {
        GRAPH ?g { ?x <knows> ?y }
        MINUS { ?x <age> "3" }
      }
    """
    assert _run(quads, q) == [("b", "c"), ("c", "a")]
    # MINUS with a disjoint variable domain removes nothing (spec'd
    # difference from NOT EXISTS)
    q = """
      SELECT ?x WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        MINUS { ?a <age> ?b }
      }
    """
    assert len(_run(quads, q)) == 2


def test_minus_first_rejected(quads):
    with pytest.raises(SparqlParseError, match="MINUS cannot"):
        sparql_select(quads, 'SELECT ?x WHERE { MINUS { ?x <p> ?y } }')
    with pytest.raises(SparqlParseError, match="EXISTS after"):
        sparql_select(
            quads, "SELECT ?x WHERE { ?x <p> ?y FILTER NOT BOUND(?x) }"
        )


def test_property_path_plus(quads):
    q = "SELECT ?x ?y WHERE { GRAPH <g1> { ?x <knows>+ ?y } }"
    assert _run(quads, q) == [("a", "b"), ("a", "c"), ("b", "c")]
    # constant object endpoint
    q = "SELECT ?x WHERE { GRAPH <g1> { ?x <knows>+ <c> } }"
    assert _run(quads, q) == [("a",), ("b",)]
    # path joined with a plain atom in the same BGP
    q = 'SELECT ?x ?y WHERE { GRAPH <g1> { ?x <knows>+ ?y } ?x a "Person" }'
    assert _run(quads, q) == [("a", "b"), ("a", "c"), ("b", "c")]


def test_property_path_graph_variable_scopes_closure(quads):
    # closure is per graph: g2's single edge must not compose with g1's
    q = "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x <knows>+ ?y } }"
    got = _run(quads, q)
    assert got == [("g1", "a", "b"), ("g1", "a", "c"), ("g1", "b", "c"),
                   ("g2", "c", "a")]


def test_property_path_errors(quads):
    with pytest.raises(SparqlParseError, match="constant predicate"):
        sparql_select(quads, "SELECT ?x WHERE { ?x ?p+ ?y }")
    from rify_spark.sparql import sparql_construct
    with pytest.raises(SparqlParseError, match="CONSTRUCT template"):
        sparql_construct(
            quads,
            "CONSTRUCT { ?x <p>+ ?y } WHERE { GRAPH <g1> { ?x <knows> ?y } }",
        )


def test_values_single_var_join(quads):
    q = """
      SELECT ?x ?y WHERE {
        VALUES ?x { <a> <c> }
        GRAPH ?g { ?x <knows> ?y }
      }
    """
    assert _run(quads, q) == [("a", "b"), ("c", "a")]


def test_values_multi_var_and_undef(quads):
    q = """
      SELECT ?x ?t WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        VALUES (?x ?t) { (<a> "first") (UNDEF "wild") }
      }
    """
    # UNDEF ?x is compatible with ANY ?x from the BGP (spec §18.5): the
    # bound row equi-joins, the UNDEF row fans out to every subject and
    # the merged ?x takes the bound side
    assert _run(quads, q) == [("a", "first"), ("a", "wild"), ("b", "wild")]
    q = """
      SELECT ?x ?t WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        VALUES (?x ?t) { (<a> "first") (<b> UNDEF) }
      }
    """
    assert _run(quads, q) == [("a", "first"), ("b", None)]


def test_values_standalone(quads):
    q = 'SELECT ?v WHERE { VALUES ?v { "1" "2" "2" } }'
    # bag semantics: duplicates preserved
    assert _run(quads, q) == [("1",), ("2",), ("2",)]


def test_values_errors(quads):
    with pytest.raises(SparqlParseError, match="constants"):
        sparql_select(quads, "SELECT ?v WHERE { VALUES ?v { ?w } }")
    with pytest.raises(SparqlParseError, match="empty VALUES"):
        sparql_select(quads, "SELECT ?v WHERE { VALUES ?v { } }")


def test_trailing_values_clause(quads):
    # §7.2.3 query-final VALUES: restricts the pattern solutions
    q = """
      SELECT ?x ?y WHERE { GRAPH ?g { ?x <knows> ?y } }
      VALUES ?x { <a> <c> }
    """
    assert _run(quads, q) == [("a", "b"), ("c", "a")]
    # UNDEF rides compatible-mappings; a values-only var joins in
    q = """
      SELECT ?x ?tag WHERE { GRAPH <g1> { ?x <knows> ?y } }
      VALUES (?x ?tag) { (<a> "first") (UNDEF "any") }
    """
    assert _run(quads, q) == [
        ("a", "any"), ("a", "first"), ("b", "any"),
    ]
    # grammar: the clause comes after all solution modifiers
    q = """
      SELECT ?x WHERE { GRAPH ?g { ?x <knows> ?y } }
      ORDER BY DESC(?x) LIMIT 2 VALUES ?x { <a> <b> <c> }
    """
    assert _run(quads, q) == [("b",), ("c",)]


def test_trailing_values_joins_after_aggregation(quads):
    # §18.2.4.2 modifier order: Aggregation -> HAVING -> VALUES — the
    # values restrict the GROUPED solutions, not the input rows
    q = """
      SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?x <knows> ?y } }
      GROUP BY ?g VALUES ?g { <g1> <g9> }
    """
    assert _run(quads, q) == [("g1", 2)]
    # joining ON an aggregate alias re-enters the opaque string term
    # space (the documented _lexeme_cast contract, as in subqueries)
    q = """
      SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?x <knows> ?y } }
      GROUP BY ?g VALUES ?n { "1" }
    """
    assert _run(quads, q) == [("g2", "1")]
    # ASK and CONSTRUCT take the clause too
    from rify_spark.sparql import sparql_ask, sparql_construct

    got = sparql_ask(
        quads, 'ASK { GRAPH ?g { ?x <knows> ?y } } VALUES ?x { <zz> }'
    ).collect()
    assert [tuple(r) for r in got] == [(False,)]
    got = sorted(
        tuple(r)
        for r in sparql_construct(
            quads,
            "CONSTRUCT { ?x <met> ?y } WHERE { GRAPH ?g { ?x <knows> ?y } } "
            "VALUES ?x { <c> }",
        ).collect()
    )
    assert got == [("c", "met", "a", "default_graph")]
    # subqueries carry their own trailing ValuesClause (SubSelect)
    q = """
      SELECT ?x ?y ?n WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        { SELECT ?x (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?x <knows> ?o } }
          GROUP BY ?x VALUES ?x { <a> } }
      }
    """
    assert _run(quads, q) == [("a", "b", 1)]


# --- aggregates: GROUP BY / COUNT / SUM / MIN / MAX / HAVING -----------------


def test_aggregates_as_expression_operands(spark):
    # §18.2.4.1: aggregates inside projection expressions — hidden
    # grouped columns read back as lexemes, standard scalar compiler
    store = spark.createDataFrame(
        [
            ("a", "v", "10", "default_graph"),
            ("a", "v", "30", "default_graph"),
            ("b", "v", "5", "default_graph"),
            ("b", "v", "7", "default_graph"),
            ("b", "v", "9", "default_graph"),
        ],
        "s string, p string, o string, g string",
    )

    def run(q):
        return sorted(tuple(r) for r in sparql_select(store, q).collect())

    q = (
        "SELECT ?s ((SUM(?o) - MIN(?o) * COUNT(*)) AS ?spread) "
        "WHERE { ?s <v> ?o } GROUP BY ?s"
    )
    # a: 40 - 10*2 = 20; b: 21 - 5*3 = 6 (MIN here is also numeric-min)
    assert run(q) == [("a", "20"), ("b", "6")]
    # group key + string function over an aggregate; dedup'd agg reuse
    q = (
        'SELECT ?s (CONCAT(?s, ":", STR(SUM(?o))) AS ?tag) '
        "((SUM(?o) + SUM(?o)) AS ?dbl) "
        "WHERE { ?s <v> ?o } GROUP BY ?s"
    )
    assert run(q) == [("a", "a:40", "80"), ("b", "b:21", "42")]
    # a selected PURE aggregate keeps its native BIGINT dtype alongside
    q = (
        "SELECT ?s (SUM(?o) AS ?sum) ((SUM(?o) - 1) AS ?m1) "
        "WHERE { ?s <v> ?o } GROUP BY ?s"
    )
    assert run(q) == [("a", 40, "39"), ("b", 21, "20")]
    # implicit group; HAVING composes
    q = "SELECT ((MAX(?o) - MIN(?o)) AS ?r) WHERE { ?s <v> ?o }"
    # MIN/MAX compare lexicographically: max '9', min '10' -> -1
    assert run(q) == [("-1",)]
    q = (
        "SELECT ?s ((SUM(?o) - 20) AS ?e) WHERE { ?s <v> ?o } "
        "GROUP BY ?s HAVING (COUNT(*) > 2)"
    )
    assert run(q) == [("b", "1")]
    # a free variable outside the aggregates must be a group key
    with pytest.raises(SparqlParseError, match="GROUPed BY"):
        run("SELECT ((SUM(?o) + ?s) AS ?x) WHERE { ?s <v> ?o }")
    # --- general HAVING constraint trees (beyond agg-vs-const) ---
    q = (
        "SELECT ?s WHERE { ?s <v> ?o } GROUP BY ?s "
        "HAVING (SUM(?o) - MIN(?o) * COUNT(*) > 5)"
    )
    assert run(q) == [("a",), ("b",)]  # a: 20, b: 6, vs > 5
    q = (
        "SELECT ?s WHERE { ?s <v> ?o } GROUP BY ?s "
        'HAVING (COUNT(*) >= 3 || ?s = "a")'
    )
    assert run(q) == [("a",), ("b",)]
    q = (
        "SELECT ?s WHERE { ?s <v> ?o } GROUP BY ?s "
        "HAVING (!(SUM(?o) > 30))"
    )
    assert run(q) == [("b",)]
    # the legacy native-dtype path is still taken for agg-vs-const
    # (COUNT compares as BIGINT, reusing the selected column)
    q = (
        "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s <v> ?o } GROUP BY ?s "
        "HAVING (COUNT(*) > 2)"
    )
    assert run(q) == [("b", 3)]


def test_group_by_count(quads):
    q = """
      SELECT ?x (COUNT(?y) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }
      GROUP BY ?x ORDER BY ?x
    """
    assert _run(quads, q) == [("a", 1), ("b", 1)]


def test_global_aggregates_sum_skips_non_integer_lexemes(quads):
    # SUM casts the opaque lexeme to BIGINT; 'x' -> NULL -> skipped
    more = quads.sparkSession.createDataFrame(
        [("c", "age", "x", "default_graph")],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT (SUM(?v) AS ?s) (MIN(?v) AS ?lo) (MAX(?v) AS ?hi)
             (COUNT(*) AS ?n)
      WHERE { ?x <age> ?v }
    """
    got = _run(quads.unionByName(more), q)
    assert got == [(3, "3", "x", 2)]


def test_global_aggregate_on_empty_pattern_is_one_row(quads):
    q = "SELECT (COUNT(*) AS ?n) WHERE { ?x <nope> ?y }"
    assert _run(quads, q) == [(0,)]


def test_count_distinct_and_optional_unbound_skipped(quads):
    # ?z is unbound for ?y without an age edge; COUNT skips the nulls
    q = """
      SELECT ?x (COUNT(DISTINCT ?z) AS ?n) WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        OPTIONAL { ?y <age> ?z }
      } GROUP BY ?x ORDER BY ?x
    """
    # a knows b (b has no age in default graph... b age? only a has age 3)
    got = _run(quads, q)
    assert got == [("a", 0), ("b", 0)]


def test_having_reuses_selected_aggregate_column(quads):
    q = """
      SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
      GROUP BY ?g HAVING (COUNT(*) >= 2) ORDER BY ?g
    """
    assert _run(quads, q) == [("default_graph", 3), ("g1", 2)]


def test_having_hidden_aggregate_and_string_comparison(quads):
    q = """
      SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s <knows> ?o } }
      GROUP BY ?g HAVING (MIN(?s) <= "b" && COUNT(*) >= 1) ORDER BY ?g
    """
    # hidden MIN(?s) column computed, filtered on, then dropped
    got = _run(quads, q)
    assert got == [("g1", 2)]
    cols = sparql_select(quads, q).columns
    assert cols == ["g", "n"]


def test_pure_group_by_is_distinct_keys(quads):
    q = "SELECT ?p WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?p ORDER BY ?p"
    assert _run(quads, q) == [("age",), (RDF_TYPE,), ("knows",)]


def test_order_by_aggregate_alias(quads):
    q = """
      SELECT ?p (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
      GROUP BY ?p ORDER BY DESC(?n) ?p LIMIT 2
    """
    assert [tuple(r) for r in sparql_select(quads, q).collect()] == [
        ("knows", 3), (RDF_TYPE, 2)
    ]


def test_aggregate_errors(quads):
    cases = [
        ("SELECT ?x (COUNT(?y) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }",
         "must appear in GROUP BY"),
        ("SELECT * WHERE { GRAPH <g1> { ?x <knows> ?y } } GROUP BY ?x",
         r"SELECT \*"),
        # AVG is supported since round 5 — VARIANCE stays informative
        ("SELECT (VARIANCE(?y) AS ?a) WHERE { GRAPH <g1> { ?x <knows> ?y } }",
         "COUNT/SUM/AVG/MIN/MAX"),
        # NB: mixed-type HAVING comparisons (MIN vs number, COUNT vs
        # string) are no longer errors — they fall to the general
        # HAVING tree under the FILTER numeric-switch / string-compare
        # contract; see test_mixed_having_falls_to_general_tree
        ("SELECT ?x (COUNT(?y) AS ?x) WHERE { GRAPH <g1> { ?x <knows> ?y } }"
         " GROUP BY ?x", "duplicate name"),
        ("SELECT (SUM(*) AS ?s) WHERE { GRAPH <g1> { ?x <knows> ?y } }",
         "not an aggregate"),
        ("SELECT (COUNT(?zz) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }",
         "not bound"),
        ("SELECT (COUNT(?y) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }"
         " GROUP BY ?zz", "not bound"),
    ]
    for q, pat in cases:
        with pytest.raises(SparqlParseError, match=pat):
            sparql_select(quads, q).collect()


def test_mixed_having_falls_to_general_tree(quads):
    # MIN vs unquoted number: the general tree's numeric switch
    # try_casts the MIN lexeme ('b' -> NULL -> dropped)
    q = (
        "SELECT (COUNT(?y) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }"
        " HAVING (MIN(?y) > 3)"
    )
    assert _run(quads, q) == []
    # COUNT vs string: lexicographic compare of the count lexeme
    q = (
        "SELECT (COUNT(?y) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }"
        ' HAVING (COUNT(?y) > "b")'
    )
    assert _run(quads, q) == []
    q = (
        "SELECT (COUNT(?y) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }"
        ' HAVING (COUNT(?y) < "b")'
    )
    assert _run(quads, q) == [(2,)]


# --- property-path expressions: ^ / | * ? and compositions -------------------

def test_path_inverse(quads):
    got = _run(quads, "SELECT ?x ?y WHERE { GRAPH <g1> { ?x ^<knows> ?y } }")
    assert got == [("b", "a"), ("c", "b")]


def test_path_sequence(quads):
    # two hops in one path expression == the two-pattern BGP
    got = _run(
        quads, "SELECT ?x ?z WHERE { GRAPH <g1> { ?x <knows>/<knows> ?z } }"
    )
    assert got == [("a", "c")]


def test_path_alternation(quads):
    got = _run(
        quads,
        'SELECT ?x ?y WHERE { ?x (<knows>|<age>) ?y }',
    )
    # default graph: only the age edge (knows lives in g1/g2)
    assert got == [("a", "3")]


def test_path_star_includes_zero_length(quads):
    # <knows>* against a constant endpoint: the + closure plus c itself
    got = _run(quads, "SELECT ?x WHERE { GRAPH <g1> { ?x <knows>* <c> } }")
    assert got == [("a",), ("b",), ("c",)]


def test_path_question_mark(quads):
    got = _run(quads, "SELECT ?x WHERE { GRAPH <g1> { ?x <knows>? <c> } }")
    # direct edge b->c plus the zero-length c->c
    assert got == [("b",), ("c",)]


def test_path_inverse_closure_composition(quads):
    # (^knows)+ from c walks the g1 chain backwards
    got = _run(quads, "SELECT ?y WHERE { GRAPH <g1> { <c> (^<knows>)+ ?y } }")
    assert got == [("a",), ("b",)]


def test_path_closure_inside_sequence(quads):
    # knows+ then one more hop — closure result composes like any edge set
    got = _run(
        quads,
        "SELECT ?x ?z WHERE { GRAPH <g1> { ?x <knows>+/<knows> ?z } }",
    )
    assert got == [("a", "c")]


def test_path_parenthesised_alternation_closure(quads):
    more = quads.sparkSession.createDataFrame(
        [("c", "likes", "d", "g1")], "s string, p string, o string, g string"
    )
    got = sorted(
        tuple(r)
        for r in sparql_select(
            quads.unionByName(more),
            "SELECT ?y WHERE { GRAPH <g1> { <a> (<knows>|<likes>)+ ?y } }",
        ).collect()
    )
    assert got == [("b",), ("c",), ("d",)]


def test_path_grammar_errors(quads):
    with pytest.raises(SparqlParseError, match="constant predicate"):
        sparql_select(quads, "SELECT ?x WHERE { ?x (?p|<q>) ?y }")
    with pytest.raises(SparqlParseError, match="expected"):
        sparql_select(quads, "SELECT ?x WHERE { GRAPH <g1> { ?x (<p> ?y } }")


# --- subqueries ---------------------------------------------------------------

def test_subquery_aggregate_joins_outer(quads):
    q = """
      SELECT ?x ?t ?n WHERE {
        ?x a ?t
        { SELECT ?x (COUNT(?y) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }
          GROUP BY ?x }
      }
    """
    # only a and b know anyone in g1; both are typed Person
    assert _run(quads, q) == [("a", "Person", 1), ("b", "Person", 1)]


def test_subquery_having_filters_before_outer_join(quads):
    q = """
      SELECT ?x WHERE {
        { SELECT ?x WHERE { GRAPH ?g { ?x <knows> ?y } } GROUP BY ?x
          HAVING (COUNT(?y) >= 1) }
        ?x a "Person"
      }
    """
    assert _run(quads, q) == [("a",), ("b",)]


def test_subquery_select_star_passthrough(quads):
    q = """
      SELECT ?y WHERE { { SELECT * WHERE { GRAPH <g1> { ?x <knows> ?y } } } }
    """
    assert _run(quads, q) == [("b",), ("c",)]


def test_subquery_inside_optional_yields_unbound(quads):
    q = """
      SELECT ?x ?n WHERE {
        ?x a "Person"
        OPTIONAL {
          { SELECT ?x (COUNT(*) AS ?n) WHERE { GRAPH <g2> { ?x <knows> ?y } }
            GROUP BY ?x }
        }
      }
    """
    # only c knows in g2, and c is not a Person; both Persons get null n
    assert _run(quads, q) == [("a", None), ("b", None)]


def test_subquery_limit_is_scoped(quads):
    q = """
      SELECT ?x ?y WHERE {
        { SELECT ?x WHERE { GRAPH ?g { ?x <knows> ?w } } GROUP BY ?x
          ORDER BY ?x LIMIT 1 }
        GRAPH <g1> { ?x <knows> ?y }
      }
    """
    # inner LIMIT keeps only ?x = a; outer join expands its g1 edges
    assert _run(quads, q) == [("a", "b")]


def test_subquery_sum_alias_is_possibly_unbound(quads):
    # SUM alias can be null (all-null group): as a later join key it uses
    # compatible-mappings semantics — here every ?y lexeme is non-numeric
    # so ?s is null everywhere, compatible with any subject; ?x stays the
    # sure equi key and the merged ?s takes the pattern's bound value
    q = """
      SELECT ?x ?s WHERE {
        { SELECT ?x (SUM(?y) AS ?s) WHERE { GRAPH <g1> { ?x <knows> ?y } }
          GROUP BY ?x }
        GRAPH <g1> { ?s <knows> ?x }
      }
    """
    assert _run(quads, q) == [("b", "a")]


# --- numeric FILTER comparisons, GROUP_CONCAT, SAMPLE ------------------------

def test_numeric_filter_comparison(quads):
    more = quads.sparkSession.createDataFrame(
        [("b", "age", "12", "default_graph"),
         ("c", "age", "x", "default_graph")],
        "s string, p string, o string, g string",
    )
    both = quads.unionByName(more)
    # lexicographically "3" > "12"; numerically 3 < 12 — and the
    # non-integer lexeme "x" is excluded (error-semantics)
    got = sorted(
        tuple(r) for r in sparql_select(
            both, "SELECT ?x WHERE { ?x <age> ?v FILTER (?v < 10) }"
        ).collect()
    )
    assert got == [("a",)]
    got = sorted(
        tuple(r) for r in sparql_select(
            both, "SELECT ?x WHERE { ?x <age> ?v FILTER (3 <= ?v) }"
        ).collect()
    )
    assert got == [("a",), ("b",)]


def test_group_concat_sorted_and_sample(quads):
    more = quads.sparkSession.createDataFrame(
        [("a", "tag", "t2", "default_graph"),
         ("a", "tag", "t1", "default_graph"),
         ("a", "tag", "t1", "default_graph")],
        "s string, p string, o string, g string",
    )
    q = (
        'SELECT ?x (GROUP_CONCAT(?t ; SEPARATOR = ",") AS ?cat) '
        '(GROUP_CONCAT(DISTINCT ?t ; SEPARATOR = "|") AS ?dcat) '
        "(SAMPLE(?t) AS ?any) WHERE { ?x <tag> ?t } GROUP BY ?x"
    )
    got = _run(quads.unionByName(more), q)
    assert got == [("a", "t1,t1,t2", "t1|t2", "t1")]


def test_group_concat_default_separator_and_null_group(quads):
    q = (
        "SELECT ?x (GROUP_CONCAT(?t) AS ?cat) WHERE { "
        "?x a \"Person\" OPTIONAL { ?x <tag> ?t } } GROUP BY ?x"
    )
    # no tag quads in the default graph: all-null groups yield NULL
    # (string_agg semantics), not ""
    assert _run(quads, q) == [("a", None), ("b", None)]


def test_separator_rejected_outside_group_concat(quads):
    with pytest.raises(SparqlParseError, match="SEPARATOR"):
        sparql_select(
            quads,
            'SELECT (SUM(?v ; SEPARATOR = ",") AS ?s) WHERE { ?x <age> ?v }',
        )


def test_sparql_query_entailed_runs_rules_under_the_query(quads):
    from rify_spark.rules import Bound as B, Rule, Unbound as U
    from rify_spark.sparql import sparql_query_entailed

    rules = [
        Rule.create(
            [[U("x"), B("knows"), U("y"), U("g")]],
            [[U("x"), B("reach"), U("y"), U("g")]],
        ),
        Rule.create(
            [
                [U("x"), B("reach"), U("y"), U("g")],
                [U("y"), B("reach"), U("z"), U("g")],
            ],
            [[U("x"), B("reach"), U("z"), U("g")]],
        ),
    ]
    got = sorted(
        tuple(r)
        for r in sparql_query_entailed(
            quads.sparkSession, quads, rules,
            "SELECT ?x ?y WHERE { GRAPH <g1> { ?x <reach> ?y } }",
        ).collect()
    )
    # reach is derived-only: g1's chain closes to 3 pairs; g2 untouched
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]


# --- BIND + scalar expressions ------------------------------------------


def test_bind_concat(quads):
    q = """
      SELECT ?x ?pair WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(CONCAT(?x, "->", ?y) AS ?pair)
      }
    """
    assert _run(quads, q) == [("a", "a->b"), ("b", "b->c")]


def test_bind_arithmetic_and_numeric_filter(quads):
    # age "3" + 4 -> lexeme "7"; the numeric FILTER consumes the target
    q = """
      SELECT ?x ?n WHERE {
        ?x <age> ?a
        BIND(?a + 4 AS ?n)
        FILTER (?n > 5)
      }
    """
    assert _run(quads, q) == [("a", "7")]


def test_bind_arithmetic_negative_lexeme(quads):
    q = """
      SELECT ?n WHERE { ?x <age> ?a BIND(?a - 10 AS ?n) }
    """
    assert _run(quads, q) == [("-7",)]


def test_bind_non_integer_lexeme_is_unbound(quads):
    # "Person" fails the BIGINT cast -> ?n unbound (null); bound() sees it
    q = """
      SELECT ?x WHERE {
        ?x a ?t
        BIND(?t + 1 AS ?n)
        FILTER (!bound(?n))
      }
    """
    assert _run(quads, q) == [("a",), ("b",)]


def test_bind_unbound_optional_propagates_and_coalesce_recovers(quads):
    q = """
      SELECT ?x ?lab ?safe WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?a }
        BIND(CONCAT("age=", ?a) AS ?lab)
        BIND(COALESCE(?lab, "unknown") AS ?safe)
      }
    """
    assert _run(quads, q) == [
        ("a", "age=3", "age=3"),
        ("b", None, "unknown"),
    ]


def test_bind_first_element_and_string_functions(quads):
    q = """
      SELECT ?u ?l ?n ?sub WHERE {
        BIND(UCASE("ab") AS ?u)
        BIND(LCASE(?u) AS ?l)
        BIND(STRLEN(CONCAT(?u, ?l)) AS ?n)
        BIND(SUBSTR("abcdef", 2, 3) AS ?sub)
        ?x a "Person"
      }
    """
    assert _run(quads, q) == [("AB", "ab", "4", "bcd")] * 2


def test_select_expression_item(quads):
    q = """
      SELECT ?x (STRLEN(?x) AS ?n) (STR(?y) AS ?copy) WHERE {
        GRAPH <g1> { ?x <knows> ?y }
      }
    """
    assert _run(quads, q) == [("a", "1", "b"), ("b", "1", "c")]


def test_bind_target_usable_as_join_key(quads):
    # the BIND target joins a later pattern (definitely-bound: equi key)
    q = """
      SELECT ?x ?z WHERE {
        ?x <age> "3"
        BIND("b" AS ?z)
        GRAPH <g1> { ?z <knows> ?w }
      }
    """
    assert _run(quads, q) == [("a", "b")]


def test_bind_var_included_in_select_star(quads):
    q = """
      SELECT * WHERE { ?x <age> ?a BIND(?a + 1 AS ?n) }
    """
    df = sparql_select(quads, q)
    assert df.columns == ["x", "a", "n"]
    assert [tuple(r) for r in df.collect()] == [("a", "3", "4")]


def test_bind_errors(quads):
    with pytest.raises(SparqlParseError, match="already bound"):
        _run(quads, 'SELECT ?x WHERE { ?x <age> ?a BIND("1" AS ?a) }')
    with pytest.raises(SparqlParseError, match="not in scope"):
        _run(quads, "SELECT ?n WHERE { BIND(?ghost AS ?n) ?x <age> ?a }")
    with pytest.raises(SparqlParseError, match="one argument"):
        _run(quads, 'SELECT ?n WHERE { ?x <age> ?a BIND(STRLEN(?a, ?a) AS ?n) }')
    with pytest.raises(SparqlParseError, match="SUBSTR"):
        _run(quads, 'SELECT ?n WHERE { ?x <age> ?a BIND(SUBSTR(?a, ?a, 1) AS ?n) }')
    with pytest.raises(SparqlParseError, match="aggregates"):
        _run(
            quads,
            "SELECT (STRLEN(?x) AS ?n) WHERE { ?x <age> ?a } GROUP BY ?x",
        )
    with pytest.raises(SparqlParseError, match="collides"):
        _run(quads, "SELECT (STR(?x) AS ?a) WHERE { ?x <age> ?a }")


# --- DESCRIBE ------------------------------------------------------------


def test_describe_constant_only(quads):
    from rify_spark.sparql import sparql_query

    got = sorted(
        tuple(r) for r in sparql_query(quads, "DESCRIBE <a>").collect()
    )
    assert got == sorted(
        [
            ("a", RDF_TYPE, "Person", "default_graph"),
            ("a", "age", "3", "default_graph"),
            ("a", "knows", "b", "g1"),
        ]
    )


def test_describe_variable_with_where(quads):
    from rify_spark.sparql import sparql_query

    # describe everything 'a' knows in g1 -> b's forward description
    q = "DESCRIBE ?y WHERE { GRAPH <g1> { <a> <knows> ?y } }"
    got = sorted(tuple(r) for r in sparql_query(quads, q).collect())
    assert got == [
        ("b", RDF_TYPE, "Person", "default_graph"),
        ("b", "knows", "c", "g1"),
    ]


def test_describe_mixed_and_unbound_dropped(quads):
    from rify_spark.sparql import sparql_query

    # ?z is OPTIONAL-missing for c (nothing c-known has an age): the
    # unbound binding describes nothing; the constant still describes
    q = """
      DESCRIBE <a> ?z WHERE {
        GRAPH <g2> { ?x <knows> ?y }
        OPTIONAL { ?y <age> ?z }
      }
    """
    got = sorted(tuple(r) for r in sparql_query(quads, q).collect())
    assert got == sorted(
        [
            ("a", RDF_TYPE, "Person", "default_graph"),
            ("a", "age", "3", "default_graph"),
            ("a", "knows", "b", "g1"),
        ]
    )


def test_describe_errors(quads):
    from rify_spark.sparql import sparql_describe, sparql_query

    with pytest.raises(SparqlParseError, match="WHERE"):
        sparql_query(quads, "DESCRIBE ?x")
    with pytest.raises(SparqlParseError, match="needs"):
        sparql_query(quads, "DESCRIBE WHERE { ?x <knows> ?y }")
    with pytest.raises(SparqlParseError, match="not bound"):
        sparql_query(
            quads, "DESCRIBE ?ghost WHERE { ?x a ?t }"
        )
    with pytest.raises(SparqlParseError, match="DESCRIBE"):
        sparql_describe(quads, "SELECT ?x WHERE { ?x a ?t }")


# --- FILTER over scalar expressions ---------------------------------------


def test_filter_expression_operands(quads):
    # STRLEN comparison is numeric only when an integer constant appears
    q = """
      SELECT ?x WHERE {
        ?x a ?t
        FILTER (STRLEN(CONCAT(?x, ?t)) = 7 && UCASE(?x) = "A")
      }
    """
    assert _run(quads, q) == [("a",)]


def test_filter_arithmetic_both_sides(quads):
    # age "3": 3 + 1 > 5 - 2 -> numeric on both sides
    q = "SELECT ?x WHERE { ?x <age> ?a FILTER (?a + 1 > 5 - 2) }"
    assert _run(quads, q) == [("a",)]


def test_filter_expression_error_semantics(quads):
    # CONCAT over an unbound OPTIONAL var -> null operand -> row excluded
    q = """
      SELECT ?x WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?a }
        FILTER (CONCAT(?x, ?a) != "zzz")
      }
    """
    assert _run(quads, q) == [("a",)]


def test_filter_disjunction(quads):
    q = """
      SELECT ?x ?t WHERE {
        ?x a ?t
        FILTER (?x = "a" || ?x = "b")
      }
    """
    assert _run(quads, q) == [("a", "Person"), ("b", "Person")]


def test_filter_or_over_and_precedence(quads):
    # (?x = "a" && ?t = "zzz") || ?x = "b"  -> only b survives
    q = """
      SELECT ?x WHERE {
        ?x a ?t
        FILTER (?x = "a" && ?t = "zzz" || ?x = "b")
      }
    """
    assert _run(quads, q) == [("b",)]


def test_filter_or_error_semantics(quads):
    # unbound ?age: (error || true) = true keeps the row; a row where
    # both arms error/false is dropped (three-valued logic == Spark null)
    q = """
      SELECT ?x WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
        FILTER (?age = "3" || STRLEN(?x) = 1)
      }
    """
    assert _run(quads, q) == [("a",), ("b",)]


def test_filter_bound_in_disjunction(quads):
    q = """
      SELECT ?x WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?age }
        FILTER (bound(?age) || ?x = "b")
      }
    """
    assert _run(quads, q) == [("a",), ("b",)]


def test_filter_string_tests(quads):
    q = """
      SELECT ?x ?t WHERE {
        ?x a ?t
        FILTER (STRSTARTS(?t, "Per") && STRENDS(?t, "son")
                && CONTAINS(CONCAT(?x, ?t), "aP"))
      }
    """
    assert _run(quads, q) == [("a", "Person")]


def test_filter_string_tests_negation_and_unbound(quads):
    # !CONTAINS over an unbound OPTIONAL var: error-semantics excludes
    q = """
      SELECT ?x WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?a }
        FILTER (!CONTAINS(?a, "9"))
      }
    """
    assert _run(quads, q) == [("a",)]


def test_filter_boolean_parens_and_group_negation(quads):
    # (A || B) && C needs the parens: without them && binds tighter
    q = """
      SELECT ?x WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        FILTER ((?x = "a" || ?x = "b") && ?y != "c")
      }
    """
    assert _run(quads, q) == [("a",)]
    # group negation: !(...) — and scalar operand parens still parse
    q2 = """
      SELECT ?x ?a WHERE {
        ?x <age> ?a
        FILTER (!(?x = "b" || ?a = "4") && (?a + 1) > 3)
      }
    """
    assert _run(quads, q2) == [("a", "3")]
    # !(error) stays error: unbound OPTIONAL var inside the group
    q3 = """
      SELECT ?x WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?a }
        FILTER (!(?a = "99"))
      }
    """
    assert _run(quads, q3) == [("a",)]


def test_filter_in_and_not_in(quads):
    got = _run(
        quads,
        'SELECT ?x WHERE { GRAPH <g1> { ?x <knows> ?y } '
        'FILTER (?y IN ("b", "z", CONCAT("", ?x))) }',
    )
    assert got == [("a",)]
    # numeric element switches that comparison to numeric semantics
    got = _run(
        quads,
        "SELECT ?x WHERE { ?x <age> ?a FILTER (?a IN (2+1, 99)) }",
    )
    assert got == [("a",)]
    # NOT IN over an unbound lhs: error-semantics excludes the row
    got = _run(
        quads,
        "SELECT ?x WHERE { GRAPH <g1> { ?x <knows> ?y } "
        'OPTIONAL { ?x <age> ?a } FILTER (?a NOT IN ("99")) }',
    )
    assert got == [("a",)]
    # empty lists: IN () is FALSE, NOT IN () is TRUE (spec §17.4.1.9)
    assert _run(quads, "SELECT ?x WHERE { ?x <age> ?a FILTER (?a IN ()) }") == []
    got = _run(
        quads, "SELECT ?x WHERE { ?x <age> ?a FILTER (?a NOT IN ()) }"
    )
    assert got == [("a",)]


def test_blank_nodes_as_nondistinguished_vars(quads):
    # _:m joins like a variable (two-hop) but is never projected
    q = """
      SELECT ?x ?z WHERE {
        GRAPH <g1> { ?x <knows> _:m . _:m <knows> ?z }
      }
    """
    assert _run(quads, q) == [("a", "c")]
    # SELECT * excludes blank-node internals
    q2 = "SELECT * WHERE { GRAPH <g1> { ?x <knows> _:m } }"
    df = sparql_select(quads, q2)
    assert df.columns == ["x"]
    # bare [] is fresh per occurrence: two []s do NOT join each other
    # (x must appear as both subject and object of knows in g1 -> only b)
    q3 = "SELECT ?x WHERE { GRAPH <g1> { ?x <knows> [] . [] <knows> ?x } }"
    assert _run(quads, q3) == [("b",)]


def test_blank_nodes_rejected_outside_triple_positions(quads):
    with pytest.raises(SparqlParseError, match="subject/object"):
        _run(quads, "SELECT ?x WHERE { GRAPH _:g { ?x <knows> ?y } }")
    with pytest.raises(SparqlParseError, match="subject/object"):
        _run(quads, 'SELECT ?x WHERE { ?x <knows> ?y FILTER (?y = _:m) }')
    with pytest.raises(SparqlParseError, match="reserved"):
        _run(quads, "SELECT ?__bn_m WHERE { ?x <knows> ?__bn_m }")
    from rify_spark.sparql import sparql_construct

    # a template bnode label may not ALSO appear in the WHERE pattern
    # (template-only bnodes mint fresh nodes — see test below)
    with pytest.raises(SparqlParseError, match="may not also appear"):
        sparql_construct(
            quads,
            "CONSTRUCT { ?x <p> _:n } WHERE { GRAPH <g1> { ?x <knows> _:n } }",
        )


# --- scalar built-ins: STRBEFORE / STRAFTER / REPLACE / hashes / IF --------


def test_strbefore_strafter(quads):
    q = """
      SELECT ?x ?b ?a WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(CONCAT(?x, ":", ?y) AS ?pair)
        BIND(STRBEFORE(?pair, ":") AS ?b)
        BIND(STRAFTER(?pair, ":") AS ?a)
      }
    """
    assert _run(quads, q) == [("a", "a", "b"), ("b", "b", "c")]
    # spec edge cases: empty needle -> "" / the whole string; missing
    # needle -> ""; an unbound input propagates (stays unbound)
    q2 = """
      SELECT ?e ?w ?m ?u WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        OPTIONAL { ?x <age> ?n }
        BIND(STRBEFORE(?x, "") AS ?e)
        BIND(STRAFTER(?x, "") AS ?w)
        BIND(STRBEFORE(?x, "zzz") AS ?m)
        BIND(STRAFTER(?n, "x") AS ?u)
      }
    """
    got = _run(quads, q2)
    # x=a has an age ("3": needle missing -> ""); x=b has none (unbound
    # input propagates -> unbound)
    assert got == [("", "a", "", ""), ("", "b", "", None)]


def test_replace_global_java_regex(quads):
    q = """
      SELECT ?x ?r WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(REPLACE(CONCAT(?x, "1", ?y, "2"), "[0-9]", "#") AS ?r)
      }
    """
    # REPLACE is a GLOBAL regex replace (both digits substituted)
    assert _run(quads, q) == [("a", "a#b#"), ("b", "b#c#")]
    with pytest.raises(SparqlParseError, match="REPLACE"):
        _run(quads, "SELECT ?r WHERE { ?x <age> ?a BIND(REPLACE(?x, ?a, \"y\") AS ?r) }")


def test_md5_sha256_match_reference_digests(quads):
    import hashlib

    q = """
      SELECT ?x ?h5 ?h256 WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(MD5(?x) AS ?h5) BIND(SHA256(?x) AS ?h256)
      }
    """
    got = _run(quads, q)
    exp = [
        (
            x,
            hashlib.md5(x.encode()).hexdigest(),
            hashlib.sha256(x.encode()).hexdigest(),
        )
        for x in ("a", "b")
    ]
    assert got == exp


def test_if_condition_branches_and_error_semantics(quads):
    # numeric condition over an integer lexeme takes the then-branch
    q = """
      SELECT ?x ?v WHERE {
        ?x <age> ?n
        BIND(IF(?n > 2, UCASE(?x), "young") AS ?v)
      }
    """
    assert _run(quads, q) == [("a", "A")]
    # errored condition (non-integer lexeme vs number) -> unbound target
    q2 = """
      SELECT ?x ?v WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(IF(?y > 2, "t", "f") AS ?v)
      }
    """
    assert _run(quads, q2) == [("a", None), ("b", None)]
    # compound boolean condition (the FILTER grammar) works inside IF
    q3 = """
      SELECT ?x ?v WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(IF(STRSTARTS(?y, "b") || ?y = "c", "hit", "miss") AS ?v)
      }
    """
    assert _run(quads, q3) == [("a", "hit"), ("b", "hit")]
    # a bare variable condition (EBV) stays out of subset
    with pytest.raises(SparqlParseError):
        _run(quads, 'SELECT ?v WHERE { ?x <age> ?n BIND(IF(?n, "t", "f") AS ?v) }')


# --- negated property sets -------------------------------------------------


def test_nps_forward_only(quads):
    # !<knows> in g1: no edges (g1 only has knows) -> empty;
    # over the default graph: type + age edges survive
    got = _run(quads, "SELECT ?x ?y WHERE { GRAPH <g1> { ?x !<knows> ?y } }")
    assert got == []
    got = _run(quads, "SELECT ?x ?y WHERE { ?x !<age> ?y }")
    assert got == [("a", "Person"), ("b", "Person")]


def test_nps_inverse_only_and_mixed(quads):
    # pure-inverse set: only reversed non-age edges (no forward leg)
    got = _run(quads, "SELECT ?x ?y WHERE { ?x !(^<age>) ?y }")
    assert got == [("Person", "a"), ("Person", "b")]
    # mixed: forward non-type edges union reversed non-age edges
    q = (
        "SELECT ?x ?y WHERE { ?x !(<http://www.w3.org/1999/02/"
        "22-rdf-syntax-ns#type> | ^<age>) ?y }"
    )
    got = _run(quads, q)
    assert got == [("Person", "a"), ("Person", "b"), ("a", "3")]


def test_nps_in_sequence_and_with_postfix(quads):
    # NPS composes with / and postfix modifiers like any path primary
    got = _run(
        quads,
        "SELECT ?x ?z WHERE { GRAPH <g1> { ?x <knows>/!<age> ?z } }",
    )
    assert got == [("a", "c")]
    got = _run(
        quads, "SELECT ?x ?y WHERE { GRAPH <g2> { ?x !<age>? ?y } }"
    )
    # zero-or-one over the NPS: identity over g2's nodes + the c->a edge
    assert got == [("a", "a"), ("c", "a"), ("c", "c")]


def test_nps_rejects_variables(quads):
    with pytest.raises(SparqlParseError, match="constant"):
        _run(quads, "SELECT ?x WHERE { ?x !(?p) ?y }")


# --- AVG aggregate -----------------------------------------------------------


def test_avg_aggregate(quads):
    from pyspark.sql import functions as F

    df = quads.sparkSession.createDataFrame(
        [("a", "v", "1", "default_graph"), ("a", "v", "2", "default_graph"),
         ("b", "v", "2", "default_graph"), ("b", "v", "x", "default_graph"),
         ("c", "v", "nope", "default_graph")],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT ?s (AVG(?o) AS ?m) WHERE { ?s <v> ?o } GROUP BY ?s
    """
    got = _run(df, q)
    # non-integer lexemes are skipped (NULL); an all-error group is NULL
    assert got == [("a", 1.5), ("b", 2.0), ("c", None)]
    # AVG DISTINCT; HAVING over AVG with a numeric constant
    q2 = """
      SELECT ?s (AVG(DISTINCT ?o) AS ?m) WHERE { ?s <v> ?o }
      GROUP BY ?s HAVING (AVG(?o) > 1)
    """
    assert _run(df, q2) == [("a", 1.5), ("b", 2.0)]
    # string constant vs AVG falls to the GENERAL HAVING tree (round 5):
    # the double lexeme string-compares — '1.5'/'2.0' > 'x' is false
    got = _run(
        df,
        "SELECT ?s (AVG(?o) AS ?m) WHERE { ?s <v> ?o } GROUP BY ?s "
        'HAVING (AVG(?o) > "x")',
    )
    assert got == []
    # ... and the numeric-switch form drops AVG's non-integer lexeme
    got = _run(
        df,
        "SELECT ?s (AVG(?o) AS ?m) WHERE { ?s <v> ?o } GROUP BY ?s "
        "HAVING (AVG(?o) * 1 >= 0)",
    )
    assert got == []


def test_if_as_select_expression_item(quads):
    q = """
      SELECT ?x (IF(?t = "Person", "P", "other") AS ?k)
      WHERE { ?x a ?t }
    """
    assert _run(quads, q) == [("a", "P"), ("b", "P")]



# --- property-list sugar and CONSTRUCT-template blank nodes -----------------


def test_property_list_sugar(spark):
    from rify_spark.rdf import DEFAULT_GRAPH as DG

    df = spark.createDataFrame(
        [("a", "knows", "b", DG), ("b", "age", "7", DG),
         ("b", "name", "bob", DG), ("c", "age", "7", DG),
         ("c", "name", "carl", DG), ("a", "age", "2", DG)],
        "s string, p string, o string, g string",
    )
    # object position, two predicates joined on the same fresh bnode
    q = 'SELECT ?x WHERE { ?x <knows> [ <age> "7" ; <name> "bob" ] }'
    assert _run(df, q) == [("a",)]
    # standalone subject form with a trailing dot
    q2 = "SELECT ?n WHERE { [ <age> \"7\" ; <name> ?n ] . }"
    assert _run(df, q2) == [("bob",), ("carl",)]
    # nested: [] inside a property list is a fresh wildcard
    q3 = "SELECT ?x WHERE { ?x <knows> [ <age> [ ] ] }"
    assert _run(df, q3) == [("a",)]
    # object lists inside a property list
    q4 = 'SELECT ?x WHERE { ?x <knows> [ <age> "7" , "7" ] }'
    assert _run(df, q4) == [("a",)]


def test_construct_template_bnodes_fresh_per_solution(quads):
    import hashlib

    from rify_spark.sparql import sparql_construct

    q = """
      CONSTRUCT { ?x <via> _:e . _:e <to> ?z }
      WHERE { GRAPH <g1> { ?x <knows> ?z } }
    """
    got = sorted(tuple(r) for r in sparql_construct(quads, q).collect())

    def bn(x, z):
        basis = "__bn_e\x1f%s\x1f%s" % (x, z)
        return "_:" + hashlib.md5(basis.encode()).hexdigest()

    exp = sorted(
        [
            ("a", "via", bn("a", "b"), "default_graph"),
            (bn("a", "b"), "to", "b", "default_graph"),
            ("b", "via", bn("b", "c"), "default_graph"),
            (bn("b", "c"), "to", "c", "default_graph"),
        ]
    )
    # one fresh node per solution, shared across the label's occurrences
    assert got == exp
    # anonymous [] in a template also mints per solution
    q2 = "CONSTRUCT { ?x <has> [] } WHERE { GRAPH <g1> { ?x <knows> ?z } }"
    rows = sparql_construct(quads, q2).collect()
    assert len({r.o for r in rows}) == 2  # distinct solutions, distinct nodes


def test_update_template_bnodes_insert_yes_delete_no(spark):
    # INSERT templates mint fresh nodes per solution since round 5
    # (spec §3.1.3, the CONSTRUCT machinery); DELETE templates keep the
    # spec's prohibition (§3.1.3.2)
    from rify_spark.rdf import DEFAULT_GRAPH as DG
    from rify_spark.update import sparql_update

    df = spark.createDataFrame(
        [("a", "p", "b", DG)], "s string, p string, o string, g string"
    )
    got = sorted(
        tuple(r)
        for r in sparql_update(
            df, "INSERT { ?x <q> _:n } WHERE { ?x <p> ?y }"
        ).collect()
    )
    minted = [r for r in got if r[1] == "q"]
    assert len(minted) == 1 and minted[0][2].startswith("_:")
    with pytest.raises(SparqlParseError, match="§3.1.3.2"):
        sparql_update(df, "DELETE { ?x <q> _:n } WHERE { ?x <p> ?y }")


# --- aggregate arguments as scalar expressions ------------------------------


def test_aggregate_over_expressions(spark):
    from rify_spark.rdf import DEFAULT_GRAPH as DG

    df = spark.createDataFrame(
        [("a", "price", "10", DG), ("a", "price", "3", DG),
         ("b", "price", "7", DG), ("b", "price", "7", DG)],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT ?s (SUM(?v - 1) AS ?sm)
             (COUNT(DISTINCT CONCAT(?s, "/", ?v)) AS ?c)
             (MIN(STRLEN(?v)) AS ?ml) (AVG(DISTINCT ?v + 0) AS ?ad)
      WHERE { ?s <price> ?v } GROUP BY ?s ORDER BY ?s
    """
    assert _run(df, q) == [("a", 11, 2, "1", 6.5), ("b", 12, 1, "1", 7.0)]
    # HAVING with a matching expression reuses the selected column
    q2 = """
      SELECT ?s (SUM(?v - 1) AS ?sm) WHERE { ?s <price> ?v }
      GROUP BY ?s HAVING (SUM(?v - 1) > 11)
    """
    assert _run(df, q2) == [("b", 12)]
    # a non-integer lexeme under a numeric aggregate expression is an
    # error -> NULL -> skipped (spec's skip-the-errors), like plain SUM
    df2 = spark.createDataFrame(
        [("a", "price", "10", DG), ("a", "price", "oops", DG)],
        "s string, p string, o string, g string",
    )
    q3 = "SELECT ?s (SUM(?v + 1) AS ?sm) WHERE { ?s <price> ?v } GROUP BY ?s"
    assert _run(df2, q3) == [("a", 11)]
    # expression referencing an out-of-scope variable still raises
    with pytest.raises(SparqlParseError, match="not in scope"):
        _run(df, "SELECT (SUM(?nope + 1) AS ?x) WHERE { ?s <price> ?v }")


def test_order_by_expressions(spark):
    from rify_spark.rdf import DEFAULT_GRAPH as DG

    df = spark.createDataFrame(
        [("a", "n", "9", DG), ("b", "n", "10", DG), ("c", "n", "100", DG)],
        "s string, p string, o string, g string",
    )
    def seq(q):  # ORDER BY tests need the row sequence, not _run's sort
        return [tuple(r) for r in sparql_select(df, q).collect()]

    # numeric ordering where lexicographic would be wrong ('9' > '10')
    q = "SELECT ?s ?v WHERE { ?s <n> ?v } ORDER BY DESC(?v + 0)"
    assert seq(q) == [("c", "100"), ("b", "10"), ("a", "9")]
    # plain variable keys stay lexicographic ('9' > '100' > '10');
    # LIMIT cuts the ordered sequence
    q2 = "SELECT ?s ?v WHERE { ?s <n> ?v } ORDER BY DESC(?v) LIMIT 2"
    assert seq(q2) == [("a", "9"), ("c", "100")]
    # bare-parenthesised expression key, multi-key with tie-break
    df2 = spark.createDataFrame(
        [("a", "n", "xx", DG), ("b", "n", "yy", DG), ("c", "n", "z", DG)],
        "s string, p string, o string, g string",
    )
    q3 = "SELECT ?s ?v WHERE { ?s <n> ?v } ORDER BY (STRLEN(?v)) ?s"
    assert [tuple(r) for r in sparql_select(df2, q3).collect()] == [
        ("c", "z"), ("a", "xx"), ("b", "yy")]
    # expression over a non-selected variable raises
    with pytest.raises(SparqlParseError, match="not in scope"):
        _run(df, "SELECT ?s WHERE { ?s <n> ?v } ORDER BY (?v + 0)")


def test_rdf_collections(spark):
    from rify_spark.rdf import DEFAULT_GRAPH as DG
    from rify_spark.sparql import RDF_FIRST as FI, RDF_NIL as NIL
    from rify_spark.sparql import RDF_REST as RE

    rows = [
        ("menu", "items", "c1", DG), ("c1", FI, "soup", DG),
        ("c1", RE, "c2", DG), ("c2", FI, "bread", DG),
        ("c2", RE, NIL, DG),
        ("empty", "items", NIL, DG),
    ]
    df = spark.createDataFrame(
        rows, "s string, p string, o string, g string"
    )
    # a two-element collection pattern matches the first/rest chain
    q = 'SELECT ?m WHERE { ?m <items> ( "soup" "bread" ) }'
    assert _run(df, q) == [("menu",)]
    # element variables bind through the chain
    q2 = 'SELECT ?x WHERE { ?m <items> ( "soup" ?x ) }'
    assert _run(df, q2) == [("bread",)]
    # () is the rdf:nil IRI
    q3 = "SELECT ?m WHERE { ?m <items> () }"
    assert _run(df, q3) == [("empty",)]
    # wrong order / wrong length do not match
    assert _run(df, 'SELECT ?m WHERE { ?m <items> ( "bread" "soup" ) }') == []
    assert _run(df, 'SELECT ?m WHERE { ?m <items> ( "soup" ) }') == []
    # predicate position: '(' opens a path group there, and the literal
    # inside is rejected — collections stay in subject/object positions
    with pytest.raises(SparqlParseError, match="predicate position"):
        _run(df, 'SELECT ?m WHERE { ?m ( "soup" ) ?x }')



def test_group_by_expression_keys(spark):
    from rify_spark.rdf import DEFAULT_GRAPH as DG

    df = spark.createDataFrame(
        [("a1", "n", "5", DG), ("a2", "n", "6", DG), ("b1", "n", "7", DG)],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT ?k (SUM(?v) AS ?sm) WHERE { ?s <n> ?v }
      GROUP BY (SUBSTR(?s, 1, 1) AS ?k)
    """
    assert _run(df, q) == [("a", 11), ("b", 7)]
    # mixed with a plain key; alias usable in later ORDER BY
    q2 = """
      SELECT ?k ?p (COUNT(*) AS ?c) WHERE { ?s ?p ?v }
      GROUP BY (UCASE(?p) AS ?k) ?p ORDER BY ?k
    """
    assert _run(df, q2) == [("N", "n", 3)]
    # alias colliding with a pattern variable raises
    with pytest.raises(SparqlParseError, match="collides"):
        _run(df, "SELECT ?s WHERE { ?s <n> ?v } GROUP BY (STR(?v) AS ?s)")


# --- FROM / FROM NAMED dataset clauses ---------------------------------------


def test_from_dataset_clauses(spark):
    df = spark.createDataFrame(
        [("a", "p", "1", "g1"), ("b", "p", "2", "g2"),
         ("c", "p", "3", "g3"), ("a", "p", "1", "g2")],
        "s string, p string, o string, g string",
    )
    # FROM merges the named graphs into the default graph (set-union:
    # the (a,p,1) duplicate across g1/g2 collapses)
    q = "SELECT ?s ?v FROM <g1> FROM <g2> WHERE { ?s <p> ?v }"
    assert _run(df, q) == [("a", "1"), ("b", "2")]
    # FROM alone: GRAPH patterns see nothing
    q2 = "SELECT ?s FROM <g1> WHERE { GRAPH ?g { ?s <p> ?v } }"
    assert _run(df, q2) == []
    # FROM NAMED alone: the default graph is empty...
    q3 = "SELECT ?s FROM NAMED <g2> WHERE { ?s <p> ?v }"
    assert _run(df, q3) == []
    # ...and GRAPH sees only the named graphs
    q4 = """
      SELECT ?g ?s FROM NAMED <g2> FROM NAMED <g3>
      WHERE { GRAPH ?g { ?s <p> ?v } }
    """
    assert _run(df, q4) == [("g2", "a"), ("g2", "b"), ("g3", "c")]
    # both: default from FROM, GRAPH from FROM NAMED
    q5 = """
      SELECT ?s ?t FROM <g1> FROM NAMED <g3>
      WHERE { ?s <p> ?v . GRAPH <g3> { ?c <p> ?t } }
    """
    assert _run(df, q5) == [("a", "3")]
    # ASK and CONSTRUCT take dataset clauses too
    from rify_spark.sparql import sparql_ask, sparql_construct

    assert sparql_ask(df, "ASK FROM <g3> WHERE { ?s <p> \"3\" }").head()[0]
    got = sparql_construct(
        df, "CONSTRUCT { ?s <q> ?v } FROM <g2> WHERE { ?s <p> ?v }"
    ).collect()
    assert sorted((r.s, r.o) for r in got) == [("a", "1"), ("b", "2")]
    # subqueries reject dataset clauses
    with pytest.raises(SparqlParseError, match="top-level"):
        _run(df, "SELECT ?s WHERE { { SELECT ?s FROM <g1> WHERE { ?s <p> ?v } } }")


def test_sha_family_matches_hashlib(quads):
    import hashlib

    q = """
      SELECT ?x ?h1 ?h384 ?h512 WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(SHA1(?x) AS ?h1)
        BIND(SHA384(?x) AS ?h384)
        BIND(SHA512(?x) AS ?h512)
      }
    """
    got = _run(quads, q)
    exp = [
        (
            x,
            hashlib.sha1(x.encode()).hexdigest(),
            hashlib.sha384(x.encode()).hexdigest(),
            hashlib.sha512(x.encode()).hexdigest(),
        )
        for x in ("a", "b")
    ]
    assert got == exp


def test_abs_integer_model_and_error_semantics(quads):
    # age lexeme "3": ABS(3 - 10) = 7; a non-integer lexeme ("a") nulls
    q = """
      SELECT ?x ?d ?bad WHERE {
        ?x <age> ?n
        BIND(ABS(?n - 10) AS ?d)
        BIND(ABS(?x) AS ?bad)
      }
    """
    assert _run(quads, q) == [("a", "7", None)]


def test_encode_for_uri_matches_rfc3986(spark):
    from urllib.parse import quote

    hard = "Los Angeles~*+%/ü?&=#.b-_c"
    quads = spark.createDataFrame(
        [("s", "label", hard, "default_graph")],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT ?e WHERE { ?s <label> ?o BIND(ENCODE_FOR_URI(?o) AS ?e) }
    """
    (row,) = sparql_select(quads, q).collect()
    # spec §17.4.3.12 == urllib quote with nothing safe (RFC 3986
    # unreserved set, uppercase hex)
    assert row.e == quote(hard, safe="")


def test_negative_integer_literals(quads):
    # signed NumericLiteral in FILTER comparisons and BIND arithmetic
    q = """
      SELECT ?x ?d WHERE {
        ?x <age> ?n
        BIND(?n - 5 AS ?d)
        FILTER (?d > -3 && ?d < -1)
      }
    """
    assert _run(quads, q) == [("a", "-2")]
    # negation binds to integer literals only (no term negation)
    with pytest.raises(SparqlParseError, match="unary '-'"):
        _run(quads, "SELECT ?d WHERE { ?x <age> ?n BIND(-?n AS ?d) }")


def test_having_negative_constant(quads):
    q = """
      SELECT ?x (SUM(?n) AS ?s) WHERE { ?x <age> ?n }
      GROUP BY ?x HAVING (SUM(?n) > -1)
    """
    assert _run(quads, q) == [("a", 3)]


def test_empty_implicit_group_aggregates(quads):
    # SPARQL defines Sum({}) = 0 and GroupConcat({}) = "" over the
    # implicit (no GROUP BY) group — unlike SQL's NULL
    q = """
      SELECT (COUNT(*) AS ?n) (SUM(?v) AS ?s)
             (GROUP_CONCAT(?v) AS ?c) (MIN(?v) AS ?lo)
      WHERE { ?x <no_such_predicate> ?v }
    """
    assert _run(quads, q) == [(0, 0, "", None)]


# --- OPTIONAL filters over outer variables: the LeftJoin condition ---------


@pytest.fixture(scope="module")
def ljquads(spark):
    return spark.createDataFrame(
        [
            ("a", "v", "5", "g"), ("b", "v", "1", "g"),
            ("c", "v", "x", "g"),
            ("a", "w", "3", "g"), ("b", "w", "4", "g"),
            ("c", "w", "9", "g"),
        ],
        "s string, p string, o string, g string",
    )


def test_optional_filter_on_outer_var_is_leftjoin_condition(ljquads):
    # spec §18.2.2.2: the filter references ?vv from OUTSIDE the
    # OPTIONAL, so it is part of the left-join condition — a row whose
    # candidate fails the condition comes back with ?wv UNBOUND, not
    # dropped (the post-join-filter reading would kill x=b entirely).
    # the `+ 0` switches the comparison numeric; x=c: ?vv = "x" is a
    # non-integer lexeme -> the comparison errors (null) -> no match ->
    # survives with ?wv unbound (three-valued).
    q = """
      SELECT ?x ?wv WHERE {
        GRAPH <g> { ?x <v> ?vv }
        OPTIONAL { GRAPH <g> { ?x <w> ?wv } FILTER(?wv < ?vv + 0) }
      }
    """
    assert _run(ljquads, q) == [("a", "3"), ("b", None), ("c", None)]
    # var-vs-var comparison is LEXICOGRAPHIC (the opaque-term
    # contract): "9" < "x", so x=c now matches
    q2 = """
      SELECT ?x ?wv WHERE {
        GRAPH <g> { ?x <v> ?vv }
        OPTIONAL { GRAPH <g> { ?x <w> ?wv } FILTER(?wv < ?vv) }
      }
    """
    assert _run(ljquads, q2) == [("a", "3"), ("b", None), ("c", "9")]


def test_optional_filter_inner_bound_still_in_group(ljquads):
    # a filter fully bound INSIDE the optional group is equivalent
    # either way (LeftJoin(A, Filter(e,B), true) == LeftJoin(A, B, e)
    # when dom(e) is inside B) and stays the plain equi left join
    q = """
      SELECT ?x ?wv WHERE {
        GRAPH <g> { ?x <v> ?vv }
        OPTIONAL { GRAPH <g> { ?x <w> ?wv } FILTER(?wv > 3) }
      }
    """
    assert _run(ljquads, q) == [("a", None), ("b", "4"), ("c", "9")]


def test_optional_connected_only_by_filter(ljquads):
    # no shared variable: the deferred filter IS the join condition
    # (without one this shape is rejected — test above); every (z, wv)
    # with wv < vv attaches, b/c (vv=1 / non-integer) get unbound arms
    q = """
      SELECT ?x ?z ?wv WHERE {
        GRAPH <g> { ?x <v> ?vv }
        OPTIONAL { GRAPH <g> { ?z <w> ?wv } FILTER(?wv < ?vv + 0) }
      }
    """
    assert _run(ljquads, q) == [
        ("a", "a", "3"), ("a", "b", "4"), ("b", None, None),
        ("c", None, None),
    ]


def test_optional_filter_outer_var_with_expression(ljquads):
    # scalar expressions in the deferred filter resolve over the merged
    # namespace: STRLEN of the inner value vs outer arithmetic
    q = """
      SELECT ?x ?wv WHERE {
        GRAPH <g> { ?x <v> ?vv }
        OPTIONAL { GRAPH <g> { ?x <w> ?wv } FILTER(?wv - ?vv = 3) }
      }
    """
    # b: 4-1=3 matches; a: 3-5=-2 no; c: error no
    assert _run(ljquads, q) == [("a", None), ("b", "4"), ("c", None)]


def test_optional_filter_var_bound_nowhere_still_raises(ljquads):
    q = """
      SELECT ?x WHERE {
        GRAPH <g> { ?x <v> ?vv }
        OPTIONAL { GRAPH <g> { ?x <w> ?wv } FILTER(?nope < ?vv) }
      }
    """
    with pytest.raises(SparqlParseError, match="nope"):
        _run(ljquads, q)


def test_optional_filter_on_maybe_shared_var(ljquads, spark):
    # the deferred filter composes with compatible-mappings machinery:
    # ?wv is possibly-unbound going INTO the second OPTIONAL (it came
    # from a first OPTIONAL), and the deferred filter reads the merged
    # coalesce of the shared variable
    quads = spark.createDataFrame(
        [
            ("a", "v", "5", "g"), ("b", "v", "9", "g"),
            ("a", "w", "7", "g"),
            ("7", "u", "6", "g"), ("9", "u", "8", "g"),
        ],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT ?x ?wv ?uv WHERE {
        GRAPH <g> { ?x <v> ?vv }
        OPTIONAL { GRAPH <g> { ?x <w> ?wv } }
        OPTIONAL { GRAPH <g> { ?wv <u> ?uv } FILTER(?uv > ?vv) }
      }
    """
    # x=a: wv=7, u-edge 7->6, 6 > 5 fails? 6 > 5 true -> uv=6
    # x=b: wv unbound -> compatible with any u subject; u-edges (7,6),
    # (9,8): filter uv > 9 -> 6,8 both fail -> unbound arm
    assert _run(quads, q) == [("a", "7", "6"), ("b", None, None)]


def test_optional_filter_on_maybe_bound_inner_var_defers(spark):
    # review finding: a filter var merely MAYBE-bound inside the
    # OPTIONAL group can take its value from the OUTER side of the
    # merge — it must defer into the LeftJoin condition, not filter the
    # (null-valued) inner rows. x=a binds ?m=5 outside; inside, ?m is
    # bound by a nested OPTIONAL that has no match, so the in-group
    # reading would evaluate FILTER(?m < 9) over NULL and drop the zv
    # arm; the spec evaluates it over the merged row where ?m = 5.
    quads = spark.createDataFrame(
        [("a", "v", "5", "g"), ("a", "z", "1", "g")],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT ?x ?m ?zv WHERE {
        GRAPH <g> { ?x <v> ?m }
        OPTIONAL {
          GRAPH <g> { ?x <z> ?zv }
          OPTIONAL { GRAPH <g> { ?x <w> ?m } }
          FILTER(?m < 9)
        }
      }
    """
    assert _run(quads, q) == [("a", "5", "1")]


def test_abs_target_is_possibly_unbound(spark):
    # review finding: ABS can null a non-null input (non-integer
    # lexeme), so its BIND target must ride the maybe tracking — the
    # later shared-var join then uses compatible-mappings semantics
    # (unbound matches anything) instead of a null-dropping equi join
    quads = spark.createDataFrame(
        [("a", "v", "x", "g"), ("s1", "score", "7", "g")],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT ?x ?d WHERE {
        GRAPH <g> { ?x <v> ?n }
        BIND(ABS(?n) AS ?d)
        GRAPH <g> { ?s <score> ?d }
      }
    """
    # ?d is unbound (ABS("x") errors): compatible with score=7, merged
    # solution takes the bound value
    assert _run(quads, q) == [("a", "7")]


def test_empty_implicit_group_avg_is_zero(quads):
    q = """
      SELECT (AVG(?v) AS ?a) (AVG(DISTINCT ?v) AS ?ad)
      WHERE { ?x <no_such_predicate> ?v }
    """
    assert _run(quads, q) == [(0.0, 0.0)]


# ---------------------------------------------------------------------------
# term-kind built-ins over the raw-lexeme convention (sparql.py module
# docstring): literals stored '"value"' / '"value"@tag' / '"v"^^<dt>',
# blanks '_:label', IRIs bare
# ---------------------------------------------------------------------------

TERM_QUADS = [
    ("cust:1", "name", '"Alice"@en', "g"),
    ("cust:2", "name", '"Bob"@en-US', "g"),
    ("cust:3", "name", '"Eve"', "g"),
    ("cust:4", "name", '"Zoe"@fr', "g"),
    ("cust:1", "acct", '"25"^^<http://www.w3.org/2001/XMLSchema#integer>', "g"),
    ("cust:3", "acct", '"n/a"', "g"),
    ("cust:1", "ref", "_:b1", "g"),
    ("cust:2", "ref", "nation:7", "g"),
]


@pytest.fixture(scope="module")
def term_quads(spark):
    return spark.createDataFrame(
        TERM_QUADS, "s string, p string, o string, g string"
    )


def test_term_kind_predicates(term_quads):
    q = """
      SELECT ?c ?r WHERE { GRAPH <g> { ?c <ref> ?r }
        FILTER(isBlank(?r) && isIRI(?c) && !isLiteral(?r)) }
    """
    assert _run(term_quads, q) == [("cust:1", "_:b1")]
    q2 = 'SELECT ?r WHERE { GRAPH <g> { ?c <ref> ?r } FILTER(isURI(?r)) }'
    assert _run(term_quads, q2) == [("nation:7",)]


def test_isnumeric_integer_lexeme_model(term_quads):
    # true for a typed-integer raw literal (its STR projection casts),
    # false for a plain non-numeric literal; an unbound argument is an
    # ERROR — the row drops even under negation
    q = """
      SELECT ?c WHERE { GRAPH <g> { ?c <acct> ?a } FILTER(isNumeric(?a)) }
    """
    assert _run(term_quads, q) == [("cust:1",)]
    q2 = """
      SELECT ?c WHERE { GRAPH <g> { ?c <name> ?n }
        OPTIONAL { GRAPH <g> { ?c <acct> ?a } }
        FILTER(!isNumeric(?a)) }
    """
    # cust:3's "n/a" is non-numeric (kept); cust:2/4 have ?a unbound
    # (error -> dropped under negation too); cust:1 is numeric
    assert _run(term_quads, q2) == [("cust:3",)]


def test_lang_and_datatype_projections(term_quads):
    q = """
      SELECT ?c ?l ?dt WHERE { GRAPH <g> { ?c <name> ?n }
        BIND(LANG(?n) AS ?l) BIND(DATATYPE(?n) AS ?dt) }
    """
    assert _run(term_quads, q) == [
        ("cust:1", "en", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
        ("cust:2", "en-US", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
        ("cust:3", "", "http://www.w3.org/2001/XMLSchema#string"),
        ("cust:4", "fr", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
    ]
    # LANG/DATATYPE of a non-literal is an error: the BIND target is
    # unbound and COALESCE recovers it (spec error-semantics)
    q2 = """
      SELECT ?r ?l WHERE { GRAPH <g> { ?c <ref> ?r }
        BIND(COALESCE(LANG(?r), "none") AS ?l) }
    """
    assert _run(term_quads, q2) == [("_:b1", "none"), ("nation:7", "none")]


def test_langmatches_basic_filtering(term_quads):
    # RFC 4647 basic filtering: 'en' matches 'en' and 'en-US' (case-
    # insensitive, '-'-prefix), not 'fr' or the empty tag; '*' matches
    # any non-empty tag
    q = """
      SELECT ?c WHERE { GRAPH <g> { ?c <name> ?n }
        FILTER(langMatches(LANG(?n), "EN")) }
    """
    assert _run(term_quads, q) == [("cust:1",), ("cust:2",)]
    q2 = """
      SELECT ?c WHERE { GRAPH <g> { ?c <name> ?n }
        FILTER(!langMatches(LANG(?n), "*")) }
    """
    assert _run(term_quads, q2) == [("cust:3",)]


def test_str_projection_by_term_kind(term_quads):
    # STR: literal -> lexical form (suffixes stripped), IRI -> itself
    # (bare convention), blank -> ERROR (unbound target)
    q = """
      SELECT ?o ?v WHERE { GRAPH <g> { ?c ?p ?o }
        BIND(COALESCE(STR(?o), "!") AS ?v) FILTER(?p != "name") }
    """
    assert _run(term_quads, q) == [
        ('"25"^^<http://www.w3.org/2001/XMLSchema#integer>', "25"),
        ('"n/a"', "n/a"),
        ("_:b1", "!"),
        ("nation:7", "nation:7"),
    ]


def test_strlang_strdt_iri_constructors(term_quads):
    q = """
      SELECT ?t ?d ?i WHERE { GRAPH <g> { ?c <name> ?n }
        FILTER(?c = "cust:3")
        BIND(STRLANG(?n, "fr") AS ?t)
        BIND(STRDT(?n, <http://www.w3.org/2001/XMLSchema#token>) AS ?d)
        BIND(IRI(?n) AS ?i) }
    """
    assert _run(term_quads, q) == [(
        '"Eve"@fr',
        '"Eve"^^<http://www.w3.org/2001/XMLSchema#token>',
        "Eve",
    )]
    # constructor round-trips recompose: DATATYPE(STRDT(...)) gives the
    # datatype back, LANG(STRLANG(...)) the tag
    q2 = """
      SELECT ?dt ?l WHERE { GRAPH <g> { ?c <name> ?n }
        FILTER(?c = "cust:3")
        BIND(DATATYPE(STRDT(?n, <urn:t>)) AS ?dt)
        BIND(LANG(STRLANG(?n, "de")) AS ?l) }
    """
    assert _run(term_quads, q2) == [("urn:t", "de")]


def test_sameterm_no_numeric_switch(spark):
    quads = spark.createDataFrame(
        [("a", "v", "01", "g"), ("b", "v", "1", "g")],
        "s string, p string, o string, g string",
    )
    # '=' against an integer constant takes the numeric switch ("01"
    # compares equal to 1); sameTerm never does (raw lexemes differ)
    q_eq = 'SELECT ?x WHERE { GRAPH <g> { ?x <v> ?o } FILTER(?o = 1) }'
    assert _run(quads, q_eq) == [("a",), ("b",)]
    q_st = """
      SELECT ?x WHERE { GRAPH <g> { ?x <v> ?o }
        FILTER(sameTerm(?o, "1")) }
    """
    assert _run(quads, q_st) == [("b",)]


def test_multiplication_precedence_and_errors(spark):
    quads = spark.createDataFrame(
        [("a", "v", "4", "g"), ("b", "v", "x", "g")],
        "s string, p string, o string, g string",
    )
    q = """
      SELECT ?x ?m WHERE { GRAPH <g> { ?x <v> ?n }
        BIND(COALESCE(2 + ?n * 10 - 1, "!") AS ?m) }
    """
    # precedence: 2 + (4*10) - 1 = 41; the non-integer lexeme errors
    assert _run(quads, q) == [("a", "41"), ("b", "!")]
    q2 = 'SELECT ?x WHERE { GRAPH <g> { ?x <v> ?n } FILTER(?n * 3 = 12) }'
    assert _run(quads, q2) == [("a",)]


def test_ceil_floor_round_integer_model(spark):
    quads = spark.createDataFrame(
        [("a", "v", "+007", "g"), ("b", "v", "x", "g")],
        "s string, p string, o string, g string",
    )
    # identity on integral lexemes (canonicalized), error on non-integer
    q = """
      SELECT ?x ?c ?f ?r WHERE { GRAPH <g> { ?x <v> ?n }
        BIND(COALESCE(CEIL(?n), "!") AS ?c)
        BIND(COALESCE(FLOOR(?n), "!") AS ?f)
        BIND(COALESCE(ROUND(?n), "!") AS ?r) }
    """
    assert _run(quads, q) == [("a", "7", "7", "7"), ("b", "!", "!", "!")]


# --------------------------------------------------------------------------
# xsd:dateTime accessors (spec §17.4.5) over the raw-lexeme convention
# --------------------------------------------------------------------------

_XDT = '^^<http://www.w3.org/2001/XMLSchema#dateTime>'
DT_QUADS = [
    ("e1", "at", '"2024-03-07T09:05:07Z"' + _XDT, "g"),
    ("e2", "at", '"1999-12-31T23:59:58.250+05:30"' + _XDT, "g"),
    ("e3", "at", '"2001-01-02T00:00:00-08:00"' + _XDT, "g"),
    ("e4", "at", '"2010-06-15T12:30:00-00:30"' + _XDT, "g"),
    ("e5", "at", '"2010-06-15T12:30:00+00:00"' + _XDT, "g"),
    ("e6", "at", '"2010-06-15T12:30:00"' + _XDT, "g"),  # no timezone
    ("e7", "at", '"-0044-03-15T00:00:01Z"' + _XDT, "g"),  # negative year
    ("e8", "at", '"not-a-date"' + _XDT, "g"),  # unparseable lexeme
    ("e9", "at", '"2024-03-07"', "g"),  # plain literal, wrong kind
    ("e10", "at", "some:iri", "g"),  # IRI, wrong kind
]


@pytest.fixture(scope="module")
def dt_quads(spark):
    return spark.createDataFrame(
        DT_QUADS, "s string, p string, o string, g string"
    )


def test_datetime_field_accessors(dt_quads):
    q = """
      SELECT ?e ?y ?mo ?d ?h ?mi ?s WHERE { GRAPH <g> { ?e <at> ?t }
        BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?mo) BIND(DAY(?t) AS ?d)
        BIND(HOURS(?t) AS ?h) BIND(MINUTES(?t) AS ?mi)
        BIND(SECONDS(?t) AS ?s)
        FILTER(?e = "e1" || ?e = "e2" || ?e = "e7") }
    """
    assert _run(dt_quads, q) == [
        ("e1", "2024", "3", "7", "9", "5", "7"),
        ("e2", "1999", "12", "31", "23", "59", "58.250"),
        ("e7", "-44", "3", "15", "0", "0", "1"),
    ]


def test_datetime_tz_and_timezone(dt_quads):
    # TZ: the designator as written, "" when absent; TIMEZONE: an
    # xsd:dayTimeDuration typed literal, ERROR when absent
    dur = '^^<http://www.w3.org/2001/XMLSchema#dayTimeDuration>'
    q = """
      SELECT ?e ?tz ?dur WHERE { GRAPH <g> { ?e <at> ?t }
        BIND(TZ(?t) AS ?tz)
        BIND(COALESCE(TIMEZONE(?t), "!err") AS ?dur)
        FILTER(?e != "e8" && ?e != "e9" && ?e != "e10") }
    """
    assert _run(dt_quads, q) == [
        ("e1", "Z", '"PT0S"' + dur),
        ("e2", "+05:30", '"PT5H30M"' + dur),
        ("e3", "-08:00", '"-PT8H"' + dur),
        ("e4", "-00:30", '"-PT30M"' + dur),
        ("e5", "+00:00", '"PT0S"' + dur),
        ("e6", "", "!err"),
        ("e7", "Z", '"PT0S"' + dur),
    ]


def test_datetime_wrong_kind_errors(dt_quads):
    # a non-dateTime term (plain literal / IRI / unparseable lexeme)
    # errors: the BIND target is unbound, and a FILTER comparison on it
    # drops the row (error-semantics)
    q = """
      SELECT ?e ?y WHERE { GRAPH <g> { ?e <at> ?t }
        BIND(COALESCE(YEAR(?t), "!err") AS ?y)
        FILTER(?e = "e8" || ?e = "e9" || ?e = "e10") }
    """
    assert _run(dt_quads, q) == [
        ("e10", "!err"), ("e8", "!err"), ("e9", "!err"),
    ]
    q2 = """
      SELECT ?e WHERE { GRAPH <g> { ?e <at> ?t }
        FILTER(YEAR(?t) >= 1999) }
    """
    assert _run(dt_quads, q2) == [
        ("e1",), ("e2",), ("e3",), ("e4",), ("e5",), ("e6",),
    ]


def test_datetime_numeric_order_and_group(dt_quads):
    # accessors are bare integer lexemes: the numeric ORDER BY switch
    # and GROUP BY both apply
    q = """
      SELECT ?e ?y WHERE { GRAPH <g> { ?e <at> ?t }
        BIND(YEAR(?t) AS ?y) FILTER(bound(?y)) }
      ORDER BY DESC(?y + 0) ?e LIMIT 2
    """
    got = [tuple(r) for r in sparql_select(dt_quads, q).collect()]
    assert got == [("e1", "2024"), ("e4", "2010")]


# --------------------------------------------------------------------------
# RDF literal term grammar: lang-tagged / ^^-typed / numeric / boolean
# constants, BASE resolution, REDUCED
# --------------------------------------------------------------------------

LIT_QUADS = [
    ("a", "name", '"Alice"@en', "g"),
    ("b", "name", '"Alicia"@es', "g"),
    ("a", "age", '"30"^^<http://www.w3.org/2001/XMLSchema#integer>', "g"),
    ("b", "age", "30", "g"),       # legacy bare lexeme
    ("a", "pi", "3.14", "g"),
    ("a", "ok", "true", "g"),
    ("b", "ok", "false", "g"),
]


@pytest.fixture(scope="module")
def lit_quads(spark):
    return spark.createDataFrame(
        LIT_QUADS, "s string, p string, o string, g string"
    )


def test_lang_and_typed_literal_constants(lit_quads):
    # suffixed literal constants compile to the RAW form; plain "30"
    # stays the legacy bare constant — the two age rows are told apart
    q = 'SELECT ?x WHERE { GRAPH <g> { ?x <name> "Alice"@en } }'
    assert _run(lit_quads, q) == [("a",)]
    q2 = """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      SELECT ?x WHERE { GRAPH <g> { ?x <age> "30"^^xsd:integer } }"""
    assert _run(lit_quads, q2) == [("a",)]
    q3 = 'SELECT ?x WHERE { GRAPH <g> { ?x <age> "30" } }'
    assert _run(lit_quads, q3) == [("b",)]
    # and in FILTERs: raw-form equality
    q4 = """
      SELECT ?x WHERE { GRAPH <g> { ?x <name> ?n }
        FILTER(?n = "Alicia"@es) }
    """
    assert _run(lit_quads, q4) == [("b",)]


def test_numeric_and_boolean_term_constants(lit_quads):
    # bare numerics/booleans match the engine's plain-lexeme convention;
    # integers canonicalize ("007" == "7"-lexeme semantics)
    assert _run(
        lit_quads, "SELECT ?x WHERE { GRAPH <g> { ?x <age> 30 } }"
    ) == [("b",)]
    assert _run(
        lit_quads, "SELECT ?x WHERE { GRAPH <g> { ?x <pi> 3.14 } }"
    ) == [("a",)]
    assert _run(
        lit_quads, "SELECT ?x WHERE { GRAPH <g> { ?x <ok> true } }"
    ) == [("a",)]
    assert _run(
        lit_quads, "SELECT ?x WHERE { GRAPH <g> { ?x <ok> false } }"
    ) == [("b",)]


def test_base_resolution(lit_quads, spark):
    # BASE resolves relative <refs> in every slot (RFC 3986, dot
    # segments included) and in PREFIX declarations; absolute IRIs
    # pass through
    iri_quads = spark.createDataFrame(
        [("http://ex.org/s/1", "http://ex.org/p/knows",
          "http://ex.org/s/2", "http://ex.org/g")],
        "s string, p string, o string, g string",
    )
    q = """
      BASE <http://ex.org/s/>
      PREFIX p: <../p/>
      SELECT ?o WHERE { GRAPH <../g> { <1> p:knows ?o } }
    """
    got = sorted(tuple(r) for r in sparql_select(iri_quads, q).collect())
    assert got == [("http://ex.org/s/2",)]


def test_base_non_http_scheme(spark):
    # RFC resolution is scheme-independent even where urljoin alone
    # is not (it only resolves schemes it knows)
    from rify_spark.sparql import _Parser

    p = _Parser(
        "BASE <graph://tpch/a/> SELECT ?x WHERE { ?x <p> ?y . "
        "FILTER(?y != <../lit>) }"
    )
    p.parse()
    pat = p.root.elems[0].patterns[0]
    assert pat[1].value == "graph://tpch/a/p"


def test_reduced_parses_as_set_output(lit_quads):
    q = "SELECT REDUCED ?p WHERE { GRAPH <g> { ?x ?p ?o } }"
    assert _run(lit_quads, q) == [("age",), ("name",), ("ok",), ("pi",)]


def test_construct_where_shorthand(quads):
    # §16.2.3: template == pattern; the result mirrors the matched
    # subgraph under the engine's GRAPH-in-template extension
    from rify_spark.sparql import sparql_construct

    q = "CONSTRUCT WHERE { GRAPH <g1> { ?x <knows> ?y } }"
    got = sorted(tuple(r) for r in sparql_construct(quads, q).collect())
    assert got == [
        ("a", "knows", "b", "g1"),
        ("b", "knows", "c", "g1"),
    ]


def test_construct_where_rejects_non_bgp(quads):
    from rify_spark.sparql import sparql_construct

    with pytest.raises(SparqlParseError):
        sparql_construct(
            quads,
            'CONSTRUCT WHERE { GRAPH <g1> { ?x <knows> ?y } '
            'FILTER(?x != "a") }',
        )
    with pytest.raises(SparqlParseError):
        sparql_construct(
            quads, "CONSTRUCT WHERE { GRAPH <g1> { [] <knows> ?y } }"
        )


# --- nondeterministic generators: BNODE / RAND / UUID / STRUUID / NOW -------


def test_ndet_generators(quads, monkeypatch):
    monkeypatch.setenv("RIFY_SPARQL_NOW", "2026-08-20T12:00:00Z")
    q = """
      SELECT ?x ?b1 ?b2 ?ba ?r ?u ?su ?n WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(BNODE() AS ?b1) BIND(BNODE() AS ?b2)
        BIND(BNODE(?x) AS ?ba)
        BIND(RAND() AS ?r) BIND(UUID() AS ?u) BIND(STRUUID() AS ?su)
        BIND(NOW() AS ?n)
      } ORDER BY ?x
    """
    rows = sparql_select(quads, q).collect()
    assert len(rows) >= 2
    a = rows[0]
    # two call sites -> distinct nodes; per-solution distinct too
    assert a["b1"] != a["b2"] != rows[1]["b1"]
    assert a["b1"].startswith("_:") and a["ba"].startswith("_:")
    # RAND: a double lexeme in [0, 1), varying per solution
    assert 0.0 <= float(a["r"]) < 1.0 and a["r"] != rows[1]["r"]
    # UUID an IRI in the urn:uuid scheme, STRUUID the bare 36-char form
    assert a["u"].startswith("urn:uuid:") and len(a["su"]) == 36
    assert a["u"] != rows[1]["u"] and a["su"] != rows[1]["su"]
    # NOW: one fixed xsd:dateTime literal for the whole execution
    assert a["n"] == (
        '"2026-08-20T12:00:00Z"'
        "^^<http://www.w3.org/2001/XMLSchema#dateTime>"
    )
    assert a["n"] == rows[1]["n"]
    # determinism: the whole result reproduces bit-for-bit
    assert [tuple(r) for r in sparql_select(quads, q).collect()] == [
        tuple(r) for r in rows
    ]


def test_bnode_argument_skolemization(quads):
    # §17.4.2.9: the same argument maps to the same node at every call
    # site (documented: across solutions too — deterministic skolem)
    q = """
      SELECT ?x ?m1 ?m2 WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(BNODE(?x) AS ?m1) BIND(BNODE(CONCAT(?x, "")) AS ?m2)
      }
    """
    for r in sparql_select(quads, q).collect():
        assert r["m1"] == r["m2"]
    # an errored argument propagates (unbound target), spec §10.1
    q2 = """
      SELECT ?x ?m WHERE {
        GRAPH <g1> { ?x <knows> ?y }
        BIND(BNODE(YEAR(?x)) AS ?m)
      }
    """
    assert all(
        r["m"] is None for r in sparql_select(quads, q2).collect()
    )


def test_ndet_in_select_expressions(quads, monkeypatch):
    monkeypatch.setenv("RIFY_SPARQL_NOW", "2026-08-20T12:00:00Z")
    # the family routes through SELECT projection items, composes with
    # other scalar functions, and NOW() feeds the dateTime accessors
    q = """
      SELECT (BNODE(?x) AS ?sk) (STRLEN(STRUUID()) AS ?len)
             (YEAR(NOW()) AS ?yr)
      WHERE { GRAPH <g1> { ?x <knows> ?y } }
    """
    for r in sparql_select(quads, q).collect():
        assert r["sk"].startswith("_:")
        assert r["len"] == "36" and r["yr"] == "2026"


def test_ndet_error_contract(quads):
    for bad in [
        "SELECT (RAND(?x) AS ?r) WHERE { GRAPH <g1> { ?x <knows> ?y } }",
        "SELECT (UUID(?x) AS ?u) WHERE { GRAPH <g1> { ?x <knows> ?y } }",
        "SELECT (NOW(?x) AS ?n) WHERE { GRAPH <g1> { ?x <knows> ?y } }",
    ]:
        with pytest.raises(SparqlParseError):
            sparql_select(quads, bad).collect()


def test_ndet_state_shared_across_subquery_scopes(quads, monkeypatch):
    monkeypatch.setenv("RIFY_SPARQL_NOW", "2026-08-20T12:00:00Z")
    # sibling subqueries continue ONE call-site stream: their UUID()
    # calls are different sites, never colliding mints; and NOW() is
    # one instant in every scope (spec §17.4.5.1)
    q = """
      SELECT ?x ?u ?v ?t1 ?t2 WHERE {
        BIND(NOW() AS ?t1)
        { SELECT ?x (UUID() AS ?u) WHERE { GRAPH <g1> { ?x <knows> ?o } } }
        { SELECT ?x (UUID() AS ?v) (NOW() AS ?t2)
          WHERE { GRAPH <g1> { ?x <knows> ?o } } }
      }
    """
    rows = sparql_select(quads, q).collect()
    assert rows
    for r in rows:
        assert r["u"] != r["v"]
        assert r["t1"] == r["t2"]


def test_describe_cbd_closes_over_bnode_objects(spark):
    from rify_spark.sparql import sparql_describe

    DG = "default_graph"
    rows = [
        ("r", "p", "_:b1", DG),
        ("_:b1", "q", "_:b2", DG),
        ("_:b2", "v", "leaf", DG),
        ("_:b2", "w", "iri:other", DG),
        ("iri:other", "x", "not-described", DG),  # named: NOT followed
        ("_:unrelated", "y", "z", DG),
        ("r2", "p", "other-resource", DG),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    # default: one hop only
    one = {
        tuple(r)[:4]
        for r in sparql_describe(df, "DESCRIBE <r>").collect()
    }
    assert one == {("r", "p", "_:b1", DG)}
    # CBD: the bnode chain is pulled in, named objects are not followed
    got = {
        tuple(r)[:4]
        for r in sparql_describe(df, "DESCRIBE <r>", cbd=True).collect()
    }
    assert got == set(rows[:4])


def test_describe_cbd_hop_cap_is_exposed(spark):
    from rify_spark.sparql import sparql_describe

    DG = "default_graph"
    rows = [("r", "p", "_:b1", DG), ("_:b1", "q", "_:b2", DG),
            ("_:b2", "v", "leaf", DG)]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    got = {
        tuple(r)[:4]
        for r in sparql_describe(
            df, "DESCRIBE <r>", cbd=True, cbd_max_hops=1
        ).collect()
    }
    # one hop of bnode closure only: _:b2's own statements are cut off
    assert got == set(rows[:2])


# --- SERVICE: local federation over a store registry (spec §13) -------------


def test_service_joins_a_registered_store(spark):
    from rify_spark.sparql import sparql_query

    DG = "default_graph"
    local = spark.createDataFrame(
        [("a", "knows", "b", DG), ("b", "knows", "c", DG)],
        "s string, p string, o string, g string",
    )
    remote = spark.createDataFrame(
        [("b", "age", "30", DG), ("c", "age", "41", DG),
         ("x", "age", "9", "g9")],
        "s string, p string, o string, g string",
    )
    reg = {"svc://people": remote}
    q = """
      SELECT ?x ?y ?age WHERE {
        ?x <knows> ?y .
        SERVICE <svc://people> { ?y <age> ?age }
      } ORDER BY ?x
    """
    got = [tuple(r) for r in sparql_query(local, q, services=reg).collect()]
    assert got == [("a", "b", "30"), ("b", "c", "41")]
    # the remote dataset scopes itself: its named graph is invisible to
    # unscoped SERVICE triples but visible to an inner GRAPH block
    ask = "ASK { SERVICE <svc://people> { <x> <age> ?a } }"
    assert sparql_query(local, ask, services=reg).collect()[0][0] is False
    ask_g = (
        "ASK { SERVICE <svc://people> { GRAPH <g9> { <x> <age> ?a } } }"
    )
    assert sparql_query(local, ask_g, services=reg).collect()[0][0] is True
    # SERVICE may open the group (frontier-first federation)
    first = """
      SELECT ?s ?a WHERE {
        SERVICE <svc://people> { ?s <age> ?a } . ?s <knows> ?o
      }
    """
    assert sorted(
        tuple(r)
        for r in sparql_query(local, first, services=reg).collect()
    ) == [("b", "30")]


def test_service_silent_and_error_contract(spark):
    from rify_spark.sparql import sparql_select

    DG = "default_graph"
    local = spark.createDataFrame(
        [("a", "knows", "b", DG)], "s string, p string, o string, g string"
    )
    # SILENT + unregistered endpoint = the unit solution (no effect)
    q = (
        "SELECT ?x ?y WHERE { ?x <knows> ?y . "
        "SERVICE SILENT <svc://gone> { ?y <age> ?a } }"
    )
    assert [tuple(r) for r in sparql_select(local, q).collect()] == [
        ("a", "b")
    ]
    # non-SILENT unregistered endpoint raises; variable endpoints too
    with pytest.raises(SparqlParseError, match="not registered"):
        sparql_select(
            local,
            "SELECT ?x WHERE { SERVICE <svc://gone> { ?x <p> ?y } }",
        ).collect()
    with pytest.raises(SparqlParseError, match="constant endpoint"):
        sparql_select(
            local,
            "SELECT ?x WHERE { SERVICE ?ep { ?x <p> ?y } }",
        ).collect()
