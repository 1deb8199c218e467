"""Structured (JSON RdfTerm) bound terms flow through the whole engine.

The reference is generic over ``Bound: Ord`` and its serde test round-trips
rules whose bound terms are structured RdfTerm objects (reference
src/rule.rs:485-570: Iri / Literal / DefaultGraph shapes). These tests run
that exact vector — not just through JSON serde, but through ``infer``,
``prove`` and ``validate`` with structured premises.
"""

import pytest

from rify_spark import Rule, infer, prove, validate
from rify_spark.errors import ExhaustedSearchSpace, NoTranslation
from rify_spark.rules import (
    Bound as B,
    FrozenTerm,
    Unbound as U,
    freeze_term,
    lower_rule,
)

IRI_ABILITY = {"Iri": "https://example.com/Ability"}
IRI_FLIGHT = {"Iri": "https://example.com/Flight"}
IRI_TYPE = {"Iri": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"}
IRI_PIG = {"Iri": "https://example.com/Pig"}
IRI_BDDAP = {"Iri": "did:dock:bddap"}
IRI_FIRSTNAME = {"Iri": "http://xmlns.com/foaf/spec/#term_firstName"}
LIT_GORGADON = {
    "Literal": {
        "value": "Gorgadon",
        "datatype": "http://www.w3.org/1999/02/22-rdf-syntax-ns#PlainLiteral",
    }
}
DG = "DefaultGraph"

# the reference serde vector, verbatim (src/rule.rs:499-529)
SERDE_RULE_JSON = {
    "if_all": [
        [
            {"Unbound": "pig"},
            {"Bound": IRI_ABILITY},
            {"Bound": IRI_FLIGHT},
            {"Bound": DG},
        ],
        [
            {"Unbound": "pig"},
            {"Bound": IRI_TYPE},
            {"Bound": IRI_PIG},
            {"Bound": DG},
        ],
    ],
    "then": [
        [
            {"Bound": IRI_BDDAP},
            {"Bound": IRI_FIRSTNAME},
            {"Bound": LIT_GORGADON},
            {"Bound": DG},
        ]
    ],
}


def test_serde_vector_roundtrip():
    r = Rule.from_json(SERDE_RULE_JSON)
    assert r.to_json() == SERDE_RULE_JSON


def test_frozen_term_semantics():
    a = FrozenTerm({"Iri": "x"})
    b = FrozenTerm({"Iri": "x"})
    c = FrozenTerm({"Iri": "y"})
    assert a == b and hash(a) == hash(b) and a != c
    assert a == {"Iri": "x"} and {"Iri": "x"} == a
    assert sorted([c, a]) == [a, c]
    assert len({a, b, c}) == 2


def test_serde_vector_through_infer(spark):
    rule = Rule.from_json(SERDE_RULE_JSON)
    pig = {"Blank": "piggy"}
    premises = [
        (pig, IRI_ABILITY, IRI_FLIGHT, DG),
        (pig, IRI_TYPE, IRI_PIG, DG),
    ]
    out = infer(spark, premises, [rule])
    assert out == [(IRI_BDDAP, IRI_FIRSTNAME, LIT_GORGADON, DG)]


def test_serde_vector_through_prove_and_validate(spark):
    rule = Rule.from_json(SERDE_RULE_JSON)
    pig = {"Blank": "piggy"}
    premises = [
        (pig, IRI_ABILITY, IRI_FLIGHT, DG),
        (pig, IRI_TYPE, IRI_PIG, DG),
    ]
    goal = [(IRI_BDDAP, IRI_FIRSTNAME, LIT_GORGADON, DG)]
    proof = prove(spark, premises, goal, [rule])
    assert len(proof) == 1
    assert proof[0].rule_index == 0
    assert proof[0].instantiations == (pig,)  # canonical order: ("pig",)

    valid = validate([rule], proof)
    # sets of structured quads need frozen elements to be hashable
    assert valid.implied == {
        tuple(freeze_term(x) for x in (IRI_BDDAP, IRI_FIRSTNAME, LIT_GORGADON, DG))
    }
    assert valid.assumed == {tuple(freeze_term(x) for x in q) for q in premises}

    # an unprovable structured goal still exhausts the search space
    with pytest.raises(ExhaustedSearchSpace):
        prove(
            spark,
            premises,
            [(pig, IRI_FIRSTNAME, LIT_GORGADON, DG)],
            [rule],
        )


def test_lower_structured_no_translation():
    r = Rule.create([[U("a"), B({"Iri": "unknown"}), U("b"), U("g")]], [])
    empty = {}
    with pytest.raises(NoTranslation):
        lower_rule(r, 0, lambda t: empty[t])
