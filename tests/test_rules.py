"""Rule model tests — ports of reference src/rule.rs test vectors."""

import pytest

from rify_spark.rules import Bound as B, Rule, Unbound as U, lower_rule
from rify_spark.errors import UnboundImplied


def test_create_valid():
    r = Rule.create(
        [[U("a"), B("parent"), U("b"), B("dg")]],
        [[U("a"), B("ancestor"), U("b"), B("dg")]],
    )
    assert r.canonical_unbound() == ["a", "b"]


def test_create_invalid_unbound_implied():
    # reference src/rule.rs:405-442 (create_invalid)
    with pytest.raises(UnboundImplied):
        Rule.create([], [[U("a"), U("a"), U("a"), U("a")]])
    with pytest.raises(UnboundImplied) as ei:
        Rule.create(
            [
                [U("super"), B("claims"), U("claim1"), U("g")],
                [U("claim1"), B("subject"), U("minor"), U("g")],
                [U("claim1"), B("predicate"), B("mayclaim"), U("g")],
                [U("claim1"), B("object"), U("pred"), U("g")],
                [U("minor"), B("claims"), U("claim2"), U("g")],
                [U("claim2"), B("subject"), U("s"), U("g")],
                [U("claim2"), B("predicate"), U("pred"), U("g")],
                [U("claim2"), B("object"), U("o"), U("g")],
            ],
            [
                [U("super"), B("claims"), U("claim3"), U("g")],
                [U("claim3"), B("subject"), U("s"), U("g")],
                [U("claim3"), B("predicate"), U("pred"), U("g")],
                [U("claim3"), B("object"), U("o"), U("g")],
            ],
        )
    assert ei.value.name == "claim3"


def test_similar_names():
    # variable "a" is distinct from constant "a" (reference src/rule.rs:242-257)
    r = Rule.create([[U("a"), B("a"), U("b"), U("g")]], [])
    lr = lower_rule(r, 0, lambda t: f"c:{t}")
    (s, p, o, g) = lr.body[0]
    assert s[0] == "v" and p == ("c", "c:a")
    assert lr.canon_vars == ["a", "b", "g"]


def test_canonical_unbound_first_appearance_order():
    r = Rule.create(
        [
            [U("z"), B("p"), U("a"), U("g")],
            [U("a"), B("q"), U("m"), U("g")],
        ],
        [[U("m"), B("r"), U("z"), U("g")]],
    )
    assert r.canonical_unbound() == ["z", "a", "g", "m"]


def test_lower_shapes():
    # reference src/rule.rs:260-376 (lower): shared vars share slots,
    # constants carry translated values
    r = Rule.create(
        [
            [U("a"), B("ancestor"), U("b"), U("g")],
            [U("b"), B("ancestor"), U("c"), U("g")],
        ],
        [[U("a"), B("ancestor"), U("c"), U("g")]],
    )
    lr = lower_rule(r, 3, lambda t: hash(t))
    a0, a1 = lr.body
    h = lr.head[0]
    assert a0[1] == a1[1] == h[1] == ("c", hash("ancestor"))
    assert a0[0] == h[0]          # ?a
    assert a0[2] == a1[0]         # ?b
    assert a1[2] == h[2]          # ?c
    assert a0[3] == a1[3] == h[3]  # ?g
    assert lr.index == 3 and lr.n_vars == 4


def test_lower_no_translation():
    r = Rule.create([[U("a"), B("unknown"), U("b"), U("g")]], [])
    empty = {}
    with pytest.raises(KeyError):
        lower_rule(r, 0, lambda t: empty[t])


def test_json_roundtrip():
    # serde wire format (reference src/rule.rs:485-570 shape, string terms)
    obj = {
        "if_all": [
            [
                {"Unbound": "pig"},
                {"Bound": "https://example.com/Ability"},
                {"Bound": "https://example.com/Flight"},
                {"Bound": "default_graph"},
            ]
        ],
        "then": [
            [
                {"Bound": "did:dock:bddap"},
                {"Bound": "firstName"},
                {"Bound": "Gorgadon"},
                {"Bound": "default_graph"},
            ]
        ],
    }
    r = Rule.from_json(obj)
    assert r.to_json() == obj
    # structured (non-string) bound terms survive the round trip too
    obj2 = {
        "if_all": [
            [
                {"Unbound": "x"},
                {"Bound": {"Iri": "https://example.com/p"}},
                {"Bound": {"Literal": {"value": "1", "datatype": "int"}}},
                {"Bound": "DefaultGraph"},
            ]
        ],
        "then": [],
    }
    r2 = Rule.from_json(obj2)
    assert r2.to_json() == obj2


def test_unconditional_head_must_be_constant():
    with pytest.raises(UnboundImplied):
        Rule.create([], [[U("x"), B("p"), B("o"), B("g")]])
    Rule.create([], [[B("s"), B("p"), B("o"), B("g")]])  # ok
