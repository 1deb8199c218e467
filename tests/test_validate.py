"""Validate tests — ports of reference src/validate.rs:112-271 vectors.

validate() is driver-side pure replay; only the vectors that need prove()
touch Spark."""

import pytest

from rify_spark import (
    BadRuleApplication,
    Bound as B,
    NoSuchRule,
    Rule,
    RuleApplication,
    Unbound as U,
    prove,
    decl_rules,
    validate,
)

DG = "default_graph"


def test_irrelevant_facts_ignored(spark):
    # src/validate.rs:120-142
    facts = [
        ("tacos", "are", "tasty", DG),
        ("nachos", "are", "tasty", DG),
    ]
    rules = decl_rules(
        [
            (
                [[B("nachos"), B("are"), B("tasty"), B(DG)]],
                [[B("nachos"), B("are"), B("food"), B(DG)]],
            )
        ]
    )
    claims = [("nachos", "are", "food", DG)]
    proof = prove(spark, facts, claims, rules)
    valid = validate(rules, proof)
    assert valid.assumed == {("nachos", "are", "tasty", DG)}
    for c in claims:
        assert c in valid.implied


def test_bad_rule_application(spark):
    # src/validate.rs:145-159 — same proof replayed against a rule list
    # expecting a different binding arity
    facts = [("a", "a", "a", "a")]
    rules_v1 = decl_rules(
        [([[U("a"), B("a"), B("a"), B("a")]], [[B("b"), B("b"), B("b"), B("b")]])]
    )
    rules_v2 = decl_rules(
        [([[B("a"), B("a"), B("a"), B("a")]], [[B("b"), B("b"), B("b"), B("b")]])]
    )
    proof = prove(spark, facts, [("b", "b", "b", "b")], rules_v1)
    with pytest.raises(BadRuleApplication):
        validate(rules_v2, proof)


def test_no_such_rule(spark):
    # src/validate.rs:162-172
    facts = [("a", "a", "a", "a")]
    rules = decl_rules(
        [([[B("a"), B("a"), B("a"), B("a")]], [[B("b"), B("b"), B("b"), B("b")]])]
    )
    proof = prove(spark, facts, [("b", "b", "b", "b")], rules)
    with pytest.raises(NoSuchRule):
        validate([], proof)


def test_validate_manual_proof():
    # src/validate.rs:175-261 — hand-written 3-step proof, exact sets;
    # no Spark involved
    rules = decl_rules(
        [
            (
                [
                    [B("andrew"), B("claims"), U("c"), B(DG)],
                    [U("c"), B("subject"), U("s"), B(DG)],
                    [U("c"), B("property"), U("p"), B(DG)],
                    [U("c"), B("object"), U("o"), B(DG)],
                ],
                [[U("s"), U("p"), U("o"), B(DG)]],
            ),
            (
                [[U("a"), B("favoriteFood"), U("f"), B(DG)]],
                [
                    [U("a"), B("likes"), U("f"), B(DG)],
                    [U("f"), B("type"), B("food"), B(DG)],
                ],
            ),
            (
                [
                    [U("f"), B("type"), B("food"), B(DG)],
                    [U("a"), B("alergyFree"), B("true"), B(DG)],
                ],
                [[U("a"), B("mayEat"), U("f"), B(DG)]],
            ),
        ]
    )
    facts = [
        ("alice", "favoriteFood", "beans", DG),
        ("andrew", "claims", "_:claim1", DG),
        ("_:claim1", "subject", "bob", DG),
        ("_:claim1", "property", "alergyFree", DG),
        ("_:claim1", "object", "true", DG),
    ]
    manual_proof = [
        RuleApplication(1, ("alice", "beans")),
        RuleApplication(0, ("_:claim1", "bob", "alergyFree", "true")),
        RuleApplication(2, ("beans", "bob")),
    ]
    valid = validate(rules, manual_proof)
    assert valid.assumed == set(facts)
    assert valid.implied == {
        ("alice", "likes", "beans", DG),
        ("beans", "type", "food", DG),
        ("bob", "alergyFree", "true", DG),
        ("bob", "mayEat", "beans", DG),
    }


def test_validate_errors_no_spark():
    # error shapes (test.js:148-158)
    rules = decl_rules(
        [([[U("a"), B("p"), U("b"), U("g")]], [[U("a"), B("q"), U("b"), U("g")]])]
    )
    with pytest.raises(BadRuleApplication):
        validate(rules, [RuleApplication(0, ("only one",))])
    with pytest.raises(NoSuchRule):
        validate(rules, [RuleApplication(1000, ())])


def test_doctest_validate_example():
    # reference src/validate.rs:21-59 doctest
    awesome_score_axiom = Rule.create(
        [
            [U("a"), B("is"), B("awesome"), B(DG)],
            [U("a"), B("score"), U("s"), B(DG)],
        ],
        [[U("a"), B("score"), B("awesome"), B(DG)]],
    )
    valid = validate(
        [awesome_score_axiom],
        [RuleApplication(0, ("you", "unspecified"))],
    )
    assert valid.assumed == {
        ("you", "is", "awesome", DG),
        ("you", "score", "unspecified", DG),
    }
    assert valid.implied == {("you", "score", "awesome", DG)}
