"""Ready-made rule sets for common ontology-closure tasks (RDFS-style).

The reference engine ships no rule library — its users hand-write exactly
these shapes against ``infer``/``prove`` (the reference README's ancestry
example IS rdfs-style transitivity; see also the claim-deduction rules in
bindings/js_wasm/binding_tests/test.js:93-146). Providing them as data is
pure API surface: each is an ordinary :class:`rify_spark.Rule` list that
lowers through the standard engine, so the semi-naive fixpoint, lineage,
and validation all apply unchanged.

Vocabulary follows the RDFS terms but nothing is hard-coded to IRIs — pass
your own predicate names to use an existing graph's vocabulary.
"""

from __future__ import annotations

from .rules import Bound as B, Rule, Unbound as U

RDF_TYPE = "rdf:type"
RDFS_SUBCLASS = "rdfs:subClassOf"
RDFS_SUBPROPERTY = "rdfs:subPropertyOf"
RDFS_DOMAIN = "rdfs:domain"
RDFS_RANGE = "rdfs:range"


def rdfs_rules(
    type_p: str = RDF_TYPE,
    subclass_p: str = RDFS_SUBCLASS,
    subproperty_p: str = RDFS_SUBPROPERTY,
    domain_p: str = RDFS_DOMAIN,
    range_p: str = RDFS_RANGE,
) -> list:
    """The RDFS entailment core (rdfs5/7/9/11 plus domain/range rdfs2/3),
    graph-scoped: every rule carries the graph variable, so entailment
    never leaks across graphs — the same invariant the engine's own tests
    pin for hand-written rules.

    Rules with a variable in predicate position (subproperty, domain,
    range) exercise the matcher's variable-predicate join path; the
    per-predicate join-order stats keep the [?p subPropertyOf ?q] /
    [?p domain ?c] atoms first, so the open [?x ?p ?y] atom joins against
    an already-bound tiny predicate set.
    """
    g = U("g")
    return [
        # rdfs11: subclass transitivity
        Rule.create(
            [
                [U("a"), B(subclass_p), U("b"), g],
                [U("b"), B(subclass_p), U("c"), g],
            ],
            [[U("a"), B(subclass_p), U("c"), g]],
        ),
        # rdfs9: type propagation through subclass
        Rule.create(
            [
                [U("x"), B(type_p), U("a"), g],
                [U("a"), B(subclass_p), U("b"), g],
            ],
            [[U("x"), B(type_p), U("b"), g]],
        ),
        # rdfs5: subproperty transitivity
        Rule.create(
            [
                [U("p"), B(subproperty_p), U("q"), g],
                [U("q"), B(subproperty_p), U("r"), g],
            ],
            [[U("p"), B(subproperty_p), U("r"), g]],
        ),
        # rdfs7: property propagation through subproperty
        Rule.create(
            [
                [U("p"), B(subproperty_p), U("q"), g],
                [U("x"), U("p"), U("y"), g],
            ],
            [[U("x"), U("q"), U("y"), g]],
        ),
        # rdfs2: domain typing
        Rule.create(
            [
                [U("p"), B(domain_p), U("c"), g],
                [U("x"), U("p"), U("y"), g],
            ],
            [[U("x"), B(type_p), U("c"), g]],
        ),
        # rdfs3: range typing
        Rule.create(
            [
                [U("p"), B(range_p), U("c"), g],
                [U("x"), U("p"), U("y"), g],
            ],
            [[U("y"), B(type_p), U("c"), g]],
        ),
    ]
