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
OWL_TRANSITIVE = "owl:TransitiveProperty"
OWL_SYMMETRIC = "owl:SymmetricProperty"
OWL_INVERSE_OF = "owl:inverseOf"


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


def owl_property_rules(
    type_p: str = RDF_TYPE,
    transitive_c: str = OWL_TRANSITIVE,
    symmetric_c: str = OWL_SYMMETRIC,
    inverse_p: str = OWL_INVERSE_OF,
) -> list:
    """OWL-RL property-characteristic rules (prp-trp, prp-symp, prp-inv1/2):
    declare a predicate transitive / symmetric / the inverse of another AS
    DATA and the fixpoint closes it — no per-predicate rule authoring.
    Graph-scoped like :func:`rdfs_rules`. (Deliberately excludes owl:sameAs
    substitution semantics: equality saturation multiplies the fact set by
    clique sizes; the engine's canonicalization stage — entity resolution
    via connected components, extract/canonicalize.py — is the scalable way
    to merge equal individuals BEFORE reasoning.)
    """
    g = U("g")
    return [
        # prp-trp
        Rule.create(
            [
                [U("p"), B(type_p), B(transitive_c), g],
                [U("x"), U("p"), U("y"), g],
                [U("y"), U("p"), U("z"), g],
            ],
            [[U("x"), U("p"), U("z"), g]],
        ),
        # prp-symp
        Rule.create(
            [
                [U("p"), B(type_p), B(symmetric_c), g],
                [U("x"), U("p"), U("y"), g],
            ],
            [[U("y"), U("p"), U("x"), g]],
        ),
        # prp-inv1
        Rule.create(
            [
                [U("p"), B(inverse_p), U("q"), g],
                [U("x"), U("p"), U("y"), g],
            ],
            [[U("y"), U("q"), U("x"), g]],
        ),
        # prp-inv2
        Rule.create(
            [
                [U("p"), B(inverse_p), U("q"), g],
                [U("x"), U("q"), U("y"), g],
            ],
            [[U("y"), U("p"), U("x"), g]],
        ),
    ]
