"""Shipped RDFS-style ruleset (rify_spark/rulesets.py): entailment core
over a tiny hand-checked ontology."""

from rify_spark import infer
from rify_spark.rulesets import rdfs_rules

G = "g"


def test_rdfs_core_entailments(spark):
    facts = [
        ("fido", "rdf:type", "Dog", G),
        ("Dog", "rdfs:subClassOf", "Mammal", G),
        ("Mammal", "rdfs:subClassOf", "Animal", G),
        ("fido", "has_owner", "alice", G),
        ("has_owner", "rdfs:subPropertyOf", "knows", G),
        ("knows", "rdfs:subPropertyOf", "related_to", G),
        ("related_to", "rdfs:domain", "Agent", G),
        ("related_to", "rdfs:range", "Agent", G),
    ]
    out = set(infer(spark, facts, rdfs_rules()))
    assert ("Dog", "rdfs:subClassOf", "Animal", G) in out          # rdfs11
    assert ("fido", "rdf:type", "Mammal", G) in out                # rdfs9
    assert ("fido", "rdf:type", "Animal", G) in out                # rdfs9 (2 hops)
    assert ("has_owner", "rdfs:subPropertyOf", "related_to", G) in out  # rdfs5
    assert ("fido", "knows", "alice", G) in out                    # rdfs7
    assert ("fido", "related_to", "alice", G) in out               # rdfs7 (2 hops)
    assert ("fido", "rdf:type", "Agent", G) in out                 # rdfs2
    assert ("alice", "rdf:type", "Agent", G) in out                # rdfs3


def test_rdfs_graph_scoped(spark):
    # entailment must not leak across graphs
    facts = [
        ("fido", "rdf:type", "Dog", "g1"),
        ("Dog", "rdfs:subClassOf", "Mammal", "g2"),
    ]
    assert infer(spark, facts, rdfs_rules()) == []


def test_owl_property_characteristics(spark):
    from rify_spark.rulesets import owl_property_rules

    facts = [
        ("a", "conn", "b", G),
        ("b", "conn", "c", G),
        ("conn", "rdf:type", "owl:TransitiveProperty", G),
        ("x", "likes", "y", G),
        ("likes", "rdf:type", "owl:SymmetricProperty", G),
        ("p", "owns", "q", G),
        ("owns", "owl:inverseOf", "owned_by", G),
    ]
    out = set(infer(spark, facts, owl_property_rules()))
    assert ("a", "conn", "c", G) in out          # prp-trp
    assert ("y", "likes", "x", G) in out         # prp-symp
    assert ("q", "owned_by", "p", G) in out      # prp-inv1
    # prp-inv2: an owned_by fact implies the owns fact back
    facts2 = facts + [("r", "owned_by", "s", G)]
    out2 = set(infer(spark, facts2, owl_property_rules()))
    assert ("s", "owns", "r", G) in out2
