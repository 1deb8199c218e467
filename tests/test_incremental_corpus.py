"""End-to-end incremental corpus maintenance: corpus_diff decides which
files re-extract; the signed-batch reasoner retracts the old extractions
and asserts the new ones; the resulting closure must EQUAL a from-scratch
batch run over the new snapshot — the O(changed)-not-O(corpus) maintenance
contract the snapshot/diff ops exist to feed.

Uses the real pipeline stages (pandas-UDF extraction, blocked link
scoring, CC canonicalization with a mapping built over the full versioned
file set — incremental re-canonicalization is out of scope and stated so
in ops/snapshot.py) and the real DRed retraction path."""

import pytest
from pyspark.sql import functions as F

from rify_spark.extract.canonicalize import canonicalize_quads
from rify_spark.extract.code import extract_triples
from rify_spark.ops.snapshot import corpus_diff, latest_snapshot
from rify_spark.pipeline import (
    candidate_links,
    code_ontology_rules,
    link_mapping,
)
from rify_spark.streaming import IncrementalReasoner

SCHEMA = "repo string, path string, commit long, lang string, content string"

FILES = [
    # a.py v1 imports b; v2 (commit 7) drops every import -> its base
    # AND derived dependencies must retract
    ("r1", "a.py", 1, "python", "import b\ndef fa(): pass"),
    ("r1", "a.py", 7, "python", "def fa(): pass"),
    # b.py: unchanged across the cuts
    ("r1", "b.py", 2, "python", "import c\ndef fb(): pass"),
    ("r1", "c.py", 3, "python", "def fc(): pass"),
    # d.py first appears between the cuts -> new base + derived deps
    ("r1", "d.py", 8, "python", "import b\ndef fd(): pass"),
]
V_OLD, V_NEW = 5, 10


def _closure(spark, quads_df, rules):
    from rify_spark.api import infer

    premises = [tuple(r) for r in quads_df.collect()]
    if not premises:
        return set()
    return set(premises) | {
        tuple(q) for q in infer(spark, premises, rules)
    }


def test_diff_driven_maintenance_equals_batch(spark, tmp_path):
    files = spark.createDataFrame(FILES, SCHEMA)
    snap1 = latest_snapshot(files, asof=F.lit(V_OLD))
    snap2 = latest_snapshot(files, asof=F.lit(V_NEW))

    # stable canonical mapping over the FULL versioned set (entities are
    # path-level, so versions do not add nodes)
    all_triples = extract_triples(files)
    mapping = link_mapping(candidate_links(all_triples))

    def canon(snapshot_df):
        return canonicalize_quads(extract_triples(snapshot_df), mapping)

    rules = code_ontology_rules()
    expected = _closure(spark, canon(snap2), rules)
    # sanity on the fixture: v2 adds d->b (direct) and d->c (derived),
    # and a's dependencies are gone
    b_canon = {r.node: r.canon for r in mapping.collect()}.get(
        "mod://b", "mod://b"
    )
    assert any(q[0].endswith("d.py") and q[1] == "depends_on" for q in expected)
    assert not any(
        q[0].endswith("a.py") and q[1] == "depends_on" for q in expected
    )

    # incremental path: seed with snapshot v1, maintain with the diff
    r = IncrementalReasoner(spark, rules, str(tmp_path / "store"))
    r.process_batch(canon(snap1), 0)
    closure1 = {tuple(x) for x in r.facts().collect()}
    assert any(
        q[0].endswith("a.py") and q[2].endswith("c.py") or q[2] == b_canon
        for q in closure1
        if q[1] == "depends_on"
    )

    diff = corpus_diff(files, F.lit(V_OLD), F.lit(V_NEW))
    changes = {(row.repo, row.path): row.change for row in diff.collect()}
    assert changes == {("r1", "a.py"): "modified", ("r1", "d.py"): "added"}

    keys = diff.select("repo", "path")
    old_changed = snap1.join(
        keys.filter(F.lit(True)), ["repo", "path"], "left_semi"
    )
    new_changed = snap2.join(keys, ["repo", "path"], "left_semi")
    minus = canon(old_changed).withColumn("op", F.lit("-"))
    plus = canon(new_changed).withColumn("op", F.lit("+"))
    r.process_signed_batch(minus.unionByName(plus), 1)

    got = {tuple(x) for x in r.facts().collect()}
    assert got == expected
