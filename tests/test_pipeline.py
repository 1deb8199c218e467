"""KG-construction pipeline tests: extraction, linking, canonicalization,
sha256 ingest invariant, end-to-end inference over the synthetic corpus."""

import hashlib

import pytest
from pyspark.sql import functions as F

from rify_spark.extract import (
    assert_sha256,
    code_files_df,
    code_files_rows,
    connected_components,
    extract_triples,
    reference_sha256,
)
from rify_spark.pipeline import candidate_links, code_ontology_rules, run_pipeline


def test_sha256_ingest_invariant(spark):
    rows = code_files_rows(n_repos=1, n_modules=2)
    df = code_files_df(spark, n_repos=1, n_modules=2)
    out = assert_sha256(df)
    got = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in out.select("repo", "path", "content_sha256").collect()
    }
    assert got == reference_sha256(rows)


def test_sha256_invariant_violation_detected(spark):
    df = code_files_df(spark, n_repos=1, n_modules=1).withColumn(
        "content_sha256", F.lit("0" * 64)
    )
    with pytest.raises(AssertionError):
        assert_sha256(df)


def test_extract_triples_closed_form(spark):
    # module 1 of repo_0: imports mod_0 and os; defines f_1_0..f_1_2;
    # f_1_j calls f_0_k (seeded) and f_1_{j-1} for j>0
    df = code_files_df(spark, n_repos=1, n_modules=2, n_funcs=2)
    triples = extract_triples(df)
    rows = {(r["s"], r["p"], r["o"]) for r in triples.collect()}
    m0 = "repo://repo_0/src/mod_0.py"
    m1 = "repo://repo_0/src/mod_1.py"
    assert (m1, "imports", "mod://mod_0") in rows
    assert (m0, "imports", "mod://os") in rows
    assert (f"{m0}#f_0_0", "defines", m0) in rows
    assert (f"{m1}#f_1_1", "defines", m1) in rows
    # f_1_1 calls f_1_0 (sibling chain)
    assert (f"{m1}#f_1_1", "calls", "name://f_1_0") in rows
    # every call object is an unresolved mention at this stage
    assert all(
        o.startswith("name://") for s, p, o in rows if p == "calls"
    )
    # graph column is the repo graph
    gs = {r["g"] for r in triples.select("g").distinct().collect()}
    assert gs == {"graph://repo_0"}


def test_candidate_links_resolve_names(spark):
    df = code_files_df(spark, n_repos=1, n_modules=2, n_funcs=2)
    triples = extract_triples(df)
    links = candidate_links(triples)
    got = {(r["mention"], r["entity"]) for r in links.collect()}
    assert (
        "name://f_0_0",
        "repo://repo_0/src/mod_0.py#f_0_0",
    ) in got
    assert ("mod://mod_0", "repo://repo_0/src/mod_0.py") in got
    # all kept links are exact-name matches (score 1.0)
    assert all(r["score"] == 1.0 for r in links.collect())


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [
            ("name://x", "repo://r/a.py#x"),
            ("name://y", "repo://r/b.py#y"),
            ("name://z", "name://y"),
        ],
        "a string, b string",
    )
    mapping = {r["node"]: r["canon"] for r in connected_components(edges).collect()}
    assert mapping["name://x"] == "repo://r/a.py#x"
    assert mapping["repo://r/a.py#x"] == "repo://r/a.py#x"
    # chain: z - y - def(y): all collapse onto the repo:// entity
    assert mapping["name://z"] == "repo://r/b.py#y"
    assert mapping["name://y"] == "repo://r/b.py#y"


def test_pipeline_end_to_end(spark):
    df = code_files_df(spark, n_repos=1, n_modules=3, n_funcs=2)
    res = run_pipeline(spark, df)
    canon = {(r["s"], r["p"], r["o"]) for r in res.canonical.collect()}
    m = [f"repo://repo_0/src/mod_{i}.py" for i in range(3)]
    # canonicalization resolved call mentions to symbol IRIs
    assert any(
        s.startswith(m[1] + "#") and p == "calls" and o.startswith(m[0] + "#")
        for s, p, o in canon
    )
    derived = {(r["s"], r["p"], r["o"]) for r in res.derived.collect()}
    # direct deps from calls/imports, plus the transitive closure
    assert (m[1], "depends_on", m[0]) in derived
    assert (m[2], "depends_on", m[1]) in derived
    assert (m[2], "depends_on", m[0]) in derived  # transitive
    assert res.metrics["fixpoint_iterations"] >= 1


def test_ontology_rules_are_range_restricted():
    for r in code_ontology_rules():
        assert r.canonical_unbound()  # constructed without UnboundImplied


def test_pipeline_stage_checkpoints_and_resume(spark, tmp_path):
    """With checkpoint_dir every stage lands in parquet (meta.json commit
    marker, row/partition metrics); a resume run reuses every stage and a
    mismatched fingerprint is refused."""
    import json
    import os

    ckpt = str(tmp_path / "pipe_ckpt")
    df = code_files_df(spark, n_repos=1, n_modules=3, n_funcs=2)
    res1 = run_pipeline(spark, df, checkpoint_dir=ckpt)
    want = sorted(map(tuple, res1.derived.collect()))

    stages = ["triples", "links", "canonical_ids", "canonical"]
    for s in stages:
        meta = json.load(open(os.path.join(ckpt, s, "meta.json")))
        assert meta["rows"] > 0 and meta["partitions"] >= 1
        assert not meta.get("resumed")
    assert os.path.isdir(os.path.join(ckpt, "fixpoint"))
    sm = res1.metrics["stage_checkpoints"]
    assert set(stages) <= set(sm)

    # resume: all stages + the fixpoint restore from parquet, same result
    res2 = run_pipeline(spark, df, checkpoint_dir=ckpt, resume=True)
    assert sorted(map(tuple, res2.derived.collect())) == want
    assert all(res2.metrics["stage_checkpoints"][s]["resumed"] for s in stages)
    assert any(m.get("resumed") for m in res2.metrics["iteration_metrics"])

    # a different job (threshold changes the fingerprint) must refuse
    with pytest.raises(ValueError, match="different"):
        run_pipeline(spark, df, checkpoint_dir=ckpt, resume=True, link_threshold=0.5)


def test_small_input_mode_restores_session_confs(spark):
    """Small-input mode flips codegen/AQE off and shrinks the shuffle width
    for the duration of the run; all three session confs must come back to
    their prior values afterwards (including on the tiny test corpus, which
    always trips the 1 GiB gate)."""
    keys = (
        "spark.sql.codegen.wholeStage",
        "spark.sql.adaptive.enabled",
        "spark.sql.shuffle.partitions",
    )
    before = {k: spark.conf.get(k) for k in keys}
    df = code_files_df(spark, n_repos=1, n_modules=2, n_funcs=2)
    res = run_pipeline(spark, df)
    assert res.derived.count() > 0
    assert {k: spark.conf.get(k) for k in keys} == before
