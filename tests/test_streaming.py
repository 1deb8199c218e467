"""Incremental streaming inference tests: arriving quad files maintain the
closed fact store via foreachBatch + semi-naive delta fixpoints."""

import os

import pytest

from rify_spark.rules import Bound as B, Rule, Unbound as U
from rify_spark.streaming import IncrementalReasoner

DG = "dg"
SCHEMA = "s string, p string, o string, g string"


def _rules():
    return [
        Rule.create(
            [[U("a"), B("parent"), U("b"), B(DG)]],
            [[U("a"), B("anc"), U("b"), B(DG)]],
        ),
        Rule.create(
            [
                [U("a"), B("anc"), U("b"), B(DG)],
                [U("b"), B("anc"), U("c"), B(DG)],
            ],
            [[U("a"), B("anc"), U("c"), B(DG)]],
        ),
    ]


def _write_batch(spark, src, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _store_set(reasoner):
    return {tuple(r) for r in reasoner.facts().collect()}


def test_incremental_stream_maintains_closure(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    r = IncrementalReasoner(spark, _rules(), store)

    # batch 1: a chain fragment
    _write_batch(spark, src, [("a", "parent", "b", DG)], "b1")
    q = r.start_file_stream(src, ckpt, available_now=True)
    q.awaitTermination(120)
    s1 = _store_set(r)
    assert ("a", "anc", "b", DG) in s1
    assert len(s1) == 2  # premise + derived

    # batch 2: extend the chain; closure must connect across batches
    _write_batch(spark, src, [("b", "parent", "c", DG)], "b2")
    q = r.start_file_stream(src, ckpt, available_now=True)
    q.awaitTermination(120)
    s2 = _store_set(r)
    assert ("b", "anc", "c", DG) in s2
    assert ("a", "anc", "c", DG) in s2  # needs old facts ⋈ new delta
    assert len(s2) == 5

    # batch 3: duplicate + already-derivable arrivals change nothing
    _write_batch(
        spark, src, [("a", "parent", "b", DG), ("a", "anc", "c", DG)], "b3"
    )
    q = r.start_file_stream(src, ckpt, available_now=True)
    q.awaitTermination(120)
    assert _store_set(r) == s2


def test_incremental_matches_batch_engine(spark, tmp_path):
    """Stream in two halves == one-shot batch inference on the union."""
    from rify_spark.api import infer

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    nodes = [f"n{i}" for i in range(6)]
    edges = [
        (a, "parent", b, DG) for a, b in zip(nodes, nodes[1:])
    ]
    r = IncrementalReasoner(spark, _rules(), store)
    _write_batch(spark, src, edges[:2], "b1")
    r.start_file_stream(src, ckpt, available_now=True).awaitTermination(120)
    _write_batch(spark, src, edges[2:], "b2")
    r.start_file_stream(src, ckpt, available_now=True).awaitTermination(120)

    batch_out = set(infer(spark, edges, _rules()))
    streamed = _store_set(r) - set(edges)
    assert streamed == batch_out


def test_encode_terms_config_rejected(spark, tmp_path):
    from rify_spark.infer import InferConfig

    with pytest.raises(ValueError):
        IncrementalReasoner(
            spark, _rules(), str(tmp_path / "s"), InferConfig(encode_terms=True)
        )


def test_restart_recovers_from_bucketed_store(spark, tmp_path):
    """A NEW reasoner over the same durable store must continue exactly
    where the old one stopped (cold-start recovery path), and the durable
    store must be laid out in s-hash bucket partitions."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    ckpt2 = str(tmp_path / "ckpt2")
    os.makedirs(src, exist_ok=True)

    r1 = IncrementalReasoner(spark, _rules(), store)
    _write_batch(spark, src, [("a", "parent", "b", DG)], "b1")
    r1.start_file_stream(src, ckpt, available_now=True).awaitTermination(120)
    assert any(e.startswith("bucket=") for e in os.listdir(store))

    # simulated restart: fresh reasoner (empty live store), fresh source
    src2 = str(tmp_path / "src2")
    os.makedirs(src2, exist_ok=True)
    r2 = IncrementalReasoner(spark, _rules(), store)
    _write_batch(spark, src2, [("b", "parent", "c", DG)], "b2")
    r2.start_file_stream(src2, ckpt2, available_now=True).awaitTermination(120)
    s = _store_set(r2)
    assert ("a", "anc", "c", DG) in s  # joins recovered facts with new delta
    assert len(s) == 5


def test_store_compaction_bounds_files(spark, tmp_path):
    """With compact_files_every=1 every batch triggers compaction: the
    store ends with at most one data file per bucket, content unchanged."""
    import glob

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    r = IncrementalReasoner(
        spark, _rules(), store, n_buckets=4, compact_files_every=1
    )
    for i, edge in enumerate(
        [("a", "parent", "b", DG), ("b", "parent", "c", DG), ("c", "parent", "d", DG)]
    ):
        _write_batch(spark, src, [edge], f"b{i}")
        r.start_file_stream(src, ckpt, available_now=True).awaitTermination(120)
    s = _store_set(r)
    assert ("a", "anc", "d", DG) in s
    assert len(s) == 9  # 3 premises + 6 closure edges
    for bdir in glob.glob(os.path.join(store, "bucket=*")):
        files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
        assert len(files) <= 1, f"{bdir} not compacted: {files}"
