"""sf1 correctness gate (VERDICT r4 ask #4): run the n-PARAMETERIZED
dedup/ANN queries — the ones whose behavior changes with corpus size (IVF
auto-params, LSH banding, the auto-scaled embedding near-dup bit width,
the df-capped ngram join) — against the DuckDB oracle at the sf1
derivation (scripts/make_sf1.py), with the driver's own comparison
semantics (columns sorted by name, rows sorted, value equality).

Writes CORRECTNESS_SF1.json at the repo root."""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = os.environ.get("RIFY_SF1_DST", "/tmp/rify_sf1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# every query whose plan or parameters depend on n (the sf0.01 driver gate
# cannot exercise the auto-scaling branches)
PARAMETERIZED = [
    "dedup_minhash",
    "dedup_lsh_pairs",
    "dedup_lsh_recall",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_ngram_lsh_verify",
    # cluster structure is n-dependent (more/larger components at sf1, so
    # the CC loop's multi-round + DuckDB recursive-reachability paths are
    # actually exercised)
    "dedup_clusters",
    "docs_keep",
    "docs_sample_stratified",
    # eval sample and n-gram universe grow with n (~1k eval docs at sf1)
    "docs_decontaminate",
    "dedup_embedding_pairs",
    "dedup_embedding_recall",
    "knn_lsh_buckets",
    "knn_lsh",
    "knn_lsh_recall",
    "knn_ivf_cells",
    "knn_ivf",
    "knn_ivf_recall",
    "knn_ivf_refined_recall",
    # SQ8 scale factors are corpus maxima (per-dimension MAX(ABS)), and
    # the quantized-vs-exact recall depends on the candidate density
    "emb_sq8_codes",
    "knn_sq8_recall",
    "knn_sq8_refined_recall",
    # the shuffle rank is a bijection onto 1..n — n-parameterized by
    # construction (offset arithmetic across 10x more partitions)
    "docs_shuffle_rank",
]


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9) if not math.isnan(v) else "nan"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from rify_spark.session import get_spark

    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run scripts/make_sf1.py first")
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="correctness-sf1",
        shuffle_partitions=2 * CPUS,
    )
    entrymod._ship(spark)
    con = duckdb.connect()
    for t in TABLES:
        # make_sf1.py writes Spark-style parquet DIRECTORIES
        path = f"{SF1}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict = {}
    for name in PARAMETERIZED:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF1)
            srows = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = _normalize(dcols, res.fetchall())
            results[name] = {
                "rows_spark": len(srows),
                "rows_oracle": len(drows),
                "rows_match": len(srows) == len(drows),
                "cols_match": sorted(sdf.columns) == sorted(dcols),
                "values_match": srows == drows,
                "wall_s": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 — gate must report, not die
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
        print(name, results[name], flush=True)
    n_emb, = con.execute("SELECT count(*) FROM embeddings").fetchone()
    n_docs, = con.execute("SELECT count(*) FROM documents").fetchone()
    out = {
        "sf_dir": SF1,
        "n_documents": n_docs,
        "n_embeddings": n_emb,
        "queries": results,
        "all_green": all(
            r.get("rows_match") and r.get("cols_match") and r.get("values_match")
            for r in results.values()
        ),
    }
    with open(os.path.join(REPO, "CORRECTNESS_SF1.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"all_green": out["all_green"]}))


if __name__ == "__main__":
    main()
