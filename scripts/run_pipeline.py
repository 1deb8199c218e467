"""spark-submit entry point for the KG-construction pipeline.

Cluster deployment (the north-rule invocation shape):

    zip -r rify_spark.zip rify_spark/
    spark-submit --py-files rify_spark.zip scripts/run_pipeline.py \
        --input  <path to code_files table (parquet/Iceberg layout)> \
        --output <output dir> \
        --checkpoint-dir <resumable fixpoint checkpoints> \
        [--resume] [--link-threshold 0.99]

Local smoke (synthetic corpus):

    PYTHONPATH=. python scripts/run_pipeline.py --synthetic 100x8 \
        --output /tmp/kg_out

Outputs under --output:
    triples.parquet     raw extracted candidate quads
    links.parquet       scored entity links
    canonical.parquet   canonicalized quads
    derived.parquet     inferred quads (depends_on closure)
    metrics.json        per-stage and per-iteration metrics
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input",
        help="code_files table: parquet path, Iceberg table directory, or "
        "catalog identifier (catalog.db.table)",
    )
    ap.add_argument("--synthetic", help="generate NxM synthetic corpus instead")
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--checkpoint-dir",
        help="stage-level checkpoints: triples/links/canonical-ID mapping/"
        "canonical land as commit-marked parquet stages; the fixpoint "
        "checkpoints per-iteration under <dir>/fixpoint",
    )
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--link-threshold", type=float, default=0.99)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not args.input and not args.synthetic:
        ap.error("one of --input / --synthetic is required")

    from rify_spark.pipeline import run_pipeline
    from rify_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="rify-kg-pipeline")

    if args.synthetic:
        from rify_spark.extract import code_files_df_distributed

        n_repos, n_modules = (int(x) for x in args.synthetic.split("x"))
        code_files = code_files_df_distributed(spark, n_repos, n_modules)
        input_id = f"synthetic:{n_repos}x{n_modules}"
    else:
        from rify_spark.io import read_table

        # parquet path, Iceberg directory, or catalog table identifier
        # (the north rule's Iceberg corpus is `catalog.db.code_files`)
        code_files = read_table(spark, args.input)
        input_id = args.input

    t0 = time.time()
    res = run_pipeline(
        spark,
        code_files,
        link_threshold=args.link_threshold,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        input_id=input_id,
    )
    for name, df in (
        ("triples", res.raw_triples),
        ("links", res.links),
        ("canonical", res.canonical),
        ("derived", res.derived),
    ):
        df.write.mode("overwrite").parquet(os.path.join(args.output, f"{name}.parquet"))
    res.metrics["total_wall_s"] = round(time.time() - t0, 2)
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(res.metrics, f, indent=2, default=str)
    print(json.dumps({"ok": True, **{k: v for k, v in res.metrics.items() if k != "iteration_metrics"}}))


if __name__ == "__main__":
    main()
