"""Retraction (DRed) soak -> RETRACT_RUN.json.

Streams a k -> k//2 tree into an IncrementalReasoner in id-ordered insert
batches, and after every RETRACT_EVERY-th insert batch RETRACTS all parent
edges with k % 5 == 0 from the window just inserted. Shortcut 'ancestor'
premises are planted for k % 9 == 0, so retractions hit all three DRed
paths at scale: pure cone deletion (k % 5, no shortcut), premise re-seed +
transitive re-derivation (k % 45: the retracted edge is shadowed by a
surviving shortcut premise), and multi-round over-delete (deleted links
stack across levels). One mid-run restart re-seeds the live store AND the
premise set from the durable bucketed parquet.

Exactness: the final store has a closed form, no oracle engine needed.
With alive[k] := (edge k kept) or (shortcut at k), the ancestor count of
node k is anc[k] = alive[k] ? 1 + anc[k//2] : 0 (parents precede children
in id order, so one ascending pass computes it), and

    store rows = surviving parent premises + sum_k anc[k]

(shortcut premises are always ancestor pairs of their own link, so they
are already inside the sum). The driver verifies the total AND a sampled
per-node ancestor set.

Env: RIFY_RSOAK_TREE_N (default 300_000), RIFY_RSOAK_BATCHES (20),
RIFY_RSOAK_RETRACT_EVERY (4), RIFY_RSOAK_CPUS (16), RIFY_RSOAK_RESTART_AT
(10), RIFY_RSOAK_OUT.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("RIFY_RSOAK_CPUS", "16"))
TREE_N = int(os.environ.get("RIFY_RSOAK_TREE_N", "300000"))
BATCHES = int(os.environ.get("RIFY_RSOAK_BATCHES", "20"))
RETRACT_EVERY = int(os.environ.get("RIFY_RSOAK_RETRACT_EVERY", "4"))
RESTART_AT = int(os.environ.get("RIFY_RSOAK_RESTART_AT", "10"))
OUT = os.environ.get("RIFY_RSOAK_OUT", os.path.join(REPO, "RETRACT_RUN.json"))

G = "graph://tree"


def expected_totals(tree_n: int, retracted: set) -> tuple:
    """Closed-form survivor counts: (parent premises, ancestor pairs)."""
    anc = [0] * tree_n
    pairs = 0
    for k in range(1, tree_n):
        alive = (k not in retracted) or (k % 9 == 0)
        if alive:
            anc[k] = 1 + anc[k // 2]
        pairs += anc[k]
    premises = (tree_n - 1) - len(retracted)
    return premises, pairs


def main() -> None:
    from pyspark.sql import functions as F

    from rify_spark.rules import Bound as B, Rule, Unbound as U
    from rify_spark.session import get_spark
    from rify_spark.streaming.incremental import IncrementalReasoner

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="rify-retract-soak",
        shuffle_partitions=2 * CPUS,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    store_dir = "/tmp/rify_rsoak_store"
    for suffix in ("", ".__old__", ".__compact__", ".__premises__",
                   ".__premises__.__old__", ".__premises__.__compact__",
                   ".__retract_journal__"):
        shutil.rmtree(store_dir + suffix, ignore_errors=True)

    rules = [
        Rule.create(
            [[U("a"), B("parent"), U("b"), U("g")]],
            [[U("a"), B("ancestor"), U("b"), U("g")]],
        ),
        Rule.create(
            [
                [U("a"), B("ancestor"), U("b"), U("g")],
                [U("b"), B("ancestor"), U("c"), U("g")],
            ],
            [[U("a"), B("ancestor"), U("c"), U("g")]],
        ),
    ]

    def mk_reasoner() -> IncrementalReasoner:
        return IncrementalReasoner(spark, rules, store_dir, compact_files_every=16)

    def _edges(ids, pred="parent"):
        return ids.select(
            F.concat(F.lit("node:"), F.col("id")).alias("s"),
            F.lit(pred).alias("p"),
            F.concat(F.lit("node:"), (F.col("id") / 2).cast("long")).alias("o"),
            F.lit(G).alias("g"),
        )

    def insert_df(lo: int, hi: int):
        ids = spark.range(lo, hi, 1, CPUS)
        edges = _edges(ids)
        shortcuts = _edges(ids.filter(F.col("id") % 9 == 0), pred="ancestor")
        return edges.unionByName(shortcuts)

    def retract_df(lo: int, hi: int):
        return _edges(spark.range(lo, hi, 1, CPUS).filter(F.col("id") % 5 == 0))

    r = mk_reasoner()
    step = (TREE_N - 1) // BATCHES + 1
    ops = []
    retracted: set = set()
    inserted_hi = 1
    restarted = False
    t_start = time.time()
    for i in range(BATCHES):
        lo, hi = 1 + i * step, min(1 + (i + 1) * step, TREE_N)
        if lo >= hi:
            break
        if i == RESTART_AT and not restarted:
            r._reset_live_store()
            r = mk_reasoner()
            restarted = True
        t0 = time.time()
        r.process_batch(insert_df(lo, hi), i)
        inserted_hi = hi
        store = r._live_store()
        ops.append(
            {
                "op": "insert",
                "batch": i,
                "rows": hi - lo,
                "wall_s": round(time.time() - t0, 3),
                "store_rows": store.total_rows,
                "restart": i == RESTART_AT,
            }
        )
        print(json.dumps(ops[-1]), file=sys.stderr)
        if (i + 1) % RETRACT_EVERY == 0:
            t0 = time.time()
            m = r.retract_batch(retract_df(lo, hi))
            retracted |= {k for k in range(lo, hi) if k % 5 == 0}
            store = r._live_store()
            ops.append(
                {
                    "op": "retract",
                    "batch": i,
                    "wall_s": round(time.time() - t0, 3),
                    "store_rows": store.total_rows,
                    **m,
                }
            )
            print(json.dumps(ops[-1]), file=sys.stderr)

    # --- exactness ---------------------------------------------------------
    exp_prem, exp_pairs = expected_totals(inserted_hi, retracted)
    facts = r.facts()
    got_prem = facts.filter(F.col("p") == "parent").count()
    got_pairs = facts.filter(F.col("p") == "ancestor").count()
    exact = got_prem == exp_prem and got_pairs == exp_pairs

    # sampled per-node ancestor sets (every 977th node): the chain up to the
    # first dead link, exactly
    sample_err = 0
    anc_rows = (
        facts.filter(F.col("p") == "ancestor")
        .withColumn("k", F.split("s", ":")[1].cast("long"))
        .filter(F.col("k") % 977 == 0)
        .select("k", "o")
        .collect()
    )
    got_anc: dict = {}
    for row in anc_rows:
        got_anc.setdefault(row["k"], set()).add(row["o"])
    for k in range(977, inserted_hi, 977):
        chain = []
        j = k
        while j >= 1 and ((j not in retracted) or (j % 9 == 0)):
            chain.append(f"node:{j // 2}")
            j //= 2
        if set(chain) != got_anc.get(k, set()):
            sample_err += 1

    out = {
        "tree_n": inserted_hi,
        "batches": BATCHES,
        "retract_every": RETRACT_EVERY,
        "retracted_premises": len(retracted),
        "expected": {"premises": exp_prem, "ancestor_pairs": exp_pairs},
        "got": {"premises": got_prem, "ancestor_pairs": got_pairs},
        "exact": exact,
        "sampled_nodes_mismatched": sample_err,
        "restart_at": RESTART_AT,
        "total_wall_s": round(time.time() - t_start, 1),
        "ops": ops,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "ops"}))
    if not exact or sample_err:
        sys.exit(1)


if __name__ == "__main__":
    main()
