"""Semi-naive fixpoint of DataFrame self-joins.

Spark-native reimplementation of the reference's worklist loop
(``low_infer``, src/infer.rs:29-101, and the lineage-carrying variant
``low_prove``, src/prove.rs:90-165):

  reference (sequential)                 this module (set-at-a-time)
  ------------------------------------   -----------------------------------
  BTreeSet worklist of novel quads       checkpointed `delta` DataFrame
  insert + 6 sorted permutation indexes  union of checkpointed deltas
  apply_related per (new quad, rule)     k delta-substituted join plans per
                                         k-atom rule, unioned (matcher.py)
  `!rs.contains && !adding.contains`     dropDuplicates + left_anti vs facts
  arguments: BTreeMap or_insert          row_number first-wins per novel quad
  loop until worklist empty              loop until delta.count() == 0

The reference interleaves insertions within a batch (src/infer.rs:59-60);
because derivation is monotone, the fixpoint *set* is identical to this
synchronous formulation — each of our iterations makes every quad derivable
from (facts ∪ delta) with ≥1 delta atom visible, which is exactly the
visibility the reference's in-batch interleaving provides by the end of a
batch. Only per-quad first-derivation attribution can differ on ties; see
prove.py for the deterministic tie-break.

Scale design:
  * each iteration's delta is checkpointed (local or parquet) — mandatory,
    otherwise iterative-join lineage grows without bound;
  * `facts` is kept as a union of checkpointed deltas (no recompute risk,
    no extra materialization pass per iteration);
  * the delta side of every join is broadcast while it fits
    (`broadcast_delta_max_rows`), turning the hot inner joins into
    shuffle-free broadcast-hash joins against the large fact set;
  * AQE (incl. skew-join splitting) is expected on; hot-predicate skew is
    additionally mitigated by the dictionary's hash ids spreading the key
    space, and per-predicate stats feed the static join order.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager
from .matcher import bindings, lineage_cols, project_heads
from .rules import LoweredRule

SPOG = ["s", "p", "o", "g"]


@dataclass
class InferConfig:
    encode_terms: bool = True
    collision_audit: bool = True
    # delta-side broadcast cutoff (rows); above it joins fall back to
    # shuffle joins with AQE skew handling. Measured on the 1M-node-tree
    # closure: broadcasting a 4M-row delta cut its iteration 67s -> 21s
    # (bindings joins stop shuffling the fact side); an 8M-row delta
    # regressed, so the cutoff sits between. ~5M quad rows ≈ 160 MB — a
    # routine broadcast on cluster-class executors.
    broadcast_delta_max_rows: int = 5_000_000
    # persistent checkpoints (resumable); None -> localCheckpoint only
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    max_iterations: Optional[int] = None
    # per-predicate cardinality stats for join ordering; disabled when the
    # predicate vocabulary is unexpectedly large
    use_stats: bool = True
    stats_max_predicates: int = 10_000
    # collect threshold for driver-side proof argument recall
    collect_arguments_max_rows: int = 1_000_000


@dataclass
class FixpointResult:
    facts: DataFrame                 # premises ∪ everything derived (deduped)
    arguments: Optional[DataFrame]   # lineage (prove mode): spog, rule_index, inst, iteration
    metrics: list = field(default_factory=list)
    iterations: int = 0
    facts_rows: int = 0


def _union_all(dfs: list) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _predicate_stats(facts: DataFrame, cfg: InferConfig) -> Optional[dict]:
    if not cfg.use_stats:
        return None
    rows = facts.groupBy("p").count().limit(cfg.stats_max_predicates + 1).collect()
    if len(rows) > cfg.stats_max_predicates:
        return None
    return {r["p"]: r["count"] for r in rows}


def job_fingerprint(lrules: list, dtype_str: str, lineage: bool) -> str:
    """Deterministic identity of a fixpoint job: the lowered rule set (body/
    head slot structure and constant values), the engine value type, and
    whether lineage is maintained. Stamped into checkpoint meta.json so a
    resume against a different job's directory is refused."""
    h = hashlib.sha256()
    h.update(f"dtype={dtype_str};lineage={lineage};".encode())
    for r in lrules:
        h.update(f"r{r.index}:{r.body!r}->{r.head!r};n={r.n_vars}".encode())
    return h.hexdigest()[:32]


def unconditional_heads(lrules: list) -> list:
    """Driver-side literal head quads of empty-body rules, in rule order.

    Range restriction guarantees these heads are all-constant
    (src/rule.rs:72-86), so no join is needed — mirrors the pre-loop seeding
    at src/infer.rs:36-50 / src/prove.rs:100-121. Returns
    [(s, p, o, g, rule_index), ...] with first-wins dedup across rules.
    """
    out = []
    seen = set()
    for r in lrules:
        if not r.unconditional:
            continue
        for atom in r.head:
            quad = tuple(slot[1] for slot in atom)
            if quad not in seen:
                seen.add(quad)
                out.append((*quad, r.index))
    return out


def fixpoint(
    spark: SparkSession,
    facts0: DataFrame,
    lrules: list,
    cfg: Optional[InferConfig] = None,
    lineage: bool = False,
    goals: Optional[DataFrame] = None,
    initial_arguments: Optional[DataFrame] = None,
    delta0: Optional[DataFrame] = None,
) -> FixpointResult:
    """Run rules to fixpoint over an already-deduplicated quad DataFrame.

    ``facts0`` must be deduplicated and already include unconditional-rule
    heads (see :func:`seed_facts`). With ``lineage=True`` a first-wins
    arguments table is maintained; with ``goals`` the loop exits early once
    every goal quad is present (src/prove.rs:124). ``delta0`` restricts the
    first round's worklist (incremental mode: ``facts0`` minus ``delta0``
    is already a fixpoint, so only derivations touching ``delta0`` can be
    new); by default the whole of ``facts0`` is the first worklist.
    """
    cfg = cfg or InferConfig()
    dtype = facts0.schema["s"].dataType
    cond_rules: list = [r for r in lrules if not r.unconditional]
    ckpt = (
        CheckpointManager(
            spark,
            cfg.checkpoint_dir,
            fingerprint=job_fingerprint(lrules, dtype.simpleString(), lineage),
        )
        if cfg.checkpoint_dir
        else None
    )

    metrics: list = []
    arguments: Optional[DataFrame] = None
    it = 0

    resumed = None
    if ckpt and cfg.resume:
        resumed = ckpt.latest()
    if resumed is not None:
        it, facts, delta, arguments, meta = resumed
        facts_rows = meta.get("facts_rows", facts.count())
        delta_rows = meta.get("delta_rows", delta.count())
        # F_old for the next round (non-redundant decomposition)
        facts_old = facts.join(delta, SPOG, "left_anti").localCheckpoint(eager=True)
        metrics.append({"iteration": it, "resumed": True, "delta_rows": delta_rows})
    else:
        facts = facts0.localCheckpoint(eager=True)
        facts_rows = facts.count()
        if delta0 is not None:
            delta = delta0.localCheckpoint(eager=True)
            delta_rows = delta.count()
            facts_old = facts.join(delta, SPOG, "left_anti").localCheckpoint(
                eager=True
            )
        else:
            delta = facts
            delta_rows = facts_rows
            facts_old = facts.limit(0)
        if lineage:
            # iteration-0 arguments (unconditional-rule heads) come from the
            # caller; see prove.py.
            arguments = (
                initial_arguments
                if initial_arguments is not None
                else spark.createDataFrame(
                    [],
                    f"s {dtype.simpleString()}, p {dtype.simpleString()}, "
                    f"o {dtype.simpleString()}, g {dtype.simpleString()}, "
                    f"rule_index long, inst array<{dtype.simpleString()}>, iteration long",
                )
            )

    goals_n = goals.count() if goals is not None else 0

    def goals_met() -> bool:
        if goals is None or goals_n == 0:
            return goals is not None
        return goals.join(facts, SPOG, "left_anti").count() == 0

    stats = _predicate_stats(facts, cfg) if cond_rules else None

    while delta_rows > 0 and cond_rules:
        if goals is not None and goals_met():
            break
        if cfg.max_iterations is not None and it >= cfg.max_iterations:
            break
        it += 1
        t0 = time.time()

        delta_src = (
            F.broadcast(delta)
            if delta_rows <= cfg.broadcast_delta_max_rows
            else delta
        )
        plans = []
        for r in cond_rules:
            extra = lineage_cols(r, dtype) if lineage else ()
            for i in range(len(r.body)):
                b = bindings(
                    facts,
                    r,
                    delta=delta_src,
                    seed_pos=i,
                    stats=stats,
                    facts_old=facts_old,
                )
                plans.append(project_heads(b, r, dtype, extra))
        cand = _union_all(plans)

        if lineage:
            novel = cand.join(facts, SPOG, "left_anti")
            w = Window.partitionBy(*SPOG).orderBy("rule_index", "inst")
            picked = (
                novel.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
                .withColumn("iteration", F.lit(it).cast("long"))
            )
            new_full = picked.localCheckpoint(eager=True)
            delta_rows = new_full.count()
            new = new_full.select(*SPOG)
            if delta_rows:
                arguments = arguments.unionByName(new_full)
                # flatten the accumulating union periodically so long prove
                # fixpoints keep bounded plan depth
                if it % 16 == 0:
                    arguments = arguments.localCheckpoint(eager=True)
        else:
            new = (
                cand.dropDuplicates(SPOG)
                .join(facts, SPOG, "left_anti")
                .localCheckpoint(eager=True)
            )
            delta_rows = new.count()

        if delta_rows == 0:
            metrics.append(
                {"iteration": it, "delta_rows": 0, "wall_s": round(time.time() - t0, 4)}
            )
            break

        facts_old = facts
        facts = facts.unionByName(new)
        facts_rows += delta_rows
        delta = new
        m = {
            "iteration": it,
            "delta_rows": delta_rows,
            "facts_rows": facts_rows,
            "wall_s": round(time.time() - t0, 4),
            "delta_partitions": new.rdd.getNumPartitions(),
        }
        metrics.append(m)
        if ckpt:
            facts, delta, arguments = ckpt.save_iteration(
                it,
                facts,
                delta,
                arguments,
                extra_meta={"facts_rows": facts_rows, "delta_rows": delta_rows},
            )

    return FixpointResult(
        facts=facts,
        arguments=arguments,
        metrics=metrics,
        iterations=it,
        facts_rows=facts_rows,
    )


def seed_facts(
    spark: SparkSession,
    premises: DataFrame,
    lrules: list,
    dtype_str: str = "string",
) -> DataFrame:
    """Deduplicated premises ∪ unconditional-rule heads (src/infer.rs:32-50)."""
    facts = premises.dropDuplicates(SPOG)
    heads = unconditional_heads(lrules)
    if heads:
        hdf = spark.createDataFrame(
            [h[:4] for h in heads],
            f"s {dtype_str}, p {dtype_str}, o {dtype_str}, g {dtype_str}",
        )
        facts = facts.unionByName(hdf).dropDuplicates(SPOG)
    return facts
