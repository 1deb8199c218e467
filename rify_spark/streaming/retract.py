"""Retraction for the incremental reasoner: DRed (delete / re-derive).

The reference engine is insert-only (``Reasoner::insert``, src/reasoner.rs —
there is no delete anywhere in its API), but a KG under construction must
also *unlearn*: upstream documents get corrected, extractions get recalled,
CDC streams carry deletes. This module adds the classic DRed algorithm
(Gupta/Mumick/Subrahmanian, "Maintaining views incrementally", SIGMOD'93)
over the existing FactStore + matcher machinery:

1. **Over-delete**: semi-naive *forward* propagation of the retracted
   premises through the rules against the pre-deletion store — every fact
   whose some derivation used a deleted fact lands in the cone ``D``
   (a superset of what must go).
2. **Subtract** ``D`` from the store.
3. **Re-derive**: a ``D``-member with an alternative derivation from the
   surviving facts comes back. This step is *goal-directed*: each rule
   head is unified against ``D`` first (``D`` is small — broadcast), so
   every body probe is a broadcast-keyed scan of the store, never a rule
   re-evaluation over the full store. Iterated to closure (a re-added fact
   can support further re-additions), delta-restricted after round 0.

Cost model (the 100-TB contract): steps 1 and 3 are O(cone) join work plus
O(store/cores) *scan* terms (body atoms probe the store's cached blocks in
place with pushed constant-slot filters — the same per-batch scan floor the
insert path pays, see STREAM_SCAN_CONTROL.json); step 2 is one O(store)
re-block exchange per retraction batch (retractions are rare events; the
store fold is the price of keeping the block invariants — co-partitioned,
checkpoint-backed — that make every *insert* batch cheap).

Correctness notes:
  * premises are first-class: a retracted quad that is *also* still
    asserted by a surviving premise is re-seeded by the caller
    (IncrementalReasoner tracks the premise set durably);
  * unconditional-rule heads are never deletable (they hold in the empty
    store) — the caller re-seeds ``uncond ∩ D`` the same way;
  * re-derivation only ever re-admits members of ``D``: anything derivable
    from the surviving store was derivable before, hence was either in
    ``D`` (removed, comes back) or never removed.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..infer import SPOG, FactStore, _union_all
from ..matcher import _atom_vars, atom_relation, bindings, project_heads, term_lit

# above this cone size the per-block broadcast joins would OOM the driver;
# the subtract falls back to a shuffle anti and re-derivation to shuffle
# joins (Catalyst/AQE pick sides) — same semantics, cluster-shaped plans
BROADCAST_MAX_ROWS = 1_000_000


def _maybe_broadcast(df: DataFrame, rows: int) -> DataFrame:
    return F.broadcast(df) if rows <= BROADCAST_MAX_ROWS else df


def overdelete(
    spark: SparkSession,
    facts_pre: DataFrame,
    lrules: list,
    retracted: DataFrame,
    max_rounds: Optional[int] = None,
    rows: Optional[int] = None,
) -> tuple:
    """The deletion cone: all facts some derivation of which used a
    retracted fact, transitively — computed by the SAME delta-restricted
    seed plans the insert fixpoint uses (matcher.bindings with delta at
    each body position), propagated over the PRE-deletion store.

    Heads of a satisfied body are in the store by induction (the body was
    satisfied pre-deletion, so its head was derived), so no store
    membership join is needed; the anti against the accumulated cone is
    what terminates the loop (D ⊆ store is finite and grows monotonically).

    Returns (cone DataFrame, cone rows, rounds) — the cone is a union of
    eager localCheckpoints, so consumers never replay the propagation.
    """
    dtype = facts_pre.schema["s"].dataType
    cond = [r for r in lrules if not r.unconditional]
    blocks = [retracted]
    # callers that already counted the (checkpointed) retraction set pass
    # `rows` and save one Spark job per retraction batch
    rows = [retracted.count() if rows is None else rows]
    delta, delta_rows = retracted, rows[0]
    rounds = 0
    while delta_rows > 0 and cond:
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(f"overdelete did not close in {max_rounds} rounds")
        rounds += 1
        delta_src = _maybe_broadcast(delta, delta_rows)
        plans = []
        for r in cond:
            for i in range(len(r.body)):
                b = bindings(facts_pre, r, delta=delta_src, seed_pos=i)
                plans.append(_project_head_quads(b, r, dtype))
        cand = _union_all(plans).dropDuplicates(SPOG)
        for db, dbn in zip(blocks, rows):
            cand = cand.join(_maybe_broadcast(db, dbn), SPOG, "left_anti")
        new = cand.localCheckpoint(eager=True)
        delta_rows = new.count()
        if delta_rows:
            blocks.append(new)
            rows.append(delta_rows)
            delta = new
    return _union_all(blocks), sum(rows), rounds


def _project_head_quads(binding_df: DataFrame, lrule, dtype) -> DataFrame:
    """Head projection without lineage extras — matcher.project_heads with
    its default ``extra=()`` does exactly this."""
    return project_heads(binding_df, lrule, dtype)


def _head_bindings(D: DataFrame, head_atom, dtype) -> tuple:
    """Unify one head atom against the deletion set: constant slots filter,
    variable slots project to ``v{slot}`` (repeated variables become
    intra-row equality filters). The result is one binding row per
    D-member this head can emit — the goal-directed seed relation."""
    conds = []
    first: dict = {}
    for colname, slot in zip(SPOG, head_atom):
        kind, val = slot
        if kind == "c":
            conds.append(F.col(colname) == term_lit(val, dtype))
        else:
            if val in first:
                conds.append(F.col(colname) == F.col(first[val]))
            else:
                first[val] = colname
    rel = D
    for c in conds:
        rel = rel.filter(c)
    if not first:
        # fully-constant head: 0-or-1-row gate (is the quad in the cone?)
        return rel.select(F.lit(1).alias("__h")).limit(1), []
    sel = [F.col(cn).alias(f"v{vi}") for vi, cn in sorted(first.items())]
    return rel.select(*sel).dropDuplicates(), sorted(first)


def _rederive_rule(
    facts: DataFrame,
    lrule,
    D: DataFrame,
    dtype,
    delta: Optional[DataFrame] = None,
) -> list:
    """D-members of ``lrule``'s heads derivable from ``facts`` — one plan
    per head atom (and, with ``delta``, per body seed position).

    Goal-direction: the accumulating join STARTS from the head-unification
    table (broadcast — O(cone) rows), so each body atom is probed with the
    head's variable bindings already pinned; a body atom sharing no
    variable with anything yet joined is a disconnected existence gate
    (crossJoin of a 0/1-row relation), exactly like the forward matcher.
    With ``delta`` (delta-restricted rounds after round 0), one body
    position reads the freshly re-added facts instead of the store."""
    plans = []
    for head_atom in lrule.head:
        hb, h_vars = _head_bindings(D, head_atom, dtype)
        seed_positions = range(len(lrule.body)) if delta is not None else (None,)
        for seed in seed_positions:
            # the caller size-gates the broadcast hint on D itself
            # (_maybe_broadcast); it rides through the projection
            acc = hb
            acc_vars = set(h_vars)
            order = _connected_order(lrule.body, acc_vars)
            for tag, pos in enumerate(order):
                src = delta if (delta is not None and pos == seed) else facts
                rel, rel_vars = atom_relation(src, lrule.body[pos], tag)
                shared = sorted(acc_vars & set(rel_vars))
                if shared:
                    acc = acc.join(rel, on=[f"v{v}" for v in shared], how="inner")
                else:
                    # disconnected component (vars joined by a later atom)
                    # or a fully-constant existence gate — same as the
                    # forward matcher's crossJoin fallback
                    acc = acc.crossJoin(rel)
                acc_vars |= set(rel_vars)
            plans.append(acc.select(*_head_cols(head_atom, dtype)))
    return plans


def _head_cols(head_atom, dtype) -> list:
    """Quad column expressions for one head atom under current bindings."""
    return [
        (term_lit(val, dtype) if kind == "c" else F.col(f"v{val}")).alias(colname)
        for colname, (kind, val) in zip(SPOG, head_atom)
    ]


def _connected_order(body, bound_vars: set) -> list:
    """Greedy body order for the goal-directed join: prefer atoms sharing
    variables with what is already bound (head vars first), then more
    constants. Ordering is not semantics-bearing (same binding set)."""
    remaining = list(range(len(body)))
    out: list = []
    avail = set(bound_vars)
    while remaining:
        remaining.sort(
            key=lambda i: (
                -len(_atom_vars(body[i]) & avail),
                -sum(1 for s in body[i] if s[0] == "c"),
                i,
            )
        )
        nxt = remaining.pop(0)
        out.append(nxt)
        avail |= _atom_vars(body[nxt])
    return out


def rederive(
    spark: SparkSession,
    store: FactStore,
    lrules: list,
    cone: DataFrame,
    cone_rows: int,
    reseed: DataFrame,
    dtype,
    max_rounds: Optional[int] = None,
) -> tuple:
    """DRed step 3: members of the (already subtracted) cone that survive.

    ``reseed`` — cone members that are facts by fiat (surviving premises,
    unconditional heads) — seeds the re-added set; round 0 then finds cone
    members with a derivation entirely inside (store ∪ re-added); later
    rounds are delta-restricted to derivations using the previous round's
    re-additions. Returns (readded union DataFrame, readded rows, rounds);
    both the per-round blocks and the remaining-cone frontier are eager
    localCheckpoints (bounded plans, no replay).
    """
    readd_blocks = []
    readd_rows = 0
    d_rem = cone
    d_rem_rows = cone_rows
    r0 = reseed.localCheckpoint(eager=True)
    n0 = r0.count()
    if n0:
        readd_blocks.append(r0)
        readd_rows += n0
        d_rem = d_rem.join(_maybe_broadcast(r0, n0), SPOG, "left_anti").localCheckpoint(
            eager=True
        )
        d_rem_rows = d_rem.count()
    cond = [r for r in lrules if not r.unconditional]
    delta: Optional[DataFrame] = None  # round 0 is unrestricted
    delta_rows = 0
    rounds = 0
    while d_rem_rows > 0 and cond:
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(f"rederive did not close in {max_rounds} rounds")
        rounds += 1
        facts = _union_all([store.union()] + readd_blocks)
        d_b = _maybe_broadcast(d_rem, d_rem_rows)
        delta_b = _maybe_broadcast(delta, delta_rows) if delta is not None else None
        plans: list = []
        for r in cond:
            plans.extend(_rederive_rule(facts, r, d_b, dtype, delta=delta_b))
        if not plans:
            break
        new = (
            _union_all(plans)
            .dropDuplicates(SPOG)
            .join(d_b, SPOG, "left_semi")  # safety: only cone members return
            .localCheckpoint(eager=True)
        )
        n = new.count()
        if n == 0:
            break
        readd_blocks.append(new)
        readd_rows += n
        delta, delta_rows = new, n
        d_rem = d_rem.join(_maybe_broadcast(new, n), SPOG, "left_anti").localCheckpoint(
            eager=True
        )
        d_rem_rows = d_rem.count()
    readded = _union_all(readd_blocks) if readd_blocks else cone.limit(0)
    return readded, readd_rows, rounds


def subtract_plan(store: FactStore, cone: DataFrame, cone_rows: int) -> DataFrame:
    """The UNEXECUTED fold scan ``store_subtract`` runs: the cached block
    chain anti-joined against the (broadcast-when-small) cone. Exposed
    separately so the physical plan is auditable before execution
    (scripts/explain_audit.py): the store side must read its cached
    s-partitioned blocks with no Exchange; the cone side broadcasts below
    BROADCAST_MAX_ROWS, else exchanges once to the store's width."""
    anti_side = (
        F.broadcast(cone)
        if cone_rows <= BROADCAST_MAX_ROWS
        else cone.repartition(store.partitions, "s")
    )
    return store.union().join(anti_side, SPOG, "left_anti")


def store_subtract(store: FactStore, cone: DataFrame, cone_rows: int) -> None:
    """Remove the cone from the live FactStore in place: one fold of the
    block chain through an anti-join and a fresh checkpoint, at the store's
    existing width (the cone side broadcasts when small, otherwise
    exchanges once to the store's s-partitioning). O(store) — the price of
    re-establishing the block invariants every insert batch relies on."""
    if store.total_rows == 0 or cone_rows == 0:
        return
    old = list(store.blocks)
    flat = subtract_plan(store, cone, cone_rows).localCheckpoint(eager=False)
    nb = store._mk_block(flat)
    n = nb.count()  # fills the cache (and the lazy checkpoint) in one job
    store.blocks = [nb]
    store.block_rows = [n]
    store.total_rows = n
    store.last_src = flat
    store.just_compacted = True
    for b in old:
        b.unpersist()


def unconditional_head_quads(spark: SparkSession, lrules: list, schema: str) -> DataFrame:
    """The (fully-constant, range-restriction-guaranteed) head quads of
    unconditional rules — never deletable: they hold in the empty store."""
    rows = []
    seen = set()
    for r in lrules:
        if not r.unconditional:
            continue
        for atom in r.head:
            quad = tuple(slot[1] for slot in atom)
            if quad not in seen:
                seen.add(quad)
                rows.append(quad)
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
