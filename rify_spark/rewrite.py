"""Linear-recursion doubling rewrite: O(depth) -> O(log depth) iterations.

The reference engine evaluates tuple-at-a-time (src/reasoner.rs:120-227),
so rule shape never changes its asymptotics. Set-at-a-time semi-naive
evaluation pays ONE distributed iteration per round, and the round count is
rule-shape-dependent: the transitive closure users naturally write as a
LINEAR recursion,

    reach(x, z) <- edge(x, y), reach(y, z)        (+ reach(x, y) <- edge(x, y))

extends paths one edge per round — a k-deep chain costs k Spark jobs, which
at 100-TB graph depths (10^5-link dependency/ancestry chains) is infeasible
regardless of per-job speed. The NONLINEAR form

    reach(x, z) <- reach(x, y), reach(y, z)

has the identical least fixpoint but doubles the reachable path length per
semi-naive round: ceil(log2 depth) + 2 jobs. This module detects the linear
shape and rewrites it to the doubling shape.

Soundness/completeness (per graph g; all relations graph-indexed by the
rules' own g slots): with ONLY the copy rule and the linear rule deriving
predicate H, the original least fixpoint solves H = C ∪ (B ∘ H) where C is
the copy rule's image of B — i.e. H = B* ∘ C, which (because C ⊆ B within
any graph where the linear rule fires) equals the transitive closure of C
under B-prefixing and is composition-closed: H ∘ H ⊆ H. The rewritten
program solves H = C ∪ (H ∘ H) = C+ — the same set. Both directions are a
two-line prefixpoint check: the original's LFP satisfies the rewritten
rules and vice versa. The rewrite is therefore applied only when

  * every head atom in the program has a CONSTANT predicate (a variable
    head predicate could derive H-facts out of band);
  * exactly two single-head rules derive H: one copy-shaped, one
    linear-shaped, over the SAME body predicate B != H;
  * s/o slots are distinct variables forming the chain (x,y,z), and each
    rule's g slots agree internally (one shared variable, or one constant,
    the variable distinct from the s/o variables).

Lineage mode is never rewritten: proofs must attribute the user's own
rules with their arities and instantiation orders (src/prove.rs:142-148).
Goal-directed mode is not rewritten either — the early-exit iteration
becomes evaluation-order-dependent, and prove is the only goal user.
"""

from __future__ import annotations

from dataclasses import replace


def _g_shape(atoms: list):
    """The shared g slot of ``atoms`` if they agree (same variable index or
    same constant value), else None."""
    g0 = atoms[0][3]
    for a in atoms[1:]:
        if a[3] != g0:
            return None
    return g0


def _copy_shape(rule):
    """``H(u,v,g) <- B(u,v,g)``: return ``(body_predicate, g_slot)``, else
    None."""
    if len(rule.body) != 1 or len(rule.head) != 1:
        return None
    (bs, bp, bo, _), (hs, hp, ho, _) = rule.body[0], rule.head[0]
    if bp[0] != "c" or hp[0] != "c" or bp[1] == hp[1]:
        return None
    slots = (bs, bo, hs, ho)
    if any(k != "v" for k, _ in slots):
        return None
    if bs == bo or (hs, ho) != (bs, bo):
        return None
    g = _g_shape(rule.body + rule.head)
    if g is None or (g[0] == "v" and g in (bs, bo)):
        return None
    return bp[1], g


def _linear_shape(rule):
    """``H(x,z,g) <- B(x,y,g), H(y,z,g)`` (either body order): return
    ``(edge_atom_index, edge_predicate_value)``, else None."""
    if len(rule.body) != 2 or len(rule.head) != 1:
        return None
    hs, hp, ho, _ = rule.head[0]
    if hp[0] != "c":
        return None
    preds = [a[1] for a in rule.body]
    if any(p[0] != "c" for p in preds):
        return None
    rec = [i for i, p in enumerate(preds) if p[1] == hp[1]]
    if len(rec) != 1:
        return None
    ri, ei = rec[0], 1 - rec[0]
    r_atom, e_atom = rule.body[ri], rule.body[ei]
    if e_atom[1][1] == hp[1]:
        return None  # already nonlinear
    slots = (r_atom[0], r_atom[2], e_atom[0], e_atom[2], hs, ho)
    if any(k != "v" for k, _ in slots):
        return None
    g = _g_shape(list(rule.body) + rule.head)
    if g is None:
        return None
    # chain: edge (x,y) then rec (y,z), head (x,z) — or rec first, mirrored
    if ei == 0:
        x, y1 = e_atom[0], e_atom[2]
        y2, z = r_atom[0], r_atom[2]
    else:
        x, y1 = r_atom[0], r_atom[2]
        y2, z = e_atom[0], e_atom[2]
    if y1 != y2:
        return None
    xyz = (x, y1, z)
    if len(set(xyz)) != 3 or (hs, ho) != (x, z):
        return None
    if g[0] == "v" and g in xyz:
        return None
    return ei, e_atom[1][1], g


def _nonlinear_shape(rule):
    """``H(x,z,g) <- H(x,y,g), H(y,z,g)``: return the shared g slot, else
    None."""
    if len(rule.body) != 2 or len(rule.head) != 1:
        return None
    hs, hp, ho, _ = rule.head[0]
    if hp[0] != "c":
        return None
    if any(a[1] != hp for a in rule.body):
        return None
    (as_, _, ao, _), (bs, _, bo, _) = rule.body
    if any(k != "v" for k, _ in (as_, ao, bs, bo, hs, ho)):
        return None
    # either body order: H(x,y),H(y,z) or H(y,z),H(x,y) — same Datalog
    for (ls, lo), (rs, ro) in (((as_, ao), (bs, bo)), ((bs, bo), (as_, ao))):
        if lo != rs:
            continue
        xyz = (ls, lo, ro)
        if len(set(xyz)) != 3 or (hs, ho) != (ls, ro):
            continue
        g = _g_shape(list(rule.body) + rule.head)
        if g is None or (g[0] == "v" and g in xyz):
            return None
        return g
    return None


def rewrite_linear_doubling(lrules: list) -> tuple:
    """Rewrite eligible linear recursions in a lowered-rule list.

    Returns ``(rules, rewrites)`` where ``rewrites`` is a list of
    ``{"rule_index", "predicate"}`` records (empty -> ``rules`` is the
    input list unchanged). Only the matched linear rules are replaced;
    indices, heads, variable spaces are untouched, so the rewritten list
    is a drop-in for every non-lineage fixpoint consumer.
    """
    for r in lrules:
        for atom in r.head:
            if atom[1][0] != "c":
                return lrules, []

    by_head_pred: dict = {}
    for r in lrules:
        for atom in r.head:
            by_head_pred.setdefault(atom[1][1], []).append(r)

    out = list(lrules)
    rewrites = []
    for pred, rules in by_head_pred.items():
        if len(rules) != 2:
            continue
        for copy_r, lin_r in (rules, rules[::-1]):
            copy = _copy_shape(copy_r)
            if copy is not None and len(lrules) == 2:
                # already-nonlinear TC pair (the reference's own benchmark
                # shape): no rule modification, but when the program is
                # EXACTLY this pair with per-graph (variable-g) semantics,
                # smart TC evaluates it with unique decompositions — the
                # nonlinear semi-naive loop re-derives each pair once per
                # split point. LFP here is (C ∪ H0)+, so tc.py seeds the
                # wavefront from the B-image ∪ premise H-facts.
                nl_g = _nonlinear_shape(lin_r)
                if nl_g is not None and copy[1][0] == "v" and nl_g[0] == "v":
                    rewrites.append(
                        {
                            "rule_index": lin_r.index,
                            "predicate": pred,
                            "edge_predicate": copy[0],
                            "direction": "prepend",
                            "shape": "nonlinear",
                            "smart_eligible": True,
                        }
                    )
                    break
            lin = _linear_shape(lin_r)
            if copy is None or lin is None:
                continue
            b_copy, g_copy = copy
            edge_i, b_lin, g_lin = lin
            if b_copy != b_lin:
                continue
            e = lin_r.body[edge_i]
            new_body = list(lin_r.body)
            new_body[edge_i] = (e[0], ("c", pred), e[2], e[3])
            pos = next(i for i, r in enumerate(out) if r is lin_r)
            out[pos] = replace(lin_r, body=new_body)
            rewrites.append(
                {
                    "rule_index": lin_r.index,
                    "predicate": pred,
                    "edge_predicate": b_lin,
                    # rec atom first (edge_i == 1) appends B to the right:
                    # H = C0 ∘ B*; edge first prepends: H = B* ∘ C0
                    "direction": "append" if edge_i == 1 else "prepend",
                    "shape": "linear",
                    # smart-TC delegation (tc.py) needs per-graph semantics
                    # (variable g slots in both rules) and the program to be
                    # EXACTLY this pair — no bystander rule may read H-facts
                    # mid-fixpoint or derive anything else
                    "smart_eligible": len(lrules) == 2
                    and g_copy[0] == "v"
                    and g_lin[0] == "v",
                }
            )
            break
    return (out, rewrites) if rewrites else (lrules, [])
