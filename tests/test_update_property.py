"""Property-based parity for SPARQL Update: random operation sequences
(INSERT/DELETE DATA incl. blank-node subjects, DELETE WHERE, WITH/USING
modifies incl. blank-node INSERT-template objects, CLEAR scopes,
ADD/COPY/MOVE) applied to random quad stores, required to agree EXACTLY
with an independent ~60-line Python quad-set interpreter written straight
from spec §3 semantics (single pre-operation WHERE evaluation, deletes
before inserts, WITH as the unscoped default, USING as the match-side
dataset, blank nodes minted by the documented deterministic formula:
'_:' + md5(label, '#'op-index[, sorted bindings])) — no engine code
shared."""

import hashlib
import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rify_spark.rdf import DEFAULT_GRAPH as G  # noqa: E402
from rify_spark.update import sparql_update  # noqa: E402

SCHEMA = "s string, p string, o string, g string"
_SCALE = max(1, int(os.environ.get("RIFY_PROP_EXAMPLES_SCALE", "1")))
_SETTINGS = dict(
    derandomize=_SCALE == 1,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)

TERMS = ["a", "b", "c"]
PREDS = ["p", "q"]
GRAPHS = [G, "g1", "g2"]

_quad = st.tuples(
    st.sampled_from(TERMS),
    st.sampled_from(PREDS),
    st.sampled_from(TERMS),
    st.sampled_from(GRAPHS),
)
_data = st.lists(_quad, min_size=1, max_size=3)

# INSERT DATA additionally takes blank-node subjects (fresh per op)
_bquad = st.tuples(
    st.sampled_from(TERMS + ["_:m", "_:n"]),
    st.sampled_from(PREDS),
    st.sampled_from(TERMS),
    st.sampled_from(GRAPHS),
)
_bdata = st.lists(_bquad, min_size=1, max_size=3)

# a template slot: (pred, subject var, object var, graph or None=op default)
_tmpl = st.tuples(
    st.sampled_from(PREDS + ["r"]),
    st.sampled_from(["x", "y"]),
    st.sampled_from(["x", "y"]),
    st.sampled_from([None] + GRAPHS),
)

# INSERT templates additionally take a blank-node object (fresh per
# solution); DELETE templates keep the spec prohibition
_itmpl = st.tuples(
    st.sampled_from(PREDS + ["r"]),
    st.sampled_from(["x", "y"]),
    st.sampled_from(["x", "y", "_:n"]),
    st.sampled_from([None] + GRAPHS),
)

_op = st.one_of(
    st.tuples(st.just("insert_data"), _bdata),
    st.tuples(st.just("delete_data"), _data),
    # DELETE WHERE { [GRAPH <g>] ?x <pred> ?y }
    st.tuples(
        st.just("delete_where"),
        st.sampled_from(PREDS),
        st.sampled_from([None] + GRAPHS),
    ),
    # modify: WITH?, where ?x <p1> ?y [. ?y <p2> ?z], USING*, DELETE?, INSERT?
    st.tuples(
        st.just("modify"),
        st.sampled_from([None, "g1", "g2"]),  # WITH
        st.sampled_from(PREDS),  # pattern 1 predicate
        st.sampled_from([None] + PREDS),  # optional join pattern predicate
        st.lists(st.sampled_from(GRAPHS), max_size=2),  # USING
        st.one_of(st.none(), _tmpl),  # DELETE template
        _itmpl,  # INSERT template (always present)
    ),
    st.tuples(
        st.just("clear"), st.sampled_from(["DEFAULT", "NAMED", "ALL", "g1"])
    ),
    st.tuples(
        st.just("gm"),
        st.sampled_from(["ADD", "COPY", "MOVE"]),
        st.sampled_from(GRAPHS),
        st.sampled_from(GRAPHS),
    ),
)


# ---------------------------------------------------------------------------
# rendering: structured op -> UPDATE text
# ---------------------------------------------------------------------------


def _r_term(t):
    return t if t.startswith("_:") else f"<{t}>"


def _r_triple(s, p, o):
    return f"{_r_term(s)} <{p}> {_r_term(o)}"


def _r_data(quads):
    return " . ".join(
        _r_triple(s, p, o)
        if g == G
        else f"GRAPH <{g}> {{ {_r_triple(s, p, o)} }}"
        for s, p, o, g in quads
    )


def _r_tmpl(tmpl):
    pred, sv, ov, tg = tmpl
    obj = ov if ov.startswith("_:") else f"?{ov}"
    t = f"?{sv} <{pred}> {obj}"
    return t if tg is None else f"GRAPH <{tg}> {{ {t} }}"


def _render(op) -> str:
    kind = op[0]
    if kind == "insert_data":
        return f"INSERT DATA {{ {_r_data(op[1])} }}"
    if kind == "delete_data":
        return f"DELETE DATA {{ {_r_data(op[1])} }}"
    if kind == "delete_where":
        _, pred, gscope = op
        pat = f"?x <{pred}> ?y"
        if gscope is not None:
            pat = f"GRAPH <{gscope}> {{ {pat} }}"
        return f"DELETE WHERE {{ {pat} }}"
    if kind == "modify":
        _, with_g, p1, p2, using, dtmpl, itmpl = op
        parts = []
        if with_g:
            parts.append(f"WITH <{with_g}>")
        if dtmpl is not None:
            parts.append(f"DELETE {{ {_r_tmpl(dtmpl)} }}")
        parts.append(f"INSERT {{ {_r_tmpl(itmpl)} }}")
        parts.extend(f"USING <{u}>" for u in using)
        where = f"?x <{p1}> ?y"
        if p2 is not None:
            where += f" . ?y <{p2}> ?z"
        parts.append(f"WHERE {{ {where} }}")
        return " ".join(parts)
    if kind == "clear":
        scope = op[1]
        return f"CLEAR {scope}" if scope in (
            "DEFAULT", "NAMED", "ALL"
        ) else f"CLEAR GRAPH <{scope}>"
    _, verb, src, dst = op

    def ref(g):
        return "DEFAULT" if g == G else f"GRAPH <{g}>"

    return f"{verb} {ref(src)} TO {ref(dst)}"


# ---------------------------------------------------------------------------
# the independent interpreter (spec §3 over a Python set of quads)
# ---------------------------------------------------------------------------


def _mint_data(label: str, idx: int) -> str:
    return "_:" + hashlib.md5(f"#{idx}\x1f{label}".encode()).hexdigest()


def _apply(store: frozenset, op, idx: int) -> frozenset:
    kind = op[0]
    if kind == "insert_data":
        rows = {
            tuple(
                _mint_data(t[2:], idx) if t.startswith("_:") else t
                for t in q
            )
            for q in op[1]
        }
        return store | rows
    if kind == "delete_data":
        return store - set(op[1])
    if kind == "delete_where":
        _, pred, gscope = op
        gg = G if gscope is None else gscope
        return store - {q for q in store if q[1] == pred and q[3] == gg}
    if kind == "modify":
        _, with_g, p1, p2, using, dtmpl, itmpl = op
        default_g = with_g or G
        if using:  # USING rebuilds the match-side default graph (§3.1.3.2)
            ds = {(s, p, o, G) for (s, p, o, g) in store if g in using}
            match_g = G
        else:
            ds = store
            match_g = default_g
        sols = []
        for s, p, o, g in ds:
            if p == p1 and g == match_g:
                if p2 is None:
                    sols.append({"x": s, "y": o})
                else:
                    for s2, pp, o2, g2 in ds:
                        if pp == p2 and g2 == match_g and s2 == o:
                            sols.append({"x": s, "y": o, "z": o2})

        def inst(tmpl):
            pred, sv, ov, tg = tmpl
            gg = default_g if tg is None else tg
            if ov.startswith("_:"):
                # fresh node per solution: md5 over (internal label,
                # '#'op-index, bindings in sorted-variable order)
                def o_of(b):
                    basis = "\x1f".join(
                        [f"__bn_{ov[2:]}", f"#{idx}"]
                        + [b[k] for k in sorted(b)]
                    )
                    return "_:" + hashlib.md5(basis.encode()).hexdigest()
            else:
                def o_of(b):
                    return b[ov]
            return {(b[sv], pred, o_of(b), gg) for b in sols}

        nxt = store - inst(dtmpl) if dtmpl is not None else store
        return nxt | inst(itmpl)
    if kind == "clear":
        scope = op[1]
        if scope == "ALL":
            return frozenset()
        if scope == "NAMED":
            return frozenset(q for q in store if q[3] == G)
        gg = G if scope == "DEFAULT" else scope
        return frozenset(q for q in store if q[3] != gg)
    _, verb, src, dst = op
    if src == dst:
        return store  # spec: same-graph ADD/COPY/MOVE is a no-op
    moved = {(s, p, o, dst) for (s, p, o, g) in store if g == src}
    if verb == "ADD":
        base = store
    elif verb == "COPY":
        base = {q for q in store if q[3] != dst}
    else:  # MOVE
        base = {q for q in store if q[3] not in (dst, src)}
    return frozenset(base) | moved


# ---------------------------------------------------------------------------


@settings(max_examples=8 * _SCALE, **_SETTINGS)
@given(
    quads=st.lists(_quad, max_size=10),
    ops=st.lists(_op, min_size=1, max_size=3),
)
def test_update_sequences_match_python_interpreter(spark, quads, ops):
    quads = sorted(set(quads))
    df = spark.createDataFrame(quads or [("x", "x", "x", "x")], SCHEMA)
    if not quads:
        df = df.limit(0)
    text = " ; ".join(_render(op) for op in ops)
    got = sorted(tuple(r) for r in sparql_update(df, text).collect())
    want = frozenset(quads)
    for idx, op in enumerate(ops):
        want = _apply(want, op, idx)
    assert got == sorted(want), text
