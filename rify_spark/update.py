"""SPARQL 1.1 Update subset, executed functionally over a quad DataFrame.

The reference engine has no mutation API beyond ``Reasoner::insert``
(src/reasoner.rs) — its store is an insert-only set of quads. SPARQL
Update is the standard write surface for that data model, so this module
completes the query front-end (sparql.py) with the update forms, mapped
onto Spark's immutable DataFrames: ``sparql_update(store, text)`` returns
the NEW store (``s, p, o, g``), leaving the input untouched — callers
chain updates exactly like any other DataFrame transformation, and the
result feeds ``infer_df`` / ``sparql_query`` / the incremental reasoner
unchanged.

Supported operations (spec §3), separated by ``;``:

  * ``INSERT DATA { quads }`` / ``DELETE DATA { quads }`` — constant
    quads, ``GRAPH <iri> { ... }`` blocks allowed (unscoped triples go
    to the engine default graph). Plan shape: the constants broadcast;
    DELETE DATA is a broadcast anti-join (a scan predicate — the store
    is never shuffled) and INSERT DATA probes novelty with a broadcast
    left-semi scan, then unions only the novel rows — zero store
    shuffles for both.
  * ``DELETE WHERE { pattern }`` — the pattern is matched and doubles
    as its own delete template (spec §3.1.3.3). Triples-only pattern
    (QuadPattern), like the spec grammar.
  * ``[DELETE { template }] [INSERT { template }] WHERE { pattern }`` —
    the full modify form, at least one clause. The WHERE group takes
    the whole query-group grammar (OPTIONAL/UNION/FILTER/paths/...);
    it is evaluated ONCE against the pre-operation store, then deletes
    apply before inserts (spec §3.1.3) — both templates instantiate
    through the rule engine's head projection
    (``sparql._template_quads`` -> ``matcher.project_heads``), so an
    UPDATE template is exactly a one-shot rule head. Template variables
    must be sure-bound (the CONSTRUCT restriction); INSERT-template
    blank nodes mint fresh per solution (spec §3.1.3, the CONSTRUCT
    §16.2.1 machinery, salted per operation), DELETE-template blank
    nodes raise (spec §3.1.3.2).
  * Graph management: ``CLEAR GRAPH <g> | DEFAULT | NAMED | ALL``
    (``NAMED`` empties every graph except the default; ``DROP`` is
    an alias — without empty-graph bookkeeping the two coincide, a
    documented divergence), ``ADD | COPY | MOVE (GRAPH <g> | DEFAULT)
    TO (GRAPH <g> | DEFAULT)`` — all pure column filters/unions, no
    shuffle. ``CREATE GRAPH <g>`` parses and is a no-op (spec §3.2.1
    sanctions this for stores without empty-graph records — this store
    is a quad set). ``SILENT`` is accepted on all of the above and is
    equally moot: none of these operations can error here (a missing
    source graph is just empty).

  * ``WITH <g>`` on the modify form (spec §3.1.3): unscoped template
    AND pattern triples target/match ``<g>`` instead of the engine
    default graph (``GRAPH`` blocks still win); not applicable to DATA
    or ``DELETE WHERE`` (the spec grammar's own restriction).
  * ``USING <g>`` / ``USING NAMED <g>`` (§3.1.3.2): FROM / FROM NAMED
    for the modify's WHERE — the match-side dataset is reconstructed
    (default = set-union of the USING graphs, GRAPH sees only USING
    NAMED) while templates keep instantiating against the real store
    graphs; any USING clause overrides WITH for the WHERE side.

  * ``LOAD [SILENT] <doc> [INTO GRAPH <g>]`` (spec §3.1.4): the
    document IRI goes verbatim to ``spark.read.text`` + the
    distributed N-Quads parser (``rdf.read_nquads``), so any
    Hadoop-mounted scheme works (``file://``, ``hdfs://``,
    ``s3a://``...) and a single 100 GB document still parallelizes;
    graph labels in the document are honored, ``INTO GRAPH``
    retargets every statement. A non-SILENT LOAD fails on the first
    malformed statement (one validation probe); ``SILENT`` drops
    malformed lines and treats a missing document as a no-op.
    HTTP fetches are out by design (no external data).

Blank nodes: INSERT DATA blocks and INSERT templates take them (fresh
nodes, minted deterministically — see :func:`sparql_update`); the DELETE
forms reject them exactly where the spec forbids them (§3.1.2/§3.1.3.2).

Set semantics throughout: the store is a set of quads (the engine's
``Reasoner::insert`` contract, reference src/reasoner.rs:33-41), so
inserting an existing quad is a no-op and the result carries no
duplicates (inputs are assumed deduplicated, as everywhere else in this
package).

Scale notes: each modify operation costs the pattern match (the same
join plans as the equivalent SELECT) plus one anti-join exchange for
the delete set and one for insert novelty; DATA and graph-management
operations never shuffle the store. A ``;``-sequence composes lazily —
one Catalyst plan end to end; checkpoint between operations yourself if
you chain very many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rdf import DEFAULT_GRAPH
from .sparql import (
    BNODE_PREFIX as _BN_PREFIX,
    Bgp,
    Const,
    SparqlParseError,
    Var,
    _Eval,
    _Parser,
    _template_quads,
    _walk_patterns,
)

_COLS = ["s", "p", "o", "g"]


# --- parsing ----------------------------------------------------------------


class _BNodeRef:
    """A blank-node label inside an INSERT DATA block, minted fresh at
    execution time (one node per distinct label per operation)."""

    __slots__ = ("label",)

    def __init__(self, label: str):
        self.label = label


def _quad_data(p: _Parser, *, allow_bnodes: bool = False) -> list:
    """A quad block for INSERT/DELETE DATA — the spec's QuadData
    production: no variables; blank nodes are legal in INSERT DATA
    (fresh per operation, spec §3.1.1 — they parse to :class:`_BNodeRef`
    markers minted at execution) and forbidden in DELETE DATA
    (spec §3.1.2)."""
    grp = p.group_node(Const(DEFAULT_GRAPH), allow_filter=False)
    if grp.filters or any(not isinstance(e, Bgp) for e in grp.elems):
        raise SparqlParseError("DATA blocks take plain quads")
    quads = [q for e in grp.elems for q in e.patterns]
    out = []
    for quad in quads:
        row = []
        for t in quad:
            if isinstance(t, Const):
                row.append(t.value)
            elif (
                allow_bnodes
                and isinstance(t, Var)
                and t.name.startswith(_BN_PREFIX)
            ):
                row.append(_BNodeRef(t.name[len(_BN_PREFIX):]))
            elif isinstance(t, Var) and t.name.startswith(_BN_PREFIX):
                raise SparqlParseError(
                    "blank nodes are not allowed in DELETE DATA "
                    "(spec §3.1.2)"
                )
            else:
                raise SparqlParseError(
                    "INSERT/DELETE DATA takes constant quads "
                    "(no variables)"
                )
        out.append(tuple(row))
    return out


def _template(p: _Parser, default_g: str = DEFAULT_GRAPH) -> list:
    """A DELETE/INSERT template block: plain (possibly GRAPH-scoped)
    triples; unscoped triples target ``default_g`` (the WITH graph when
    declared); variable binding is checked at instantiation time."""
    grp = p.group_node(Const(default_g), allow_filter=False)
    if grp.filters or any(not isinstance(e, Bgp) for e in grp.elems):
        raise SparqlParseError("UPDATE templates take plain triples")
    return [q for e in grp.elems for q in e.patterns]


# sentinel for the NAMED graph-ref scope — not a legal IRI token, so it
# can never collide with a parsed <graph> name
NAMED_SCOPE = "::named::"


def _graph_ref(p: _Parser) -> str | None:
    """``GRAPH <iri>`` or ``DEFAULT`` -> graph name (DEFAULT -> the
    engine default graph); ``ALL`` -> None (every graph); ``NAMED`` ->
    the NAMED_SCOPE sentinel (every graph except the default)."""
    if p.kw("DEFAULT"):
        return DEFAULT_GRAPH
    if p.kw("ALL"):
        return None
    if p.kw("NAMED"):
        return NAMED_SCOPE
    p.expect("GRAPH")
    t = p.term()
    if not isinstance(t, Const):
        raise SparqlParseError("graph management needs a constant graph")
    return t.value


def _using_clauses(p: _Parser) -> tuple:
    """``USING <g>`` / ``USING NAMED <g>`` clauses of a modify (spec
    §3.1.3.2) — FROM / FROM NAMED for the WHERE pattern."""
    frm, named = [], []
    while p.kw("USING"):
        named_one = p.kw("NAMED")
        t = p.term()
        if not isinstance(t, Const) or not t.value:
            raise SparqlParseError("USING needs a graph IRI")
        (named if named_one else frm).append(t.value)
    return frm, named


def _modify_where(p: _Parser, with_g: str, uf: list, un: list):
    """The WHERE group of a modify: under USING the unscoped pattern
    triples match the constructed default graph; otherwise WITH's graph
    (the spec's fallback target for WHERE too, §3.1.3)."""
    return p.group_node(Const(DEFAULT_GRAPH if (uf or un) else with_g))


def parse_update(text: str) -> list:
    """Parse an update string into a list of operation tuples."""
    p = _Parser(text)
    p.parse_prologue()
    ops: list = []
    while True:
        kind, tok = p.peek()
        if kind != "kw":
            raise SparqlParseError(f"expected an update operation, got {tok!r}")
        word = tok.upper()
        if word == "LOAD":
            # spec §3.1.4: LOAD [SILENT] <doc> [INTO GRAPH <g>] — the
            # document IRI goes VERBATIM to spark.read.text, so any
            # Hadoop-FS scheme the cluster mounts works (file://,
            # hdfs://, s3a://...); http fetches are out by design
            p.next()
            silent = bool(p.kw("SILENT"))
            t = p.term()
            if not isinstance(t, Const) or not t.value:
                raise SparqlParseError("LOAD needs a document IRI")
            into = None
            if p.kw("INTO"):
                p.expect("GRAPH")
                t2 = p.term()
                if not isinstance(t2, Const) or not t2.value:
                    raise SparqlParseError("INTO GRAPH needs an IRI")
                into = t2.value
            ops.append(("load", t.value, into, silent))
            if p.peek() == ("op", ";"):
                p.next()
                if p.peek()[0] == "eof":
                    break
                continue
            break
        with_g = DEFAULT_GRAPH
        if word == "WITH":
            # spec §3.1.3: WITH names the graph that unscoped template
            # and pattern triples use; only the modify form takes it
            p.next()
            t = p.term()
            if not isinstance(t, Const) or not t.value:
                raise SparqlParseError("WITH needs a graph IRI")
            with_g = t.value
            kind, tok = p.peek()
            word = tok.upper() if kind == "kw" else ""
            if word not in ("INSERT", "DELETE"):
                raise SparqlParseError(
                    "WITH applies to DELETE/INSERT ... WHERE modify "
                    "operations only"
                )
        if word == "INSERT":
            p.next()
            if p.kw("DATA"):
                if with_g != DEFAULT_GRAPH:
                    raise SparqlParseError("WITH does not apply to DATA")
                ops.append(
                    ("insert_data", _quad_data(p, allow_bnodes=True))
                )
            else:
                tmpl = _template(p, with_g)
                uf, un = _using_clauses(p)
                p.expect("WHERE")
                ops.append(
                    (
                        "modify", None, tmpl,
                        _modify_where(p, with_g, uf, un), uf, un,
                    )
                )
        elif word == "DELETE":
            p.next()
            if p.kw("DATA"):
                if with_g != DEFAULT_GRAPH:
                    raise SparqlParseError("WITH does not apply to DATA")
                ops.append(("delete_data", _quad_data(p)))
            elif (
                p.peek()[0] == "kw" and p.peek()[1].upper() == "WHERE"
            ):
                if with_g != DEFAULT_GRAPH:
                    # spec grammar: DeleteWhere has no WITH prefix
                    raise SparqlParseError(
                        "WITH does not apply to DELETE WHERE (use the "
                        "modify form: WITH <g> DELETE { t } WHERE { t })"
                    )
                p.next()
                # the pattern doubles as its own delete template
                grp = p.group_node(
                    Const(DEFAULT_GRAPH), allow_filter=False
                )
                if grp.filters or any(
                    not isinstance(e, Bgp) for e in grp.elems
                ):
                    raise SparqlParseError(
                        "DELETE WHERE takes a plain quad pattern"
                    )
                tmpl = _walk_patterns(grp)
                ops.append(("modify", tmpl, None, grp, [], []))
            else:
                dtmpl = _template(p, with_g)
                itmpl = None
                if p.kw("INSERT"):
                    itmpl = _template(p, with_g)
                uf, un = _using_clauses(p)
                p.expect("WHERE")
                ops.append(
                    (
                        "modify",
                        dtmpl,
                        itmpl,
                        _modify_where(p, with_g, uf, un),
                        uf,
                        un,
                    )
                )
        elif word in ("CLEAR", "DROP"):
            p.next()
            p.kw("SILENT")  # our CLEAR/DROP never error: SILENT is moot
            ops.append(("clear", _graph_ref(p)))
        elif word == "CREATE":
            # spec §3.2.1: a store that does not record empty graphs MAY
            # treat CREATE as a no-op — this store is a quad set, so it
            # does (and with no "already exists" error, SILENT is moot)
            p.next()
            p.kw("SILENT")
            p.expect("GRAPH")
            t = p.term()
            if not isinstance(t, Const) or not t.value:
                raise SparqlParseError("CREATE needs a graph IRI")
            ops.append(("create", t.value))
        elif word in ("ADD", "COPY", "MOVE"):
            p.next()
            p.kw("SILENT")  # missing sources are empty here, never errors
            src = _graph_ref(p)
            p.expect("TO")
            dst = _graph_ref(p)
            if src is None or dst is None or NAMED_SCOPE in (src, dst):
                raise SparqlParseError(f"{word} needs two specific graphs")
            ops.append((word.lower(), src, dst))
        else:
            raise SparqlParseError(f"unknown update operation {tok!r}")
        if p.peek() == ("op", ";"):
            p.next()
            if p.peek()[0] == "eof":
                break
            continue
        break
    if p.peek()[0] != "eof":
        raise SparqlParseError(f"trailing input at {p.peek()[1]!r}")
    return ops


# --- execution --------------------------------------------------------------


def _const_df(store: DataFrame, rows: list) -> DataFrame:
    # constants dedupe driver-side: the DATA plans stay exchange-free
    return store.sparkSession.createDataFrame(
        list(dict.fromkeys(rows)), "s string, p string, o string, g string"
    )


def _union_novel(store: DataFrame, ins: DataFrame, *, tiny: bool) -> DataFrame:
    """store ∪ ins under set semantics. ``tiny`` inserts (DATA constants)
    broadcast: novelty is a broadcast left-semi probe of the store (scan,
    no shuffle) and the union appends only novel rows. Derived inserts
    use a plain anti-join (AQE picks the strategy from runtime sizes)."""
    if tiny:
        hits = {
            tuple(r)
            for r in store.join(
                F.broadcast(ins), _COLS, "left_semi"
            ).collect()
        }
        novel = [tuple(r) for r in ins.collect() if tuple(r) not in hits]
        if not novel:
            return store
        return store.unionByName(_const_df(store, novel))
    return store.unionByName(ins.join(store, _COLS, "left_anti"))


def sparql_update(
    store: DataFrame, update: str, *, bnode_seed: str = ""
) -> DataFrame:
    """Apply a SPARQL Update string to a quad store; returns the NEW
    store DataFrame (the input is untouched — Spark-functional update).
    Operations in a ``;``-sequence apply left to right, each seeing the
    previous result (spec §3.1: a sequence of operations on the graph
    store).

    Blank nodes in INSERT DATA / INSERT templates mint as
    ``"_:" + md5(seed # op-index, label[, bindings])`` — deterministic
    (same CONSTRUCT precedent: reproducible by the SQL oracle twins;
    duplicate solutions collapse under set semantics). The op-index
    salt keeps two operations in one ``;``-sequence disjoint. The spec
    wants nodes fresh per EXECUTION too — callers that re-apply an
    update and need that freshness pass a unique ``bnode_seed`` (e.g.
    a uuid); the default trades it for oracle determinism."""
    import hashlib

    dtype = store.schema["s"].dataType
    cur = store.select(*_COLS)
    for idx, op in enumerate(parse_update(update)):
        salt = f"{bnode_seed}#{idx}"
        if op[0] == "insert_data":
            mint = {
                t.label: "_:"
                + hashlib.md5(
                    f"{salt}\x1f{t.label}".encode()
                ).hexdigest()
                for q in op[1]
                for t in q
                if isinstance(t, _BNodeRef)
            }
            rows = [
                tuple(
                    mint[t.label] if isinstance(t, _BNodeRef) else t
                    for t in q
                )
                for q in op[1]
            ]
            ins = _const_df(cur, rows)
            cur = _union_novel(cur, ins, tiny=True)
        elif op[0] == "delete_data":
            dels = _const_df(cur, op[1])
            cur = cur.join(F.broadcast(dels), _COLS, "left_anti")
        elif op[0] == "modify":
            _, dtmpl, itmpl, root, uf, un = op
            # the WHERE matches ONCE against the pre-operation store;
            # deletes apply before inserts (spec §3.1.3). USING clauses
            # re-dataset the MATCH side only (templates always
            # instantiate against the real store graphs) — the same
            # construction as FROM / FROM NAMED.
            src = cur
            if uf or un:
                from types import SimpleNamespace

                from .sparql import _dataset_view

                src = _dataset_view(
                    cur,
                    SimpleNamespace(dataset_from=uf, dataset_named=un),
                )
            sol = _Eval(src, graph_var_hides_default=bool(uf or un)).group(
                root
            )
            if dtmpl:
                dels = _template_quads(sol, dtmpl, dtype, what="DELETE")
                nxt = cur.join(dels, _COLS, "left_anti")
            else:
                nxt = cur
            if itmpl:
                ins = _template_quads(
                    sol, itmpl, dtype, what="INSERT", bnode_salt=salt
                )
                nxt = _union_novel(nxt, ins, tiny=False)
            cur = nxt
        elif op[0] == "clear":
            g = op[1]
            if g is None:  # ALL
                cur = cur.limit(0)
            elif g == NAMED_SCOPE:  # every graph except the default
                cur = cur.filter(F.col("g") == DEFAULT_GRAPH)
            else:
                cur = cur.filter(F.col("g") != g)
        elif op[0] == "create":
            pass  # documented no-op (spec-sanctioned for set stores)
        elif op[0] == "load":
            _, doc, into, silent = op
            from .rdf import read_nquads

            try:
                loaded = read_nquads(
                    cur.sparkSession, doc,
                    default_graph=into or DEFAULT_GRAPH,
                )
                if not silent:
                    # one validation pass: a non-SILENT LOAD fails on any
                    # malformed statement (spec: operation failure);
                    # SILENT quarantines them (drops) and proceeds
                    bad = loaded.filter(F.col("malformed")).limit(1)
                    if bad.take(1):
                        raise SparqlParseError(
                            f"LOAD <{doc}>: malformed N-Quads statement"
                        )
                ins = loaded.filter(~F.col("malformed")).select(*_COLS)
                if into is not None:
                    # INTO GRAPH retargets every statement (spec §3.1.4)
                    ins = ins.withColumn("g", F.lit(into))
                cur = _union_novel(cur, ins, tiny=False)
            except SparqlParseError:
                raise
            except Exception:
                if not silent:
                    raise
                # SILENT: a missing/unreadable document is a no-op
        else:
            verb, src, dst = op
            if src == dst:
                continue  # spec: same-graph ADD/COPY/MOVE is a no-op
            moved = cur.filter(F.col("g") == src).withColumn(
                "g", F.lit(dst)
            )
            if verb == "add":
                base = cur
            elif verb == "copy":
                base = cur.filter(F.col("g") != dst)
            else:  # move
                base = cur.filter(
                    (F.col("g") != dst) & (F.col("g") != src)
                )
            cur = _union_novel(base, moved, tiny=False)
    return cur


# --- driver-gate query -------------------------------------------------------

# a three-operation sequence: a modify (predicate rename into a derived
# graph, region-0 slice), a constant insert, and a DELETE WHERE — the
# final store is closed-form in SQL
GATE_UPDATE = """
  DELETE { GRAPH <graph://tpch> { ?c <in_nation> ?n } }
  INSERT { GRAPH <graph://derived> { ?c <member_of> ?n } }
  WHERE { GRAPH <graph://tpch> {
    ?c <in_nation> ?n . ?n <in_region> <region:0>
  } } ;
  INSERT DATA { GRAPH <graph://derived> {
    <admin:root> <member_of> <nation:manual>
  } } ;
  DELETE WHERE { GRAPH <graph://tpch> { <order:1> <placed_by> ?c } }
"""


def sparql_update_gate(spark, sf_dir: str) -> DataFrame:
    from .ops.quads import tpch_quads

    return sparql_update(tpch_quads(spark, sf_dir), GATE_UPDATE)


def sparql_update_sql() -> str:
    return """
      SELECT 'order:' || o_orderkey AS s, 'placed_by' AS p,
             'cust:' || o_custkey AS o, 'graph://tpch' AS g
      FROM orders WHERE o_orderkey <> 1
      UNION ALL
      SELECT 'cust:' || c_custkey, 'in_nation',
             'nation:' || c_nationkey, 'graph://tpch'
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_regionkey <> 0
      UNION ALL
      SELECT 'nation:' || n_nationkey, 'in_region',
             'region:' || n_regionkey, 'graph://tpch' FROM nation
      UNION ALL
      SELECT DISTINCT 'cust:' || c_custkey, 'member_of',
             'nation:' || c_nationkey, 'graph://derived'
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_regionkey = 0
      UNION ALL
      SELECT 'admin:root', 'member_of', 'nation:manual', 'graph://derived'
    """


# WITH / USING gate: op 1 matches in_region triples through a USING-
# constructed dataset (graph://tpch as the match default) and inserts
# the unscoped template into the WITH graph; op 2 (no USING) shows WITH
# doubling as the WHERE default — it matches and deletes the region-0
# labels just inserted into graph://derived. Final store closed-form.
GATE_UPDATE_WITH = """
  WITH <graph://derived>
  INSERT { ?n <region_label> ?r }
  USING <graph://tpch>
  WHERE { ?n <in_region> ?r } ;
  WITH <graph://derived>
  DELETE { ?n <region_label> <region:0> }
  WHERE { ?n <region_label> <region:0> }
"""


def sparql_update_with_gate(spark, sf_dir: str) -> DataFrame:
    from .ops.quads import tpch_quads

    return sparql_update(tpch_quads(spark, sf_dir), GATE_UPDATE_WITH)


def sparql_update_with_sql() -> str:
    from .ops.quads import TPCH_QUADS_SQL

    return f"""
      {TPCH_QUADS_SQL}
      UNION ALL
      SELECT 'nation:' || n_nationkey, 'region_label',
             'region:' || n_regionkey, 'graph://derived'
      FROM nation WHERE n_regionkey <> 0
    """


# LOAD gate: serialize a deterministic nation-derived N-Quads document
# (distributed write_nquads -> part files), then LOAD it twice — once
# honoring its graph labels, once retargeted INTO GRAPH — and modify on
# top of the loaded triples. Final store closed-form from the parquet.
def _load_gate_doc(spark, sf_dir: str) -> str:
    import os
    import tempfile

    from .rdf import write_nquads

    nation = spark.read.parquet(f"{sf_dir.rstrip('/')}/nation.parquet")
    doc = nation.select(
        F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("s"),
        F.lit("named").alias("p"),
        F.concat(F.lit("region:"), F.col("n_regionkey")).alias("o"),
        F.concat(
            F.lit("graph://src/"), F.col("n_nationkey") % 2
        ).alias("g"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "rify_load_gate_" + os.path.basename(sf_dir.rstrip("/")),
    )
    write_nquads(doc, path)
    return path


def sparql_update_load_gate(spark, sf_dir: str) -> DataFrame:
    from .ops.quads import tpch_quads

    path = _load_gate_doc(spark, sf_dir)
    return sparql_update(
        tpch_quads(spark, sf_dir),
        f"""
          LOAD <file://{path}> ;
          LOAD SILENT <file://{path}> INTO GRAPH <graph://loaded> ;
          DELETE WHERE {{ GRAPH <graph://loaded> {{
            ?n <named> <region:0>
          }} }}
        """,
    )


def sparql_update_load_sql() -> str:
    from .ops.quads import TPCH_QUADS_SQL

    return f"""
      {TPCH_QUADS_SQL}
      UNION ALL
      SELECT 'nation:' || n_nationkey, 'named',
             'region:' || n_regionkey, 'graph://src/' || (n_nationkey % 2)
      FROM nation
      UNION ALL
      SELECT 'nation:' || n_nationkey, 'named',
             'region:' || n_regionkey, 'graph://loaded'
      FROM nation WHERE n_regionkey <> 0
    """


# blank-node gate: an INSERT template mints one fresh node per nation
# solution (reified region-membership slot) and an INSERT DATA block
# mints a per-operation node — both labels are deterministic md5s the
# SQL twin reproduces exactly (salt = bnode_seed '#' op-index)
GATE_UPDATE_BNODES = """
  INSERT { GRAPH <graph://derived> {
    ?n <has_slot> _:s . _:s <slot_region> ?r
  } }
  WHERE { GRAPH <graph://tpch> { ?n <in_region> ?r } } ;
  INSERT DATA { GRAPH <graph://derived> { _:root <kind> <manual> } }
"""


def sparql_update_bnode_gate(spark, sf_dir: str) -> DataFrame:
    from .ops.quads import tpch_quads

    return sparql_update(tpch_quads(spark, sf_dir), GATE_UPDATE_BNODES)


def sparql_update_bnode_sql() -> str:
    from .ops.quads import TPCH_QUADS_SQL

    return f"""
      {TPCH_QUADS_SQL}
      UNION ALL
      SELECT 'nation:' || n_nationkey, 'has_slot',
             '_:' || md5('__bn_s' || chr(31) || '#0' || chr(31)
                         || 'nation:' || n_nationkey || chr(31)
                         || 'region:' || n_regionkey),
             'graph://derived'
      FROM nation
      UNION ALL
      SELECT '_:' || md5('__bn_s' || chr(31) || '#0' || chr(31)
                         || 'nation:' || n_nationkey || chr(31)
                         || 'region:' || n_regionkey),
             'slot_region', 'region:' || n_regionkey, 'graph://derived'
      FROM nation
      UNION ALL
      SELECT '_:' || md5('#1' || chr(31) || 'root'), 'kind', 'manual',
             'graph://derived'
    """
