"""Proof replay: check a proof against a rule list without any reasoning.

Behavioral port of the reference's ``validate`` (src/validate.rs:61-82):
a sequential fold over proof steps whose set logic is order-dependent —
an assumption is skipped if already implied by an earlier step, an
implication is skipped if already assumed. The two sets end disjoint.

Soundness contract preserved verbatim (src/validate.rs:13-19):

    forall assumed, implied, rules, proof:
      if Valid { assumed, implied } = validate(rules, proof)
      and all assumed are true and all rules are true
      then all implied are true

Proofs are tiny relative to the corpus (bounded by derivation-chain length),
so this runs driver-side; :func:`valid_to_dfs` exposes the result sets as
DataFrames for distributed downstream checks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Set, Tuple

from pyspark.sql import DataFrame, SparkSession

from .errors import BadRuleApplication, NoSuchRule
from .rules import Rule, RuleApplication

Quad = Tuple[object, object, object, object]


@dataclass
class Valid:
    """If every quad in ``assumed`` is true, every quad in ``implied`` is true."""

    assumed: Set[Quad]
    implied: Set[Quad]


def _bind_atoms(rule: Rule, atoms, instantiations) -> list:
    canon = rule.canonical_unbound()
    if len(canon) != len(instantiations):
        raise BadRuleApplication()
    bind = dict(zip(canon, instantiations))
    out = []
    for atom in atoms:
        out.append(tuple(bind[e.value] if e.is_var else e.value for e in atom))
    return out


def validate(rules: Sequence[Rule], proof: Sequence[RuleApplication]) -> Valid:
    implied: Set[Quad] = set()
    assumed: Set[Quad] = set()
    for app in proof:
        if not (0 <= app.rule_index < len(rules)):
            raise NoSuchRule()
        rule = rules[app.rule_index]
        for assumption in _bind_atoms(rule, rule.if_all, app.instantiations):
            if assumption not in implied:
                assumed.add(assumption)
        for implication in _bind_atoms(rule, rule.then, app.instantiations):
            if implication not in assumed:
                implied.add(implication)
    assert assumed.isdisjoint(implied)
    return Valid(assumed=assumed, implied=implied)


def valid_to_dfs(spark: SparkSession, valid: Valid) -> tuple[DataFrame, DataFrame]:
    """Expose assumed/implied as sorted DataFrames (string terms only)."""
    schema = "s string, p string, o string, g string"
    a = spark.createDataFrame(sorted(valid.assumed), schema)
    i = spark.createDataFrame(sorted(valid.implied), schema)
    return a, i
