"""Rule model: entities, rules, validation, canonical variable order, JSON serde.

Reference parity (behavior, not code):
  - ``Entity::{Unbound, Bound}``            -> :class:`Entity` (src/rule.rs:32-35)
  - ``Rule::create`` range restriction      -> :meth:`Rule.create` (src/rule.rs:72-86)
  - ``Rule::cononical_unbound``             -> :meth:`Rule.canonical_unbound`
                                               (src/rule.rs:170-177; first-appearance
                                               order over ``if_all``)
  - serde JSON wire format                  -> :meth:`Rule.to_json` / :meth:`Rule.from_json`
                                               (src/rule.rs:485-570, bindings/js_wasm
                                               binding_tests/test.js:50-85)
  - ``RuleApplication``                     -> :class:`RuleApplication` (src/prove.rs:264-269)

Terms are opaque: the engine never inspects their structure, only compares
them (reference README.md:47). Internally the Spark engine requires string
terms; the API layer transparently maps arbitrary orderable Python terms
through a driver-side codec (see :mod:`rify_spark.api`).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterator, Sequence, Tuple

from .errors import NoTranslation, UnboundImplied

Term = Any  # opaque; str inside the Spark engine


class FrozenTerm:
    """Hashable, totally-ordered wrapper for structured (JSON-shaped) terms.

    The reference engine is generic over ``Bound: Ord`` and its serde vectors
    round-trip rules whose bound terms are structured RdfTerm objects
    (reference src/rule.rs:485-570, e.g. ``{"Bound": {"Iri": ...}}``). Python
    dicts are unhashable, so such terms are frozen at rule-construction time:
    hash/eq/order derive from the canonical JSON encoding, and ``.json``
    recovers the original structure for serialization.
    """

    __slots__ = ("json", "_key")

    def __init__(self, obj: Any) -> None:
        self.json = obj
        self._key = json.dumps(
            obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False
        )

    def __hash__(self) -> int:
        return hash(self._key)

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, FrozenTerm):
            return self._key == other._key
        # reflected comparison against the raw structure (dict == FrozenTerm
        # delegates here), so tests and callers can compare against plain JSON
        if isinstance(other, (dict, list)):
            return self.json == other
        return NotImplemented

    def __lt__(self, other: "FrozenTerm") -> bool:
        if not isinstance(other, FrozenTerm):
            return NotImplemented
        return self._key < other._key

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"FrozenTerm({self.json!r})"


def freeze_term(value: Term) -> Term:
    """Return ``value`` unchanged if hashable, else a :class:`FrozenTerm`."""
    if isinstance(value, FrozenTerm):
        return value
    try:
        hash(value)
        return value
    except TypeError:
        return FrozenTerm(value)


def thaw_term(value: Term) -> Term:
    """Inverse of :func:`freeze_term` for serialization."""
    return value.json if isinstance(value, FrozenTerm) else value


@dataclass(frozen=True)
class Entity:
    """A rule atom element: either a named variable or a constant term."""

    is_var: bool
    value: Term

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"?{self.value}" if self.is_var else f"<{self.value!r}>"


def Unbound(name: Term) -> Entity:
    """A named variable with an unknown value."""
    return Entity(True, freeze_term(name))


def Bound(value: Term) -> Entity:
    """A constant term (structured terms are frozen to a hashable form)."""
    return Entity(False, freeze_term(value))


Atom = Tuple[Entity, Entity, Entity, Entity]


def _entity_from_json(obj: Any) -> Entity:
    if not isinstance(obj, dict) or len(obj) != 1:
        raise ValueError(f"entity must be a single-key mapping, got {obj!r}")
    ((kind, value),) = obj.items()
    if kind == "Unbound":
        return Unbound(value)
    if kind == "Bound":
        return Bound(value)
    raise ValueError(f"entity key must be 'Unbound' or 'Bound', got {kind!r}")


def _entity_to_json(e: Entity) -> dict:
    value = thaw_term(e.value)
    return {"Unbound": value} if e.is_var else {"Bound": value}


def _coerce_atom(atom: Sequence[Entity]) -> Atom:
    atom = tuple(atom)
    if len(atom) != 4:
        raise ValueError(f"rule atoms are quads; expected 4 entities, got {len(atom)}")
    for e in atom:
        if not isinstance(e, Entity):
            raise TypeError(f"expected Entity, got {type(e).__name__}")
    # freeze structured term values so every downstream set/dict over terms
    # (bound_terms, TermCodec, prove's known-name check) stays hashable
    return tuple(Entity(e.is_var, freeze_term(e.value)) for e in atom)  # type: ignore[return-value]


@dataclass(frozen=True)
class Rule:
    """A conjunctive if-then rule over quads.

    Invariant (enforced by :meth:`create`): every unbound name in ``then``
    also occurs in ``if_all``.
    """

    if_all: Tuple[Atom, ...]
    then: Tuple[Atom, ...]

    @classmethod
    def create(
        cls,
        if_all: Sequence[Sequence[Entity]],
        then: Sequence[Sequence[Entity]],
    ) -> "Rule":
        if_atoms = tuple(_coerce_atom(a) for a in if_all)
        then_atoms = tuple(_coerce_atom(a) for a in then)
        if_vars = {e.value for atom in if_atoms for e in atom if e.is_var}
        for atom in then_atoms:
            for e in atom:
                if e.is_var and e.value not in if_vars:
                    raise UnboundImplied(e.value)
        return cls(if_atoms, then_atoms)

    def canonical_unbound(self) -> list:
        """Unique unbound names in first-appearance order over ``if_all``.

        Proof instantiation vectors are ordered by this list, so it must be
        stable (reference src/rule.rs:170-177, src/prove.rs:236-237).
        """
        seen: list = []
        for atom in self.if_all:
            for e in atom:
                if e.is_var and e.value not in seen:
                    seen.append(e.value)
        return seen

    def iter_entities(self) -> Iterator[Entity]:
        for atom in self.if_all:
            yield from atom
        for atom in self.then:
            yield from atom

    def bound_terms(self) -> list:
        """All constant terms mentioned by the rule (with repetition removed,
        first-appearance order)."""
        out: list = []
        seen = set()
        for e in self.iter_entities():
            if not e.is_var and e.value not in seen:
                seen.add(e.value)
                out.append(e.value)
        return out

    # -- JSON wire format (matches the reference serde shape) ---------------

    def to_json(self) -> dict:
        return {
            "if_all": [[_entity_to_json(e) for e in atom] for atom in self.if_all],
            "then": [[_entity_to_json(e) for e in atom] for atom in self.then],
        }

    @classmethod
    def from_json(cls, obj: dict) -> "Rule":
        return cls.create(
            [[_entity_from_json(e) for e in atom] for atom in obj["if_all"]],
            [[_entity_from_json(e) for e in atom] for atom in obj["then"]],
        )


def decl_rules(rs: Sequence) -> list:
    """Build a rule list from ((if_all, then), ...) pairs — the analog of
    the reference's ``decl_rules!`` test-sugar macro (src/common.rs:129-137).

    >>> rules = decl_rules([
    ...     ([[Unbound("a"), Bound("p"), Unbound("b"), Unbound("g")]],
    ...      [[Unbound("a"), Bound("q"), Unbound("b"), Unbound("g")]]),
    ... ])
    """
    return [Rule.create(if_all, then) for if_all, then in rs]


@dataclass(frozen=True)
class RuleApplication:
    """One proof step: a rule fired with concrete bindings.

    ``instantiations`` are ordered by the rule's canonical unbound order.
    """

    rule_index: int
    instantiations: Tuple[Term, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        object.__setattr__(
            self,
            "instantiations",
            tuple(freeze_term(x) for x in self.instantiations),
        )


# ---------------------------------------------------------------------------
# Compiled (lowered) rule form used by the matcher / fixpoint.
# Analog of the reference's LowRule (src/rule.rs:24-28) but holding
# join-space constant values instead of translator ids.
# ---------------------------------------------------------------------------

# slot: ("v", var_index) for a variable, ("c", value) for a constant.
Slot = Tuple[str, Any]
LoweredAtom = Tuple[Slot, Slot, Slot, Slot]


@dataclass
class LoweredRule:
    """A rule compiled against a specific term space.

    ``body``/``head`` atoms hold variable slot indices (dense, ordered by
    :meth:`Rule.canonical_unbound`) and constant values already translated to
    the facts DataFrame's value space (hashed longs when term encoding is on,
    raw strings otherwise).
    """

    index: int
    body: list  # list[LoweredAtom]
    head: list  # list[LoweredAtom]
    n_vars: int
    canon_vars: list  # canonical unbound names (user-facing), index == slot

    @property
    def unconditional(self) -> bool:
        return not self.body


def lower_rule(rule: Rule, index: int, const_map) -> LoweredRule:
    """Compile ``rule`` into the matcher's slot form.

    ``const_map`` maps a constant term to its value in the facts value space;
    it must raise / be total for all of ``rule.bound_terms()`` (analog of
    ``Rule::lower``'s ``NoTranslation``, src/rule.rs:154-165).
    """
    canon = rule.canonical_unbound()
    var_slot = {name: i for i, name in enumerate(canon)}

    def lower_const(value):
        try:
            return const_map(value)
        except (KeyError, LookupError) as exc:
            # reference Rule::lower surfaces NoTranslation when the term
            # dictionary lacks a bound term (src/rule.rs:154-165,221-223)
            raise NoTranslation(value) from exc

    def lower_atoms(atoms: Sequence[Atom]) -> list:
        out = []
        for atom in atoms:
            out.append(
                tuple(
                    ("v", var_slot[e.value]) if e.is_var else ("c", lower_const(e.value))
                    for e in atom
                )
            )
        return out

    return LoweredRule(
        index=index,
        body=lower_atoms(rule.if_all),
        head=lower_atoms(rule.then),
        n_vars=len(canon),
        canon_vars=canon,
    )
