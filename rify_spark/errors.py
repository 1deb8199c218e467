"""Error types mirroring the reference engine's error enums.

Reference parity:
  - ``CantProve::{ExhaustedSearchSpace, NovelName}`` (reference src/prove.rs:212-220)
  - ``Invalid::{BadRuleApplication, NoSuchRule}`` (reference src/validate.rs:97-104)
  - ``InvalidRule::UnboundImplied`` (reference src/rule.rs:196-210)
  - ``NoTranslation`` (reference src/rule.rs:221-223)
"""

from __future__ import annotations


class RifyError(Exception):
    """Base class for all engine errors."""


class CantProve(RifyError):
    """A proof of the requested composite claims does not exist."""


class ExhaustedSearchSpace(CantProve):
    """Entire search space was exhausted; the requested proof does not exist."""

    def __init__(self) -> None:
        super().__init__("ExhaustedSearchSpace")


class NovelName(CantProve):
    """An entity in ``to_prove`` was never mentioned in premises or rules."""

    def __init__(self) -> None:
        super().__init__("NovelName")


class Invalid(RifyError):
    """A proof failed validation."""


class BadRuleApplication(Invalid):
    """The rule being applied expects a different number of name bindings."""

    def __init__(self) -> None:
        super().__init__("BadRuleApplication")


class NoSuchRule(Invalid):
    """The rule index exceeds the provided rule list."""

    def __init__(self) -> None:
        super().__init__("NoSuchRule")


class InvalidRule(RifyError, ValueError):
    """A rule violates a structural invariant."""


class UnboundImplied(InvalidRule):
    """`then` contains an unbound name that does not occur in `if_all`.

    This is the range-restriction that keeps inference polynomial
    (reference src/rule.rs:60-62,72-86).
    """

    def __init__(self, name: object) -> None:
        self.name = name
        super().__init__(f"UnboundImplied({name!r})")


class NoTranslation(RifyError, KeyError):
    """A bound term has no entry in the term dictionary."""

    def __init__(self, term: object) -> None:
        self.term = term
        super().__init__(f"NoTranslation({term!r})")


class DictionaryCollision(RifyError):
    """Two distinct terms hashed to the same 64-bit id.

    Raised by the collision audit (see rify_spark.dictionary). At test scale
    this is effectively impossible; at corpus scale the audit is the guard
    rail mandated by the salted hash-partitioned id-space design.
    """
