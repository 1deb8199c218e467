"""Pure-Python reference evaluator: a naive backtracking forward chainer.

~30 lines written directly from the rule semantics (reference engine
src/reasoner.rs:120-227 is the same tuple-at-a-time shape), sharing no
code with the Spark engine — the engine-independent oracle the property
gate (tests/test_property.py) and the randomized soaks
(scripts/random_walk_soak.py) pin the distributed implementation against.
Deliberately naive: clarity over speed, only ever run on toy inputs.
"""

from __future__ import annotations


def bindings(atoms, store, binding):
    """All extensions of ``binding`` matching ``atoms`` against ``store``."""
    if not atoms:
        yield binding
        return
    first, rest = atoms[0], atoms[1:]
    for quad in store:
        b = dict(binding)
        for e, val in zip(first, quad):
            if e.is_var:
                if b.setdefault(e.value, val) != val:
                    break
            elif e.value != val:
                break
        else:
            yield from bindings(rest, store, b)


def naive_closure(facts, rules) -> set:
    """The full closure (premises ∪ everything derivable) as a set of
    4-tuples."""
    store = set(facts)
    while True:
        new = set()
        for r in rules:
            for b in bindings(list(r.if_all), list(store), {}):
                for atom in r.then:
                    q = tuple(b[e.value] if e.is_var else e.value for e in atom)
                    if q not in store:
                        new.add(q)
        if not new:
            return store
        store |= new
