"""Hierarchical field-weight resolution (SURVEY §2.8 Q7).

Reference: `sandpaper/sandbox/config/etk/field_weights.json:2-124` under
/root/reference — a wildcard weight tree over
``indexed.<field>.<method>.<segment>.{value,key}`` paths, e.g.
``tld.* = 100``, ``indexed.phone.gurobi.* = 20``,
``extract_from_landmark.* = 15``, per-segment overrides. Resolution is
longest/most-specific match.

Here a weight pattern is ``(field, method, segment)`` with ``*`` wildcards;
specificity = number of non-wildcard components; ties → later definition
wins (configs are ordered most-general first, like the reference's JSON).
Resolution happens driver-side at compile time — the scoring expression
ships to executors with the weights already folded in as literals.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class WeightRule:
    field: str = "*"
    method: str = "*"
    segment: str = "*"
    weight: float = 1.0


class WeightTree:
    def __init__(self, rules: list[WeightRule]):
        self.rules = list(rules)

    def resolve(self, field: str, method: str = "*", segment: str = "*") -> float:
        """Most-specific matching rule's weight; default 1.0."""
        best: tuple[int, int] | None = None
        weight = 1.0
        for i, r in enumerate(self.rules):
            if not _match(r.field, field):
                continue
            if not _match(r.method, method):
                continue
            if not _match(r.segment, segment):
                continue
            spec = sum(c != "*" for c in (r.field, r.method, r.segment))
            rank = (spec, i)
            if best is None or rank >= best:
                best, weight = rank, r.weight
        return weight


def _match(pattern: str, value: str) -> bool:
    return pattern == "*" or value == "*" or pattern == value
