"""Excel-style location/range spec parsing (T1).

Reference: ``utilities/timeseries/LocationParser.py:13-75`` and
``LocationRange.py:1-69``. Behavior port (not a code port — Py3, plain
generators):

  * ``[B:*]``-style range strings with comma-separated components;
  * a component is ``X`` (singleton), ``X:Y`` (interval, 1-based start,
    end exclusive after the reference's asymmetric ``-1`` on start only),
    ``X:incr:Y`` (strided interval), ``X:*`` (infinite from X);
  * column labels A..ZZZ translate to 1-based indices, rows are numeric;
  * ``(A,5)``-style cell coordinates → (row, col) 0-based.

Intentional divergence: the reference's 3-part form with a ``*`` middle
(``LocationParser.py:35-38``) passes the sentinel to ``int()`` and would
crash; we read ``X:*:incr`` as an infinite strided range instead.
"""

from __future__ import annotations

import itertools
import re
from collections.abc import Iterator
from dataclasses import dataclass

_RANGE = re.compile(r"\[(.+?)\]")
_CELL = re.compile(r"\(([A-Z]+),(\d+)\)")
_COL = re.compile(r"[A-Z]+")


def col_label_to_index(label: str) -> int:
    """'A' → 1, 'Z' → 26, 'AA' → 27 … (base-26 bijective numeration)."""
    n = 0
    for ch in label:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


@dataclass
class RangeComponent:
    """One component of a location range; ``end is None`` ⇒ infinite."""
    start: int              # 0-based
    end: int | None         # exclusive, 0-based-compatible (see parse_range)
    increment: int = 1
    infinite: bool = False

    def indices(self) -> Iterator[int]:
        if self.infinite:
            return itertools.count(self.start, self.increment)
        return iter(range(self.start, self.end, self.increment))


class LocationRange:
    """Ordered union of range components, iterable as 0-based indices.

    ``component_at`` exposes which component produced a given position so
    region extraction can apply blank-stop only inside infinite components
    (``extractSpreadsheet.py:133-155``).
    """

    def __init__(self, components: list[RangeComponent]):
        self.components = components

    def __iter__(self) -> Iterator[tuple[int, RangeComponent]]:
        for comp in self.components:
            for idx in comp.indices():
                yield idx, comp


def parse_range(spec: str) -> LocationRange:
    """Parse ``[A:C,5,J:2:S,7:*]`` → LocationRange (reference semantics:
    start is 1-based minus one; interval end is the raw translated label —
    i.e. inclusive end, because range() stops before it +1 ... the
    reference uses ``range(start-1, end)`` making the end label inclusive)."""
    m = _RANGE.match(spec.strip())
    if not m:
        raise ValueError(f"bad range spec: {spec!r}")
    comps: list[RangeComponent] = []
    for raw in (x.strip() for x in m.group(1).split(",")):
        parts = raw.split(":")
        conv = (col_label_to_index if _COL.match(parts[0]) else int)
        start = conv(parts[0]) - 1
        if len(parts) == 1:
            comps.append(RangeComponent(start, start + 1))
        elif len(parts) == 2:
            if parts[1] == "*":
                comps.append(RangeComponent(start, None, infinite=True))
            else:
                comps.append(RangeComponent(start, conv(parts[1])))
        elif len(parts) == 3:
            if parts[1] == "*":
                comps.append(RangeComponent(start, None,
                                            increment=int(parts[2]),
                                            infinite=True))
            else:
                comps.append(RangeComponent(start, conv(parts[2]),
                                            increment=int(parts[1])))
        else:
            raise ValueError(f"bad range component: {raw!r}")
    return LocationRange(comps)


def parse_coords(spec: str) -> tuple[int, int]:
    """'(A,5)' → (row=4, col=0), both 0-based (`LocationParser.py:50-55`)."""
    m = _CELL.match(spec.strip())
    if not m:
        raise ValueError(f"bad cell coords: {spec!r}")
    return int(m.group(2)) - 1, col_label_to_index(m.group(1)) - 1
