"""Canonical key widths for hash-based placement and membership.

``xxhash64`` (Spark's 64-bit column hash) is WIDTH-SENSITIVE: INT 42 and
BIGINT 42 hash to different values. Any structure that derives placement
or membership from a key hash — the Bloom pre-join filter's bitset
(`operators/runtime_filter.py`), the bucketed KG table's ``_kb=``
partition assignment (`sinks/kg_table.py`) — therefore breaks silently
when the same logical key arrives at two different widths: the bloom
filter drops every probe match (false negatives the exact join would
have kept), and the bucket merge reads the wrong partitions and keeps
duplicate keys. The r7 external review caught the bloom instance live
(HIGH); the bucket instance is the same class.

The fix, shared here so the two sites can never drift apart again:
widen every hash input to ONE canonical type per family before hashing
— integral → BIGINT, float → DOUBLE (the same widening an equi-join's
implicit cast performs, so hash agreement mirrors join agreement).
Types outside those families (string, binary, date, timestamp, decimal)
pass through unchanged: they have a single width per family already,
and CROSS-family mismatches must be rejected by the caller (compare
:func:`canonical_hash_type` on both sides), never papered over with a
lossy cast.
"""

from __future__ import annotations

from pyspark.sql import Column

_WIDEN = {"tinyint": "bigint", "smallint": "bigint", "int": "bigint",
          "float": "double"}


def canonical_hash_type(simple_type: str) -> str:
    """The family-canonical type a key of ``simple_type`` hashes at."""
    return _WIDEN.get(simple_type, simple_type)


def widen_for_hash(col: Column, simple_type: str) -> Column:
    """``col`` cast to its family-canonical width (no-op when already
    canonical — the returned expression is then token-identical to the
    raw column, so already-verified surfaces don't change)."""
    target = _WIDEN.get(simple_type)
    return col.cast(target) if target else col
