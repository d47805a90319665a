"""Structural contract of the query registry, independent of value
parity (that's `test_oracle_parity.py`):

* every registered query's OUTPUT schema is atomic — the driver's pandas
  canonicalizer crashes on array/map/struct cells (the round-4
  `unhashable type: 'list'` failure class), so this is load-bearing;
* registry iteration order is least-recently-driver-verified first —
  the driver time-boxes its sweep to a prefix window, so ordering is
  what guarantees every query cycles through verification;
* `oracle=None` escapes are enumerated, not open-ended.

Schemas are taken at sf0.001 (plan construction only where possible;
some queries materialize during construction — trainers, streams — so
this suite shares the session-scoped spark fixture).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from dig_etl_engine_spark import queries as registry
from tests.oracle_harness import assert_atomic_schema

SF_SMALL = "/root/testdata/sf0.001"

# Queries allowed to register with oracle=None. Keep this list EMPTY
# unless a query is genuinely not SQL-replayable — and then document why
# here, not just at the registration site.
ALLOWED_NO_ORACLE: dict[str, str] = {}


def _names():
    return list(registry.queries())


@pytest.mark.parametrize("name", _names(), ids=_names())
def test_output_schema_is_atomic(spark, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_SMALL)
    errs = assert_atomic_schema(name, df)
    assert not errs, "\n".join(errs)


def test_no_oracle_escapes_are_enumerated():
    q = registry.queries()
    o = registry.oracle_sql()
    missing = {n for n in q if n not in o}
    assert missing == set(ALLOWED_NO_ORACLE), (
        f"queries registered with oracle=None but not documented in "
        f"ALLOWED_NO_ORACLE: {sorted(missing - set(ALLOWED_NO_ORACLE))}; "
        f"stale allowlist entries: {sorted(set(ALLOWED_NO_ORACLE) - missing)}"
    )


def test_registry_orders_least_recently_verified_first():
    """The driver walks `queries()` in iteration order and time/count-boxes
    the sweep, so the registry must present un-verified and stalest
    verdicts first. Recompute the expected key from the CORRECTNESS_r*.json
    files and assert the registry's actual order is sorted by it."""
    root = Path(__file__).resolve().parent.parent
    last: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.loads(path.read_text())
        for n, v in data.items():
            if isinstance(v, dict) and v.get("rows_match") \
                    and v.get("schema_match") and v.get("hash_match"):
                last[n] = max(last.get(n, -1), rnd)
    names = _names()
    keys = [last.get(n, -1) for n in names]
    assert keys == sorted(keys), (
        "registry iteration order is not least-recently-verified first; "
        f"first inversion near: "
        f"{[(n, k) for n, k in zip(names, keys)][:60]}"
    )
