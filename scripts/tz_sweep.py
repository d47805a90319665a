"""Session-timezone robustness gate: the full registry (or a named
subset) must be hash-identical under a UTC and an America/New_York
session — the repeatable form of the r8 sweep that caught
`stream_windowed_counts`' zone dependence (README, round-8 notes), so
the axis can't silently rot between rounds.

Usage (round-close checklist step):

    python scripts/tz_sweep.py [sf_dir] [name ...]       # default sf0.001
    python scripts/tz_sweep.py --zone <tz> <sf_dir> ...  # (internal child)

The parent spawns one FRESH python child per zone — the zone must be
set in the process environment (``TZ`` + ``time.tzset``) and the Spark
session conf BEFORE the JVM starts, because kernels (pandas/numpy
datetime handling) and JVM defaults both capture it at startup; flipping
``spark.sql.session.timeZone`` inside a live test session covers only
the Catalyst half. Each child emits one JSON map
``{name: [rowcount, schema, value_hash]}``; the parent diffs the two.

A DIFF means a query consults the session zone somewhere on its hashed
surface — the classes seen so far: ``unix_micros(cast(ntz AS
timestamp))`` (interprets wall time in the session zone — use
``timestamp_diff`` calendar arithmetic against the NTZ epoch instead)
and fixed-width ``F.window`` over a parsed instant (buckets by
zone-shifted epochs — shift to the naive-as-UTC epoch first and
compensate on output). See timeseries/convert.py and
streaming/stateful.py for the fixed patterns.
"""

from __future__ import annotations

import hashlib
import json
import glob
import os
import subprocess
import sys
from pathlib import Path

ZONES = ("UTC", "America/New_York")
DEFAULT_SF = "/root/testdata/sf0.001"


def _child(zone: str, sf: str, names: list[str]) -> int:
    os.environ["TZ"] = zone
    import time

    time.tzset()
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from pyspark.sql import SparkSession

    from dig_etl_engine_spark import queries as registry
    from tests.oracle_harness import _norm_rows

    b = (SparkSession.builder.master("local[8]")
         .appName(f"tz_sweep_{zone}")
         .config("spark.sql.session.timeZone", zone)
         .config("spark.sql.shuffle.partitions", "16"))
    # extra SQL confs ride the environment so sibling gates
    # (conf_sweep.py) can reuse this child protocol for the
    # deployment-conf axes (ANSI off, case-sensitive resolution,
    # interpreted eval) without a second child implementation
    for k, v in json.loads(
            os.environ.get("TZSWEEP_EXTRA_SQL_CONF", "{}")).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    q = registry.queries()
    out: dict[str, list] = {}
    for name in names or sorted(q):
        df = q[name](spark, sf)
        cols, rows = _norm_rows(df.columns, [tuple(r) for r in df.collect()])
        h = hashlib.sha256(
            repr((cols, rows)).encode()).hexdigest()[:16]
        out[name] = [len(rows), [f"{c}:{t}" for c, t in df.dtypes], h]
    print("TZSWEEP_JSON:" + json.dumps(out, sort_keys=True))
    return 0


def split_sf_arg(args: list[str]) -> tuple[str, list[str]]:
    """Split an optional leading sf_dir from query-name args. A dataset
    dir may be given relative (testdata/sf0.001), but it must be a
    directory CONTAINING parquet tables — a bare existing dir that
    happens to share a query's name must not eat the query arg."""
    if args and (args[0].startswith("/")
                 or (os.path.isdir(args[0])
                     and glob.glob(os.path.join(args[0], "*.parquet")))):
        return os.path.abspath(args[0]), args[1:]
    return DEFAULT_SF, args


def run_child(zone: str, sf: str, names: list[str],
              env: dict[str, str] | None = None,
              label: str | None = None) -> dict | None:
    """Spawn one fresh child under ``zone`` (and optional extra env),
    return its {name: [rows, dtypes, hash]} payload, or None after
    printing the failure (shared with hostile_env_sweep — one copy of
    the child protocol, so a payload-shape change can't silently
    desynchronize the two gates). ``label`` names the failure line —
    hostile_env_sweep passes its composed-environment label so a
    locale/charset-knob crash isn't misattributed to the zone axis."""
    proc = subprocess.run(
        [sys.executable, __file__, "--zone", zone, sf, *names],
        capture_output=True, text=True, env=env)
    payload = [ln for ln in proc.stdout.splitlines()
               if ln.startswith("TZSWEEP_JSON:")]
    if proc.returncode != 0 or not payload:
        print(f"{label or zone}: child failed\n{proc.stdout[-2000:]}"
              f"\n{proc.stderr[-4000:]}")
        return None
    return json.loads(payload[0][len("TZSWEEP_JSON:"):])


def diff_results(base: dict, other: dict, diff_label: str) -> list[str]:
    """Print the per-query OK/diff report; return the differing names."""
    bad = []
    for name in sorted(base):
        same = base[name] == other.get(name)
        print(f"{name}: {'OK' if same else diff_label} "
              f"rows={base[name][0]}")
        if not same:
            bad.append(name)
            print(f"    base ={base[name]}\n    other={other.get(name)}")
    return bad


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--zone":
        zone, sf, names = args[1], args[2], args[3:]
        return _child(zone, sf, names)
    sf, args = split_sf_arg(args)
    results = {}
    for zone in ZONES:
        got = run_child(zone, sf, args)
        if got is None:
            return 2
        results[zone] = got
    bad = diff_results(results[ZONES[0]], results[ZONES[1]], "ZONE-DIFF")
    print(f"tz_sweep: {len(results[ZONES[0]]) - len(bad)}"
          f"/{len(results[ZONES[0]])} zone-independent at {sf}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
