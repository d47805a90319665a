"""Deployment-SQL-conf robustness gate: the full registry (or a named
subset) must be hash-identical between the driver's default session and
a session where a cluster-level SQL conf a real deployment plausibly
flips is adversarial:

  * ``spark.sql.ansi.enabled=false``     — Spark 4 defaults ANSI on; a
    cluster that turned it off changes overflow/cast/element_at
    semantics from error to silent NULL, so any query RELYING on an
    ANSI error path (or differing under the legacy coercions) diverges
    silently.
  * ``spark.sql.caseSensitive=true``     — default-off; enabling it
    makes column resolution case-sensitive, so any engine-internal
    column-name case mixing CRASHES instead of resolving.
  * ``spark.sql.adaptive.enabled=false`` — AQE re-plans at runtime;
    results must not depend on it (plan-shape changes only).
  * ``spark.sql.codegen.wholeStage=false`` + ``factoryMode=NO_CODEGEN``
    — forces the INTERPRETED expression-eval path engine-wide; codegen
    and interpreted eval are two implementations of every expression,
    and a divergence between them is a silent-wrongness class of its
    own (same family as the engine-vs-oracle hash checks, but
    engine-vs-engine).

Same family as ``tz_sweep`` (zone axis) and ``hostile_env_sweep``
(JVM-locale/charset/Python-locale axes); this covers the SESSION-CONF
axes those can't reach. One fresh child per conf set (reusing
``tz_sweep``'s child protocol — the conf rides the
``TZSWEEP_EXTRA_SQL_CONF`` env var and binds at session build), all
compared against one baseline child.

Usage (round-close checklist step, after tz_sweep + hostile_env_sweep):

    python scripts/conf_sweep.py [sf_dir] [name ...]   # default sf0.001
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import tz_sweep  # noqa: E402  (shared child protocol + compare loop)

CONF_SETS: dict[str, dict[str, str]] = {
    "ansi_off": {"spark.sql.ansi.enabled": "false"},
    "case_sensitive": {"spark.sql.caseSensitive": "true"},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "interpreted": {"spark.sql.codegen.wholeStage": "false",
                    "spark.sql.codegen.factoryMode": "NO_CODEGEN"},
}


def main() -> int:
    sf, args = tz_sweep.split_sf_arg(sys.argv[1:])
    # the baseline must run with DEFAULT confs: a TZSWEEP_EXTRA_SQL_CONF
    # inherited from the parent environment would silently turn every
    # comparison into conf-vs-conf instead of conf-vs-default
    base_env = dict(os.environ)
    base_env.pop("TZSWEEP_EXTRA_SQL_CONF", None)
    base = tz_sweep.run_child("UTC", sf, args, env=base_env,
                              label="conf[baseline]")
    if base is None:
        return 2
    rc = 0
    for label, confs in CONF_SETS.items():
        env = dict(base_env)
        env["TZSWEEP_EXTRA_SQL_CONF"] = json.dumps(confs)
        got = tz_sweep.run_child("UTC", sf, args, env=env,
                                 label=f"conf[{label}]({confs})")
        if got is None:
            return 2
        bad = tz_sweep.diff_results(base, got, f"CONF-DIFF[{label}]")
        print(f"conf_sweep[{label}]: {len(base) - len(bad)}/{len(base)} "
              f"conf-independent at {sf}")
        if bad:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
