"""Composed hostile-environment gate: the full registry (or a named
subset) must be hash-identical between the baseline environment
(UTC session, root JVM locale, UTF-8 Python locale) and a process where
EVERY deployment-environment knob the engine has ever been bitten by is
hostile AT ONCE:

  * ``TZ=America/New_York`` + session timezone   (r8 class: zone-shifted
    epochs — caught ``ts_rolling_anomaly``/``stream_windowed_counts``)
  * ``JAVA_TOOL_OPTIONS=-Duser.language=tr -Duser.country=TR``
    (r9 class: default-locale JVM case folding — ``functions/casefold.py``
    — and the writer's ``partitionOverwriteMode`` enum lookup, which
    uppercases under the default locale inside Spark itself)
  * ``-Dfile.encoding=ISO-8859-1`` (JVM default charset — Java 17 still
    honors it for default-charset APIs; all engine byte↔text paths must
    carry explicit UTF-8)
  * ``LANG=LC_ALL=C`` (r9 class: locale-default Python text-file codec —
    the utf-8 IO sweep; under C the preferred encoding is ASCII, so any
    missed text-mode open of non-ASCII content crashes loudly here)

The axes compose: a query could pass each single-knob sweep and still
consult two knobs whose effects cancel only in isolation. One child per
environment (fresh process — all three knobs bind at JVM/interpreter
start), reusing ``tz_sweep``'s child protocol and JSON hash format.

Usage (round-close checklist step, after ``tz_sweep``):

    python scripts/hostile_env_sweep.py [sf_dir] [name ...]   # default sf0.001
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import tz_sweep  # noqa: E402  (shared child protocol + compare loop)

ENVS: dict[str, dict[str, str]] = {
    "baseline": {},
    "hostile": {
        "JAVA_TOOL_OPTIONS": "-Duser.language=tr -Duser.country=TR "
                             "-Dfile.encoding=ISO-8859-1",
        "LANG": "C",
        "LC_ALL": "C",
    },
}
# the zone knob rides tz_sweep's --zone argument (it also sets TZ +
# time.tzset + the session conf inside the child)
ZONE = {"baseline": "UTC", "hostile": "America/New_York"}


def main() -> int:
    sf, args = tz_sweep.split_sf_arg(sys.argv[1:])
    results: dict[str, dict] = {}
    for label, extra in ENVS.items():
        env = dict(os.environ)
        for k, v in extra.items():
            # append JVM flags rather than clobber host-level settings
            env[k] = f"{env[k]} {v}" if k == "JAVA_TOOL_OPTIONS" \
                and env.get(k) else v
        got = tz_sweep.run_child(ZONE[label], sf, args, env=env,
                                 label=f"hostile[{label}]"
                                       f"(zone={ZONE[label]}, {extra})")
        if got is None:
            return 2
        results[label] = got
    bad = tz_sweep.diff_results(results["baseline"], results["hostile"],
                                "ENV-DIFF")
    print(f"hostile_env_sweep: {len(results['baseline']) - len(bad)}"
          f"/{len(results['baseline'])} environment-independent at {sf}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
