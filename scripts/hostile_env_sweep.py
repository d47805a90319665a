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

import json
import os
import subprocess
import sys
from pathlib import Path

DEFAULT_SF = "/root/testdata/sf0.001"
_TZ_SWEEP = str(Path(__file__).resolve().parent / "tz_sweep.py")

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
    args = sys.argv[1:]
    sf = DEFAULT_SF
    if args and os.path.isdir(args[0]):
        sf, args = os.path.abspath(args[0]), args[1:]
    results: dict[str, dict] = {}
    for label, extra in ENVS.items():
        env = dict(os.environ)
        for k, v in extra.items():
            # append JVM flags rather than clobber host-level settings
            env[k] = f"{env[k]} {v}" if k == "JAVA_TOOL_OPTIONS" \
                and env.get(k) else v
        proc = subprocess.run(
            [sys.executable, _TZ_SWEEP, "--zone", ZONE[label], sf, *args],
            capture_output=True, text=True, env=env)
        payload = [ln for ln in proc.stdout.splitlines()
                   if ln.startswith("TZSWEEP_JSON:")]
        if proc.returncode != 0 or not payload:
            print(f"{label}: child failed\n{proc.stdout[-2000:]}"
                  f"\n{proc.stderr[-4000:]}")
            return 2
        results[label] = json.loads(payload[0][len("TZSWEEP_JSON:"):])
    base, host = results["baseline"], results["hostile"]
    bad = []
    for name in sorted(base):
        same = base[name] == host.get(name)
        print(f"{name}: {'OK' if same else 'ENV-DIFF'} rows={base[name][0]}")
        if not same:
            bad.append(name)
            print(f"    baseline={base[name]}\n    hostile ={host.get(name)}")
    print(f"hostile_env_sweep: {len(base) - len(bad)}/{len(base)} "
          f"environment-independent at {sf}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
