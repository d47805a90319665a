"""Rank headline queries by pure construction time (driver-side fn() call,
no action) — guide §5: the driver should do almost no data work, yet query
construction runs inside the bench's timed region and every real caller's
latency budget.

Usage:
    python scripts/profile_construction.py [query ...]

Caveat: some queries' fn() legitimately RUNS jobs during construction
(stream drains, iterative trainers, eager pins); their reading here is
construction+jobs, not py4j chatter. The job count per construction is
printed alongside to tell the two apart.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dig_etl_engine_spark.session import get_spark
    from dig_etl_engine_spark import queries as registry
    from dig_etl_engine_spark.catalog import load_tables

    spark = get_spark("profile_construction")
    sc = spark.sparkContext
    qmap = registry.queries()
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()

    tracker = sc.statusTracker()
    rows = []
    for name in names:
        fn = qmap[name]
        fn(spark, sf_dir)           # warm-up build (fixture caches etc.)
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        # jobs run under the default group only when no group is set;
        # count via the all-jobs API instead
        j0 = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
        samples = []
        jobs_before = _all_job_count(sc)
        t0 = time.perf_counter()
        for _ in range(3):
            fn(spark, sf_dir)
        dt = (time.perf_counter() - t0) / 3
        jobs = (_all_job_count(sc) - jobs_before) / 3
        rows.append((dt, jobs, name))
        print(f"{name:35s} {dt*1000:8.1f} ms/build  {jobs:5.1f} jobs/build",
              flush=True)

    rows.sort(reverse=True)
    print("\n== ranked ==")
    total = sum(r[0] for r in rows)
    for dt, jobs, name in rows:
        print(f"{name:35s} {dt*1000:8.1f} ms  {jobs:5.1f} jobs")
    print(f"TOTAL construction {total:.2f} s/sweep (x{len(rows)} queries)")


def _all_job_count(sc) -> int:
    st = sc._jsc.sc().statusTracker()
    ids = st.getJobIdsForGroup(None)
    # getJobIdsForGroup(None) returns only group-less jobs; use the
    # AppStatusStore job list length instead for an all-jobs counter
    try:
        return sc._jsc.sc().statusStore().jobsList(None).size()
    except Exception:
        return len(ids)


if __name__ == "__main__":
    main()
