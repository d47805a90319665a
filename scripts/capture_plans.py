"""Capture ``explain("formatted")`` for headline queries → plans/$SPARK_GRAFT_PLANS_DIR (default r12).

Usage:
    python scripts/capture_plans.py before [query ...]
    python scripts/capture_plans.py after  [query ...]

Writes ``plans/<dir>/<query>_<suffix>.txt`` for each named query (default:
the full bench HEADLINE list). The capture runs at the bench scale
factor dir ($SPARK_GRAFT_SF_DIR, default sf0.1) so the plans are the
ones the bench actually executes. Queries whose construction
materializes fixtures (index builds, stream drains) run those builds as
a side effect — the captured plan is the returned DataFrame's, i.e. the
final read/rank stage, which is what `.count()` times after the fixture
cache warms.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dig_etl_engine_spark.session import get_spark
    from dig_etl_engine_spark import queries as registry

    spark = get_spark("capture_plans")
    qmap = registry.queries()
    out_dir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get("SPARK_GRAFT_PLANS_DIR", "r12")
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(plan,
                                                      encoding="utf-8")
        print(f"captured {name} ({len(plan)} chars)")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
