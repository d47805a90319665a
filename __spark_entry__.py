"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, backed by the registry in ``dig_etl_engine_spark.queries``
(each registration site documents the reference operator it covers).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from dig_etl_engine_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full coarse structured-search pipeline (glossary
    extraction → long-format KG index → weighted-match ranked retrieval),
    the engine's identity query (SURVEY §3.2), on sf0.001."""
    from dig_etl_engine_spark.queries_search import coarse_search_rank

    return coarse_search_rank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
