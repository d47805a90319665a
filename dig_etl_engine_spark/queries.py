"""Query registry: every implemented operator from SURVEY.md §2 declared as a
(spark_fn, oracle_sql) pair over the canonical test tables.

The driver contract (``__spark_entry__.py``) runs each ``spark_fn(spark,
sf_dir)`` and its DuckDB oracle side by side, comparing row count, schema and
an order-insensitive value hash. Conventions that make the hashes stable:

  * every computed column is aliased identically in Spark and SQL;
  * double-typed aggregates are rounded explicitly on BOTH sides (float
    summation order differs between engines at the 1e-12 level);
  * timestamps are projected as formatted strings (Spark session tz is UTC,
    DuckDB is UTC-naive — strings remove the ambiguity).

Each entry's docstring cites the reference operator it covers
(file:line under /root/reference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the registry with its DuckDB oracle SQL.

    ``oracle=None`` → non-SQL-expressible; the driver records a weaker
    rows-only check (allowed for custom stateful / iterative ops).
    """
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import side effects)."""
    global _LOADED
    if _LOADED:
        return
    from dig_etl_engine_spark import (  # noqa: F401
        queries_relational,
        queries_ingest,
        queries_extraction,
        queries_search,
        queries_llm,
        queries_timeseries,
        queries_io,
        queries_mapping,
        queries_modules,
    )
    _LOADED = True
