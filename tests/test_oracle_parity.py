"""The main correctness gate, run locally: every registered query must
hash-match its DuckDB oracle at sf0.01 (exactly what the driver does).
Queries without an oracle get a rows-runnable smoke check."""

from __future__ import annotations

import pytest

from dig_etl_engine_spark import queries as registry
from tests.oracle_harness import assert_atomic_schema, compare


def _pairs():
    q = registry.queries()
    o = registry.oracle_sql()
    return [(name, fn, o.get(name)) for name, fn in sorted(q.items())]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, sf_oracle, name, fn, sql):
    if sql is None:
        df = fn(spark, sf_oracle)
        assert not assert_atomic_schema(name, df)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    errs = compare(spark, sf_oracle, name, fn, sql)
    assert not errs, "\n".join(errs)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_every_query_has_docstring_citation():
    for name, fn in registry.queries().items():
        assert fn.__doc__, f"{name} lacks a docstring citation"
