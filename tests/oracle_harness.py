"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same sf dir and
compares row count, column-name set, and an order-insensitive value
multiset (columns sorted by name, doubles rounded to 9 significant-ish
decimals before comparison — mirroring a value-hash check).
"""

from __future__ import annotations

import math

import duckdb

from dig_etl_engine_spark.catalog import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for c in sorted(cols)], out


def assert_atomic_schema(name: str, sdf) -> list[str]:
    """The driver's pandas canonicalizer sort_values-crashes on list/dict
    cells (`TypeError: unhashable type` — the r4 failure mode), so every
    registry output column must be atomic. Enforced here so the local
    harness can never 'pre-validate green' a query the driver will
    reject."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f"{name}: non-atomic output column {f.name!r} ({f.dataType.simpleString()}) "
        "— the driver canonicalizer rejects array/map/struct; emit long "
        "form via posexplode or to_json instead"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def compare(spark, sf_dir: str, name: str, spark_fn, sql: str,
            max_report: int = 5) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    sdf = spark_fn(spark, sf_dir)
    errs.extend(assert_atomic_schema(name, sdf))
    if errs:
        return errs
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    if sorted(scols) != sorted(dcols):
        errs.append(f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}")
        return errs
    if len(srows) != len(drows):
        errs.append(f"{name}: row count spark={len(srows)} duck={len(drows)}")
    _, ns = _norm_rows(scols, srows)
    _, nd = _norm_rows(dcols, drows)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b]
        errs.append(f"{name}: value mismatch ({len(diffs)} differing rows of {len(ns)}); "
                    f"first: {diffs[:max_report] if diffs else (ns[:2], nd[:2])}")
    return errs
