"""Table catalog: load the canonical test tables from a scale-factor dir.

The reference routes every logical type to one Elasticsearch index per
project (``manager.py:220`` in /root/reference — TypeIndexMapping,
SURVEY.md Q9). Here the catalog is the equivalent routing layer: logical
table name → parquet path → DataFrame, registered as temp views so both
the DataFrame API and ``spark.sql`` address the same tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_CATALOG_CACHE: dict[tuple[int, str], tuple[SparkSession,
                                            dict[str, DataFrame]]] = {}

# id(session) → (session, last (id, sf_dir) key whose views it holds).
# The session object is stored so an id() reused by a NEW session after
# GC can never satisfy the skip check (same identity discipline as
# _CATALOG_CACHE); entries are evicted with the cache eviction loop.
_LAST_REGISTERED: dict[int, tuple[SparkSession, tuple[int, str]]] = {}


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                register_views: bool = True) -> dict[str, DataFrame]:
    """Load every canonical table that exists under ``sf_dir``.

    Scans stay lazy — Catalyst prunes columns and pushes filters into the
    parquet reader, so loading "all tables" costs nothing until an action.

    The analyzed DataFrames are memoized per (session, sf_dir): the
    expensive part of this call is ten ``spark.read.parquet`` file
    listings + footer schema reads (~1 s of driver round-trips), paid
    by EVERY registry query at construction time — against canonical
    test tables that never change within a session. Temp views are a
    session-global namespace: a call whose sf_dir differs from what the
    session's views currently point at (re-)registers them, so a later
    ``load_tables`` against a DIFFERENT sf_dir always repoints the
    routing; a same-dir repeat call skips the ~10 catalog round trips
    (r12 — registration was ~80 ms inside every query's construction). Callers get a COPY of the cached dict (mutating the
    return value must not poison later callers), and entries whose
    session has been stopped are evicted on every call, so a long-lived
    process that cycles SparkSessions (pytest, notebooks) does not pin
    dead sessions and their plan objects forever."""
    # Runtime SQL conf (not a static conf): must be on even when the caller
    # built its own SparkSession (the driver does) — events.parquet stores
    # TIMESTAMP(NANOS) which Spark otherwise refuses to read.
    for k in [k for k, (s, _) in _CATALOG_CACHE.items()
              if s is not spark and _is_stopped(s)]:
        del _CATALOG_CACHE[k]
    for i in [i for i, (s, _) in _LAST_REGISTERED.items()
              if s is not spark and _is_stopped(s)]:
        del _LAST_REGISTERED[i]
    key = (id(spark), os.path.abspath(sf_dir))
    cached = _CATALOG_CACHE.get(key)
    if cached is not None and cached[0] is spark:
        out = cached[1]
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4's per-API-call call-site capture is 61% of measured
        # query-construction time; engine-built sessions disable it at
        # build time (session.py — it is a STATIC conf, so a session
        # built without it, e.g. the round driver's, keeps the default
        # and simply pays the capture cost; the try covers exactly that
        # CANNOT_MODIFY_STATIC_CONFIG case).
        try:
            spark.conf.set("spark.python.sql.dataFrameDebugging.enabled",
                           os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"))
        except Exception:
            pass
        out = {}
        for name in TABLES:
            p = table_path(sf_dir, name)
            if os.path.exists(p):
                out[name] = _normalize(name, spark.read.parquet(p))
        _CATALOG_CACHE[key] = (spark, out)
    last = _LAST_REGISTERED.get(id(spark))
    if register_views and not (last is not None and last[0] is spark
                               and last[1] == key):
        # (Re-)register only when this session's views don't already
        # point at THIS sf_dir: registration is ~10 catalog round trips
        # (~80 ms) paid by every registry query's construction — inside
        # the bench's timed region — against views that almost never
        # move. A later call with a DIFFERENT sf_dir still repoints
        # them (the memo skips re-analysis, never the routing).
        for name, df in out.items():
            df.createOrReplaceTempView(name)
        _LAST_REGISTERED[id(spark)] = (spark, key)
    return dict(out)


def _is_stopped(spark: SparkSession) -> bool:
    """True when a cached session has been stopped (its JVM handle is
    gone) — safe under any PySpark internals drift: treat errors while
    probing as 'stopped' so eviction never raises."""
    try:
        return spark._sc is None or spark._sc._jsc is None
    except Exception:
        return True


def materialize_bucketed(spark: SparkSession, df: DataFrame, name: str,
                         key: str, *, buckets: int = 8,
                         path: str | None = None) -> DataFrame:
    """Materialize ``df`` as a bucketed (+ sorted) table on ``key``.

    The co-located-join lever (SURVEY §4: "bucketing for co-located
    joins"): two tables bucketed on the same key with the same bucket
    count sort-merge-join with ZERO exchange — at 100 TB that deletes the
    dominant cost of every recurring fact-fact join (e.g. the KG doc table
    joined to its long index table on doc_id, re-joined by every query).
    Bucket once at write time; every later join rides the layout free.

    Bucketing metadata lives in the session catalog (`saveAsTable` —
    Spark's bucketed-scan planning requires a catalog table; plain
    ``.parquet()`` files can't carry bucket info). ``path`` makes it an
    external table so data lands in a caller-owned directory.
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)
    return spark.table(name)


def _normalize(name: str, df: DataFrame) -> DataFrame:
    """Schema normalization at the catalog boundary.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS); Spark reads it as
    long (``spark.sql.legacy.parquet.nanosAsLong``). Convert to a proper
    microsecond timestamp here so every downstream operator sees
    TimestampType — matching DuckDB's µs semantics after truncation.
    """
    from pyspark.sql import functions as F, types as T

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df
