"""Catalog memoization contract (`catalog.load_tables`).

`load_tables` is called by every registry query at construction time; the
parquet file-listing + footer schema reads it performs are pure driver
round-trips against canonical tables that never change within a session.
The memo must (a) return the SAME analyzed DataFrames on repeat calls,
(b) keep distinct sf_dirs distinct, and (c) repoint the session's temp
views whenever the requested sf_dir differs from what the views
currently hold, so a later call against a different sf_dir wins the view
namespace. Since r12 a SAME-dir repeat call deliberately skips the ~10
registration round trips (they sat inside every query's construction);
the documented trade is that an externally dropped/clobbered view is
only restored by a call whose sf_dir differs from the memo — pinned
below so the contract change stays visible.
"""

from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def test_repeat_call_returns_memoized_frames(spark):
    first = load_tables(spark, SF_A)
    second = load_tables(spark, SF_A)
    assert set(first) == set(second)
    for name in first:
        assert first[name] is second[name], name


def test_distinct_sf_dirs_not_conflated(spark):
    a = load_tables(spark, SF_A)
    b = load_tables(spark, SF_B)
    assert a["lineitem"] is not b["lineitem"]
    assert a["lineitem"].count() != b["lineitem"].count()


def test_views_repointed_on_every_call(spark):
    load_tables(spark, SF_A)
    n_a = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    load_tables(spark, SF_B)
    n_b = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    load_tables(spark, SF_A)
    n_a2 = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    assert n_a != n_b
    assert n_a == n_a2


def test_same_dir_skip_and_cross_dir_restore(spark):
    """The r12 registration memo: a same-dir repeat call skips view
    registration (an externally dropped view stays dropped — the
    documented trade for removing ~80 ms from every query build), while
    any cross-dir call repoints/restores the full view set."""
    load_tables(spark, SF_A)
    spark.catalog.dropTempView("lineitem")
    load_tables(spark, SF_A)            # same dir → skip, not restored
    assert not spark.catalog.tableExists("lineitem")
    load_tables(spark, SF_B)            # different dir → full register
    assert spark.catalog.tableExists("lineitem")
    n_b = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    load_tables(spark, SF_A)
    n_a = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    assert n_a != n_b


def test_memoized_frames_stay_lazy_and_pruned(spark):
    # The memo caches *analyzed* frames; projections over them must still
    # push column pruning into the parquet scan.
    docs = load_tables(spark, SF_A)["documents"]
    plan = (docs.select("doc_id")
                .filter(F.col("doc_id").isNotNull())
                ._jdf.queryExecution().executedPlan().toString())
    assert "ReadSchema" in plan
    assert "text" not in plan.split("ReadSchema")[1][:300]


def test_returned_dict_is_a_copy(spark):
    """Mutating the returned mapping must not poison the cache for
    later callers (the cache hands out copies)."""
    from dig_etl_engine_spark.catalog import load_tables
    sf = "/root/testdata/sf0.001"
    t1 = load_tables(spark, sf, register_views=False)
    t1["documents"] = None
    t1.pop("region", None)
    t2 = load_tables(spark, sf, register_views=False)
    assert t2["documents"] is not None
    assert "region" in t2
