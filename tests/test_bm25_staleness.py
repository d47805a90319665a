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


def test_load_path_unchanged(spark, corpus, tmp_path):
    path = str(tmp_path / "bm25")
    materialize_bm25_stats(corpus, path)
    n_docs, avgdl, dfs = load_bm25_stats(spark, path, ["fast", "absent"])
    assert n_docs == 3
    assert dfs == {"fast": 2, "absent": 0}
    assert avgdl == pytest.approx((4 + 5 + 3) / 3)
