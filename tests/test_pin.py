"""Pin-strategy knob (operators/pin.py): one conf switches every
lineage pin in the package between localCheckpoint (default),
reliable checkpoint(dir), and lineage-keeping persist — the
executor-loss trade documented in the module docstring."""

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.pin import (
    CHECKPOINT_DIR_CONF, STRATEGY_CONF, pin)


@pytest.fixture(autouse=True)
def _restore_conf(spark):
    yield
    spark.conf.unset(STRATEGY_CONF)
    spark.conf.unset(CHECKPOINT_DIR_CONF)


def _df(spark):
    return spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"))


def test_default_local_truncates_lineage(spark):
    out = pin(_df(spark))
    assert out.count() == 100
    # localCheckpoint plans scan an RDD leaf, not the range source
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan


def test_reliable_requires_and_uses_checkpoint_dir(spark, tmp_path):
    spark.conf.set(STRATEGY_CONF, "reliable")
    sc = spark.sparkContext
    if not sc.getCheckpointDir():
        with pytest.raises(ValueError, match="checkpoint dir"):
            pin(_df(spark))
    spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "ckpt"))
    out = pin(_df(spark), eager=True)
    assert out.count() == 100
    assert sc.getCheckpointDir() is not None


def test_persist_keeps_result_and_counts_eagerly(spark):
    spark.conf.set(STRATEGY_CONF, "persist")
    out = pin(_df(spark), eager=True)
    assert out.storageLevel.useDisk
    assert out.count() == 100
    out.unpersist()


def test_snapshot_upgrades_persist_to_materialization(spark, tmp_path):
    """snapshot=True pins guard read-before-append flows: under the
    'persist' strategy they must NOT keep lineage (a lost cache block
    would re-execute against the mutated source), so pin() upgrades
    them to localCheckpoint (or the reliable checkpoint when a dir is
    configured)."""
    spark.conf.set(STRATEGY_CONF, "persist")
    out = pin(_df(spark), snapshot=True)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan  # materialized, lineage gone
    assert out.count() == 100
    # with a checkpoint dir configured, durability intent is honoured
    spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "snapck"))
    out2 = pin(_df(spark), snapshot=True)
    assert out2.count() == 100
    plan2 = out2._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan2


def test_snapshot_semantics_incremental_dedup_under_persist(spark, tmp_path):
    """End-to-end: incremental minhash dedup appends its batch to the
    index it reads — under strategy=persist the snapshot pin must keep
    the batch from matching itself on plan re-execution. unpersist()
    forces the worst case (every block dropped) after the append."""
    from dig_etl_engine_spark.operators.dedup import incremental_minhash_dedup
    spark.conf.set(STRATEGY_CONF, "persist")
    idx = str(tmp_path / "mh_idx")
    base = spark.createDataFrame(
        [(i, f"base shingle corpus text number {i} " * 4)
         for i in range(20)], "doc_id LONG, text STRING")
    incremental_minhash_dedup(base, idx, content_col="text", append=True)
    batch = spark.createDataFrame(
        [(100, "completely novel text that matches nothing at all xyzzy "
          * 4)], "doc_id LONG, text STRING")
    result = incremental_minhash_dedup(
        batch, idx, content_col="text", append=True)
    result.unpersist()  # no-op on a materialized snapshot; fatal on a cache
    rows = result.collect()  # re-executes IF lineage survived
    assert all(r["doc_a"] != r["doc_b"] for r in rows)
    assert rows == []  # novel doc: no matches, and no self-match


def test_unknown_strategy_rejected(spark):
    spark.conf.set(STRATEGY_CONF, "banana")
    with pytest.raises(ValueError, match="banana"):
        pin(_df(spark))


def test_minhash_state_runs_under_each_strategy(spark, tmp_path):
    """The heaviest pin consumer end-to-end under all three settings —
    same results regardless of strategy."""
    from dig_etl_engine_spark.operators.dedup import minhash_lsh_pairs
    rows = [(i, f"some repeated shingle text body number {i % 5} "
             * 4) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    want = None
    for strat in ("local", "persist", "reliable"):
        spark.conf.set(STRATEGY_CONF, strat)
        spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "ck"))
        got = sorted(tuple(r) for r in minhash_lsh_pairs(
            df, "text").select("doc_a", "doc_b").collect())
        if want is None:
            want = got
        assert got == want and len(got) > 0
