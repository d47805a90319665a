"""Classifier-based quality filter (`operators/quality_model.py`):
train on labeled good/junk text, score a held-out set, persist the model.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.quality_model import (
    score_quality, train_quality_classifier)

GOOD = ("the committee published its annual report on water quality and "
        "the measures taken to improve river basins across the region "
        "with detailed findings for each district")
JUNK_REP = "buy now " * 30
JUNK_SPAM = "aaaaaaaaaaaaaaaa " * 12


def _labeled(spark, n=30):
    rows = []
    for i in range(n):
        rows.append((f"g{i}", GOOD + f" sample {i} extra detail", 1.0))
        junk = JUNK_REP if i % 2 else JUNK_SPAM
        rows.append((f"j{i}", junk + f"x{i}", 0.0))
    return spark.createDataFrame(rows,
                                 "doc_id string, text string, label double")


@pytest.fixture(scope="module")
def model(spark):
    return train_quality_classifier(_labeled(spark))


def test_separates_heldout_good_from_junk(spark, model):
    held = spark.createDataFrame([
        ("h1", GOOD + " fresh unseen phrasing of the findings"),
        ("h2", "the council met on tuesday to review the harbour works "
               "and approved the revised schedule for the autumn"),
        ("h3", "click here " * 25),
        ("h4", "zzzzzzzzzzzz " * 15),
    ], "doc_id string, text string")
    got = {r.doc_id: r.quality_prob
           for r in score_quality(held, model).collect()}
    assert min(got["h1"], got["h2"]) > max(got["h3"], got["h4"])
    assert got["h1"] > 0.8 and got["h4"] < 0.2
    # scoring drops the internal feature/vector columns
    cols = set(score_quality(held, model).columns)
    assert cols == {"doc_id", "text", "quality_prob"}


def test_null_text_and_user_column_survive(spark, model):
    # null text is scored (as empty) instead of crashing the assembler —
    # what it scores is the model's business — and a user column that
    # shares a heuristic's natural name is untouched
    held = spark.createDataFrame(
        [("h1", GOOD, 42), ("h2", None, 7)],
        "doc_id string, text string, n_tokens int")
    rows = {r.doc_id: r for r in score_quality(held, model).collect()}
    assert 0.0 <= rows["h2"].quality_prob <= 1.0
    assert rows["h1"].n_tokens == 42 and rows["h2"].n_tokens == 7


def test_model_save_load_roundtrip(spark, model, tmp_path):
    from pyspark.ml import PipelineModel
    p = str(tmp_path / "qmodel")
    model.write().overwrite().save(p)
    loaded = PipelineModel.load(p)
    held = spark.createDataFrame([("x", GOOD)], "doc_id string, text string")
    a = score_quality(held, model).head().quality_prob
    b = score_quality(held, loaded).head().quality_prob
    assert a == b


class TestPinnedModel:
    """The deployable train-once/score-everywhere split: the registry's
    `quality_classifier_filter` scores with PINNED_COEFFICIENTS (shipped
    constants), so the pinned model must keep separating the fixture it
    was fitted on and stay sign-consistent with a fresh LBFGS fit."""

    def test_pinned_model_separates_real_docs_from_junk(self, spark,
                                                        sf_unit):
        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.quality_model import (
            quality_logit)
        docs = load_tables(spark, sf_unit)["documents"] \
            .select("doc_id", "text")
        junk = docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat_ws(" ", F.array_repeat(F.lit("zzz"), 40))
            .alias("text"))
        scored = quality_logit(docs.unionByName(junk))
        agg = scored.withColumn("is_junk", F.col("doc_id") >= 100000) \
            .groupBy("is_junk") \
            .agg(F.min("quality_logit").alias("lo"),
                 F.max("quality_logit").alias("hi"))
        r = {row["is_junk"]: row for row in agg.collect()}
        assert r[True]["hi"] < 0.0 < r[False]["lo"], (
            "pinned coefficients no longer separate the training fixture"
        )

    def test_pinned_coefficients_sign_consistent_with_fresh_fit(
            self, spark, sf_unit):
        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.quality_model import (
            PINNED_COEFFICIENTS, train_quality_classifier)
        docs = load_tables(spark, sf_unit)["documents"] \
            .select("doc_id", "text")
        junk = docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat_ws(" ", F.array_repeat(F.lit("zzz"), 40))
            .alias("text"))
        labeled = (docs.withColumn("label", F.lit(1.0))
                   .unionByName(junk.withColumn("label", F.lit(0.0))))
        lr = train_quality_classifier(labeled).stages[-1]
        for pinned, fresh in zip(PINNED_COEFFICIENTS, lr.coefficients):
            if abs(fresh) > 1e-6:  # dead features may drift either way
                assert pinned * fresh >= 0, (
                    f"pinned {pinned} vs fresh {fresh}: sign flip — "
                    "retrain and re-pin PINNED_COEFFICIENTS")
