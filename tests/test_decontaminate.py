"""Benchmark decontamination (`operators/text_analysis.py:decontaminate`):
n-gram overlap flagging of eval-set text inside a training corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.text_analysis import (
    decontaminate, ngram_hashes)

EVAL_SENT = ("what is the capital of france the capital of france "
             "is paris a city on the seine")          # 17 words


def test_flags_verbatim_inclusion_counts_grams(spark):
    corpus = spark.createDataFrame([
        ("c1", "intro words here " + EVAL_SENT + " closing remark"),
        ("c2", "capital of france is a phrase too short to trip the rule"),
        ("c3", "completely unrelated text about submarine volcanoes and "
               "hydrothermal vents on the ocean floor"),
    ], "doc_id string, text string")
    evals = spark.createDataFrame(
        [("e1", EVAL_SENT)], "doc_id string, text string")

    got = {r.doc_id: r.n_hits
           for r in decontaminate(corpus, evals, n=5).collect()}
    # c1 embeds the 17-word sentence verbatim: all 13 of its five-grams
    # overlap; boundary grams spanning into c1's own words are NOT in
    # the eval set and add nothing
    assert set(got) == {"c1"}
    assert got["c1"] == 13                    # 17 - 5 + 1
    # filtering contract: anti-join keeps the clean docs
    clean = corpus.join(
        decontaminate(corpus, evals, n=5), "doc_id", "left_anti")
    assert {r.doc_id for r in clean.collect()} == {"c2", "c3"}


def test_short_doc_whole_gram_and_default_n(spark):
    # a doc shorter than n yields one whole-doc gram; it only matches an
    # eval doc with identical (lowercased, whitespace-split) content
    corpus = spark.createDataFrame(
        [("c1", "Tiny Doc"), ("c2", "tiny doc"), ("c3", "other text")],
        "doc_id string, text string")
    evals = spark.createDataFrame(
        [("e1", "tiny  doc")], "doc_id string, text string")
    got = {r.doc_id for r in decontaminate(corpus, evals).collect()}
    assert got == {"c1", "c2"}                # case/whitespace normalized


def test_corpus_side_broadcast_semi_join_plan(spark):
    corpus = spark.createDataFrame(
        [("c1", "some words")], "doc_id string, text string")
    evals = spark.createDataFrame(
        [("e1", "other words")], "doc_id string, text string")
    plan = decontaminate(corpus, evals) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan