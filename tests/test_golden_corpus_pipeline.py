"""End-to-end corpus-curation golden: the full LLM training-data flow a
corpus owner runs, composed from the tested pieces —

    heuristic quality gate → dedup_corpus (exact + near) →
    decontaminate (eval overlap anti-join) → pack_sequences

Every planted doc's fate is hand-derivable: junk dies at the gate,
exact/near dups collapse to their survivor, the eval-contaminated doc is
anti-joined out, and the survivors pack.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators import text_analysis as TA
from dig_etl_engine_spark.operators.dedup import dedup_corpus
from dig_etl_engine_spark.operators.text_analysis import (
    decontaminate, pack_sequences)

CLEAN_A = ("the ministry announced that the new bridge over the river "
           "will open to the public in early spring after final checks")
CLEAN_B = ("farmers in the northern valley reported a strong harvest "
           "this year thanks to the mild weather and new irrigation")
CLEAN_D = ("the museum extended its opening hours for the summer and "
           "added a guided tour of the restored east wing")
EVAL_Q = ("which river does the new bridge cross and when will it open "
          "to the public according to the ministry")


@pytest.fixture(scope="module")
def curated(spark):
    docs = spark.createDataFrame([
        (1, CLEAN_A),
        (2, CLEAN_A),                          # exact dup of 1
        (3, CLEAN_A + " officials said"),      # near dup of 1
        (4, CLEAN_B),
        (5, "zzz " * 40),                      # junk: no stopwords, 1 token
        (6, CLEAN_D + " " + EVAL_Q),           # contaminated with eval q
        (7, CLEAN_D.replace("museum", "gallery").replace("east", "west")),
    ], "doc_id long, text string")
    evals = spark.createDataFrame([(100, EVAL_Q)], "doc_id long, text string")

    t = F.col("text")
    gated = docs.filter((TA.stopword_ratio(t) > 0.1)
                        & (TA.distinct_token_ratio(t) > 0.3))
    labels = dedup_corpus(gated, "text", threshold=0.5)
    kept = gated.join(labels.filter(F.col("reason") == "kept")
                     .select("doc_id"), "doc_id")
    clean = kept.join(decontaminate(kept, evals, n=8),
                      "doc_id", "left_anti")
    return docs, labels, clean


def test_each_docs_fate(spark, curated):
    docs, labels, clean = curated
    fates = {r.doc_id: (r.survivor, r.reason) for r in labels.collect()}
    # junk doc 5 never reached dedup
    assert 5 not in fates
    assert fates[1] == (1, "kept")
    assert fates[2] == (1, "exact_dup")
    assert fates[3] == (1, "near_dup")
    assert {r.doc_id for r in clean.collect()} == {1, 4, 7}


def test_survivors_pack(spark, curated):
    _, _, clean = curated
    packed = pack_sequences(clean, budget=64, n_buckets=2)
    rows = packed.collect()
    assert {r.doc_id for r in rows} == {1, 4, 7}
    assert all(r.seq_id == 0 for r in rows)     # small docs: first pack
    assert all(r.n_tokens > 0 for r in rows)
