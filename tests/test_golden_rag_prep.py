"""End-to-end RAG-prep golden: the new corpus-prep operators composed the
way a retrieval pipeline uses them —

    chunk_documents → hashed_bow_embedding → materialize_ivf_index →
    knn_ivf_indexed

A paragraph duplicated across two documents must surface as each chunk's
top neighbor (cosine 1.0) through the whole chain: chunking alignment,
featurization determinism, index build, and probe-side cell assignment
all have to agree for this to hold.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.similarity import (
    hashed_bow_embedding, knn_ivf_indexed, materialize_ivf_index)
from dig_etl_engine_spark.operators.text_analysis import chunk_documents

SHARED = ("the identical shared paragraph about hydrothermal vents "
          "and submarine volcanoes repeated verbatim in both documents "
          "word for word with no variation at all here")   # 24 words


@pytest.fixture(scope="module")
def chunked_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rag") / "index")
    fill_a = " ".join(f"alpha{i}" for i in range(24))
    fill_b = " ".join(f"beta{i}" for i in range(24))
    docs = spark.createDataFrame([
        (1, fill_a + " " + SHARED),       # chunk 1 of doc 1 == SHARED
        (2, fill_b + " " + SHARED),       # chunk 1 of doc 2 == SHARED
        (3, " ".join(f"gamma{i}" for i in range(48))),
    ], "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_tokens=24, overlap=0)
    embedded = (hashed_bow_embedding(
        chunks.withColumn(
            "vec_id", F.col("doc_id") * 100 + F.col("chunk_id")),
        "chunk_text", id_col="vec_id", dim=16))
    materialize_ivf_index(embedded, path, k=2, iters=2)
    return path, embedded


def test_duplicated_paragraph_is_top_neighbor(spark, chunked_index):
    path, embedded = chunked_index
    # probe with doc 1's SHARED chunk (vec_id 101); its top neighbor must
    # be doc 2's SHARED chunk (vec_id 201) at cosine 1.0, in every probe
    # breadth (identical vectors always share a cell)
    probe = embedded.filter(F.col("vec_id") == 101)
    for nprobe in (1, 2):
        top = (knn_ivf_indexed(probe, path, k=1, nprobe=nprobe)
               .collect())
        assert len(top) == 1
        assert top[0].neighbor_id == 201
        assert top[0].cosine_e4 == 10_000  # cosine exactly 1.0


def test_featurizer_stays_jvm_side(spark):
    # hashed_bow_embedding must be pure column math — no Python eval
    # nodes, unrolled normalization (the HOF cliff fix)
    df = spark.createDataFrame([(1, "some words here")],
                               "doc_id long, text string")
    plan = hashed_bow_embedding(df, "text", id_col="doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_unrelated_chunks_score_low(spark, chunked_index):
    path, embedded = chunked_index
    probe = embedded.filter(F.col("vec_id") == 300)   # gamma chunk 0
    rows = knn_ivf_indexed(probe, path, k=3, nprobe=2).collect()
    # gamma's tokens are unique; nothing reaches near-dup territory
    assert all(r.cosine_e4 < 9_000 for r in rows)
