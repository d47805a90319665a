"""Registry entries for the module-pipeline UDF surface (SURVEY §2.11):
the ETK-module model — (document_selector, process) pairs demultiplexing
one doc stream (`etk_worker.py:102-106`; `docs/advanced.md:20-54`) — and
the doc→many imperative UDTF path via Arrow-batched mapInPandas."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.pipeline import Module, python_doc_module, run_modules
from dig_etl_engine_spark.queries import register


@register(
    "module_pipeline_demux",
    oracle="""
    SELECT doc_id, source, 'short_doc' AS module, upper(lang) AS lang_tag
    FROM documents WHERE n_chars < 300
    UNION ALL
    SELECT doc_id, source, 'long_doc' AS module, lang AS lang_tag
    FROM documents WHERE NOT (n_chars < 300)
    """,
)
def module_pipeline_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 module registry (`etk_worker.py:102-106`; F1 demux
    `docs/advanced.md:39-53`): two modules with disjoint document
    selectors, each with its own set-oriented transform, recombined by
    unionByName — one pass over the corpus, no per-doc Python."""
    docs = load_tables(spark, sf_dir)["documents"]
    modules = [
        Module(
            name="short_doc",
            selector=F.col("n_chars") < 300,
            process=lambda df: df.select(
                "doc_id", "source", F.lit("short_doc").alias("module"),
                F.upper("lang").alias("lang_tag")),
        ),
        Module(
            name="long_doc",
            selector=~(F.col("n_chars") < 300),
            process=lambda df: df.select(
                "doc_id", "source", F.lit("long_doc").alias("module"),
                F.col("lang").alias("lang_tag")),
        ),
    ]
    return run_modules(docs, modules)


@register(
    "python_doc_udtf",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')[1:2]) AS token,
           n_chars
    FROM documents
    """,
)
def python_doc_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 doc→many UDTF (`etk_worker.py:104-106`: process_ems returns a
    LIST of documents): an imperative per-batch pandas function emitting
    two child rows per doc through mapInPandas — Arrow batches, pickled by
    value, package shipped to workers automatically."""
    docs = load_tables(spark, sf_dir)["documents"] \
        .select("doc_id", "text", "n_chars")

    def split_docs(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            for tok in row["text"].split(" ")[:2]:
                out.append((row["doc_id"], tok, row["n_chars"]))
        return pd.DataFrame(out, columns=["doc_id", "token", "n_chars"])

    process = python_doc_module(split_docs,
                                "doc_id long, token string, n_chars long")
    return process(docs)
