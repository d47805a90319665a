"""Registry entries for the module-pipeline UDF surface (SURVEY §2.11):
the ETK-module model — (document_selector, process) pairs demultiplexing
one doc stream (`etk_worker.py:102-106`; `docs/advanced.md:20-54`) — and
the doc→many imperative UDTF path via Arrow-batched mapInPandas."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.functions.localdf import local_df
from dig_etl_engine_spark.pipeline import python_doc_module, run_modules
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
    """§2.11 module registry + auto-discovery (`etk_worker.py:102-106,
    210-213`; F1 demux `docs/advanced.md:39-53`): two user modules written
    as ``em_*.py`` files into a working dir, discovered by the glob
    loader — the reference's porting path 1:1 — each with a disjoint
    document selector and its own set-oriented transform, recombined by
    unionByName. One pass over the corpus, no per-doc Python."""
    import os
    import shutil

    from dig_etl_engine_spark.pipeline import discover_modules

    # pid-scoped like queries_io._scratch: rebuilt per call, so a shared
    # path would race concurrent processes (rmtree vs the other's read)
    workdir = f"/tmp/spark_graft_io-{os.getpid()}/ems"
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "em_short_doc.py"), "w",
              encoding="utf-8") as fh:
        fh.write(
            # the generated module case-folds through the engine's
            # locale-safe wrapper, like all engine code — the casing
            # lint can't see inside this string, so the discipline is
            # enforced here by construction (r9 review)
            "from pyspark.sql import functions as F\n"
            "from dig_etl_engine_spark.functions.casefold import "
            "safe_upper\n"
            "def document_selector():\n"
            "    return F.col('n_chars') < 300\n"
            "def process(df):\n"
            "    return df.select('doc_id', 'source',\n"
            "                     F.lit('short_doc').alias('module'),\n"
            "                     safe_upper('lang').alias('lang_tag'))\n")
    with open(os.path.join(workdir, "em_long_doc.py"), "w",
              encoding="utf-8") as fh:
        fh.write(
            "from pyspark.sql import functions as F\n"
            "from dig_etl_engine_spark.pipeline import Module\n"
            "MODULE = Module(\n"
            "    name='long_doc',\n"
            "    selector=~(F.col('n_chars') < 300),\n"
            "    process=lambda df: df.select(\n"
            "        'doc_id', 'source', F.lit('long_doc').alias('module'),\n"
            "        F.col('lang').alias('lang_tag')))\n")

    docs = load_tables(spark, sf_dir)["documents"]
    return run_modules(docs, discover_modules(workdir))


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


def _elicit_fixture(spark: SparkSession) -> DataFrame:
    """The 20-doc elicit-shaped CDR fixture (FIXTURES.md §1; reference
    `datasets/elicit_20.jl` schema): planted titles, ISO dates, and
    glossary countries, so every downstream value is hand-derivable."""
    countries = ["nigeria", "france", "japan"]
    rows = []
    for i in range(20):
        country = countries[i % 3]
        date = f"2016-01-{(i % 9) + 1:02d}"
        body = (f"<html><head><title>Report {i}</title></head><body>"
                f"<p>Unrest reported in {country} on {date} .</p>"
                f"<script>var x = 'noise';</script>"
                f"</body></html>")
        rows.append((f"doc{i:02d}",
                     f"http://news{i % 4}.example.org/{i}.html", body))
    return local_df(
        spark, rows, "doc_id string, url string, raw_content string")


@register(
    "golden_elicit_pipeline",
    oracle="""
    SELECT * FROM (VALUES
      ('doc00', 'http://news0.example.org/0.html', 12.0),
      ('doc03', 'http://news3.example.org/3.html', 12.0),
      ('doc06', 'http://news2.example.org/6.html', 12.0),
      ('doc09', 'http://news1.example.org/9.html', 12.0),
      ('doc12', 'http://news0.example.org/12.html', 12.0),
      ('doc15', 'http://news3.example.org/15.html', 12.0),
      ('doc18', 'http://news2.example.org/18.html', 12.0)
    ) AS t(doc_id, url, score)
    """,
)
def golden_elicit_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§7.2 golden walkthrough as ONE registered query — the reference's
    elicit demo end-to-end (`docs/index.md:79-141`): default module (X1
    content zones, X2 title, X3 date, X4 glossary, X8 hostname) → KG
    assembly (`kg_build`) → long-format index (`kg_index`) → coarse
    structured search for Nigeria. Docs 0,3,...,18 carry nigeria: index
    hit (w=10) + text zone (w=2) → score 12; the oracle pins the exact
    ranked rows hand-derived from the fixture."""
    from dig_etl_engine_spark.functions import extractors as X
    from dig_etl_engine_spark.functions.kg import kg_build, kg_index
    from dig_etl_engine_spark.plans.query_compiler import (
        EngineConfig, FieldRef, compile_query)
    from dig_etl_engine_spark.plans.weights import WeightRule, WeightTree

    docs = _elicit_fixture(spark)
    glossary = local_df(
        spark, [("nigeria",), ("france",), ("japan",)], "term string")
    with_zones = docs.withColumn(
        "content_strict", X.html_main_content(F.col("raw_content")))
    matches = X.glossary_matches(with_zones, "content_strict", glossary)
    country_arr = (matches.groupBy("doc_id")
                   .agg(F.array_sort(F.collect_list("term")).alias("terms")))
    enriched = (with_zones.join(country_arr, "doc_id", "left")
                .withColumn("terms", F.coalesce(
                    "terms", F.array().cast("array<string>"))))
    kg = kg_build(enriched, {
        "title": X._results(F.array(X.html_title(F.col("raw_content"))),
                            "html_metadata", "title"),
        "event_date": X.extract_date_iso(F.col("content_strict"),
                                         segment="content_strict"),
        "country": X._results(F.col("terms"), "glossary", "content_strict"),
        "website": X.extract_hostname(F.col("url")),
    })
    index = kg_index(kg)
    cfg = EngineConfig(
        predicate_types={"country": "Country"},
        type_field_mappings={
            "Country": [FieldRef("country", "glossary", "content_strict",
                                 zone="index"),
                        FieldRef("raw_content", zone="text")],
        },
        weights=WeightTree([WeightRule(weight=1.0),
                            WeightRule(field="raw_content", weight=2.0),
                            WeightRule(field="country", method="glossary",
                                       weight=10.0)]),
        type_query_kinds={"Country": "match_phrase"},
        transforms={"Country": "lower"},
        default_source_fields=["doc_id", "url"],
        excluded_source_fields=["raw_content"],
    )
    return compile_query(
        spark, docs, index,
        {"clauses": [{"predicate": "country", "constraint": "Nigeria"}],
         "size": 10}, cfg)
