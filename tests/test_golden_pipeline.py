"""Golden end-to-end test: the elicit walkthrough (SURVEY §7.2;
`docs/index.md:79-141` in the reference) on an inline fixture corpus.

20 HTML CDR docs (FIXTURES.md §1 shape) with planted titles, dates, and
glossary countries run the full pipeline: default module (X1 content zones,
X2 title, X3 date, X4 glossary, X8 hostname) → KG assembly → long-format
index → high-confidence keys → coarse structured search → facet counts.
Every expected value is derivable by hand from the fixture."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.functions import extractors as X
from dig_etl_engine_spark.functions.kg import (
    high_confidence_keys, kg_build, kg_index)
from dig_etl_engine_spark.plans.query_compiler import (
    EngineConfig, FieldRef, compile_query, facet_counts)
from dig_etl_engine_spark.plans.weights import WeightRule, WeightTree

COUNTRIES = ["nigeria", "france", "japan"]

def _fixture_docs(spark):
    rows = []
    for i in range(20):
        country = COUNTRIES[i % 3]
        date = f"2016-01-{(i % 9) + 1:02d}"
        body = (f"<html><head><title>Report {i}</title></head><body>"
                f"<p>Unrest reported in {country} on {date} .</p>"
                f"<script>var x = 'noise';</script>"
                f"</body></html>")
        rows.append((f"doc{i:02d}",
                     f"http://news{i % 4}.example.org/{i}.html", body))
    return spark.createDataFrame(rows, "doc_id string, url string, raw_content string")


def _run_pipeline(spark):
    docs = _fixture_docs(spark)
    glossary = spark.createDataFrame([(c,) for c in COUNTRIES], "term string")
    text = X.html_main_content(F.col("raw_content"))
    with_zones = docs.withColumn("content_strict", text)

    country_matches = X.glossary_matches(with_zones, "content_strict", glossary)
    country_arr = (country_matches.groupBy("doc_id")
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
    return docs, index


class TestGoldenElicitPipeline:
    @pytest.fixture(scope="class")
    def pipeline(self, spark):
        docs, index = _run_pipeline(spark)
        return docs, index.cache()

    def test_index_contents(self, pipeline):
        _, index = pipeline
        by_field = {r["field"]: r["n"] for r in
                    index.groupBy("field").agg(F.count("*").alias("n")).collect()}
        # 20 docs: every doc has title, date, hostname; one country each
        assert by_field == {"title": 20, "event_date": 20,
                            "country": 20, "website": 20}
        titles = dict(index.filter(F.col("field") == "title")
                      .select("doc_id", "value").collect())
        assert titles["doc07"] == "Report 7"
        dates = dict(index.filter(F.col("field") == "event_date")
                     .select("doc_id", "value").collect())
        assert dates["doc04"] == "2016-01-05"
        hosts = set(index.filter(F.col("field") == "website")
                    .select("value").distinct().toPandas()["value"])
        assert hosts == {f"news{i}.example.org" for i in range(4)}

    def test_high_confidence_keys(self, pipeline):
        _, index = pipeline
        hck = high_confidence_keys(index.filter(F.col("field") == "country"))
        got = {r.doc_id: list(r.high_confidence_keys) for r in hck.collect()}
        assert got["doc00"] == ["nigeria"]
        assert got["doc01"] == ["france"]

    def test_coarse_query_and_ranking(self, pipeline, spark):
        docs, index = pipeline
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
        result = compile_query(
            spark, docs, index,
            {"clauses": [{"predicate": "country", "constraint": "Nigeria"}],
             "size": 10},
            cfg)
        rows = result.collect()
        # docs 0,3,6,9,12,15,18 carry nigeria; index hit (10) + text zone (2)
        assert [r.doc_id for r in rows] == [f"doc{i:02d}"
                                            for i in (0, 3, 6, 9, 12, 15, 18)]
        assert all(abs(r.score - 12.0) < 1e-9 for r in rows)
        assert "raw_content" not in result.columns  # Q10 exclude list

    def test_facets(self, pipeline):
        _, index = pipeline
        got = [(r.key, r.doc_count) for r in
               facet_counts(index, "country").collect()]
        # 20 docs mod 3: nigeria 7 (0,3,..18), france 7 (1,4,..19), japan 6
        assert got == [("france", 7), ("nigeria", 7), ("japan", 6)]
