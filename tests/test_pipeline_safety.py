"""Unit tests for per-document error isolation (C5) and the landmark
rule-set executor (X5 full shape)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F


class TestSafePythonDocModule:
    def test_failing_docs_quarantined_rest_processed(self, spark):
        from dig_etl_engine_spark.pipeline import safe_python_doc_module

        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(9)], "doc_id long, text string")

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            if (pdf["doc_id"] % 3 == 0).any():
                raise ValueError("boom")
            return pd.DataFrame({"doc_id": pdf["doc_id"],
                                 "out": pdf["text"].str.upper()})

        process = safe_python_doc_module(fn, "doc_id long, out string")
        result = process(docs).collect()
        good = {r.doc_id: r.out for r in result if r._error is None}
        bad = {r.doc_id: r._error for r in result if r._error is not None}
        assert good == {i: f"TEXT {i}" for i in range(9) if i % 3 != 0}
        assert set(bad) == {0, 3, 6}
        assert all(e.startswith("ValueError") for e in bad.values())

    def test_clean_batch_takes_fast_path(self, spark):
        from dig_etl_engine_spark.pipeline import safe_python_doc_module

        docs = spark.createDataFrame([(1, "a"), (2, "b")],
                                     "doc_id long, text string")
        process = safe_python_doc_module(
            lambda pdf: pd.DataFrame({"doc_id": pdf["doc_id"],
                                      "out": pdf["text"]}),
            "doc_id long, out string")
        rows = process(docs).collect()
        assert {r.doc_id for r in rows} == {1, 2}
        assert all(r._error is None for r in rows)


class TestLandmarkRuleset:
    RULES = {
        "museum.example.org": [
            {"rule_type": "ItemRule", "name": "title-0-0",
             "begin_regex": r"<h1>", "end_regex": r"</h1>",
             "removehtml": True},
            {"rule_type": "ItemRule", "name": "artist-0-1",
             "begin_regex": r"<span class=\"artist\">",
             "end_regex": r"</span>", "removehtml": True,
             "strip_end_regex": r"\(attributed\)"},
        ],
        "shop.example.org": [
            {"rule_type": "ItemRule", "name": "price-0-0",
             "begin_regex": r"price:", "end_regex": r"<"},
        ],
    }

    def test_per_tld_routing_and_cleanup(self, spark):
        from dig_etl_engine_spark.functions.extractors import landmark_ruleset

        docs = spark.createDataFrame([
            ("d1", "museum.example.org",
             "<h1>The <i>Blue</i> Boat</h1>"
             "<span class=\"artist\">Monet (attributed)</span>"),
            ("d2", "shop.example.org", "<b>price:19.99</b>"),
            ("d3", "unknown.org", "<h1>ignored</h1>"),
        ], "doc_id string, tld string, raw_content string")

        got = {(r.doc_id, r.field): r.value
               for r in landmark_ruleset(docs, "raw_content",
                                         self.RULES).collect()}
        assert got == {
            ("d1", "title"): "The Blue Boat",      # removehtml strips <i>
            ("d1", "artist"): "Monet",             # strip_end_regex applied
            ("d2", "price"): "19.99",
        }


class TestModuleDiscovery:
    def test_em_glob_loader(self, spark, tmp_path):
        """etk_worker.py:210-213 parity: em_*.py files in working dirs are
        discovered in (dir order, then name order); all three export
        styles work; non-em files ignored."""
        from dig_etl_engine_spark.pipeline import discover_modules, run_modules
        d1, d2 = tmp_path / "additional", tmp_path / "generated"
        d1.mkdir(); d2.mkdir()
        (d1 / "em_b.py").write_text(
            "from pyspark.sql import functions as F\n"
            "def document_selector():\n"
            "    return F.col('v') >= 10\n"
            "def process(df):\n"
            "    return df.select('doc_id', F.lit('b').alias('m'))\n")
        (d1 / "not_a_module.py").write_text("raise AssertionError\n")
        (d2 / "em_a.py").write_text(
            "from pyspark.sql import functions as F\n"
            "from dig_etl_engine_spark.pipeline import Module\n"
            "MODULES = [Module(name='a', selector=F.col('v') < 10,\n"
            "    process=lambda df: df.select(\n"
            "        'doc_id', F.lit('a').alias('m')))]\n")
        mods = discover_modules(str(d1), str(d2))
        assert [m.name for m in mods] == ["em_b", "a"]
        df = spark.createDataFrame([(1, 5), (2, 15)], ["doc_id", "v"])
        got = {(r.doc_id, r.m) for r in run_modules(df, mods).collect()}
        assert got == {(2, "b"), (1, "a")}

    def test_em_loader_rejects_contractless_file(self, tmp_path):
        import pytest
        from dig_etl_engine_spark.pipeline import discover_modules
        (tmp_path / "em_bad.py").write_text("x = 1\n")
        with pytest.raises(ValueError):
            discover_modules(str(tmp_path))


class TestConnectedComponents:
    def _cc(self, spark, edges):
        from dig_etl_engine_spark.operators.dedup import connected_components
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return {r.doc_id: r.component
                for r in connected_components(df).collect()}

    def test_long_chain_single_component(self, spark):
        """A 64-node path graph — the diameter-pathological case that
        plain label propagation needs 64 rounds for; large-star/small-star
        must collapse it within the (log²) iteration budget."""
        got = self._cc(spark, [(i, i + 1) for i in range(63)])
        assert set(got.values()) == {0}
        assert len(got) == 64

    def test_two_components_and_reversed_edges(self, spark):
        got = self._cc(spark, [(5, 1), (1, 9), (20, 30), (30, 20)])
        assert got == {1: 1, 5: 1, 9: 1, 20: 20, 30: 20}

    def test_star_and_self_loop(self, spark):
        got = self._cc(spark, [(10, 2), (10, 3), (10, 4), (7, 7)])
        # self-loop-only node 7 contributes no edge; star collapses to 2
        assert got == {2: 2, 3: 2, 4: 2, 10: 2}


class TestSimhashBanded:
    def test_banded_recall_is_exact_vs_bruteforce(self, spark):
        """Pigeonhole guarantee: banded candidates ∩ hamming-filter must
        equal the brute-force all-pairs hamming ≤ 3 set exactly."""
        from pyspark.sql import functions as F
        from dig_etl_engine_spark.operators.dedup import (
            simhash16_table, simhash_banded_pairs)
        docs = spark.createDataFrame(
            [(i, " ".join(f"tok{(i * 7 + j) % 23}" for j in range(12)))
             for i in range(40)], "doc_id long, text string")
        got = {(r.doc_a, r.doc_b, r.hamming)
               for r in simhash_banded_pairs(docs, "text").collect()}

        h = {r.id: r.simhash
             for r in simhash16_table(docs, "text").collect()}
        expect = set()
        ids = sorted(h)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                d = bin(h[a] ^ h[b]).count("1")
                if d <= 3:
                    expect.add((a, b, d))
        assert got == expect
        assert expect, "fixture should produce at least one close pair"
