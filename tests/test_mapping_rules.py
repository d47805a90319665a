"""Unit tests for the token-rule compiler (X6) and template compiler (P2)
— the driver-side compilation steps behind the oracle-checked queries."""

from __future__ import annotations

import re

import pytest

from dig_etl_engine_spark.functions.token_rules import (
    _shape_to_regex, compile_rule)


class TestShapeRegex:
    def test_runs_collapse(self):
        assert _shape_to_regex("ddd") == r"\d{3}"
        assert _shape_to_regex("Xxx") == "[A-Z][a-z]{2}"

    def test_literal_punct(self):
        assert re.fullmatch(_shape_to_regex("ddd-dddd"), "555-1234")

    def test_compile_and_match(self):
        pat = compile_rule([{"shape": "ddd"}, {"shape": "ddd"},
                            {"shape": "dddd"}])
        assert re.search(pat, "call 213 555 0147 now").group(0) == "213 555 0147"

    def test_vocab_and_exact(self):
        pat = compile_rule([{"in": ["txt", "sms"]}, {"lower": "stop"}])
        assert re.search(pat, "please sms STOP today").group(0) == "sms STOP"

    def test_optional_token(self):
        pat = compile_rule([{"lower": "ext"}, {"shape": "d", "optional": True},
                            {"shape": "ddd"}])
        assert re.search(pat, "ext 123") and re.search(pat, "ext 4 123")

    def test_bad_constraint(self):
        with pytest.raises(ValueError):
            compile_rule([{"pos": "NOUN"}])


class TestFallbackId:
    def test_fallback_url_id_is_content_stable(self, spark):
        """P8 fallback id (no id_path): a pure content hash — identical
        across runs, repartitions and row order, unlike
        monotonically_increasing_id (ADVICE r01)."""
        from dig_etl_engine_spark.operators.mapping import (
            MappingSpec, apply_mapping)
        spec = MappingSpec(
            rules=[{"path": "a", "field": "a2"}],
            file_url="http://x/f.csv")
        df = spark.createDataFrame(
            [("p", 1), ("q", 2), ("r", 3)], ["a", "b"])
        one = {r.a2: r.url for r in apply_mapping(df, spec).collect()}
        two = {r.a2: r.url
               for r in apply_mapping(df.repartition(5), spec).collect()}
        assert one == two
        assert len(set(one.values())) == 3      # distinct content → distinct id
        assert all(u.startswith("http://x/f.csv#") for u in one.values())


class TestEtkRuleCompile:
    """Parity: compile the reference's actual shipped spacy-rule files
    (museum tarball spacy_rules/*.json) and check matches on texts the
    rules were built for. The tarball is read as DATA (rule configs), not
    code."""

    TARBALL = ("/root/reference/sample-projects/museum/"
               "museum_20180202192943.tar.gz")

    @pytest.fixture(scope="class")
    def rule_docs(self):
        import json
        import tarfile
        docs = {}
        with tarfile.open(self.TARBALL) as tf:
            for name in ("phone", "stock_ticker", "date_birth"):
                fh = tf.extractfile(f"spacy_rules/{name}.json")
                docs[name] = json.load(fh)
        return docs

    def test_all_shipped_rules_compile(self, rule_docs):
        """Every ACTIVE rule in every shipped file compiles to a valid
        regex — no POS constraint anywhere in the shipped set."""
        from dig_etl_engine_spark.functions.token_rules import (
            compile_etk_rule_file)
        total = 0
        for doc in rule_docs.values():
            for regexes in compile_etk_rule_file(doc).values():
                for pat in regexes:
                    re.compile(pat)
                    total += 1
        assert total >= 40    # the phone file alone ships ~49 rules

    def test_phone_rules_match_us_formats(self, rule_docs):
        from dig_etl_engine_spark.functions.token_rules import (
            compile_etk_rule_file)
        pats = [p for regexes in
                compile_etk_rule_file(rule_docs["phone"]).values()
                for p in regexes]
        for text in ("(213) 555-0147", "213-555-0147", "2135550147",
                     "213.555.0147"):
            assert any(re.search(p, text) for p in pats), text

    def test_ticker_rule_matches_symbol(self, rule_docs):
        """Shipped active rules want an exchange prefix, $-prefix, parens,
        or a trailing price — exercise one of each."""
        from dig_etl_engine_spark.functions.token_rules import (
            compile_etk_rule_file)
        pats = [p for regexes in
                compile_etk_rule_file(rule_docs["stock_ticker"]).values()
                for p in regexes]
        for text in ("NYSE: AAPL^X", "NASDAQ:MSFT", "$TSLA", "(GOOG)",
                     "IBM 123.45"):
            assert any(re.search(p, text) for p in pats), text

    def test_extractor_column_delegates(self, spark, rule_docs):
        """The X6 entry point runs the compiled rules natively end-to-end
        (no spaCy import, no NotImplementedError for shipped rules)."""
        from dig_etl_engine_spark.functions.extractors import (
            spacy_rule_extractor)
        from pyspark.sql import functions as F
        df = spark.createDataFrame(
            [("call (213) 555-0147 now",), ("no phone here",)], ["txt"])
        got = (df.select(spacy_rule_extractor(
                   F.col("txt"), rule_docs["phone"]).alias("m"))
               .collect())
        assert any("213" in str(r.m) for r in got)
        assert got[1].m == []

    def test_pos_constraint_still_gated(self):
        from dig_etl_engine_spark.functions.token_rules import (
            compile_etk_token)
        with pytest.raises(NotImplementedError):
            compile_etk_token({"type": "word", "part_of_speech": ["NOUN"]})

    def test_num_range_regex_exact(self):
        from dig_etl_engine_spark.functions.token_rules import (
            num_range_regex)
        pat = re.compile(num_range_regex(95, 1043) + "$")
        for n in (0, 50, 94, 95, 96, 99, 100, 500, 999, 1000, 1043, 1044,
                  9999):
            assert bool(pat.fullmatch(str(n))) == (95 <= n <= 1043), n
