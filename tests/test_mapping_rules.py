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
