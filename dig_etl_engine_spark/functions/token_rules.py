"""Token-pattern rule extractor (X6) — the SpacyRuleExtractor surface.

Reference: ``em_base.py:12`` (museum tarball) wires spaCy token-pattern
rules — JSON lists of per-token constraints (shape / exact / vocab /
prefix, with optionality) — for phone, stock_ticker, date_birth, etc.;
defaults in ``generate_mydig_config.py:45-63``.

Spark design: a rule compiles ONCE (driver-side) to a single regex over
whitespace-tokenized text, executed by native ``regexp_extract_all`` —
JVM-side, codegen'd, no Python in the hot path. This covers the
shape/vocab/regex constraint classes the reference's shipped rules use
(phone, ticker, dates); POS/lemma constraints would need a real NLP model
and are out of scope by design (heavy optional plugin, SURVEY §2.5 X6
'heavy; optional').
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SHAPE_CHAR = {"d": r"\d", "x": "[a-z]", "X": "[A-Z]"}


def _shape_to_regex(shape: str) -> str:
    """spaCy-style shape: 'ddd' → \\d{3}, 'Xxx' → [A-Z][a-z]{2}; literal
    punctuation passes through escaped. Runs of the same class collapse to
    counted repetition."""
    out = []
    i = 0
    while i < len(shape):
        ch = shape[i]
        n = 1
        while i + n < len(shape) and shape[i + n] == ch:
            n += 1
        atom = _SHAPE_CHAR.get(ch, re.escape(ch))
        out.append(atom + (f"{{{n}}}" if n > 1 else ""))
        i += n
    return "".join(out)


def compile_rule(tokens: list[dict]) -> str:
    """Compile a token-constraint list to one regex.

    Constraint keys per token (one of): ``shape`` ('ddd'), ``lower``
    (case-insensitive exact), ``in`` (vocabulary alternation), ``regex``
    (raw token pattern). Plus ``optional: True``. Tokens join on ``\\s+``.
    """
    parts = []
    for tok in tokens:
        if "shape" in tok:
            pat = _shape_to_regex(tok["shape"])
        elif "lower" in tok:
            pat = "".join(f"[{c.lower()}{c.upper()}]" if c.isalpha()
                          else re.escape(c) for c in tok["lower"])
        elif "in" in tok:
            pat = "(?:" + "|".join(re.escape(v) for v in tok["in"]) + ")"
        elif "regex" in tok:
            pat = f"(?:{tok['regex']})"
        else:
            raise ValueError(f"token constraint needs shape/lower/in/regex: {tok}")
        if tok.get("optional"):
            parts.append(f"(?:{pat}\\s+)?")
        else:
            parts.append(f"{pat}\\s+")
    joined = "".join(parts)
    return joined.removesuffix("\\s+") if joined.endswith("\\s+") else joined


def extract_token_rule(col: Column, tokens: list[dict]) -> Column:
    """Apply a compiled token rule → array of matched spans."""
    return F.regexp_extract_all(col, F.lit(compile_rule(tokens)), F.lit(0))
