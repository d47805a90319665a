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


def _token_pattern(tok: dict) -> tuple[str, bool]:
    """One token constraint → (regex atom, is_punctuation)."""
    if "shape" in tok:
        return _shape_to_regex(tok["shape"]), False
    if "lower" in tok:
        pat = "".join(f"[{c.lower()}{c.upper()}]" if c.isalpha()
                      else re.escape(c) for c in tok["lower"])
        return pat, not any(c.isalnum() for c in tok["lower"])
    if "in" in tok:
        vocab = [str(v) for v in tok["in"]]
        pat = "(?:" + "|".join(re.escape(v) for v in vocab) + ")"
        return pat, all(not any(c.isalnum() for c in v) for v in vocab)
    if "regex" in tok:
        return f"(?:{tok['regex']})", bool(tok.get("punct"))
    raise ValueError(f"token constraint needs shape/lower/in/regex: {tok}")


def compile_rule(tokens: list[dict]) -> str:
    """Compile a token-constraint list to one regex.

    Constraint keys per token (one of): ``shape`` ('ddd'), ``lower``
    (case-insensitive exact), ``in`` (vocabulary alternation), ``regex``
    (raw token pattern). Plus ``optional: True``.

    Join semantics mirror spaCy's tokenizer, which the reference's rules
    assume: two word-ish tokens are whitespace-separated (``\\s+``), but a
    punctuation token binds to its neighbors with OPTIONAL whitespace
    (``\\s*``) — spaCy splits "(555)" into three tokens with no spaces in
    the text. An optional token carries its separator inside its group, so
    its absence never strands a mandatory separator.
    """
    pieces = []
    for tok in tokens:
        pat, punct = _token_pattern(tok)
        pieces.append((pat, bool(tok.get("optional")), punct))

    regex = ""
    sep_consumed = True           # first token takes no leading separator
    for i, (pat, opt, punct) in enumerate(pieces):
        if sep_consumed:
            lead = ""
        else:
            prev_punct = pieces[i - 1][2]
            lead = r"\s*" if (punct or prev_punct) else r"\s+"
        if opt and sep_consumed:
            # leading-position optional: trailing separator goes inside
            # the group and the next token starts separator-free
            if i + 1 < len(pieces):
                nxt_punct = pieces[i + 1][2]
                post = r"\s*" if (punct or nxt_punct) else r"\s+"
            else:
                post = ""
            regex += f"(?:{pat}{post})?"
            sep_consumed = True
        elif opt:
            regex += f"(?:{lead}{pat})?"
            sep_consumed = False
        else:
            regex += lead + pat
            sep_consumed = False
    return regex


def extract_token_rule(col: Column, tokens: list[dict]) -> Column:
    """Apply a compiled token rule → array of matched spans."""
    return F.regexp_extract_all(col, F.lit(compile_rule(tokens)), F.lit(0))


# --- ETK rule-file compilation (the reference's shipped schema) ---------------

def _digit_span(lo: str, hi: str) -> str:
    """Regex for decimal strings of equal length in [lo, hi]."""
    if len(lo) == 1:
        return lo if lo == hi else f"[{lo}-{hi}]"
    if lo[0] == hi[0]:
        return lo[0] + _digit_span(lo[1:], hi[1:])
    k = len(lo) - 1
    if lo[1:] == "0" * k and hi[1:] == "9" * k:
        return f"[{lo[0]}-{hi[0]}]" + rf"\d{{{k}}}"
    parts = [lo[0] + _digit_span(lo[1:], "9" * k)]
    if int(hi[0]) - int(lo[0]) >= 2:
        a, b = str(int(lo[0]) + 1), str(int(hi[0]) - 1)
        parts.append((a if a == b else f"[{a}-{b}]") + rf"\d{{{k}}}")
    parts.append(hi[0] + _digit_span("0" * k, hi[1:]))
    return "(?:" + "|".join(parts) + ")"


def num_range_regex(lo: int, hi: int) -> str:
    """Exact regex for decimal integers in [lo, hi] (no leading zeros) —
    lets the reference's number tokens with ``minimum``/``maximum`` (e.g.
    phone-prefix ranges 400000000-499999999) stay on the native-regex
    fast path instead of needing a post-filter."""
    parts = []
    for ndig in range(len(str(lo)), len(str(hi)) + 1):
        a = max(lo, 10 ** (ndig - 1) if ndig > 1 else 0)
        b = min(hi, 10 ** ndig - 1)
        if a <= b:
            parts.append(_digit_span(str(a).zfill(ndig), str(b).zfill(ndig)))
    return "(?:" + "|".join(parts) + ")"


def compile_etk_token(tok: dict) -> dict | None:
    """One token of the reference's spacy-rule JSON (museum tarball
    ``spacy_rules/*.json``; every shipped token uses type ∈ {shape,
    punctuation, word, number, linebreak} — none uses POS) → internal
    constraint dict. Returns None for linebreak tokens (consumed by the
    inter-token separator). Raises NotImplementedError for POS/lemma
    constraints, which need a real NLP model (SURVEY §2.5 X6 gate)."""
    if tok.get("part_of_speech"):
        raise NotImplementedError(
            "part_of_speech token constraints need a POS tagger (gated "
            "optional dependency); shape/vocab/number rules compile natively")
    ttype = tok.get("type", "word")
    required = str(tok.get("is_required", "true")).lower() != "false"
    out: dict | None
    if ttype == "linebreak":
        return None
    elif ttype == "shape":
        raw = tok.get("shapes") or tok.get("shape") or []
        if isinstance(raw, str):      # singular string form: ONE shape,
            raw = [raw]               # not a per-character alternation
        shapes = [s for s in raw if s]
        if not shapes:
            raise ValueError(f"shape token without shapes: {tok}")
        out = {"regex": "|".join(_shape_to_regex(s) for s in shapes)}
    elif ttype in ("punctuation", "word"):
        vocab = [str(v) for v in tok.get("token") or []]
        if vocab:
            out = {"in": vocab}
        elif ttype == "punctuation":
            out = {"regex": r"[^\w\s]", "punct": True}
        else:
            out = {"regex": r"\S+"}
    elif ttype == "number":
        numbers = [str(n) for n in tok.get("numbers") or []]
        # unset is ''/None in the shipped files; a JSON integer 0 is a
        # real bound ('minimum or maximum' would drop minimum=0/maximum=0)
        minimum = tok.get("minimum")
        maximum = tok.get("maximum")
        has_min = minimum not in (None, "")
        has_max = maximum not in (None, "")
        lengths = [int(x) for x in tok.get("length") or []]
        if numbers:
            out = {"in": numbers}
        elif has_min or has_max:
            out = {"regex": num_range_regex(
                int(minimum) if has_min else 0,
                int(maximum) if has_max else 10 ** 18)}
        elif lengths:
            out = {"regex": "|".join(rf"\d{{{n}}}" for n in lengths)}
        else:
            out = {"regex": r"\d+"}
    else:
        raise NotImplementedError(f"token type {ttype!r}")
    if not required:
        out["optional"] = True
    return out


def compile_etk_rule(rule: dict) -> str:
    """One rule of the reference's spacy-rule JSON ({identifier, pattern,
    is_active, ...}) → one regex via :func:`compile_rule`."""
    tokens = [t for t in (compile_etk_token(tok) for tok in rule["pattern"])
              if t is not None]
    return compile_rule(tokens)


def compile_etk_rule_file(doc: dict) -> dict[str, list[str]]:
    """A whole reference rule file ({"rules": [...]}) → {identifier:
    [regex, ...]} for the ACTIVE rules (``is_active != "false"``, matching
    etk's loader behavior)."""
    out: dict[str, list[str]] = {}
    for rule in doc.get("rules", []):
        if str(rule.get("is_active", "true")).lower() == "false":
            continue
        out.setdefault(rule.get("identifier", ""), []).append(
            compile_etk_rule(rule))
    return out
