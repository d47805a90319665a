"""functions/bindings.py: bind-once evaluation of repeated subexpressions.

The contract under test is EXTENSIONAL EQUALITY — ``bind_once(expr, f)``
must return exactly ``f(expr)`` for every input (the bound form exists
only to change the evaluation COUNT, never the value), because r10
rewrote the n-gram/shingle/trigram builders onto it and those feed
hashed dedup/decontamination surfaces where any divergence is silent
wrongness. Perf rationale + measurements in the module docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_etl_engine_spark.functions.bindings import bind_once
from dig_etl_engine_spark.functions.casefold import safe_lower
from dig_etl_engine_spark.operators.dedup import shingles
from dig_etl_engine_spark.operators.text_analysis import ngram_hashes

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "short doc"),                      # < n tokens → one whole-doc gram
    (3, "one"),                            # single token
    (4, ""),                               # empty
    (5, "   padded   whitespace   runs "),
    (6, "Ünïcode Çhars İ I J mixed case"),
    (7, None),                             # null text
]


def _inline_ngram_hashes(col, n):
    """The pre-r10 inlined form — the reference the bound form must
    reproduce bit-for-bit."""
    toks = F.split(F.trim(safe_lower(col)), r"\s+")
    n_out = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, 1 + j, n_out) for j in range(n)])
    return F.transform(
        zipped,
        lambda s: F.xxhash64(F.concat_ws(" ", *[s[str(j)] for j in range(n)])))


def _inline_shingles(col, k):
    toks = F.split(F.trim(col), r"\s+")
    n_out = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, 1 + j, n_out) for j in range(k)])
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)]))


def test_bind_once_is_identity_on_values(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    rows = df.select(
        bind_once(F.upper("text"), lambda t: F.concat(t, F.lit("!")))
        .alias("bound"),
        F.concat(F.upper("text"), F.lit("!")).alias("inline")).collect()
    assert all(r.bound == r.inline for r in rows)
    # null flows through as a bound NULL argument, same as inlined
    assert rows[-1].bound is None


def test_ngram_hashes_matches_inline_form(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    for n in (2, 13):
        rows = df.select(ngram_hashes(F.col("text"), n).alias("b"),
                         _inline_ngram_hashes(F.col("text"), n).alias("i")
                         ).collect()
        for r in rows:
            assert r.b == r.i, (n, r)


def test_shingles_matches_inline_form(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    for k in (2, 3, 5):
        rows = df.select(shingles(F.col("text"), k).alias("b"),
                         _inline_shingles(F.col("text"), k).alias("i")
                         ).collect()
        for r in rows:
            assert r.b == r.i, (k, r)


def test_shingles_accepts_expression_input(spark):
    """Callers pass composed expressions (safe_lower(col)) — the bound
    form must evaluate THAT expression once and agree with inline."""
    df = spark.createDataFrame(DOCS, "id long, text string")
    rows = df.select(
        shingles(safe_lower(F.col("text")), 3).alias("b"),
        _inline_shingles(safe_lower(F.col("text")), 3).alias("i")).collect()
    for r in rows:
        assert r.b == r.i
