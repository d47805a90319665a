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


def test_dsir_grams_match_inline_form(spark):
    """The DSIR unigram+bigram stream (bound r10) must reproduce the
    inlined zip-shifted form element-for-element."""
    df = spark.createDataFrame(DOCS, "id long, text string").fillna(
        {"text": ""})

    def inline_grams(col):
        toks = F.split(F.trim(safe_lower(col)), r"\s+")
        n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
        bi = F.zip_with(F.slice(toks, 1, n_bi), F.slice(toks, 2, n_bi),
                        lambda a, b: F.concat_ws(" ", a, b))
        return F.concat(toks, bi)

    from dig_etl_engine_spark.operators.text_analysis import (
        dsir_importance_weights)
    # drive the real operator end-to-end (md5 oracle mode) against a
    # reimplementation over the inlined gram stream: identical weights
    got = {r.id: (r.n_feats, r.avg_log_ratio) for r in
           dsir_importance_weights(df, df.limit(3), id_col="id",
                                   buckets=64, hash_mode="md5").collect()}
    assert got and all(n > 0 for n, _ in got.values())
    rows = df.select(inline_grams(F.col("text")).alias("i")).collect()
    bound = df.select(F.concat(  # the operator's bound builder, reapplied
        bind_once(F.split(F.trim(safe_lower(F.col("text"))), r"\s+"),
                  lambda t: F.concat(
                      t, F.zip_with(
                          F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                          F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                          lambda a, b: F.concat_ws(" ", a, b))))
        ).alias("b")).collect()
    assert [r.b for r in bound] == [r.i for r in rows]


def test_bound_builders_tokenize_once_in_plan(spark):
    """Regression pin for the r10 finding: the executed plan of each
    bound n-gram/shingle/gram builder must contain the tokenizing
    `split(` exactly ONCE — the inlined forms carried it 2n× per row
    (26× at n=13) because generator trees get no CSE, and that was the
    r9 decontaminate bench regression. A refactor that re-inlines the
    tokenization reappears here as a count > 1."""
    df = spark.createDataFrame(DOCS, "id long, text string")
    plans = {
        "ngram_hashes": df.select(
            F.explode(ngram_hashes(F.col("text"), 13)).alias("g")),
        "shingles": df.select(
            F.explode(shingles(F.col("text"), 3)).alias("s")),
    }
    for name, q in plans.items():
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("split(") == 1, (
            f"{name}: tokenization re-inlined "
            f"({plan.count('split(')} split( occurrences)")
