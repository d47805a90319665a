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


def test_dsir_weights_invariant_under_bind(spark, monkeypatch):
    """The DSIR operator's OWN gram builder, driven end-to-end both
    bound and inlined: monkeypatching ``bind_once`` to the identity
    composition ``f(expr)`` reconstructs the exact pre-r10 inlined
    expression tree inside the real operator, so any drift between the
    bound builder and its inlined semantics (a slice off-by-one, a
    changed length bound) shows up as a weight difference — unlike a
    reference copy pasted into the test, which would drift WITH the
    operator."""
    import dig_etl_engine_spark.operators.text_analysis as ta

    df = spark.createDataFrame(DOCS, "id long, text string").fillna(
        {"text": ""})

    def run():
        return sorted(
            (r.id, r.n_feats, round(r.avg_log_ratio, 9))
            for r in ta.dsir_importance_weights(
                df, df.limit(3), id_col="id", buckets=64,
                hash_mode="md5").collect())

    bound = run()
    monkeypatch.setattr(ta, "bind_once", lambda expr, f: f(expr))
    inlined = run()
    assert bound == inlined
    assert bound and all(n > 0 for _, n, _ in bound)


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
