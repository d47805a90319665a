"""functions/casefold.py: deployment-locale-independent case folding.

Two halves (module docstring there has the full hazard writeup):

* parity — under the suite's default-locale JVM the safe wrappers are
  byte-identical to Python's locale-free ``str.lower``/``str.upper``
  (which implements the same root-locale Unicode mappings) on a planted
  set covering every locale-conditional trigger codepoint;
* independence — a subprocess JVM booted under ``-Duser.language=tr``
  (via ``JAVA_TOOL_OPTIONS``, which reaches the JVM regardless of how
  Spark launches it) where raw ``F.lower`` DEMONSTRABLY diverges on the
  same inputs (the witness that the axis has teeth) while the safe
  wrappers and the case-folded product surfaces (``ccnet_normalize``,
  the date-candidate ``ascii_initcap``) hold byte-identical.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.functions.casefold import (
    ascii_initcap, safe_lower, safe_upper)

# Every tr/az/lt locale-conditional trigger, plus ASCII, accents,
# one-to-many (İ → i + U+0307; ß → SS upper), no-case CJK, and empties.
HAZARD = [
    "TİTLE ÉI",
    "AÉI",
    "PLAIN ASCII I J",
    "STRASSE ß Ä I",
    "Ì Í Ĩ Į J I",
    "MIXED Île-de-France É",
    "i stays dotted é",
    "İstanbul KINALIADA",
    "漢字 NO CASE 字",
    "",
]


@pytest.fixture(scope="module")
def hazard_df(spark):
    return spark.createDataFrame([(s,) for s in HAZARD], ["s"])


def test_safe_lower_matches_python_reference(hazard_df):
    got = [r.lo for r in
           hazard_df.select(safe_lower(F.col("s")).alias("lo")).collect()]
    assert got == [s.lower() for s in HAZARD]


def test_safe_upper_matches_python_reference(hazard_df):
    # scope: the tr/az i→İ rule (the Lithuanian combining-mark residual
    # is documented out of scope — no planted string exercises it)
    got = [r.up for r in
           hazard_df.select(safe_upper(F.col("s")).alias("up")).collect()]
    assert got == [s.upper() for s in HAZARD]


def test_sql_safe_lower_tree_identical(spark):
    """r12: `sql_safe_lower` renders the safe_lower tree as Spark-SQL
    text (for call sites that assemble whole expressions as one parsed
    string — construction-cost cut, guide §5). The parsed tree must be
    EXACTLY the Column form's tree: same guard, same pre-fold chain,
    same branch order. Rendered from the module constants, so constant
    drift breaks here first."""
    import re

    from dig_etl_engine_spark.functions.casefold import sql_safe_lower

    df = spark.createDataFrame([("x",)], ["s"])
    strip = lambda s: re.sub(r"#\d+", "", s)  # noqa: E731
    col_form = strip(df.select(safe_lower(F.col("s")).alias("o"))
                     ._jdf.queryExecution().analyzed().toString())
    sql_form = strip(df.selectExpr(f"{sql_safe_lower('`s`')} AS o")
                     ._jdf.queryExecution().analyzed().toString())
    assert col_form == sql_form, (col_form, sql_form)


def test_safe_lower_null_passthrough(spark):
    row = (spark.createDataFrame([(None,)], "s string")
           .select(safe_lower(F.col("s")).alias("lo"),
                   safe_upper(F.col("s")).alias("up")).head())
    assert row.lo is None and row.up is None


def test_ascii_guard_is_extensionally_equal(spark):
    """r10: the wrappers route all-ASCII rows to the bare engine casing
    (its ASCII fast path is already locale-free) and only pre-fold rows
    carrying a multi-byte char. The guard must NEVER change output —
    guarded and always-folded forms must agree on every input: ASCII
    with triggers, non-ASCII with triggers, the İ one-to-many, mixed,
    hypothesis-generated unicode."""
    from hypothesis import given, settings, strategies as st

    from dig_etl_engine_spark.functions import casefold as cf

    def folded_lower(c):   # the unguarded r9 form
        x = F.replace(c, F.lit(cf._CAP_I_DOT), F.lit(cf._SMALL_I_DOT))
        return F.lower(F.translate(x, cf._LOWER_TRIGGERS, cf._LOWER_IMAGES))

    def folded_upper(c):
        return F.upper(F.translate(c, cf._UPPER_TRIGGERS, cf._UPPER_IMAGES))

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(
        alphabet=st.sampled_from(list("IJij ÌÍĨĮİé漢xyzAB")),
        max_size=12), min_size=1, max_size=8))
    def check(strings):
        df = spark.createDataFrame([(s,) for s in strings], ["s"])
        rows = df.select(
            safe_lower(F.col("s")).alias("g_lo"),
            folded_lower(F.col("s")).alias("f_lo"),
            safe_upper(F.col("s")).alias("g_up"),
            folded_upper(F.col("s")).alias("f_up")).collect()
        for r in rows:
            assert r.g_lo == r.f_lo and r.g_up == r.f_up

    check()
    # and on the curated hazard set
    df = spark.createDataFrame([(s,) for s in HAZARD], ["s"])
    rows = df.select(safe_lower(F.col("s")).alias("g"),
                     folded_lower(F.col("s")).alias("f")).collect()
    assert [r.g for r in rows] == [r.f for r in rows]


# One self-contained child script: emits JSON so the parent asserts on
# values, not exit codes. Boots its own Spark — must NOT inherit the
# suite's session (the whole point is a differently-configured JVM).
_CHILD = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession, functions as F
from dig_etl_engine_spark.functions.casefold import (
    ascii_initcap, safe_lower, safe_upper)
from dig_etl_engine_spark.operators.text_analysis import ccnet_normalize
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
loc = spark.sparkContext._jvm.java.util.Locale.getDefault().toString()
rows = json.loads(sys.argv[2])
df = spark.createDataFrame([(s,) for s in rows], ["s"])
out = df.select(
    F.lower("s").alias("raw_lo"),
    safe_lower(F.col("s")).alias("safe_lo"),
    safe_upper(F.col("s")).alias("safe_up"),
    ccnet_normalize(F.col("s")).alias("norm"),
    ascii_initcap(F.lit("JANUARY 5 2021")).alias("cap"),
).collect()
# the Spark-internal cousin of the casing hazard: the writer resolves
# partitionOverwriteMode via a default-locale toUpperCase before its
# enum lookup, so a lowercase "dynamic" crashes under tr
# (NoSuchElementException: 'DYNAMIC' with dotted I). The engine ships
# the pre-uppercased literal everywhere; prove it survives this JVM.
import shutil, tempfile
d = tempfile.mkdtemp()
try:
    (spark.range(2).withColumn("p", F.col("id") % 2)
     .write.mode("overwrite").option("partitionOverwriteMode", "DYNAMIC")
     .partitionBy("p").parquet(d))
    dyn_rows = spark.read.parquet(d).count()
finally:
    shutil.rmtree(d, ignore_errors=True)
print("CASEFOLD_JSON:" + json.dumps({
    "locale": loc,
    "raw_lo": [r.raw_lo for r in out],
    "safe_lo": [r.safe_lo for r in out],
    "safe_up": [r.safe_up for r in out],
    "norm": [r.norm for r in out],
    "cap": out[0].cap,
    "dyn_rows": dyn_rows,
}))
"""


def _run_child(env_extra: dict[str, str]) -> dict:
    import os

    repo = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)   # never attach to our JVM
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    for k, v in env_extra.items():
        # APPEND to inherited JAVA_TOOL_OPTIONS (hosts may carry
        # heap/truststore flags there — clobbering them would fail the
        # child JVM for reasons unrelated to the locale axis). ONLY that
        # var is list-valued; anything else (LANG, LC_ALL) must replace.
        env[k] = f"{env[k]} {v}" if k == "JAVA_TOOL_OPTIONS" \
            and env.get(k) else v
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, json.dumps(HAZARD)],
        capture_output=True, text=True, env=env, timeout=300)
    payload = [ln for ln in proc.stdout.splitlines()
               if ln.startswith("CASEFOLD_JSON:")]
    assert proc.returncode == 0 and payload, (proc.stdout[-2000:],
                                              proc.stderr[-4000:])
    return json.loads(payload[0][len("CASEFOLD_JSON:"):])


def test_locale_independence_under_turkish_jvm():
    got = _run_child({
        "JAVA_TOOL_OPTIONS": "-Duser.language=tr -Duser.country=TR"})
    assert got["locale"] == "tr_TR", got["locale"]
    py = [s.lower() for s in HAZARD]
    # the witness: the RAW engine lower really is locale-dependent on
    # this build (if a Spark upgrade makes it locale-free, this assert
    # fires and the whole casefold layer can be retired knowingly)
    assert got["raw_lo"] != py, (
        "raw F.lower no longer diverges under tr_TR — casefold.py may "
        "be retirable on this Spark build")
    assert "ı" in "".join(got["raw_lo"]), got["raw_lo"]
    # the contract: safe wrappers and product surfaces hold the
    # root-locale output byte-for-byte under the hostile JVM
    assert got["safe_lo"] == py
    assert got["safe_up"] == [s.upper() for s in HAZARD]
    assert got["cap"] == "January 5 2021"
    assert got["dyn_rows"] == 2   # pre-uppercased "DYNAMIC" writer option
    ref = _run_child({})   # same child under the suite's default locale
    assert ref["locale"] != "tr_TR"
    assert got["norm"] == ref["norm"]
    assert got["safe_lo"] == ref["safe_lo"]
    assert got["safe_up"] == ref["safe_up"]
