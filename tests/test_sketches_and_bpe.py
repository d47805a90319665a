"""Unit tests for the full BPE merge trainer (`operators/
text_analysis.py:bpe_train_merges`) and the KMV bottom-k overlap
sketches (`operators/sketches.py`)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators import text_analysis as TA
from dig_etl_engine_spark.operators.sketches import (
    kmv_sketches, kmv_source_overlap)


# --- pure-Python greedy-BPE reference ---------------------------------------

def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, int]]:
    """Independent scan-based reference: leftmost non-overlapping merge
    application over symbol tuples — the textbook Sennrich loop."""
    freq: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.strip().lower().split():
            if len(w) >= 2:
                k = tuple(w)
                freq[k] = freq.get(k, 0) + 1
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in freq.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((step, f"{a} {b}", n))
        new: dict[tuple[str, ...], int] = {}
        for syms, f in freq.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + f
        freq = new
    return merges


def _run(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    rows = TA.bpe_train_merges(df, n_merges=n).collect()
    return [(r["step"], r["pair"], r["n"]) for r in rows]


class TestBpeTrainMerges:
    def test_textbook_corpus(self, spark):
        texts = ["low low low low low lower lower newest newest",
                 "newest newest newest newest widest widest widest"]
        assert _run(spark, texts, 6) == _ref_bpe(texts, 6)

    def test_repeated_symbol_runs(self, spark):
        # [a,a,a,a] must greedily become [aa,aa], then [aaaa] — the case
        # a naive delimiter encoding gets wrong by sharing a boundary.
        texts = ["aaaa aaaa aaa"]
        got = _run(spark, texts, 3)
        assert got == _ref_bpe(texts, 3)
        assert got[0][1] == "a a"

    def test_merged_symbol_pairs_again(self, spark):
        # merges must chain: (e,r) then (er,?) style second-order pairs.
        texts = ["berber berber berber erber"]
        assert _run(spark, texts, 5) == _ref_bpe(texts, 5)

    def test_punctuation_symbols_survive(self, spark):
        texts = ["a|b a|b a|b c||d c||d x..y x..y x..y x..y"]
        assert _run(spark, texts, 4) == _ref_bpe(texts, 4)

    def test_partitioning_invariance(self, spark):
        texts = [f"hello world wordy w{i % 7}rd" for i in range(40)]
        df1 = spark.createDataFrame(
            [(t,) for t in texts], "text STRING").repartition(1)
        df7 = spark.createDataFrame(
            [(t,) for t in texts], "text STRING").repartition(7)
        r1 = [(r["step"], r["pair"], r["n"])
              for r in TA.bpe_train_merges(df1, n_merges=5).collect()]
        r7 = [(r["step"], r["pair"], r["n"])
              for r in TA.bpe_train_merges(df7, n_merges=5).collect()]
        assert r1 == r7 == _ref_bpe(texts, 5)

    def test_exhausted_corpus_stops_early(self, spark):
        # one two-char word: exactly one mergeable pair, then nothing.
        got = _run(spark, ["ab ab"], 5)
        assert got == [(1, "a b", 2)]


# --- KMV sketches ------------------------------------------------------------

def _two_source_df(spark, n_a=300, n_b=300, n_shared=150):
    rows = []
    for i in range(n_shared):
        rows.append(("A", f"shared-{i}"))
        rows.append(("B", f"shared-{i}"))
    for i in range(n_a - n_shared):
        rows.append(("A", f"only-a-{i}"))
    for i in range(n_b - n_shared):
        rows.append(("B", f"only-b-{i}"))
    return spark.createDataFrame(rows, "source STRING, text STRING")


class TestKmvSketches:
    def test_sketch_is_bottom_k_of_md5(self, spark):
        df = _two_source_df(spark, 50, 50, 10)
        sk = {(r["source"], r["rn"]): r["h"]
              for r in kmv_sketches(df, k=8, hash_mode="md5").collect()}
        a_hashes = sorted(
            hashlib.md5(f"shared-{i}".encode()).hexdigest()[:16]
            for i in range(10)) + sorted(
            hashlib.md5(f"only-a-{i}".encode()).hexdigest()[:16]
            for i in range(40))
        assert sk[("A", 1)] == min(a_hashes)
        assert [sk[("A", i)] for i in range(1, 9)] == sorted(a_hashes)[:8]

    def test_estimate_tracks_exact_jaccard(self, spark):
        # true J = 150 / 450 = 1/3; k=128 of 450 distinct → SE ≈ 4%.
        df = _two_source_df(spark)
        row = kmv_source_overlap(df, k=128, hash_mode="md5").collect()[0]
        assert row["source_a"] == "A" and row["source_b"] == "B"
        assert row["k_used"] == 128
        assert abs(row["jaccard_est"] - 1 / 3) < 0.15

    def test_disjoint_and_identical_sources(self, spark):
        df = _two_source_df(spark, 60, 60, 0)
        row = kmv_source_overlap(df, k=32, hash_mode="md5").collect()[0]
        assert row["n_common"] == 0 and row["jaccard_est"] == 0.0
        dup = _two_source_df(spark, 40, 40, 40)
        row = kmv_source_overlap(dup, k=32, hash_mode="md5").collect()[0]
        assert row["jaccard_est"] == 1.0

    def test_small_union_uses_all_hashes(self, spark):
        df = _two_source_df(spark, 20, 20, 5)
        row = kmv_source_overlap(df, k=128, hash_mode="md5").collect()[0]
        assert row["k_used"] == 35  # |A ∪ B| = 20 + 20 - 5
        assert row["n_common"] == 5
        assert abs(row["jaccard_est"] - 5 / 35) < 1e-6  # est rounds to 6dp

    def test_prefilter_salts_identical_result(self, spark):
        df = _two_source_df(spark)
        plain = sorted(map(tuple, kmv_source_overlap(
            df, k=64, hash_mode="md5").collect()))
        salted = sorted(map(tuple, kmv_source_overlap(
            df, k=64, hash_mode="md5", prefilter_salts=8).collect()))
        assert plain == salted

    def test_xxhash_mode_runs(self, spark):
        df = _two_source_df(spark, 50, 50, 25)
        row = kmv_source_overlap(df, k=32).collect()[0]
        assert 0.0 <= row["jaccard_est"] <= 1.0


class TestBpeSubwordStats:
    def test_matches_reference_encoding(self, spark):
        texts = ["low lower low widest x", "newest lower newest ab"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING")
        got = {r["doc_id"]: (r["n_words"], r["n_subwords"])
               for r in TA.bpe_subword_stats(df, n_merges=4).collect()}
        # replay with the reference trainer's final vocab
        freq: dict[tuple[str, ...], int] = {}
        for t in texts:
            for w in t.strip().lower().split():
                if len(w) >= 2:
                    freq[tuple(w)] = freq.get(tuple(w), 0) + 1
        merges = _ref_bpe(texts, 4)
        vocab: dict[str, int] = {}
        for syms in freq:
            cur = list(syms)
            for _, pair, _n in merges:
                a, b = pair.split(" ")
                out, i = [], 0
                while i < len(cur):
                    if i + 1 < len(cur) and cur[i] == a and cur[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(cur[i])
                        i += 1
                cur = out
            vocab["".join(syms)] = len(cur)
        for i, t in enumerate(texts):
            words = t.strip().lower().split()
            want = (len(words), sum(vocab.get(w, 1) for w in words))
            assert got[i] == want, (i, got[i], want)

    def test_single_char_words_count_one(self, spark):
        df = spark.createDataFrame([(0, "a b c ab")], "doc_id LONG, text STRING")
        r = TA.bpe_subword_stats(df, n_merges=2).collect()[0]
        # 'ab' trains to one symbol after merge 1; a/b/c fall back to 1
        assert (r["n_words"], r["n_subwords"]) == (4, 4)


class TestKeySkewProfile:
    def test_planted_skew(self, spark):
        from dig_etl_engine_spark.operators.skew import key_skew_profile
        rows = [(0,)] * 90 + [(k,) for k in range(1, 11) for _ in range(1)]
        df = spark.createDataFrame(rows, "k LONG")
        r = key_skew_profile(df, "k", top_k=1).collect()[0]
        assert r["n_keys"] == 11 and r["n_rows"] == 100
        assert r["max_n"] == 90 and r["p50_n"] == 1.0
        assert abs(r["top_share"] - 0.9) < 1e-9

    def test_uniform_keys(self, spark):
        from dig_etl_engine_spark.operators.skew import key_skew_profile
        df = spark.createDataFrame(
            [(i % 10,) for i in range(100)], "k LONG")
        r = key_skew_profile(df, "k", top_k=5).collect()[0]
        assert r["n_keys"] == 10 and r["max_n"] == 10
        assert abs(r["top_share"] - 0.5) < 1e-9


class TestCcnetNormalize:
    def _norm(self, spark, s):
        df = spark.createDataFrame([(s,)], "t STRING")
        return df.select(TA.ccnet_normalize(F.col("t")).alias("n")) \
            .collect()[0]["n"]

    def test_folds_case_accents_digits_punct(self, spark):
        assert self._norm(spark, "Héllo, Wörld! 42") == "hello world 00"

    def test_collapses_whitespace(self, spark):
        assert self._norm(spark, "  a\t b\n\nc  ") == "a b c"

    def test_idempotent(self, spark):
        s = "Çà et là — №7; naïve文"
        once = self._norm(spark, s)
        assert self._norm(spark, once) == once

    def test_keeps_non_latin_letters(self, spark):
        # \p{L} keeps CJK instead of destroying it (the oracle-parity
        # restriction to [a-z0-9] only matters for ASCII corpora).
        assert self._norm(spark, "中文 test") == "中文 test"

    def test_oracle_template_parity_on_non_ascii(self, spark):
        """The shipped DuckDB rendering must agree with the Spark chain
        beyond ASCII — the exact divergence a review once flagged when
        the SQL template stripped [^a-z0-9] while Spark kept \\p{L}."""
        import duckdb
        s = "Héllo, 中文 žurnal 42! ...serie№7"
        sql = TA.CCNET_NORMALIZE_SQL.format(col="?")
        want = duckdb.execute(f"SELECT {sql}", [s]).fetchone()[0]
        assert self._norm(spark, s) == want
