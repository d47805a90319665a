"""Unit + plan-shape tests for the round-4 corpus profiling operators:
top_ngrams, tfidf_keywords, paragraph-granularity global_line_dedup, and
minhash_decontaminate (fuzzy eval leakage). The driver oracle checks
value parity; these pin the semantics a hash can't explain (paraphrase
recall vs the exact rule, separator granularity) and the plan shapes the
operators promise (TakeOrdered top-k, broadcast eval side)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.dedup import minhash_decontaminate
from dig_etl_engine_spark.operators.text_analysis import (
    decontaminate, global_line_dedup, tfidf_keywords, top_ngrams)


class TestTopNgrams:
    def test_counts_and_order(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c a b c"), (2, "a b c d e f"), (3, "x y z")],
            "doc_id long, text string")
        rows = top_ngrams(docs, n=3, k=3).collect()
        # 'a b c' occurs 3x (twice in doc1: positions 0 and... doc1 grams:
        # abc bca cab abc -> 2; doc2: abc -> 1) = 3 total
        assert rows[0].gram == "a b c" and rows[0].n_occurrences == 3
        assert len(rows) == 3

    def test_plan_is_take_ordered(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string")
        plan = top_ngrams(docs, n=3, k=5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan


class TestTfidfKeywords:
    def test_rare_token_outranks_common(self, spark):
        docs = spark.createDataFrame(
            [(1, "common rare common"), (2, "common filler"),
             (3, "common other")],
            "doc_id long, text string")
        rows = {(r.doc_id, r.rank): r.token
                for r in tfidf_keywords(docs, k=2).collect()}
        # 'rare' (df=1) beats 'common' (df=3) for doc 1 despite tf 1 vs 2?
        # tf(common)=2 * (ln(4/4)+1)=2.0; tf(rare)=1 * (ln(4/2)+1)=1.693
        # -> common still wins on tf; both present, common rank 1
        assert rows[(1, 1)] == "common" and rows[(1, 2)] == "rare"

    def test_broadcast_n_not_collected(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "b c")], "doc_id long, text string")
        plan = tfidf_keywords(docs, k=1)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" \
            in plan, plan


class TestParagraphDedup:
    def test_block_granularity(self, spark):
        # the repeated PARAGRAPH contains two lines that also appear,
        # individually, inside unique paragraphs — line-level dedup
        # would delete those; paragraph-level must not
        promo = "promo line one\npromo line two"
        docs = spark.createDataFrame(
            [(1, f"intro one\n\n{promo}"),
             (2, f"intro two\n\n{promo}"),
             (3, "solo doc\n\npromo line one kept inline")],
            "doc_id long, text string")
        out = {r.doc_id: r.text
               for r in global_line_dedup(docs, sep="\n\n").collect()}
        assert out[1] == f"intro one\n\n{promo}"   # first occurrence kept
        assert out[2] == "intro two"               # repeat removed
        assert "promo line one kept inline" in out[3]  # distinct block

    def test_drop_all_mode(self, spark):
        docs = spark.createDataFrame(
            [(1, "dup\n\nown one"), (2, "dup\n\nown two")],
            "doc_id long, text string")
        out = {r.doc_id: r.text
               for r in global_line_dedup(docs, sep="\n\n",
                                          keep_first=False).collect()}
        assert out == {1: "own one", 2: "own two"}


class TestMinhashDecontaminate:
    BASE = ("the committee published its final report on river safety "
            "after months of public hearings and detailed engineering "
            "review across the whole region")

    def test_catches_paraphrase_exact_rule_misses(self, spark):
        # eval doc = corpus doc with scattered single-token edits: no
        # 13 consecutive shared tokens survive, so the exact rule sees
        # nothing — but the shingle set is still mostly shared
        toks = self.BASE.split()
        toks[3] = "released"
        toks[11] = "waterway"
        toks[19] = "thorough"
        paraphrase = " ".join(toks)
        corpus = spark.createDataFrame(
            [(1, self.BASE), (2, "entirely unrelated text about farming "
                                 "practices in the northern valley")],
            "doc_id long, text string")
        evals = spark.createDataFrame(
            [(900, paraphrase)], "doc_id long, text string")
        exact = decontaminate(corpus, evals, n=13).collect()
        assert exact == []                       # the gap being closed
        # scattered edits leave jaccard ~0.38 — below the default
        # 4-band×4-row S-curve's reliable zone, so sweep with rows=1
        # banding (16 bands of 1 hash: P(hit) = 1-(1-s)^16 ≈ 0.999),
        # the standard LSH parameterization for low-threshold sweeps
        fuzzy = minhash_decontaminate(corpus, evals, threshold=0.3,
                                      num_hashes=16, bands=16).collect()
        assert [(r.doc_id, r.eval_id) for r in fuzzy] == [(1, 900)]

    def test_eval_side_broadcasts(self, spark):
        corpus = spark.createDataFrame(
            [(1, self.BASE)], "doc_id long, text string")
        evals = spark.createDataFrame(
            [(900, self.BASE)], "doc_id long, text string")
        plan = minhash_decontaminate(corpus, evals)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan, plan
        # and the corpus side must not sort-merge against the eval bands
        assert "SortMergeJoin" not in plan, plan


class TestNgramLmScores:
    def test_fluent_scores_below_junk(self, spark):
        """A doc made of reference trigrams must score (mean neg-logp)
        well below a doc of unseen trigrams — the separation the CCNet
        perplexity band relies on."""
        from dig_etl_engine_spark.operators.text_analysis import (
            ngram_lm_scores)

        ref = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog") for i
             in range(5)], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(100, "the quick brown fox jumps"),        # in-domain
             (101, "zz qq vv kk pp ww")],               # unseen junk
            "doc_id long, text string")
        got = {r.doc_id: r.avg_neg_logp
               for r in ngram_lm_scores(corpus, ref).collect()}
        assert got[100] < got[101]
        # in-domain trigrams: P ~ (5+0.1)/(5+0.1·8) -> nlp ~ ln(1.14)
        assert got[100] < 0.5
        # unseen: V=8 distinct ref tokens, P = 0.1/(0.1·8) = 1/8
        assert got[101] == pytest.approx(2.079442, abs=1e-5)

    def test_short_docs_omitted(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            ngram_lm_scores)

        ref = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b")], "doc_id long, text string")
        ids = {r.doc_id for r in ngram_lm_scores(corpus, ref).collect()}
        assert ids == {1}

    def test_trigram_sql_tree_matches_column_form(self, spark):
        """r12: `_trigram_rows` assembles its expression tree as one
        parsed SQL string (construction-cost cut, guide §5). This pin
        keeps the parsed tree ALPHA-IDENTICAL to the Column form it
        replaced — the reference implementation below is the pre-r12
        code verbatim. 'Alpha-identical' = analyzed plans equal after
        stripping expression ids AND Catalyst's auto-generated lambda
        variable names (`lambda x_N` vs the SQL text's `lambda t`/`s`
        — pure naming, zero semantics). If casefold constants or the
        trigram shape drift, this fails loudly."""
        import re

        from pyspark.sql import functions as F
        from dig_etl_engine_spark.functions.bindings import bind_once
        from dig_etl_engine_spark.functions.casefold import safe_lower
        from dig_etl_engine_spark.operators.text_analysis import (
            _trigram_rows)

        def trigrams_column_reference(df):
            toks = F.split(F.trim(safe_lower(F.col("text"))), r"\s+")

            def grams(t):
                n_out = F.size(t) - 2
                zipped = F.arrays_zip(F.slice(t, 1, n_out),
                                      F.slice(t, 2, n_out),
                                      F.slice(t, 3, n_out))
                return F.transform(
                    zipped,
                    lambda s: F.struct(
                        F.concat_ws(" ", s["0"], s["1"]).alias("ctx"),
                        s["2"].alias("w")))

            return (df.filter(F.size(toks) >= 3)
                    .select(F.col("doc_id").alias("id"),
                            F.explode(bind_once(toks, grams)).alias("t"))
                    .select("id", "t.ctx", "t.w"))

        df = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string")

        def canon(sdf):
            s = sdf._jdf.queryExecution().analyzed().toString()
            s = re.sub(r"#\d+", "", s)
            # lambda variable names are parser-assigned labels: the
            # Column API invents x_1/x_2..., SQL keeps the source names
            return re.sub(r"lambda [A-Za-z_][A-Za-z0-9_]*", "lambda V", s)

        got = canon(_trigram_rows(df))
        want = canon(trigrams_column_reference(df))
        assert got == want, f"---- got ----\n{got}\n---- want ----\n{want}"


class TestProductQuantization:
    def test_reconstruction_beats_zero_and_respects_codebook(self, spark):
        """PQ reconstruction (concat of per-subspace centroids) must cut
        MSE well below the zero-vector baseline (= mean ||v||²/dim), and
        every code must index a real codebook row."""
        import numpy as np

        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.similarity import (
            pq_train_encode)

        emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
        codes, books = pq_train_encode(emb, m=4, k=8, iters=2)
        assert len(books) == 4 and all(b.shape == (8, 16) for b in books)
        rows = {r.vec_id: r.codes for r in codes.collect()}
        orig = {r.vec_id: np.array(r.embedding, dtype=np.float64)
                for r in emb.select("vec_id", "embedding").collect()}
        assert set(rows) == set(orig)
        se = baseline = 0.0
        for vid, cs in rows.items():
            assert all(0 <= c < 8 for c in cs)
            recon = np.concatenate([books[s][cs[s]] for s in range(4)])
            se += float(((orig[vid] - recon) ** 2).sum())
            baseline += float((orig[vid] ** 2).sum())
        # isotropic random vectors are PQ's worst case: rate-distortion
        # floor ~ k^(-2/d_sub) = 8^(-1/8) ≈ 0.77 of the variance, so any
        # real reduction proves the codebooks fit; structured (real)
        # embeddings compress far better
        assert se < 0.9 * baseline

    def test_codes_deterministic_across_runs(self, spark):
        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.similarity import (
            pq_train_encode)

        emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
        a, _ = pq_train_encode(emb, m=4, k=8, iters=2)
        b, _ = pq_train_encode(emb.repartition(7), m=4, k=8, iters=2)
        ra = sorted((r.vec_id, tuple(r.codes)) for r in a.collect())
        rb = sorted((r.vec_id, tuple(r.codes)) for r in b.collect())
        assert ra == rb


class TestWeightedSample:
    def test_inclusion_tracks_weight_and_is_deterministic(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            weighted_sample)

        rows = [(i, 10.0 if i < 50 else 1.0) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        heavy = light = 0
        for s in range(8):                      # fixed salts → no flake
            got = {r.doc_id for r in
                   weighted_sample(df, 30, weight_col="w",
                                   salt=f"s{s}").collect()}
            assert len(got) == 30
            heavy += sum(1 for d in got if d < 50)
            light += sum(1 for d in got if d >= 50)
        # A-ES: 10:1 weights over a 30-of-100 draw → heavy rows dominate
        assert heavy > 3 * light, (heavy, light)
        # same salt → identical sample
        a = weighted_sample(df, 30, weight_col="w", salt="x").collect()
        b = weighted_sample(df.repartition(7), 30, weight_col="w",
                            salt="x").collect()
        assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)

    def test_nonpositive_weights_never_sample(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            weighted_sample)

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id long, w double")
        got = [r.doc_id for r in
               weighted_sample(df, 10, weight_col="w").collect()]
        assert got == [1]


class TestSentimentScores:
    def test_labels_and_means(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            sentiment_scores)

        docs = spark.createDataFrame(
            [(1, "the build is fast and stable and great"),
             (2, "slow broken query with a terrible crash"),
             (3, "the table has a column and a row")],
            "doc_id long, text string")
        got = {r.doc_id: r for r in sentiment_scores(docs).collect()}
        # fast(2)+stable(2)+great(4) = 8 over 8 tokens
        assert (got[1].sent_sum, got[1].label) == (8, "pos")
        # slow(-2)+broken(-3)+terrible(-4)+crash(-4) = -13 over 7
        assert (got[2].sent_sum, got[2].label) == (-13, "neg")
        assert got[3].label == "neu" and got[3].sent_sum == 0

    def test_custom_lexicon_swaps_in(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            sentiment_scores)

        docs = spark.createDataFrame(
            [(1, "foo bar foo")], "doc_id long, text string")
        rows = sentiment_scores(docs, lexicon={"foo": 1}).collect()
        assert rows[0].sent_sum == 2 and rows[0].label == "pos"


class TestVocabCoverage:
    def test_oov_against_reference_vocab(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            vocab_coverage)

        ref = spark.createDataFrame(
            [(1, "alpha alpha beta beta gamma")],
            "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(10, "alpha beta novel words"), (11, "alpha beta")],
            "doc_id long, text string")
        got = {r.doc_id: (r.n_tokens, r.n_oov)
               for r in vocab_coverage(corpus, ref,
                                       vocab_size=2).collect()}
        # vocab = {alpha, beta} (counts 2,2; gamma count 1 missed)
        assert got[10] == (4, 2) and got[11] == (2, 0)


def test_approx_cardinality_close_to_exact(spark):
    """The 100 TB path for the cardinality profile swaps count_distinct
    for approx_count_distinct (HLL, no distinct shuffle); pin the
    relative error at the default rsd=0.05 on real data."""
    from dig_etl_engine_spark.catalog import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.01")["documents"]
    tok = docs.select(F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                        r"\s+")).alias("t"))
    row = tok.agg(
        F.count_distinct("t").alias("exact"),
        F.approx_count_distinct("t").alias("approx")).head()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.1


def test_corpus_diff_statuses(spark):
    from dig_etl_engine_spark.operators.text_analysis import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same text"), (2, "now different"), (4, "brand new")],
        "doc_id long, text string")
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added"}
    # whitespace-variant content is the SAME fingerprint (normalized)
    new2 = spark.createDataFrame(
        [(1, "  same   text ")], "doc_id long, text string")
    got2 = {r.doc_id: r.status
            for r in corpus_diff(old.filter("doc_id = 1"),
                                 new2).collect()}
    assert got2 == {1: "unchanged"}


def test_remove_contaminated_spans_cuts_only_the_leak(spark):
    from dig_etl_engine_spark.operators.text_analysis import (
        remove_contaminated_spans)

    corpus = spark.createDataFrame(
        [(1, "Keep head tokens LEAK A B C D E plus tail stays here"),
         (2, "totally clean document with no overlap at all")],
        "doc_id long, text string")
    evals = spark.createDataFrame(
        [(9, "leak a b c d e")], "doc_id long, text string")
    out = {r.doc_id: (r.text, r.n_removed)
           for r in remove_contaminated_spans(corpus, evals,
                                              n=6).collect()}
    # exactly the 6 leak tokens go; case of survivors is preserved
    assert out[1] == ("Keep head tokens plus tail stays here", 6)
    assert out[2][1] == 0 and out[2][0].startswith("totally clean")


def test_chunk_documents_null_text_yields_one_chunk(spark):
    from dig_etl_engine_spark.operators.text_analysis import chunk_documents

    docs = spark.createDataFrame(
        [(1, "some real text"), (2, None)], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == ""
    assert len(by_doc[1]) == 1
