"""Data-selection operator units: SemDeDup pruning, DSIR importance
weights, BPE pair statistics, deterministic split assignment.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.similarity import semdedup
from dig_etl_engine_spark.operators.text_analysis import (
    assign_splits, bpe_pair_stats, dsir_importance_weights)


class TestSemDeDup:
    def test_prunes_higher_id_of_near_pairs(self, spark):
        """Two planted near-dup pairs in well-separated regions: the
        higher id of each pair is dropped, everything else kept, one
        output row per input vector."""
        base = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9999, 0.001, 0.0, 0.0]),   # near-dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.9999, 0.001, 0.0]),   # near-dup of 2
            (4, [0.0, 0.0, 1.0, 0.0]),
            (5, [0.0, 0.0, 0.0, 1.0]),
        ]
        df = spark.createDataFrame(
            base, "vec_id long, embedding array<double>")
        out = semdedup(df, k=4, iters=2, threshold=0.99)
        rows = {r.vec_id: r.kept for r in out.collect()}
        assert len(rows) == len(base)
        assert rows[1] is False and rows[3] is False
        assert all(rows[i] for i in (0, 2, 4, 5))

    def test_pairwise_only_within_cluster(self, spark):
        """A vector identical to another but forced into a different
        k-means cell is NOT compared against it — the documented
        cluster-boundary approximation (detection is per-cell)."""
        # k=2 with seeds = two lowest ids: id 0 (x-axis) and id 1
        # (y-axis). ids 2/3 are copies of the seeds, so they cluster
        # with their own seed and both survive cross-cell.
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
             (2, [1.0, 0.0]), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>")
        out = semdedup(df, k=2, iters=1, threshold=0.99)
        rows = {r.vec_id: (r.cluster, r.kept) for r in out.collect()}
        # same-cell copies ARE pruned...
        assert rows[2][1] is False and rows[3][1] is False
        # ...and the two surviving seeds sit in different cells.
        assert rows[0][0] != rows[1][0]
        assert rows[0][1] and rows[1][1]


class TestDsirWeights:
    def _corpus(self, spark):
        rows = [(i, "wiki article encyclopedia reference entry"
                 if i % 2 == 0 else "buy cheap pills now click here")
                for i in range(20)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_target_like_docs_score_higher(self, spark):
        corpus = self._corpus(spark)
        target = corpus.filter(F.col("doc_id") % 2 == 0)
        for mode in ("xxhash64", "md5"):
            got = dsir_importance_weights(
                corpus, target, buckets=256, hash_mode=mode)
            scores = {r.doc_id: r.avg_log_ratio for r in got.collect()}
            assert all(scores[i] > scores[j]
                       for i in range(0, 20, 2) for j in range(1, 20, 2))

    def test_feature_count_is_unigrams_plus_bigrams(self, spark):
        df = spark.createDataFrame([(0, "a b c")],
                                   "doc_id long, text string")
        got = dsir_importance_weights(df, df).collect()
        assert got[0].n_feats == 3 + 2

    def test_single_token_doc_has_no_bigrams(self, spark):
        df = spark.createDataFrame([(0, "solo")],
                                   "doc_id long, text string")
        assert dsir_importance_weights(df, df).collect()[0].n_feats == 1

    def test_unknown_hash_mode_raises(self, spark):
        df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="hash_mode"):
            dsir_importance_weights(df, df, hash_mode="sha9").collect()


class TestBpePairStats:
    def test_hand_counted_pairs(self, spark):
        # word freqs: 'aaab'×2, 'ab'×1 → pair 'aa': 2·2=4, 'ab': 2·1+1=3
        df = spark.createDataFrame([(0, "aaab aaab ab")],
                                   "doc_id long, text string")
        got = [(r.pair, r.n) for r in bpe_pair_stats(df).collect()]
        assert got == [("aa", 4), ("ab", 3)]

    def test_single_char_words_ignored(self, spark):
        df = spark.createDataFrame([(0, "a b c ab")],
                                   "doc_id long, text string")
        got = [(r.pair, r.n) for r in bpe_pair_stats(df).collect()]
        assert got == [("ab", 1)]

    def test_topk_tiebreak_lexicographic(self, spark):
        df = spark.createDataFrame([(0, "xy uv")],
                                   "doc_id long, text string")
        got = [r.pair for r in bpe_pair_stats(df, k=1).collect()]
        assert got == ["uv"]


class TestAssignSplits:
    def _docs(self, spark, n=2000):
        return spark.createDataFrame([(i,) for i in range(n)],
                                     "doc_id long")

    def test_fractions_respected_and_total(self, spark):
        docs = self._docs(spark)
        got = assign_splits(docs, {"test": 0.1, "val": 0.1, "train": 0.8})
        counts = {r["split"]: r["count"]
                  for r in got.groupBy("split").count().collect()}
        assert sum(counts.values()) == 2000
        assert 120 <= counts["test"] <= 280     # ~200 ± hash noise
        assert 120 <= counts["val"] <= 280
        assert counts["train"] > 1400

    def test_deterministic_and_stable_under_growth(self, spark):
        """Re-running assigns identically, and adding docs never moves
        an existing doc's split — the property a random split lacks."""
        fr = {"test": 0.2, "train": 0.8}
        small = assign_splits(self._docs(spark, 100), fr)
        big = assign_splits(self._docs(spark, 2000), fr)
        s = {r.doc_id: r.split for r in small.collect()}
        b = {r.doc_id: r.split for r in big.collect()}
        assert all(b[i] == s[i] for i in s)

    def test_md5_mode_matches_oracle_formula(self, spark):
        import hashlib
        docs = self._docs(spark, 50)
        got = {r.doc_id: r.split
               for r in assign_splits(docs, {"test": 0.1, "val": 0.1,
                                             "train": 0.8},
                                      hash_mode="md5").collect()}
        for i in range(50):
            h = hashlib.md5(f"split||{i}".encode()).hexdigest()
            bucket = int(h[:8], 16) % 100000
            want = ("test" if bucket < 10000
                    else "val" if bucket < 20000 else "train")
            assert got[i] == want, i

    def test_overcommitted_fractions_raise(self, spark):
        with pytest.raises(ValueError, match="sum"):
            assign_splits(self._docs(spark, 1), {"a": 0.7, "b": 0.4})


class TestPageRank:
    def _pr(self, spark, edges, **kw):
        from dig_etl_engine_spark.operators.graph import pagerank
        df = spark.createDataFrame(edges, "src long, dst long")
        return {r.v: r.rank for r in pagerank(df, **kw).collect()}

    def test_cycle_is_uniform_fixpoint(self, spark):
        """On a 3-cycle the uniform distribution is the exact fixpoint:
        every iteration reproduces 1/3."""
        got = self._pr(spark, [(0, 1), (1, 2), (2, 0)], iters=4)
        assert got == {0: round(1 / 3, 6), 1: round(1 / 3, 6),
                       2: round(1 / 3, 6)}

    def test_dangling_mass_is_dropped(self, spark):
        """a→b with b dangling: hand-rolled two iterations of the
        documented no-redistribution variant (rank sum decays < 1)."""
        got = self._pr(spark, [(0, 1)], iters=2)
        base = 0.15 / 2
        r1a = base
        r1b = base + 0.85 * 0.5
        assert got[0] == round(base, 6)
        assert got[1] == round(base + 0.85 * r1a, 6)
        assert got[0] + got[1] < 1.0
        assert r1b > got[1]  # b's rank decays as a's feed shrinks

    def test_parallel_edges_double_weight(self, spark):
        """Multigraph semantics: a duplicated edge contributes twice —
        u's rank splits over edge OCCURRENCES, not distinct targets."""
        # u → v, v (twice), w (once): v gets 2/3 of u's propagated mass
        got = self._pr(spark, [(0, 1), (0, 1), (0, 2)], iters=1)
        base = 0.15 / 3
        assert got[1] == round(base + 0.85 * (2 / 3) * (1 / 3), 6)
        assert got[2] == round(base + 0.85 * (1 / 3) * (1 / 3), 6)

    def test_sink_accumulates_more_than_source(self, spark):
        """In-degree hub outranks leaf sources after propagation."""
        got = self._pr(spark, [(1, 0), (2, 0), (3, 0), (0, 1)], iters=5)
        assert got[0] > got[1] > got[2] == got[3]


class TestRepeatedWindowHashing:
    def test_hashed_and_string_modes_agree(self, spark):
        """md5-narrowed shuffle must produce identical per-doc fractions
        to the string-equality variant (collisions aside)."""
        from dig_etl_engine_spark.operators.text_analysis import (
            repeated_window_flags)
        rows = [(0, "a b c d e f"), (1, "a b c d x y"),
                (2, "q r s t u v")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        h = {(r.doc_id): tuple(r)[1:] for r in repeated_window_flags(
            df, w=4, hash_windows=True).collect()}
        s = {(r.doc_id): tuple(r)[1:] for r in repeated_window_flags(
            df, w=4, hash_windows=False).collect()}
        assert h == s

    def test_shuffle_carries_hashes_not_windows(self, spark):
        """The count shuffle's key is the 32-char digest: no raw window
        string survives past the project before the first exchange.
        Inspected with pin=False — the production default pins the
        count table behind a LogicalRDD leaf (the md5 subtree still
        executes inside it), which plan text cannot see through."""
        from dig_etl_engine_spark.operators.text_analysis import (
            repeated_window_flags)
        df = spark.createDataFrame([(0, "a b c d e")],
                                   "doc_id long, text string")
        plan = repeated_window_flags(df, w=2, pin=False) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "md5" in plan
        # and the default path IS pinned: the count table appears as a
        # checkpointed leaf, not a re-derived explode subtree
        pinned = repeated_window_flags(df, w=2)._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert "LogicalRDD" in pinned or "ExistingRDD" in pinned


class TestContrastivePairs:
    def test_positives_negatives_and_ranking(self, spark):
        from dig_etl_engine_spark.operators.similarity import (
            contrastive_pairs)
        import math
        # One cluster (k=1): anchor 0, a near-dup (1), two in-band
        # neighbors at distinct cosines (2 hardest, 3 next, 4 third),
        # and an out-of-band vector (5).
        def vec(angle):
            return [math.cos(angle), math.sin(angle), 0.0, 0.0]
        rows = [(0, vec(0.0)), (1, vec(0.001)),       # cos≈1 → positive
                (2, vec(0.6)), (3, vec(0.8)),         # cos .825/.697
                (4, vec(0.9)), (5, vec(1.5))]         # cos .622/.071
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        got = contrastive_pairs(df, k=1, iters=1, pos_threshold=0.99,
                                neg_band=(0.5, 0.9), m_negatives=2)
        by_anchor = {}
        for r in got.collect():
            by_anchor.setdefault(r.anchor, []).append(r)
        pos0 = [r.other for r in by_anchor[0] if r.pair_type == "positive"]
        assert pos0 == [1]
        # anchor 0's negatives: hardest two in [0.5, 0.9) by cosine are
        # 2 (cos 0.6 ≈ .825) then 3 (cos 0.8 ≈ .697); 4 (.622) misses
        # the m=2 cut (scores are 1e-4-scaled BIGINTs, r9)
        negs0 = [r.other for r in sorted(
            (r for r in by_anchor[0] if r.pair_type == "hard_negative"),
            key=lambda r: -r.cosine_e4)]
        assert negs0 == [2, 3]
        # band respected everywhere; positives symmetric
        for rs in by_anchor.values():
            for r in rs:
                if r.pair_type == "hard_negative":
                    assert 5_000 <= r.cosine_e4 < 9_000
                else:
                    assert r.cosine_e4 >= 9_900
        assert [r.other for r in by_anchor[1]
                if r.pair_type == "positive"] == [0]


class TestQuantizedPrefilterBoundary:
    def test_kernel_prefilter_matches_jvm_filter_at_ulp_boundary(self, spark):
        """r9 round-close review regression: the kernel prefilter used
        ``sims >= threshold - 0.5·10^-d``, which is 1 ulp too strict at
        some thresholds — a raw cosine can quantize UP to the threshold
        (so the authoritative JVM filter and the DuckDB oracle keep the
        pair) yet sit below the subtracted-margin cut, so the kernel
        never emitted it. The prefilter now applies the SAME
        ``floor(x·10^d + 0.5) >= scaled_threshold`` predicate as the
        JVM tree. This test plants a pair whose post-normalization
        cosine lies in exactly that disagreement window (found by a
        deterministic nextafter walk) and asserts the operator emits
        it."""
        import math

        import numpy as np

        from dig_etl_engine_spark.operators.similarity import (
            embedding_near_dup_pairs)

        th, d = 0.9, 4
        cut = int(round(th * 10 ** d))
        old_cut = th - 0.5 * 10.0 ** (-d)

        # walk 1-ulp steps below old_cut for a c whose KERNEL-exact
        # post-normalization cosine still quantizes up to `cut` while
        # the old margin predicate would have dropped it
        c = np.nextafter(old_cut, 0.0)
        planted = None
        for _ in range(64):
            s = math.sqrt(max(0.0, 1.0 - c * c))
            v = np.array([[1.0, 0.0], [c, s]], dtype=np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            cos = (vn @ vn.T)[0, 1]          # the kernel's exact ops
            if cos < old_cut and np.floor(cos * 10 ** d + 0.5) >= cut:
                planted = (float(c), float(s))
                break
            c = np.nextafter(c, 0.0)
        assert planted is not None, "no boundary witness within 64 ulps"

        df = spark.createDataFrame(
            [(0, [1.0, 0.0], 7), (1, [planted[0], planted[1]], 7)],
            "vec_id long, embedding array<double>, label int")
        got = embedding_near_dup_pairs(df, threshold=th,
                                       round_digits=d).collect()
        assert [(r.doc_a, r.doc_b, r.cosine_e4) for r in got] == \
            [(0, 1, cut)]

    def test_pairs_below_threshold_stay_dropped(self, spark):
        """Complement: one quantization step below the threshold is
        dropped by kernel and JVM alike."""
        import math

        from dig_etl_engine_spark.operators.similarity import (
            embedding_near_dup_pairs)

        ang = math.acos(0.85)                 # quantizes to 8500 < 9000
        df = spark.createDataFrame(
            [(0, [1.0, 0.0], 7), (1, [math.cos(ang), math.sin(ang)], 7)],
            "vec_id long, embedding array<double>, label int")
        assert embedding_near_dup_pairs(
            df, threshold=0.9, round_digits=4).count() == 0
