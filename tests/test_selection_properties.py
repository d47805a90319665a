"""Layout-invariance and conservation properties for the data-selection
operators: results must not depend on partitioning (the property that
makes a local[32] verdict transfer to a 1000-executor cluster), and
propagation operators must conserve what they claim to conserve.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.graph import pagerank
from dig_etl_engine_spark.operators.similarity import semdedup
from dig_etl_engine_spark.operators.text_analysis import (
    assign_splits, bpe_pair_stats, dsir_importance_weights)


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


class TestLayoutInvariance:
    def test_semdedup_invariant_under_repartition(self, spark):
        import math
        rows = [(i, [math.cos(i * 0.37 + j * 0.11) for j in range(8)])
                for i in range(60)]
        rows += [(1000 + i, rows[i][1][:7] + [rows[i][1][7] + 1e-4])
                 for i in range(0, 60, 6)]          # planted near-dups
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        a = _collect_sorted(semdedup(df, k=4, iters=2, threshold=0.99))
        b = _collect_sorted(semdedup(df.repartition(7), k=4, iters=2,
                                     threshold=0.99))
        assert a == b
        assert any(not kept for (_, _, kept) in a)  # non-vacuous

    def test_dsir_invariant_under_repartition(self, spark):
        rows = [(i, f"tok{i % 5} tok{i % 7} common word stream")
                for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        tgt = df.filter(F.col("doc_id") % 3 == 0)
        a = _collect_sorted(dsir_importance_weights(df, tgt, buckets=64))
        b = _collect_sorted(dsir_importance_weights(
            df.repartition(9), tgt.repartition(4), buckets=64))
        assert a == b

    def test_bpe_stats_invariant_under_repartition(self, spark):
        rows = [(i, "alpha beta gamma delta " * (i % 3 + 1))
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert _collect_sorted(bpe_pair_stats(df, k=15)) == \
            _collect_sorted(bpe_pair_stats(df.repartition(6), k=15))

    def test_splits_invariant_under_repartition(self, spark):
        df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        fr = {"test": 0.15, "train": 0.85}
        assert _collect_sorted(assign_splits(df, fr)) == \
            _collect_sorted(assign_splits(df.repartition(11), fr))

    def test_pagerank_invariant_under_repartition(self, spark):
        edges = [(i, (i * 7 + 3) % 50) for i in range(50)] + \
                [(i, (i * 13 + 5) % 50) for i in range(50)]
        df = spark.createDataFrame(
            [e for e in edges if e[0] != e[1]], "src long, dst long")
        a = _collect_sorted(pagerank(df, iters=3))
        b = _collect_sorted(pagerank(df.repartition(5), iters=3))
        assert a == b


class TestPageRankConservation:
    def test_rank_mass_conserved_without_dangling(self, spark):
        """Every vertex has out-edges → total rank stays exactly 1 (to
        rounding): the propagation loses mass ONLY through dangling
        vertices, never through the join/agg plumbing."""
        edges = [(i, (i + 1) % 30) for i in range(30)] + \
                [(i, (i * 11 + 7) % 30) for i in range(30)]
        df = spark.createDataFrame(
            [e for e in edges if e[0] != e[1]], "src long, dst long")
        ranks = pagerank(df, iters=4).agg(F.sum("rank")).head()[0]
        assert abs(ranks - 1.0) < 1e-4

    def test_all_vertices_present_exactly_once(self, spark):
        df = spark.createDataFrame([(0, 1), (1, 2), (5, 0)],
                                   "src long, dst long")
        got = pagerank(df, iters=2)
        assert sorted(r.v for r in got.collect()) == [0, 1, 2, 5]
