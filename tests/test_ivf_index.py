"""Persisted IVF index (`operators/similarity.py:materialize_ivf_index` /
`knn_ivf_indexed`): build-once/query-many ANN with a partition-pruned cell
scan and an nprobe recall dial.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.operators.similarity import (
    knn_bruteforce, knn_ivf_indexed, materialize_ivf_index)

K_CELLS = 4


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    # plant cluster structure (same construction as the recall test):
    # shrink the random component, add a one-hot cluster center
    center = F.array(*[
        F.when(F.col("vec_id") % 4 == d, F.lit(1.0)).otherwise(F.lit(0.0))
        for d in range(4)])
    clustered = emb.select(
        "vec_id",
        F.zip_with(
            F.slice(F.transform("embedding",
                                lambda x: x.cast("double") * 0.2), 1, 64),
            F.concat(center, F.array_repeat(F.lit(0.0), 60)),
            lambda a, b: a + b).alias("embedding"))
    materialize_ivf_index(clustered, path, k=K_CELLS, iters=3)
    queries = clustered.filter(F.col("vec_id") % 20 == 0).cache()
    return path, clustered, queries


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


class TestIvfIndex:
    def test_probe_all_equals_bruteforce(self, spark, built):
        """nprobe = all cells searches the full corpus: results must be
        IDENTICAL to exact brute force (same ranking tie-breaks)."""
        path, clustered, queries = built
        # both paths emit the 1e-4-scaled BIGINT score (continuous-round
        # lint: bruteforce converted r9, indexed r8) — compare directly
        exact = {(r.query_id, r.neighbor_id, r.cosine_e4, r.rank)
                 for r in knn_bruteforce(queries, clustered, k=5).collect()}
        got = {(r.query_id, r.neighbor_id, r.cosine_e4, r.rank)
               for r in knn_ivf_indexed(queries, path, k=5,
                                        nprobe=K_CELLS).collect()}
        assert got == exact

    def test_nprobe1_recall_floor(self, spark, built):
        path, clustered, queries = built
        truth = _pairs(knn_bruteforce(queries, clustered, k=5))
        found = _pairs(knn_ivf_indexed(queries, path, k=5, nprobe=1))
        recall = len(truth & found) / len(truth)
        assert recall >= 0.85, f"nprobe=1 recall {recall:.2f} below floor"

    def test_nprobe_monotone_recall(self, spark, built):
        """More probes can only add candidates — recall must be monotone
        in nprobe (the dial's contract)."""
        path, clustered, queries = built
        truth = _pairs(knn_bruteforce(queries, clustered, k=5))
        r = [len(truth & _pairs(knn_ivf_indexed(queries, path, k=5,
                                                nprobe=p))) / len(truth)
             for p in (1, 2, K_CELLS)]
        assert r[0] <= r[1] <= r[2] == 1.0

    def test_incremental_embedding_dedup_matches_numpy_oracle(
            self, spark, built):
        """nprobe=1 pair set equals an independent NumPy oracle: cosine ≥
        threshold among same-primary-cell rows of corpus ∪ batch, minus
        corpus-only pairs, batch doc first."""
        import numpy as np

        from dig_etl_engine_spark.operators.similarity import (
            incremental_embedding_dedup)

        path, clustered, _ = built
        batch = clustered.filter(F.col("vec_id") % 20 == 7).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        got = {(r.doc_a, r.doc_b, r.origin): r.cosine_e4
               for r in incremental_embedding_dedup(
                   batch, path, threshold=0.9, append=False).collect()}

        cents = np.array(
            [r["centroid"] for r in spark.read.parquet(f"{path}/centroids")
             .orderBy("cluster").collect()], dtype=np.float64)
        def rowmap(df):
            return {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
                    for r in df.collect()}
        old, new = rowmap(clustered), rowmap(batch)
        every = {**old, **new}
        cell = {i: int(((cents - v) ** 2).sum(axis=1).argmin())
                for i, v in every.items()}
        expect = {}
        ids = sorted(every)
        for a in sorted(new):
            va = every[a] / np.linalg.norm(every[a])
            for b in ids:
                if b == a or cell[b] != cell[a]:
                    continue
                if b in new and not a < b:
                    continue
                raw = float(va @ (every[b] / np.linalg.norm(every[b])))
                c = int(np.floor(raw * 10_000 + 0.5))  # the shared tree
                if c >= 9_000:
                    expect[(a, b, "batch" if b in new else "corpus")] = c
        assert got == expect
        assert len(got) > 0     # exact copies must have matched
        # every batch doc is an exact copy of a corpus doc: its pair is
        # present at cosine 1.0 (scaled: 10_000)
        assert all(
            got.get((i + 100000, i, "corpus")) == 10_000
            for i in old if i % 20 == 7)

    def test_incremental_embedding_append_feeds_next_batch(
            self, spark, built, tmp_path):
        from dig_etl_engine_spark.operators.similarity import (
            incremental_embedding_dedup, materialize_ivf_index)

        path = str(tmp_path / "index2")
        _, clustered, _ = built
        materialize_ivf_index(clustered, path, k=K_CELLS, iters=3)
        b1 = clustered.filter(F.col("vec_id") % 20 == 7).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        r1 = incremental_embedding_dedup(b1, path, threshold=0.9,
                                         append=True)
        # pinned result: no batch doc matched through its own append
        assert not any(r.doc_b >= 100000 and r.origin == "corpus"
                       for r in r1.collect())
        # a second batch duplicating a first-batch doc finds it as corpus
        b2 = b1.limit(1).select((F.col("vec_id") + 100000).alias("vec_id"),
                                "embedding")
        hit = {(r.doc_a, r.doc_b): r.origin
               for r in incremental_embedding_dedup(
                   b2, path, threshold=0.9, append=False).collect()}
        first_id = b1.limit(1).collect()[0].vec_id
        assert hit.get((first_id + 100000, first_id)) == "corpus"

    def test_incremental_embedding_retry_idempotent(self, spark, built,
                                                    tmp_path):
        """batch_id append retry replaces its own (cluster, _ab)
        partitions: index row count unchanged after a re-run."""
        from dig_etl_engine_spark.operators.similarity import (
            incremental_embedding_dedup, materialize_ivf_index)

        path = str(tmp_path / "index3")
        _, clustered, _ = built
        materialize_ivf_index(clustered, path, k=K_CELLS, iters=3)
        b1 = clustered.filter(F.col("vec_id") % 20 == 7).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        incremental_embedding_dedup(b1, path, threshold=0.9, append=True,
                                    batch_id=3)
        n = spark.read.parquet(f"{path}/cells").count()
        incremental_embedding_dedup(b1, path, threshold=0.9, append=True,
                                    batch_id=3)
        assert spark.read.parquet(f"{path}/cells").count() == n

    def test_cells_scan_partition_pruned(self, spark, built):
        """The physical plan must prune unprobed cell partitions: probing
        1 cell reads 1 of K_CELLS partition directories."""
        path, _, queries = built
        one_q = queries.limit(1)
        plan = knn_ivf_indexed(one_q, path, k=5, nprobe=1) \
            ._jdf.queryExecution().executedPlan().toString()
        import re
        m = re.search(r"PartitionFilters: \[[^\]]*cluster[^\]]*\]", plan)
        assert m, f"no partition filter on cluster in plan:\n{plan[:2000]}"


class TestCompactIvfIndex:
    """`compact_ivf_index`: fold (cluster, _ab) append partitions into
    one epoch per cell with KNN and dedup results invariant — including
    under the simulated mid-delete crash state (duplicate cell rows),
    which the knn candidate-dedupe guard must absorb."""

    def _build_with_appends(self, spark, built, tmp_path):
        import shutil as _sh

        from dig_etl_engine_spark.operators.similarity import (
            incremental_embedding_dedup)

        src, clustered, _ = built
        idx = str(tmp_path / "ivf_c")
        _sh.copytree(src, idx)
        for bid in range(2):
            batch = clustered.filter(F.col("vec_id") % 20 == bid + 7) \
                .select((F.col("vec_id") + 100000 * (bid + 1))
                        .alias("vec_id"), "embedding")
            incremental_embedding_dedup(batch, idx, threshold=0.98,
                                        append=True, batch_id=bid)
        return idx

    def test_layout_folded_and_results_invariant(self, spark, built,
                                                 tmp_path):
        import glob as _glob
        import os

        from dig_etl_engine_spark.operators.similarity import (
            compact_ivf_index)

        _, clustered, queries = built
        idx = self._build_with_appends(spark, built, tmp_path)
        knn_before = {(r.query_id, r.neighbor_id, r.cosine_e4, r.rank)
                      for r in knn_ivf_indexed(queries, idx, k=5,
                                               nprobe=2).collect()}
        assert knn_before

        stats = compact_ivf_index(spark, idx)
        assert stats["partitions_before"] == 3        # base + 2 batches
        assert stats["epoch"] == -2
        abs_left = {os.path.basename(d) for d in _glob.glob(
            os.path.join(idx, "cells", "cluster=*", "_ab=*"))}
        assert abs_left == {"_ab=-2"}
        knn_after = {(r.query_id, r.neighbor_id, r.cosine_e4, r.rank)
                     for r in knn_ivf_indexed(queries, idx, k=5,
                                              nprobe=2).collect()}
        assert knn_after == knn_before
        # idempotent no-op on the folded layout
        stats2 = compact_ivf_index(spark, idx)
        assert stats2["partitions_before"] == 1 and stats2["epoch"] is None

    def test_crash_duplicates_absorbed_then_healed(self, spark, built,
                                                   tmp_path):
        """Mid-delete crash state = epoch partition + original partitions
        coexisting. KNN must return the same top-k (duplicate neighbors
        collapse to one slot), and the next run must heal the layout."""
        import glob as _glob
        import os
        import shutil as _sh

        from dig_etl_engine_spark.operators.similarity import (
            compact_ivf_index)

        _, clustered, queries = built
        idx = self._build_with_appends(spark, built, tmp_path)
        knn_before = {(r.query_id, r.neighbor_id, r.cosine_e4, r.rank)
                      for r in knn_ivf_indexed(queries, idx, k=5,
                                               nprobe=2).collect()}
        saved = str(tmp_path / "saved_cells")
        _sh.copytree(os.path.join(idx, "cells"), saved)
        compact_ivf_index(spark, idx)
        for d in _glob.glob(os.path.join(saved, "cluster=*", "_ab=*")):
            rel = os.path.relpath(d, saved)
            dst = os.path.join(idx, "cells", rel)
            if not os.path.exists(dst):
                _sh.copytree(d, dst)

        knn_dup = {(r.query_id, r.neighbor_id, r.cosine_e4, r.rank)
                   for r in knn_ivf_indexed(queries, idx, k=5,
                                            nprobe=2).collect()}
        assert knn_dup == knn_before                  # guard absorbs dups

        stats = compact_ivf_index(spark, idx)         # healing run
        assert stats["epoch"] == -3
        abs_left = {os.path.basename(d) for d in _glob.glob(
            os.path.join(idx, "cells", "cluster=*", "_ab=*"))}
        assert abs_left == {"_ab=-3"}
        knn_healed = {(r.query_id, r.neighbor_id, r.cosine_e4, r.rank)
                      for r in knn_ivf_indexed(queries, idx, k=5,
                                               nprobe=2).collect()}
        assert knn_healed == knn_before
