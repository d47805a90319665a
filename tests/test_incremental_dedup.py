"""Incremental minhash dedup: the steady-state daily-batch operation.

The contract under test (`operators/dedup.py:incremental_minhash_dedup`):
dedup a new batch against a previously indexed corpus plus itself, touching
the corpus only through its persisted band/shingle tables, and produce
EXACTLY the pairs a full re-run over corpus ∪ batch would add beyond the
corpus-only pairs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.dedup import (
    connected_components, dedup_corpus, incremental_minhash_dedup,
    materialize_minhash_index, minhash_lsh_pairs)


def _doc(i: int, text: str) -> tuple:
    return (f"d{i:03d}", text)


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    base = ("the quick brown fox jumps over the lazy dog while the "
            "rain in spain falls mainly on the plain every day")
    uniq = ("completely different content about {} with nothing shared "
            "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    corpus = [
        _doc(0, base),
        _doc(1, base + " extra tail token"),           # near-dup of d000
        _doc(2, uniq.format("volcanoes")),
        _doc(3, uniq.format("submarines")),
    ]
    batch = [
        _doc(10, base + " another small suffix"),      # near-dup of corpus
        _doc(11, uniq.format("harpsichords")),         # unique
        _doc(12, uniq.format("harpsichords") + " x"),  # near-dup within batch
        _doc(13, base),                                # exact dup of d000
    ]
    schema = "doc_id string, text string"
    return (spark.createDataFrame(corpus, schema),
            spark.createDataFrame(batch, schema))


def _pairs(df):
    return {(r.doc_a, r.doc_b): r.jaccard for r in df.collect()}


class TestIncrementalMinhash:
    def test_matches_full_rerun_delta(self, spark, corpus_and_batch,
                                      tmp_path):
        corpus, batch = corpus_and_batch
        idx = str(tmp_path / "mh_index")
        materialize_minhash_index(corpus, "text", idx)

        inc = incremental_minhash_dedup(batch, idx, content_col="text",
                                        threshold=0.5, append=False)
        got = {(r.doc_a, r.doc_b, r.origin): r.jaccard for r in inc.collect()}

        # oracle: full re-run over corpus ∪ batch, minus corpus-only pairs,
        # re-oriented so the batch doc is doc_a
        full = _pairs(minhash_lsh_pairs(corpus.unionByName(batch), "text",
                                        threshold=0.5))
        old = _pairs(minhash_lsh_pairs(corpus, "text", threshold=0.5))
        batch_ids = {r.doc_id for r in batch.collect()}
        expect = {}
        for (a, b), j in full.items():
            if (a, b) in old:
                continue
            if a in batch_ids and b in batch_ids:
                expect[(a, b, "batch")] = j
            elif a in batch_ids or b in batch_ids:
                new, other = (a, b) if a in batch_ids else (b, a)
                expect[(new, other, "corpus")] = j
        assert got == expect
        # sanity: the planted relationships actually surfaced
        assert ("d013", "d000", "corpus") in got       # exact dup found
        assert got[("d013", "d000", "corpus")] == 1.0
        assert ("d011", "d012", "batch") in got        # within-batch pair
        assert not any(a == b for a, b, _ in got)

    def test_append_feeds_next_batch(self, spark, corpus_and_batch,
                                     tmp_path):
        corpus, batch = corpus_and_batch
        idx = str(tmp_path / "mh_index")
        materialize_minhash_index(corpus, "text", idx)

        first = incremental_minhash_dedup(batch, idx, content_col="text",
                                          threshold=0.5, append=True)
        n_first = first.count()
        assert n_first > 0

        # a second batch duplicating a FIRST-batch doc must match it via
        # the index (origin=corpus), proving the append took effect
        batch2 = spark.createDataFrame(
            [("d020", "completely different content about harpsichords "
              "with nothing shared alpha beta gamma delta epsilon zeta "
              "eta theta iota kappa")],
            "doc_id string, text string")
        second = incremental_minhash_dedup(batch2, idx, content_col="text",
                                           threshold=0.5, append=False)
        hits = {(r.doc_a, r.doc_b): r.origin for r in second.collect()}
        assert hits.get(("d020", "d011")) == "corpus"
        assert hits.get(("d020", "d012")) == "corpus"

    def test_hot_bucket_guard_linear_pairs(self, spark):
        """A boilerplate storm (many identical docs) must not go quadratic
        when max_bucket caps it: the oversized bucket emits star pairs to
        its min-id representative (linear), the component survives for
        downstream clustering, and unrelated small buckets keep exact
        all-pairs output."""
        storm_text = ("identical boilerplate page header footer nav about "
                      "contact terms privacy copyright all rights reserved")
        base = ("the quick brown fox jumps over the lazy dog while rain "
                "in spain falls mainly on the plain")
        rows = [(f"s{i:02d}", storm_text) for i in range(12)]
        rows += [("n00", base), ("n01", base + " tail")]
        docs = spark.createDataFrame(rows, "doc_id string, text string")

        capped = minhash_lsh_pairs(docs, "text", threshold=0.5,
                                   max_bucket=5)
        got = {(r.doc_a, r.doc_b) for r in capped.collect()}
        storm_pairs = {(a, b) for a, b in got if a.startswith("s")}
        # star: 11 pairs to the rep, not C(12,2)=66
        assert storm_pairs == {("s00", f"s{i:02d}") for i in range(1, 12)}
        assert ("n00", "n01") in got          # small bucket untouched

        # the capped pair set still yields ONE storm component
        edges = capped.select(
            F.conv(F.substring(F.md5("doc_a"), 1, 15), 16, 10)
             .cast("long").alias("a_h"),
            F.conv(F.substring(F.md5("doc_b"), 1, 15), 16, 10)
             .cast("long").alias("b_h"))
        comp = connected_components(edges, src="a_h", dst="b_h")
        n_components = comp.select("component").distinct().count()
        assert n_components == 2              # storm + the n-pair

        # cap above every bucket size == exact default semantics
        exact = {(r.doc_a, r.doc_b, r.jaccard)
                 for r in minhash_lsh_pairs(docs, "text",
                                            threshold=0.5).collect()}
        wide = {(r.doc_a, r.doc_b, r.jaccard)
                for r in minhash_lsh_pairs(docs, "text", threshold=0.5,
                                           max_bucket=1000).collect()}
        assert wide == exact

    def test_dedup_corpus_composed_flow(self, spark):
        """dedup_corpus end-to-end golden: exact collapse, near-dup
        linking (transitive through a chain), and per-doc survivor labels
        derivable by hand."""
        base = ("the quick brown fox jumps over the lazy dog while rain "
                "in spain falls mainly on the plain every single day")
        uniq = ("unrelated corpus text about {} alpha beta gamma delta "
                "epsilon zeta eta theta iota kappa lambda mu nu xi")
        rows = [
            (1, base),
            (2, base),                          # exact dup of 1
            (3, base + " trailing tail"),       # near-dup of 1
            (4, "entirely different document mentioning submarine "
                "volcanoes oceanography bathymetry hydrothermal vents "
                "plate tectonics magma chambers"),   # unique → kept
            (6, uniq.format("harpsichords")),
            (7, uniq.format("harpsichords") + " x"),       # chain 6-7
            (8, uniq.format("harpsichords") + " x y z"),   # chain 7-8
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.survivor, r.reason)
               for r in dedup_corpus(docs, "text",
                                     threshold=0.5).collect()}
        assert got == {
            1: (1, "kept"),
            2: (1, "exact_dup"),
            3: (1, "near_dup"),
            4: (4, "kept"),
            6: (6, "kept"),
            7: (6, "near_dup"),
            8: (6, "near_dup"),     # transitive through 7
        }
        # filtering contract: kept docs are exactly the survivors
        kept = {d for d, (s, r) in got.items() if r == "kept"}
        assert kept == {s for s, _ in got.values()}

    def test_lsh_s_curve_matches_theory(self, spark):
        """Empirical validation of the banding model the docstrings claim:
        P(detect | jaccard s) = 1 − (1 − s^r)^b with r=4 rows, b=4 bands.
        Construct 60 isolated pairs per similarity level (pair-unique
        tokens, so only intra-pair collisions are possible), measure the
        detected fraction per level, and compare to the model at each
        pair's ACTUAL jaccard. md5 makes the outcome deterministic; the
        tolerance (±0.2 ≈ 3σ at n=60) guards model mismatch, not seed
        luck."""
        rows = []
        n_pairs, T = 60, 40
        for d in (1, 2, 3, 5):              # tokens replaced → sim level
            for p in range(n_pairs):
                pid = f"{d}_{p}"
                base = [f"w{pid}_{j}" for j in range(T)]
                mod = list(base)
                for r_ in range(d):         # spread replacements out
                    mod[(r_ * 7 + 3) % T] = f"r{pid}_{r_}"
                rows.append((2 * (d * 1000 + p), " ".join(base)))
                rows.append((2 * (d * 1000 + p) + 1, " ".join(mod)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        from dig_etl_engine_spark.operators.dedup import jaccard, shingles
        actual = (docs.alias("a").join(
            docs.alias("b"),
            F.col("a.doc_id") + 1 == F.col("b.doc_id"))
            .filter(F.col("a.doc_id") % 2 == 0)
            .select(
                F.col("a.doc_id").alias("doc_a"),
                jaccard(shingles(F.col("a.text")),
                        shingles(F.col("b.text"))).alias("j")))
        detected = {r.doc_a for r in minhash_lsh_pairs(
            docs, "text", threshold=0.0).collect()}

        import collections
        stat = collections.defaultdict(lambda: [0.0, 0, 0])
        for r in actual.collect():
            d_level = r.doc_a // 2000
            s = stat[d_level]
            s[0] += 1 - (1 - r.j ** 4) ** 4      # model prediction
            s[1] += 1
            s[2] += r.doc_a in detected
        for d_level, (pred_sum, n, hits) in stat.items():
            predicted, empirical = pred_sum / n, hits / n
            assert abs(empirical - predicted) < 0.2, (
                f"level d={d_level}: empirical {empirical:.2f} vs "
                f"model {predicted:.2f}")

    def test_merge_duplicates_field_survivorship(self, spark):
        """Survivor fields dominate; first_non_null columns backfill from
        the highest-order duplicate; standalone docs pass through."""
        from dig_etl_engine_spark.operators.dedup import merge_duplicates

        docs = spark.createDataFrame(
            [(1, "T1", None, 10), (2, "T2", "A2", 20), (3, None, "A3", 15),
             (4, "T4", None, 5)],
            "doc_id long, title string, author string, v long")
        assign = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, survivor long")
        got = {r.doc_id: (r.title, r.author, r.v)
               for r in merge_duplicates(
                   docs, assign, order_col="v",
                   first_non_null=("author",)).collect()}
        assert got == {
            # title: survivor's own (T1) even though doc 2 has higher v;
            # author: survivor null -> doc 2's A2 (v=20 beats v=15);
            # v: survivor's own 10
            1: ("T1", "A2", 10),
            4: ("T4", None, 5),
        }

    def test_dedup_then_merge_composition(self, spark):
        """The advertised flow end to end: dedup_corpus labels feed
        merge_duplicates directly, collapsing the corpus to enriched
        survivor records."""
        from dig_etl_engine_spark.operators.dedup import merge_duplicates

        base = ("the quick brown fox jumps over the lazy dog while rain "
                "in spain falls mainly on the plain every single day")
        docs = spark.createDataFrame(
            [(1, base, None, 10),
             (2, base, "Reuters", 20),            # exact dup, has source
             (3, base + " trailing tail", "AP", 15),   # near dup
             (4, "entirely different text about submarine volcanoes "
                 "bathymetry and hydrothermal vents", "AFP", 5)],
            "doc_id long, text string, src string, v long")
        assign = dedup_corpus(docs, "text", threshold=0.5) \
            .select("doc_id", "survivor")
        merged = {r.doc_id: (r.src, r.v)
                  for r in merge_duplicates(
                      docs, assign, order_col="v",
                      first_non_null=("src",)).collect()}
        # survivor 1 keeps its own v, backfills src from the highest-v
        # duplicate that has one (doc 2's Reuters beats doc 3's AP)
        assert merged == {1: ("Reuters", 10), 4: ("AFP", 5)}

    def test_batch_id_append_retry_idempotent(self, spark,
                                              corpus_and_batch, tmp_path):
        """A foreachBatch retry re-runs the same micro-batch: with
        batch_id the append replaces its own _ab partition, so index row
        counts and results are identical after the 'retry'."""
        corpus, batch = corpus_and_batch
        idx = str(tmp_path / "mh_index")
        materialize_minhash_index(corpus, "text", idx)

        r1 = {(r.doc_a, r.doc_b): r.jaccard
              for r in incremental_minhash_dedup(
                  batch, idx, content_col="text", threshold=0.5,
                  append=True, batch_id=5).collect()}
        n_bands = spark.read.parquet(f"{idx}/bands").count()
        n_sh = spark.read.parquet(f"{idx}/shingles").count()

        r2 = {(r.doc_a, r.doc_b): r.jaccard
              for r in incremental_minhash_dedup(
                  batch, idx, content_col="text", threshold=0.5,
                  append=True, batch_id=5).collect()}
        assert spark.read.parquet(f"{idx}/bands").count() == n_bands
        assert spark.read.parquet(f"{idx}/shingles").count() == n_sh
        # retry correctness, not just append idempotence: the retry
        # excludes its own _ab partition from the corpus side, so the
        # result is IDENTICAL to the first attempt
        assert r2 == r1

    def test_incremental_equivalence_property(self, spark, tmp_path):
        """Property sweep over generated corpora: for ANY corpus/batch
        split of documents built from a small token pool (so near-dup
        relationships arise by chance), incremental == full-rerun delta.
        Deterministic seeds; several corpus shapes in one Spark session."""
        import random

        pool = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi rho sigma tau").split()
        for seed in (1, 7, 42):
            rng = random.Random(seed)
            docs = []
            for i in range(24):
                if i and rng.random() < 0.4:
                    # mutate an earlier doc: near-dup by chance
                    words = docs[rng.randrange(len(docs))][1].split()
                    j = rng.randrange(len(words))
                    words[j] = rng.choice(pool)
                    docs.append((i, " ".join(words)))
                else:
                    docs.append((i, " ".join(
                        rng.choice(pool) for _ in range(12))))
            rows = [(f"d{i:03d}", t) for i, t in docs]
            cut = rng.randrange(8, 16)
            corpus = spark.createDataFrame(rows[:cut],
                                           "doc_id string, text string")
            batch = spark.createDataFrame(rows[cut:],
                                          "doc_id string, text string")
            idx = str(tmp_path / f"idx_{seed}")
            materialize_minhash_index(corpus, "text", idx)
            inc = {(r.doc_a, r.doc_b): r.jaccard
                   for r in incremental_minhash_dedup(
                       batch, idx, content_col="text", threshold=0.4,
                       append=False).collect()}

            full = _pairs(minhash_lsh_pairs(
                corpus.unionByName(batch), "text", threshold=0.4))
            old = _pairs(minhash_lsh_pairs(corpus, "text", threshold=0.4))
            batch_ids = {r[0] for r in rows[cut:]}
            expect = {}
            for (a, b), j in full.items():
                if (a, b) in old:
                    continue
                if a in batch_ids and b in batch_ids:
                    expect[(a, b)] = j
                elif a in batch_ids or b in batch_ids:
                    new, other = (a, b) if a in batch_ids else (b, a)
                    expect[(new, other)] = j
            assert inc == expect, f"seed {seed} diverged"

    def test_append_does_not_pollute_own_result(self, spark,
                                                corpus_and_batch, tmp_path):
        # the returned pairs must be pinned before the append: no batch doc
        # may appear as its own corpus match
        corpus, batch = corpus_and_batch
        idx = str(tmp_path / "mh_index")
        materialize_minhash_index(corpus, "text", idx)
        res = incremental_minhash_dedup(batch, idx, content_col="text",
                                        threshold=0.5, append=True)
        rows = res.collect()
        assert not any(r.doc_a == r.doc_b for r in rows)
        batch_ids = {r.doc_id for r in batch.collect()}
        for r in rows:
            if r.origin == "corpus":
                assert r.doc_b not in batch_ids


class TestCompactMinhashIndex:
    """`compact_minhash_index`: fold per-batch _ab partitions into one
    fresh epoch without changing any dedup result — and heal (not
    corrupt) when a previous run crashed mid-protocol."""

    def _build(self, spark, corpus_and_batch, tmp_path, name):
        corpus, batch = corpus_and_batch
        idx = str(tmp_path / name)
        materialize_minhash_index(corpus, "text", idx)
        # three appended micro-batches → _ab = {-1, 0, 1, 2}
        for bid in range(3):
            b = batch.withColumn(
                "doc_id", F.concat(F.lit(f"b{bid}_"), F.col("doc_id")))
            incremental_minhash_dedup(b, idx, content_col="text",
                                      threshold=0.5, append=True,
                                      batch_id=bid)
        return idx

    @staticmethod
    def _probe(spark, idx):
        probe = spark.createDataFrame(
            [("p1", "the quick brown fox jumps over the lazy dog while "
              "the rain in spain falls mainly on the plain every day")],
            "doc_id string, text string")
        inc = incremental_minhash_dedup(probe, idx, content_col="text",
                                        threshold=0.5, append=False)
        return {(r.doc_a, r.doc_b): (r.jaccard, r.origin)
                for r in inc.collect()}

    def test_results_invariant_and_layout_folded(self, spark,
                                                 corpus_and_batch,
                                                 tmp_path):
        import os

        from dig_etl_engine_spark.operators.dedup import \
            compact_minhash_index

        idx = self._build(spark, corpus_and_batch, tmp_path, "c1")
        before = self._probe(spark, idx)
        assert before  # the probe is a planted near-dup — non-vacuous

        stats = compact_minhash_index(spark, idx)
        assert stats["partitions_before"] == 4          # base + 3 batches
        assert stats["epoch"] == -2
        for sub in ("bands", "shingles"):
            parts = [d for d in os.listdir(os.path.join(idx, sub))
                     if d.startswith("_ab=")]
            assert parts == ["_ab=-2"]
        assert self._probe(spark, idx) == before

        # idempotent: a second run is a no-op (single partition left)
        stats2 = compact_minhash_index(spark, idx)
        assert stats2["partitions_before"] == 1 and stats2["epoch"] is None
        assert self._probe(spark, idx) == before

    def test_crashed_delete_leaves_duplicates_then_heals(
            self, spark, corpus_and_batch, tmp_path):
        """Simulate a crash between the epoch write and the old-partition
        deletes: duplicate rows must not change dedup pairs, and the
        next compaction run must heal the layout (natural-key dedupe)."""
        import os
        import shutil

        from dig_etl_engine_spark.operators.dedup import \
            compact_minhash_index

        idx = self._build(spark, corpus_and_batch, tmp_path, "c2")
        before = self._probe(spark, idx)

        # crash-sim: copy every pre-compaction partition aside, compact,
        # then restore the copies — the index now holds epoch -2 PLUS all
        # original partitions, exactly the mid-delete crash state
        saved = str(tmp_path / "saved")
        for sub in ("bands", "shingles"):
            shutil.copytree(os.path.join(idx, sub),
                            os.path.join(saved, sub))
        compact_minhash_index(spark, idx)
        for sub in ("bands", "shingles"):
            for d in os.listdir(os.path.join(saved, sub)):
                if d.startswith("_ab=") :
                    dst = os.path.join(idx, sub, d)
                    if not os.path.exists(dst):
                        shutil.copytree(os.path.join(saved, sub, d), dst)

        assert self._probe(spark, idx) == before       # duplicates harmless

        stats = compact_minhash_index(spark, idx)      # the healing run
        assert stats["epoch"] == -3
        for sub in ("bands", "shingles"):
            parts = [d for d in os.listdir(os.path.join(idx, sub))
                     if d.startswith("_ab=")]
            assert parts == ["_ab=-3"]
        assert self._probe(spark, idx) == before
