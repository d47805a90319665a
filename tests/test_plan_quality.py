"""Plan-quality tests: assert the PHYSICAL properties the engine's scale
story depends on — scan pushdown, index partition pruning, broadcast
dimension joins, and whole-stage codegen (no Python) in pure-column
operators. A regression here doesn't change results, it changes the
100 TB cost curve, so it's pinned like a correctness bug."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


class TestScanPushdown:
    def test_filter_reaches_parquet(self, spark):
        from dig_etl_engine_spark.catalog import load_tables
        docs = load_tables(spark, SF)["documents"]
        df = docs.filter(F.col("doc_id") < 10).select("doc_id", "source")
        plan = formatted(df)
        assert "PushedFilters" in plan and "LessThan(doc_id,10)" in plan

    def test_column_pruning(self, spark):
        from dig_etl_engine_spark.catalog import load_tables
        docs = load_tables(spark, SF)["documents"]
        plan = formatted(docs.select("doc_id"))
        # only the projected column reaches the reader
        read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "doc_id" in read and "text" not in read


class TestIndexPartitionPruning:
    def test_field_fanout_prunes_partitions(self, spark, tmp_path):
        from dig_etl_engine_spark.functions.kg import (
            load_index, materialize_index)

        index = spark.createDataFrame(
            [(f"d{i}", f, "m", "s", "v", "k")
             for i in range(50) for f in ("city", "country", "phone")],
            "doc_id string, field string, method string, segment string,"
            " value string, key string")
        path = str(tmp_path / "idx")
        materialize_index(index, path)

        q = load_index(spark, path).filter(F.col("field").isin("city"))
        plan = formatted(q)
        pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf and "= city)" in pf[0], pf

    def test_full_query_path_prunes(self, spark, tmp_path):
        """The search compiler's field pre-filter must prune a
        materialized index (the Q6 fan-out contract)."""
        from dig_etl_engine_spark.functions.kg import (
            load_index, materialize_index)
        index = spark.createDataFrame(
            [("d1", "keyword", "glossary", "text", "spark", "spark"),
             ("d1", "other", "m", "s", "x", "x")],
            "doc_id string, field string, method string, segment string,"
            " value string, key string")
        path = str(tmp_path / "idx2")
        materialize_index(index, path)
        pruned = load_index(spark, path).filter(
            F.col("field").isin(["keyword"]))
        plan = formatted(pruned)
        assert "PartitionFilters" in plan and "keyword" in plan

    def test_materialized_search_query_prunes(self, spark):
        """End-to-end: the registered coarse_search_rank_materialized
        query's physical plan reads the index through a field partition
        filter (only the fan-out fields' directories are opened)."""
        from dig_etl_engine_spark.queries_search import (
            coarse_search_rank_materialized)
        df = coarse_search_rank_materialized(spark, SF)
        plan = formatted(df)
        pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf and any("keyword" in l for l in pf), pf

    def test_bm25_query_path_has_no_corpus_agg(self, spark):
        """Corpus stats (N, df, avgdl) are persisted at build time and
        folded into the scoring expression as literals — the query's
        physical plan must be scan → project → filter → top-k with NO
        aggregation over the documents table (a full-corpus agg before
        every search is the 100 TB scale-killer this pins against)."""
        from dig_etl_engine_spark.queries_search import search_bm25_rank
        search_bm25_rank(spark, SF)          # first call may build stats
        df = search_bm25_rank(spark, SF)     # steady state: read-only
        plan = plan_of(df)
        assert "Aggregate" not in plan, plan
        assert "TakeOrderedAndProject" in plan


class TestJoinStrategy:
    def test_dimension_join_broadcasts(self, spark):
        from dig_etl_engine_spark import queries as registry
        df = registry.queries()["join_region_revenue"](spark, SF)
        plan = plan_of(df)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_minhash_band_join_carries_no_arrays(self, spark):
        """The LSH band self-join must shuffle only (id, band) — shingle
        arrays join back later, for candidates only."""
        from dig_etl_engine_spark.operators.dedup import minhash_lsh_pairs
        docs = spark.createDataFrame(
            [(i, "some text tokens here repeated " * 3) for i in range(10)],
            "doc_id long, text string")
        plan = formatted(minhash_lsh_pairs(docs, "text"))
        assert "hashpartitioning(band" in plan, \
            "band join should shuffle on the band key"
        # no operator may carry the shingle array together with a band
        # hash — payloads join back only after candidate dedup
        assert not [l for l in plan.splitlines()
                    if "band#" in l and "sh#" in l]

    def test_incremental_band_join_carries_no_arrays(self, spark, tmp_path):
        """Same no-array-payload rule for the incremental path: both the
        batch-internal self-join and the batch-vs-index join move only
        (id, band); shingles join back for verified candidates only."""
        from dig_etl_engine_spark.operators.dedup import (
            incremental_minhash_dedup, materialize_minhash_index)
        docs = spark.createDataFrame(
            [(i, "some text tokens here repeated " * 3) for i in range(10)],
            "doc_id long, text string")
        idx = str(tmp_path / "mh")
        materialize_minhash_index(docs, "text", idx)
        batch = docs.select((F.col("doc_id") + 100).alias("doc_id"), "text")
        plan = formatted(incremental_minhash_dedup(
            batch, idx, content_col="text", append=False))
        assert "hashpartitioning(band" in plan
        assert not [l for l in plan.splitlines()
                    if "band#" in l and "sh#" in l]


class TestCodegenPurity:
    def test_text_quality_is_jvm_only(self, spark):
        from dig_etl_engine_spark import queries as registry
        df = registry.queries()["text_quality_score"](spark, SF)
        plan = plan_of(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
        codegen = df._jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("codegen"))
        assert "WholeStageCodegen subtrees" in codegen.splitlines()[0]

    def test_ingest_operators_are_jvm_only(self, spark):
        from dig_etl_engine_spark import queries as registry
        qs = registry.queries()
        for name in ("template_concat", "decode_dict", "date_normalization",
                     "token_rule_extract", "kg_index_long"):
            plan = plan_of(qs[name](spark, SF))
            assert "EvalPython" not in plan, name

    def test_corpus_operators_are_jvm_only(self, spark):
        """The round-4 curation surface is pure column algebra + joins —
        no Python anywhere in the hot path (the LM 'training' is
        distributed counting, the window dedup is groupBy math)."""
        from dig_etl_engine_spark import queries as registry
        qs = registry.queries()
        for name in ("ngram_lm_perplexity", "repeated_window_dedup",
                     "top_ngrams", "tfidf_keywords", "gopher_gates",
                     "global_line_dedup", "paragraph_dedup",
                     "decontaminate_eval_overlap", "fuzzy_decontaminate"):
            plan = plan_of(qs[name](spark, SF))
            for marker in ("BatchEvalPython", "ArrowEvalPython",
                           "MapInPandas", "FlatMapGroupsInPandas"):
                assert marker not in plan, (name, marker)

    def test_lm_scoring_has_partial_aggregation(self, spark):
        """The trigram/context counts must map-side combine (partial_
        aggregates before the exchange) — the property that keeps a
        boilerplate-heavy corpus from shuffling one row per trigram."""
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["ngram_lm_perplexity"](
            spark, SF))
        assert "partial_count" in plan or "partial_sum" in plan, plan[:800]

    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """Both sides bucketed on the join key with equal bucket counts →
        the SMJ consumes the bucket layout directly: zero Exchange in the
        physical plan (the whole point of bucketing at 100 TB)."""
        from dig_etl_engine_spark.catalog import materialize_bucketed

        left = spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
        right = spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
        lb = materialize_bucketed(spark, left, "t_bkt_l", "k", buckets=4,
                                  path=str(tmp_path / "l"))
        rb = materialize_bucketed(spark, right, "t_bkt_r", "k", buckets=4,
                                  path=str(tmp_path / "r"))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = lb.join(rb, "k")
            plan = plan_of(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert joined.count() == 5000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS t_bkt_l")
            spark.sql("DROP TABLE IF EXISTS t_bkt_r")

    def test_salted_join_spreads_hot_key(self, spark):
        """With broadcast disabled (two-large-tables regime, the case
        salting exists for) the join must be a sort-merge join whose keys
        include the salt — the hot key occupies `buckets` shuffle
        partitions, not one — and the result must be row-identical to the
        plain join."""
        from dig_etl_engine_spark.operators.skew import salted_join

        facts = spark.range(0, 2000).select(
            F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold"))
            .alias("k"), F.col("id"))
        dim = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "k string, w double")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = salted_join(facts, dim, on="k", salt_from="id", buckets=4)
            plan = plan_of(out)
            assert "SortMergeJoin" in plan and "_salt" in plan
            got = sorted((r.k, r.id, r.w) for r in out.collect())
            want = sorted((r.k, r.id, r.w)
                          for r in facts.join(dim, "k").collect())
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_extractor_family_is_jvm_only(self, spark):
        """The X7/X9 regex family including the nested-regex HTML table
        parse must never fall out of codegen into Python — at 100 TB these
        run over every document."""
        from dig_etl_engine_spark import queries as registry
        qs = registry.queries()
        for name in ("extract_regex_family", "extract_crypto_ids",
                     "extract_html_tables"):
            plan = plan_of(qs[name](spark, SF))
            for marker in ("BatchEvalPython", "ArrowEvalPython",
                           "MapInPandas"):
                assert marker not in plan, name


class TestShuffleReuse:
    def test_sessionize_single_exchange(self, spark):
        """Sessionization's two window passes + per-session aggregation
        reuse ONE hash exchange on user_id (ClusteredDistribution on
        (user_id, session_id) is satisfied by partitioning on the subset
        user_id) — the property that makes it one-shuffle at 100 TB."""
        import re
        from dig_etl_engine_spark.queries_relational import sessionize_events
        plan = plan_of(sessionize_events(spark, SF))
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1

    def test_range_join_avoids_nested_loop(self, spark):
        """The bucketed range join must plan as an equi-join on the
        bucket key — never the O(|P|·|R|) BroadcastNestedLoop a raw
        inequality join degenerates to."""
        from dig_etl_engine_spark.queries_relational import join_range_bands
        plan = plan_of(join_range_bands(spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "_bkt" in plan


class TestSelectionOpPlans:
    def test_selection_ops_are_jvm_only(self, spark):
        """DSIR scoring, BPE pair stats, split assignment and the
        source-overlap matrix are pure column algebra + joins — no
        Python operator anywhere (SemDeDup is the deliberate exception:
        its pairwise block is an Arrow BLAS kernel)."""
        from dig_etl_engine_spark import queries as registry
        qs = registry.queries()
        for name in ("dsir_weights", "bpe_pair_stats", "train_test_split",
                     "source_overlap_matrix", "perplexity_buckets"):
            plan = plan_of(qs[name](spark, SF))
            for marker in ("BatchEvalPython", "ArrowEvalPython",
                           "MapInPandas", "FlatMapGroupsInPandas"):
                assert marker not in plan, (name, marker)

    def test_dsir_bucket_lms_broadcast(self, spark):
        """Both bucket LMs reduce to ≤`buckets` rows and must come back
        as broadcasts — the corpus-side gram stream never joins through
        an exchange keyed on the bucket id."""
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["dsir_weights"](spark, SF))
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan

    def test_bpe_topk_never_global_sorts(self, spark):
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["bpe_pair_stats"](spark, SF))
        assert "TakeOrderedAndProject" in plan

    def test_split_assignment_is_narrow(self, spark):
        """assign_splits is a per-row hash gate: zero exchanges."""
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["train_test_split"](spark, SF))
        assert "Exchange" not in plan


class TestRound4bPlans:
    def test_bpe_vocab_join_broadcasts(self, spark):
        """bpe_subword_stats encodes docs by joining the vocabulary-sized
        trained table — that join must broadcast, never shuffle the
        corpus word stream on the word key."""
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["bpe_subword_stats"](spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_key_skew_topk_never_global_sorts(self, spark):
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["key_skew_profile"](spark, SF))
        assert "TakeOrderedAndProject" in plan

    def test_normalized_dedup_is_jvm_only(self, spark):
        """ccnet_normalize + md5 grouping is pure codegen column math."""
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["dedup_exact_normalized"](spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan

    def test_kmv_pairwise_is_sketch_sized(self, spark):
        """The pairwise stage must consume the RANK-FILTERED sketches,
        not the raw distinct-fingerprint stream: the plan has to carry
        the row_number windows AND their rn <= k cutoffs (k=128 in the
        registered query; the salted prefilter adds a second window +
        cutoff pair). Dropping any of those filters is the 100 TB
        regression this operator exists to avoid, and it would leave
        the row count unchanged — so pin the plan, then the pair count
        derived from the actual source cardinality. The sketch-build
        plan is inspected via kmv_sketches directly (same arguments as
        the registered query): the overlap operator pins the built
        sketch behind an RDD leaf (TestSinglePassLineage), which plan
        text cannot see through."""
        from dig_etl_engine_spark import queries as registry
        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.sketches import kmv_sketches
        docs = load_tables(spark, SF)["documents"]
        plan = plan_of(kmv_sketches(docs, k=128, hash_mode="md5",
                                    prefilter_salts=8))
        assert plan.count("row_number") >= 2      # salt-local + global rank
        assert plan.count("<= 128") >= 2          # both rank cutoffs applied
        df = registry.queries()["kmv_source_overlap"](spark, SF)
        s = docs.select("source").distinct().count()
        assert df.count() == s * (s - 1) // 2

    def test_interval_overlap_avoids_nested_loop(self, spark):
        """Double-sided bucket fan-out must plan as an equi-join on the
        bucket id — no BroadcastNestedLoopJoin, no CartesianProduct —
        and the canonical-bucket filter means no dropDuplicates
        aggregate after the join."""
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["join_interval_overlap"](spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_ohlc_single_aggregation(self, spark):
        """OHLC rollup is ONE partial-agg groupBy: exactly one exchange."""
        from dig_etl_engine_spark import queries as registry
        plan = plan_of(registry.queries()["ts_downsample_ohlc"](spark, SF))
        assert plan.count("Exchange") == 1
        assert "partial_" in plan  # map-side combine present


class TestRound5Plans:
    def test_webdataset_read_prunes_tar_content(self, spark, tmp_path):
        """read_webdataset lists shards via binaryFile but must NEVER
        load the `content` column — file bytes stream through tarfile
        inside the task instead (no ~2 GiB cap, bounded memory). The
        scan's ReadSchema is the pinned evidence."""
        from dig_etl_engine_spark.sinks.webdataset import (
            read_webdataset, write_webdataset)
        p = str(tmp_path / "wd")
        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(8)], "doc_id LONG, text STRING")
        write_webdataset(docs, p, n_shards=2)
        plan = formatted(read_webdataset(spark, p))
        read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "path" in read and "content" not in read, read

    def test_pinned_quality_scoring_is_narrow_jvm_math(self, spark):
        """The deployed classifier scoring path (pinned coefficients) is
        a pure projection: no shuffle, no Python — the property that
        lets it gate a 100 TB corpus at scan speed."""
        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.quality_model import (
            quality_logit)
        docs = load_tables(spark, SF)["documents"].select("doc_id", "text")
        plan = plan_of(quality_logit(docs))
        assert "Exchange" not in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


class TestSinglePassLineage:
    """Regression pins for the round-5 duplicate-subtree findings:
    multi-consumer corpus lineages must stay pinned at the source, so
    the FINAL plan carries no parquet re-scan of the input — the
    checkpointed subtree (where the single scan lives) appears as an
    RDD leaf. A future edit that rebuilds a consumer on the unpinned
    lineage reintroduces N× corpus scans and fails these counts."""

    import re as _re

    @classmethod
    def _scans(cls, df):
        plan = plan_of(df)
        return (len(cls._re.findall(r"Scan parquet", plan)),
                plan.count("Generate"))

    def test_minhash_pairs_single_corpus_pass(self, spark):
        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.dedup import minhash_lsh_pairs
        docs = load_tables(spark, SF)["documents"]
        scans, gens = self._scans(minhash_lsh_pairs(docs, "text"))
        assert (scans, gens) == (0, 0), (scans, gens)

    def test_line_dedup_single_corpus_pass(self, spark):
        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.text_analysis import (
            global_line_dedup)
        docs = load_tables(spark, SF)["documents"]
        # one scan: the passthrough-column reattach; the exploded line
        # table (3 consumers) lives behind the pin
        scans, gens = self._scans(global_line_dedup(docs))
        assert scans <= 1 and gens == 0, (scans, gens)

    def test_kmv_overlap_single_corpus_pass(self, spark):
        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.sketches import (
            kmv_source_overlap)
        docs = load_tables(spark, SF)["documents"]
        scans, gens = self._scans(kmv_source_overlap(docs, k=16))
        assert (scans, gens) == (0, 0), (scans, gens)


class TestQuantizedFilterPlacement:
    def test_near_dup_filter_is_jvm_integer_predicate(self, spark):
        """r9 pin: the authoritative near-dup threshold filter must sit
        JVM-side as an exact BIGINT comparison on the quantized score —
        NOT inside the Python kernel and NOT as a double comparison.
        The kernel's prefilter is an optimization; if a refactor makes
        the kernel the only filter (or reintroduces a raw-double
        predicate), cross-engine keep-sets can drift by 1 ulp at the
        quantization boundary (the r9 review class)."""
        from pyspark.sql import functions as F

        from dig_etl_engine_spark.catalog import load_tables
        from dig_etl_engine_spark.operators.similarity import (
            embedding_near_dup_pairs)

        emb = load_tables(spark, SF)["embeddings"].select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("embedding"))
        df = embedding_near_dup_pairs(emb, threshold=0.99,
                                      round_digits=4)
        plan = plan_of(df)
        import re

        # the authoritative predicate is a JVM Filter DIRECTLY above the
        # Python node, comparing the inlined floor tree against the
        # integer cut (Catalyst collapses the alias into the filter)
        assert re.search(r"Filter .*FLOOR.*>= 9900", plan), plan[:2000]
        # the emitted score column is the same JVM floor tree
        assert re.search(r"Project .*FLOOR.*AS cosine_e4", plan), \
            plan[:2000]
        # and the filter sits ABOVE the kernel (parents print first) —
        # the kernel's own prefilter is only an optimization
        assert plan.index("Filter ") < plan.index("FlatMapGroupsInPandas"), \
            plan[:2000]
