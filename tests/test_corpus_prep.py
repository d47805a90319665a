"""Corpus-prep operators: document chunking (`chunk_documents`) and int8
embedding quantization (`quantize_embeddings`/`dequantize`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.operators.similarity import (
    dequantize, quantize_embeddings)
from dig_etl_engine_spark.operators.text_analysis import chunk_documents


class TestChunkDocuments:
    def _chunks(self, spark, text, **kw):
        df = spark.createDataFrame([("d", text)],
                                   "doc_id string, text string")
        rows = chunk_documents(df, **kw).orderBy("chunk_id").collect()
        return [(r.chunk_id, r.chunk_text, r.n_tokens) for r in rows]

    def test_short_doc_single_chunk(self, spark):
        got = self._chunks(spark, "a b c", chunk_tokens=10, overlap=2)
        assert got == [(0, "a b c", 3)]

    def test_windows_and_remainder(self, spark):
        words = [f"w{i}" for i in range(10)]
        got = self._chunks(spark, " ".join(words),
                           chunk_tokens=4, overlap=1)
        # stride 3: starts 0,3,6 → [w0..w3], [w3..w6], [w6..w9]
        assert got == [(0, "w0 w1 w2 w3", 4),
                       (1, "w3 w4 w5 w6", 4),
                       (2, "w6 w7 w8 w9", 4)]
        # every token is covered and consecutive chunks share the overlap
        assert got[0][1].split()[-1] == got[1][1].split()[0]

    def test_exact_boundary_no_empty_tail(self, spark):
        got = self._chunks(spark, "a b c d", chunk_tokens=4, overlap=1)
        assert got == [(0, "a b c d", 4)]

    def test_coverage_reconstruction(self, spark):
        """Dropping each chunk's leading overlap (except chunk 0) and
        concatenating reproduces the document — no token lost or
        duplicated by the windowing."""
        words = [f"t{i}" for i in range(23)]
        got = self._chunks(spark, " ".join(words),
                           chunk_tokens=8, overlap=3)
        rebuilt = got[0][1].split()
        for _, text, _ in got[1:]:
            rebuilt.extend(text.split()[3:])
        assert rebuilt == words


class TestChunkProperties:
    def test_reconstruction_property_sweep(self, spark):
        """For arbitrary (doc length, chunk size, overlap) shapes: chunk 0
        starts at token 0, consecutive starts advance by stride, the
        overlap-stripped concatenation reproduces the doc exactly, and
        every chunk except possibly the last is full-size."""
        import itertools
        cases = [(n, c, o)
                 for n, c, o in itertools.product(
                     (1, 2, 5, 16, 17, 31, 64), (4, 8, 16), (0, 1, 3))
                 if o < c]
        rows = [(f"{n}_{c}_{o}", " ".join(f"t{i}" for i in range(n)))
                for n, c, o in cases]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        by_doc = {}
        for c, o in {(c, o) for _, c, o in cases}:
            sub = df.filter(F.col("doc_id").endswith(f"_{c}_{o}"))
            out = chunk_documents(sub, chunk_tokens=c, overlap=o)
            for r in out.collect():
                by_doc.setdefault(r.doc_id, []).append(
                    (r.chunk_id, r.chunk_text, r.n_tokens))
        for (n, c, o) in cases:
            chunks = sorted(by_doc[f"{n}_{c}_{o}"])
            assert chunks[0][0] == 0
            assert [i for i, _, _ in chunks] == list(range(len(chunks)))
            rebuilt = chunks[0][1].split()
            for _, text, _ in chunks[1:]:
                rebuilt.extend(text.split()[o:])
            assert rebuilt == [f"t{i}" for i in range(n)], (n, c, o)
            for _, text, ntok in chunks[:-1]:
                assert len(text.split()) == c == ntok, (n, c, o)


class TestGopherGates:
    GOOD = ("the committee have agreed to publish the findings and that "
            "report will be shared with all of the districts next week "
            "so every member can review the details before the meeting "
            "which is planned for the first tuesday of next month with "
            "time reserved for questions and a short briefing from the "
            "chair about the budget")               # >50 tokens, clean

    def _gates(self, spark, text, **kw):
        from dig_etl_engine_spark.operators.text_analysis import (
            gopher_gates)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return df.select(gopher_gates(F.col("text"), **kw)
                         .alias("g")).head()["g"].asDict()

    def test_clean_doc_passes_all(self, spark):
        g = self._gates(spark, self.GOOD)
        assert g["pass_all"] and all(g.values())

    def test_each_gate_fails_for_its_own_reason(self, spark):
        assert not self._gates(spark, "too short")["word_count"]
        g = self._gates(spark, "## " * 60)
        assert not g["symbol_ratio"] and not g["alpha_words"]
        bullets = "\n".join("• item " + "word " * 9 for _ in range(10))
        assert not self._gates(spark, bullets)["bullet_lines"]
        dots = "\n".join("the line trails off... " * 3 + "..."
                         for _ in range(10))
        assert not self._gates(spark, dots)["ellipsis_lines"]
        nosw = " ".join(f"xylophone{i}" for i in range(60))
        assert not self._gates(spark, nosw)["stopword_hits"]
        longw = " ".join("a" * 15 for _ in range(60)) + " the of"
        assert not self._gates(spark, longw)["mean_word_len"]

    def test_ngram_repetition(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            ngram_repetition_ratio)
        df = spark.createDataFrame(
            [(1, "buy cheap pills now " * 10),
             (2, "a perfectly ordinary sentence with no looped phrases"),
             (3, "ab")],
            "doc_id long, text string")
        got = {r.doc_id: r.rep for r in df.select(
            "doc_id", ngram_repetition_ratio(F.col("text"))
            .alias("rep")).collect()}
        assert got[1] > 0.8           # looped phrase → massive trigram rep
        assert got[2] == 0.0
        assert got[3] == 0.0          # sub-n doc


class TestGlobalLineDedup:
    DOCS = [
        (1, "unique alpha line\nshared boilerplate footer\nsecond unique"),
        (2, "another doc body\nshared boilerplate footer\nown ending"),
        (3, "shared boilerplate footer"),
        (4, "totally untouched document\nwith two lines"),
    ]

    def test_keep_first_occurrence(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            global_line_dedup)
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {r.doc_id: r.text
               for r in global_line_dedup(df).collect()}
        assert got == {
            1: "unique alpha line\nshared boilerplate footer\n"
               "second unique",                     # first occurrence kept
            2: "another doc body\nown ending",
            3: "",                                  # doc reduced to empty
            4: "totally untouched document\nwith two lines",
        }

    def test_drop_all_occurrences(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            global_line_dedup)
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {r.doc_id: r.text
               for r in global_line_dedup(df, keep_first=False).collect()}
        assert got[1] == "unique alpha line\nsecond unique"
        assert got[3] == ""

    def test_verbatim_equality_and_crlf(self, spark):
        """Whitespace-variant lines are DISTINCT (C4 dedups verbatim
        lines), CRLF paragraph separators count as blank structure, and
        metadata columns pass through."""
        from dig_etl_engine_spark.operators.text_analysis import (
            global_line_dedup)
        df = spark.createDataFrame(
            [(1, "foo bar", "web"),
             (2, "   foo bar   ", "pdf"),        # distinct from doc 1
             (3, "para one\r\n\r\npara two", "web")],
            "doc_id long, text string, source string")
        got = {r.doc_id: (r.text, r.source)
               for r in global_line_dedup(df).collect()}
        assert got[1] == ("foo bar", "web")
        assert got[2] == ("   foo bar   ", "pdf")   # NOT deduped
        # \r lines are whitespace-only → kept as structure verbatim
        assert got[3] == ("para one\r\n\r\npara two", "web")

    def test_blank_lines_are_structure(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import (
            global_line_dedup)
        df = spark.createDataFrame(
            [(1, "para one\n\npara two"), (2, "other\n\nmore")],
            "doc_id long, text string")
        got = {r.doc_id: r.text
               for r in global_line_dedup(df).collect()}
        # the empty separator line appears in both docs but is never
        # treated as a duplicate line
        assert got == {1: "para one\n\npara two", 2: "other\n\nmore"}


class TestMixSources:
    def test_weighted_token_shares_and_determinism(self, spark):
        docs = load_tables(spark, "/root/testdata/sf0.01")["documents"]
        a = docs.filter(F.col("doc_id") % 2 == 0)
        b = docs.filter(F.col("doc_id") % 2 == 1)
        from dig_etl_engine_spark.operators.text_analysis import (
            mix_sources, token_count)

        mixed, plan = mix_sources(
            {"a": a, "b": b}, {"a": 3.0, "b": 1.0}, target_tokens=20000)
        got = {r.source: r.s for r in mixed.groupBy("source").agg(
            F.sum(token_count(F.col("text"))).alias("s")).collect()}
        # 3:1 split of 20k → 15k / 5k, hash-sampling noise ±25%
        assert abs(got["a"] - 15000) < 3750, got
        assert abs(got["b"] - 5000) < 1250, got
        assert plan["a"]["want"] == 15000 and plan["b"]["want"] == 5000

        mixed2, _ = mix_sources(
            {"a": a, "b": b}, {"a": 3.0, "b": 1.0}, target_tokens=20000)
        ids = lambda m: sorted(r.doc_id for r in m.select("doc_id").collect())
        assert ids(mixed) == ids(mixed2)        # hash gate → deterministic
        mixed3, _ = mix_sources(
            {"a": a, "b": b}, {"a": 3.0, "b": 1.0}, target_tokens=20000,
            salt="epoch2")
        assert ids(mixed3) != ids(mixed)        # new salt → new draw

    def test_small_source_taken_whole(self, spark):
        from dig_etl_engine_spark.operators.text_analysis import mix_sources
        tiny = spark.createDataFrame(
            [(1, "only a few tokens here")], "doc_id long, text string")
        big = spark.createDataFrame(
            [(i, "word " * 50) for i in range(2, 60)],
            "doc_id long, text string")
        mixed, plan = mix_sources(
            {"tiny": tiny, "big": big}, {"tiny": 5.0, "big": 1.0},
            target_tokens=1000)
        assert plan["tiny"]["fraction"] == 1.0
        assert mixed.filter("source = 'tiny'").count() == 1

    def test_sizing_is_one_driver_round_trip(self, spark, monkeypatch):
        """The plan-sizing aggregates must run as ONE Spark action for
        any source count (k sequential agg().head() round-trips was the
        r3 anti-pattern): count driver-materializing calls during
        mix_sources — exactly one collect, zero heads."""
        from dig_etl_engine_spark.operators.text_analysis import mix_sources

        srcs = {f"s{i}": spark.createDataFrame(
            [(i * 10 + j, "tok " * 8) for j in range(3)],
            "doc_id long, text string") for i in range(6)}
        # patch the CONCRETE DataFrame class (pyspark 4 routes through a
        # classic/connect subclass; the pyspark.sql.DataFrame base's
        # methods are overridden there and a base patch never fires)
        df_cls = type(next(iter(srcs.values())))
        calls = {"collect": 0, "head": 0}
        real_collect = df_cls.collect

        def counting_collect(self):
            calls["collect"] += 1
            return real_collect(self)

        def counting_head(self, n=None):
            calls["head"] += 1
            raise AssertionError("mix_sources must not size via head()")

        monkeypatch.setattr(df_cls, "collect", counting_collect)
        monkeypatch.setattr(df_cls, "head", counting_head)
        mixed, plan = mix_sources(
            srcs, {k: 1.0 for k in srcs}, target_tokens=100)
        assert calls == {"collect": 1, "head": 0}
        assert len(plan) == 6
        monkeypatch.undo()
        assert mixed.count() > 0


class TestQuantizeEmbeddings:
    def test_roundtrip_error_bound_and_cosine(self, spark):
        emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
        q = quantize_embeddings(emb)
        checked = q.select(
            # max |dequant - orig| must be ≤ scale/2 (round-to-nearest)
            F.aggregate(
                F.zip_with(dequantize(F.col("q"), F.col("q_scale")),
                           F.transform("embedding",
                                       lambda x: x.cast("double")),
                           lambda a, b: F.abs(a - b)),
                F.lit(0.0), lambda acc, x: F.greatest(acc, x)
            ).alias("max_err"),
            F.col("q_scale"))
        bad = checked.filter(
            F.col("max_err") > F.col("q_scale") / 2 + 1e-12).count()
        assert bad == 0

        from dig_etl_engine_spark.operators.similarity import cosine
        cos = q.select(cosine(
            dequantize(F.col("q"), F.col("q_scale")),
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("c")).agg(F.min("c")).head()[0]
        assert cos >= 0.999          # int8 barely moves the direction

    def test_zero_vector(self, spark):
        df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])],
                                   "vec_id long, embedding array<float>")
        r = quantize_embeddings(df).head()
        assert r.q_scale == 0.0 and list(r.q) == [0, 0, 0]

    def test_null_vector_passes_through(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, -2.0]), (2, None)],
            "vec_id long, embedding array<float>")
        rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
        assert rows[2].q is None and rows[2].q_scale is None
        assert list(rows[1].q) == [64, -127]       # scale = 2/127

    def test_only_vector_column_crosses_to_python(self, spark):
        # the other columns must stay JVM-side: the Arrow eval node's
        # input should reference only the cast vector, not doc text
        df = spark.createDataFrame(
            [(1, "big payload text", [1.0, 2.0])],
            "vec_id long, text string, embedding array<float>")
        plan = quantize_embeddings(df)._jdf.queryExecution() \
            .executedPlan().toString()
        eval_lines = [l for l in plan.splitlines()
                      if "ArrowEvalPython" in l]
        assert eval_lines and not any("text#" in l for l in eval_lines)

    def test_int8_range(self, spark):
        emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
        q = quantize_embeddings(emb)
        mx = q.select(F.aggregate(
            F.transform("q", lambda x: F.abs(x.cast("int"))),
            F.lit(0), lambda a, x: F.greatest(a, x)).alias("m")) \
            .agg(F.max("m")).head()[0]
        assert mx <= 127


class TestConnectedComponentsHybrid:
    """The hybrid CC (driver-side numpy solve under SMALL_GRAPH_EDGES,
    distributed star loop above) must be label-identical on both paths
    and agree with a reference union-find."""

    def _uf_reference(self, edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                hi, lo = max(ra, rb), min(ra, rb)
                parent[hi] = lo
        return {n: find(n) for n in parent}

    def test_local_and_distributed_paths_agree(self, spark):
        import random
        from dig_etl_engine_spark.operators.dedup import (
            connected_components)
        rng = random.Random(7)
        for _ in range(3):
            n = 60
            edges = [(rng.randrange(n) + 1, rng.randrange(n) + 1)
                     for _ in range(80)]
            df = spark.createDataFrame(edges, "doc_a long, doc_b long")
            local = {(r["doc_id"], r["component"])
                     for r in connected_components(df).collect()}
            dist = {(r["doc_id"], r["component"])
                    for r in connected_components(
                        df, small_graph_edges=0).collect()}
            ref = self._uf_reference(
                [(a, b) for a, b in edges if a != b])
            assert local == dist == set(ref.items())

    def test_long_chain_propagates_min(self, spark):
        """A 300-node path graph: the pathological diameter case the
        star loop exists for — the local path must also reach the global
        min across the whole chain, not just hop-local minima."""
        from dig_etl_engine_spark.operators.dedup import (
            connected_components)
        edges = [(i, i + 1) for i in range(1, 300)]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r["doc_id"]: r["component"]
               for r in connected_components(df).collect()}
        assert set(got) == set(range(1, 301))
        assert set(got.values()) == {1}

    def test_empty_edges(self, spark):
        from dig_etl_engine_spark.operators.dedup import (
            connected_components)
        df = spark.createDataFrame([], "doc_a long, doc_b long")
        assert connected_components(df).count() == 0
