"""Unit tests for the round-4c additions: interval-overlap join,
OHLC time-bucket downsampling, and the per-dimension embedding
profile."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.range_join import interval_overlap_join
from dig_etl_engine_spark.operators.similarity import embedding_profile
from dig_etl_engine_spark.timeseries.convert import downsample_ohlc


def _pairs(df):
    return sorted((r["a"], r["b"]) for r in df.collect())


class TestIntervalOverlapJoin:
    def _join(self, spark, left, right, w=1.0):
        ldf = spark.createDataFrame(left, "a LONG, llo DOUBLE, lhi DOUBLE")
        rdf = spark.createDataFrame(right, "b LONG, rlo DOUBLE, rhi DOUBLE")
        return interval_overlap_join(ldf, rdf, lo_cols=("llo", "rlo"),
                                     hi_cols=("lhi", "rhi"), bucket_width=w)

    def test_basic_overlap_and_strict_touching(self, spark):
        left = [(1, 0.0, 2.0), (2, 5.0, 6.0)]
        right = [(10, 1.0, 3.0),   # overlaps 1
                 (11, 2.0, 4.0),   # touches 1 at 2.0 → half-open: NO
                 (12, 5.5, 5.8)]   # inside 2
        assert _pairs(self._join(spark, left, right)) == [(1, 10), (2, 12)]

    def test_multi_bucket_overlap_emitted_once(self, spark):
        # overlap spans 5 buckets at w=1; canonical-bucket filter must
        # keep exactly one copy.
        left = [(1, 0.0, 10.0)]
        right = [(10, 3.0, 8.0)]
        out = self._join(spark, left, right, w=1.0).collect()
        assert len(out) == 1

    def test_matches_bruteforce(self, spark):
        import random
        rng = random.Random(7)
        left = [(i, v := rng.uniform(0, 50), v + rng.uniform(0.1, 5))
                for i in range(60)]
        right = [(100 + i, v := rng.uniform(0, 50), v + rng.uniform(0.1, 5))
                 for i in range(60)]
        got = _pairs(self._join(spark, left, right, w=3.0))
        want = sorted((a, b) for a, al, ah in left for b, bl, bh in right
                      if al < bh and bl < ah)
        assert got == want

    def test_negative_coordinates(self, spark):
        left = [(1, -5.0, -3.0)]
        right = [(10, -4.0, -3.5), (11, -3.0, -2.0)]
        assert _pairs(self._join(spark, left, right, w=2.0)) == [(1, 10)]


class TestDownsampleOhlc:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG")

    def test_ohlc_semantics(self, spark):
        t = datetime.datetime
        rows = [(1, t(2024, 1, 1, 9), 10.0, 1),
                (1, t(2024, 1, 1, 12), 99.0, 2),
                (1, t(2024, 1, 1, 18), 5.0, 3),
                (1, t(2024, 1, 2, 9), 7.0, 4)]
        out = {r["bucket"]: r for r in downsample_ohlc(
            self._df(spark, rows)).collect()}
        d1 = out["2024-01-01"]
        assert (d1["open"], d1["high"], d1["low"], d1["close"],
                d1["n"]) == (10.0, 99.0, 5.0, 5.0, 3)
        assert abs(d1["mean_v"] - 38.0) < 1e-9
        assert out["2024-01-02"]["open"] == out["2024-01-02"]["close"] == 7.0

    def test_timestamp_tie_breaks_on_event_id(self, spark):
        t = datetime.datetime(2024, 1, 1, 9)
        rows = [(1, t, 50.0, 2), (1, t, 10.0, 1), (1, t, 70.0, 3)]
        r = downsample_ohlc(self._df(spark, rows)).collect()[0]
        assert r["open"] == 10.0 and r["close"] == 70.0  # by (ts, id)


class TestEmbeddingProfile:
    def test_hand_stats_and_collapsed_dim(self, spark):
        df = spark.createDataFrame(
            [([1.0, 5.0],), ([3.0, 5.0],)], "embedding ARRAY<FLOAT>")
        out = {r["dim"]: r for r in embedding_profile(df).collect()}
        assert out[0]["mean"] == 2.0 and out[0]["std_e4"] > 0
        # collapsed dim: exact integer variance numerator → std exactly 0
        assert (out[1]["mean"], out[1]["std_e4"]) == (5.0, 0)
        assert out[0]["n"] == out[1]["n"] == 2
        assert (out[0]["min_v"], out[0]["max_v"]) == (1.0, 3.0)
        # std_e4 is the 1e-4-scaled sample std: std([1,3]) = √2 ≈ 1.41421
        assert out[0]["std_e4"] == 14142

    def test_ragged_vectors_visible_in_counts(self, spark):
        df = spark.createDataFrame(
            [([1.0, 2.0],), ([3.0],)], "embedding ARRAY<FLOAT>")
        out = {r["dim"]: r["n"] for r in embedding_profile(df).collect()}
        assert out == {0: 2, 1: 1}


class TestRollingAnomaly:
    # Output surface is exact-integer (r8 determinism hardening):
    # (key, ts_us BIGINT, value_cents, roll_n, roll_sum_cents, z_e4,
    # is_anomaly). Tests key rows positionally by ts_us order — the
    # inputs are built in ascending timestamp order per key.

    @staticmethod
    def _by_time(df_rows):
        return sorted(df_rows, key=lambda r: r["ts_us"])

    def test_spike_flagged_gap_shrinks_window(self, spark):
        from dig_etl_engine_spark.timeseries.convert import rolling_anomaly
        t = datetime.datetime
        rows = ([(1, t(2024, 1, d), 10.0 + (d % 3) * 0.1, d)
                 for d in range(1, 7)]
                + [(1, t(2024, 1, 7), 500.0, 7)]     # spike within window
                + [(1, t(2024, 2, 20), 10.0, 8)])    # after a 44-day gap
        df = spark.createDataFrame(
            rows, "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG")
        out = self._by_time(rolling_anomaly(df).collect())
        assert out[6]["is_anomaly"] is True          # the Jan-7 spike
        assert out[6]["value_cents"] == 50000
        first = out[0]  # empty prior baseline
        assert first["roll_n"] == 0 and first["is_anomaly"] is False
        gap = out[7]  # Feb-20 after the gap: prior baseline empty
        assert gap["roll_n"] == 0 and gap["is_anomaly"] is False

    def test_event_time_frame_not_row_frame(self, spark):
        from dig_etl_engine_spark.timeseries.convert import rolling_anomaly
        t = datetime.datetime
        # two points 10 days apart: the second's baseline must NOT
        # reach back to the first (event-time frame, not row frame) —
        # and with leave-one-out it holds nothing at all.
        df = spark.createDataFrame(
            [(1, t(2024, 1, 1), 5.0, 1), (1, t(2024, 1, 11), 9.0, 2)],
            "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG")
        out = self._by_time(rolling_anomaly(df).collect())
        assert out[1]["roll_n"] == 0
        assert out[1]["roll_sum_cents"] is None
        # close the gap to 3 days: baseline now holds the first point
        df2 = spark.createDataFrame(
            [(1, t(2024, 1, 1), 5.0, 1), (1, t(2024, 1, 4), 9.0, 2)],
            "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG")
        out2 = self._by_time(rolling_anomaly(df2).collect())
        assert out2[1]["roll_n"] == 1
        assert out2[1]["roll_sum_cents"] == 500

    def test_constant_baseline_var_exactly_zero(self, spark):
        """Integer variance numerator n·SS−S² is EXACTLY 0 for a
        constant window — no catastrophic-cancellation epsilon, so no
        phantom huge z (the failure mode of float SS−S²/n)."""
        from dig_etl_engine_spark.timeseries.convert import rolling_anomaly
        t = datetime.datetime
        rows = [(1, t(2024, 1, d), 41.37, d) for d in range(1, 9)]
        df = spark.createDataFrame(
            rows, "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG")
        out = self._by_time(rolling_anomaly(df).collect())
        for d in range(2, 9):  # constant baseline → z undefined, never flagged
            row = out[d - 1]
            assert row["z_e4"] is None and row["is_anomaly"] is False
            assert row["roll_n"] == min(d - 1, 7)

    def test_z_matches_python_sample_std(self, spark):
        """z agrees with a pure-Python leave-one-out sample-std reference
        (the exact-integer formulation is algebra, not an approximation)."""
        import statistics
        from dig_etl_engine_spark.timeseries.convert import rolling_anomaly
        t = datetime.datetime
        vals = [10.07, 9.51, 11.23, 10.88, 9.99, 10.45, 17.76]
        rows = [(1, t(2024, 1, d + 1), v, d) for d, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG")
        out = self._by_time(rolling_anomaly(df).collect())
        base = vals[:-1]
        want = (vals[-1] - statistics.mean(base)) / statistics.stdev(base)
        got = out[6]["z_e4"] / 10_000.0  # scaled-integer z, 1e-4 units
        assert abs(got - want) < 5e-5
        assert out[6]["is_anomaly"] is (abs(want) > 3.0)

    def test_ts_us_session_timezone_independent(self, spark):
        """NTZ input: ts_us comes from calendar arithmetic against the
        NTZ epoch, NOT from a session-zone interpretation — a non-UTC
        driver session must emit the same bytes (the r8 review finding:
        unix_micros(cast(ntz as timestamp)) shifted every value by the
        zone offset, +18000 s under America/New_York)."""
        from dig_etl_engine_spark.timeseries.convert import rolling_anomaly
        t = datetime.datetime
        df = spark.createDataFrame(
            [(1, t(2024, 1, 1), 5.0, 1), (1, t(2024, 1, 2), 9.0, 2)],
            "user_id LONG, ts TIMESTAMP_NTZ, value DOUBLE, event_id LONG")
        tz = spark.conf.get("spark.sql.session.timeZone")
        utc = sorted(r.ts_us for r in rolling_anomaly(df).collect())
        try:
            spark.conf.set("spark.sql.session.timeZone",
                           "America/New_York")
            ny = sorted(r.ts_us for r in rolling_anomaly(df).collect())
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz)
        assert ny == utc
        # and the values are the naive-as-UTC epochs the oracle computes
        assert utc[0] == 1704067200000000  # 2024-01-01T00:00:00Z

    def test_exact_integer_output_surface(self, spark):
        """The r7→r8 determinism contract: every output column is
        BIGINT or BOOLEAN except the key — no timestamp rendering, no
        engine round() of a continuous double on the hashed surface."""
        from dig_etl_engine_spark.timeseries.convert import rolling_anomaly
        t = datetime.datetime
        df = spark.createDataFrame(
            [(1, t(2024, 1, 1), 5.0, 1), (1, t(2024, 1, 2), 9.0, 2)],
            "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG")
        schema = {f.name: f.dataType.simpleString()
                  for f in rolling_anomaly(df).schema.fields}
        assert schema == {"user_id": "bigint", "ts_us": "bigint",
                          "value_cents": "bigint", "roll_n": "bigint",
                          "roll_sum_cents": "bigint", "z_e4": "bigint",
                          "is_anomaly": "boolean"}


class TestSeededSweeps:
    def test_interval_join_bruteforce_sweep(self, spark):
        """Three seeded interval universes × bucket widths spanning
        much-smaller / comparable / much-larger than interval length —
        the bucketing must be invariant to width choice."""
        import random
        for seed, w in [(11, 0.5), (12, 4.0), (13, 40.0)]:
            rng = random.Random(seed)
            left = [(i, v := rng.uniform(-20, 20),
                     v + rng.uniform(0.01, 6)) for i in range(40)]
            right = [(100 + i, v := rng.uniform(-20, 20),
                      v + rng.uniform(0.01, 6)) for i in range(40)]
            ldf = spark.createDataFrame(left, "a LONG, llo DOUBLE, lhi DOUBLE")
            rdf = spark.createDataFrame(right, "b LONG, rlo DOUBLE, rhi DOUBLE")
            got = sorted((r["a"], r["b"]) for r in interval_overlap_join(
                ldf, rdf, lo_cols=("llo", "rlo"), hi_cols=("lhi", "rhi"),
                bucket_width=w).collect())
            want = sorted((a, b) for a, al, ah in left for b, bl, bh in right
                          if al < bh and bl < ah)
            assert got == want, (seed, w)

    def test_bpe_reference_sweep(self, spark):
        """Seeded random corpora (skewed small alphabet → heavy merge
        interaction, runs, resurfacing pairs) against the pure-Python
        scan reference."""
        import random
        from tests.test_sketches_and_bpe import _ref_bpe
        from dig_etl_engine_spark.operators import text_analysis as TA
        for seed in (3, 5):
            rng = random.Random(seed)
            words = ["".join(rng.choice("aab") for _ in range(
                rng.randint(2, 6))) for _ in range(30)]
            texts = [" ".join(rng.choices(words, k=12)) for _ in range(8)]
            df = spark.createDataFrame([(t,) for t in texts], "text STRING")
            got = [(r["step"], r["pair"], r["n"])
                   for r in TA.bpe_train_merges(df, n_merges=4).collect()]
            assert got == _ref_bpe(texts, 4), seed


class TestLabelPropagation:
    def _run(self, spark, edges, iters=4):
        from dig_etl_engine_spark.operators.graph import label_propagation
        df = spark.createDataFrame(edges, "src LONG, dst LONG")
        return {r["v"]: r["community"]
                for r in label_propagation(df, iters=iters).collect()}

    def test_bridged_triangles_split(self, spark):
        out = self._run(spark, [(1, 2), (2, 3), (1, 3),
                                (4, 5), (5, 6), (4, 6), (3, 4)])
        left = {out[1], out[2], out[3]}
        right = {out[4], out[5], out[6]}
        assert len(left) == 1 and len(right) == 1
        assert left != right  # the bridge must not merge the cliques

    def test_clique_converges_to_min_label(self, spark):
        out = self._run(spark, [(a, b) for a in range(10, 15)
                                for b in range(10, 15) if a < b])
        assert set(out.values()) == {10}

    def test_deterministic_across_partitionings(self, spark):
        from dig_etl_engine_spark.operators.graph import label_propagation
        edges = [(i, (i * 3 + 1) % 40) for i in range(40)
                 if i != (i * 3 + 1) % 40]
        r1 = sorted(map(tuple, label_propagation(
            spark.createDataFrame(edges, "src LONG, dst LONG")
            .repartition(1), iters=4).collect()))
        r7 = sorted(map(tuple, label_propagation(
            spark.createDataFrame(edges, "src LONG, dst LONG")
            .repartition(7), iters=4).collect()))
        assert r1 == r7
