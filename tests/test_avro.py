"""Avro object-container source/sink (`sources/avro.py`): spec-vector
checks for the binary encoding, full write→read round trips (both
codecs, all supported types, NULLs), the shared staged-swap crash
protocol, and the unsupported-shape rejections."""

import datetime
import glob
import os
import zlib

import pytest

from pyspark.sql import functions as F

from dig_etl_engine_spark.sources.avro import (
    _MAGIC, _parse_header, _rlong, _wlong, read_avro, write_avro)


class TestBinaryEncodingSpecVectors:
    def test_zigzag_varint_spec_examples(self):
        # the exact table from the Avro spec §Binary Encoding
        for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                        (-2, b"\x03"), (2, b"\x04"),
                        (-64, b"\x7f"), (64, b"\x80\x01"),
                        (8192, b"\x80\x80\x01")]:
            out = bytearray()
            _wlong(out, n)
            assert bytes(out) == want, n
            got, pos = _rlong(memoryview(bytes(out)), 0)
            assert (got, pos) == (n, len(want))

    def test_long_roundtrip_extremes(self):
        for n in (2**62, -2**62, 2**63 - 1, -2**63, 123456789012345):
            out = bytearray()
            _wlong(out, n)
            got, _ = _rlong(memoryview(bytes(out)), 0)
            assert got == n


class TestCodecProperty:
    def test_random_rows_roundtrip_through_encoders(self):
        """Hypothesis fuzz of the value codec layer (no Spark in the
        loop): random primitive rows encode with _encoder and decode
        back bitwise with _decoder, including nullable-union framing."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pyspark.sql import types as T

        from dig_etl_engine_spark.sources.avro import (
            _decoder, _encoder, _rlong, _wlong)

        specs = [
            (T.LongType(), st.integers(-2**63, 2**63 - 1)),
            (T.IntegerType(), st.integers(-2**31, 2**31 - 1)),
            (T.DoubleType(), st.floats(allow_nan=False, width=64)),
            (T.FloatType(), st.floats(allow_nan=False, width=32)),
            (T.BooleanType(), st.booleans()),
            (T.StringType(), st.text(max_size=40)),
            (T.BinaryType(), st.binary(max_size=40)),
        ]
        row_st = st.lists(
            st.sampled_from(range(len(specs))).flatmap(
                lambda i: st.tuples(
                    st.just(i),
                    st.one_of(st.none(), specs[i][1]))),
            min_size=1, max_size=8)

        @given(st.lists(row_st, min_size=1, max_size=5))
        @settings(max_examples=150, deadline=None)
        def check(rows):
            buf = bytearray()
            for row in rows:
                for i, v in row:
                    _wlong(buf, 0 if v is None else 1)
                    if v is not None:
                        _encoder(specs[i][0])(buf, v)
            mv, pos = memoryview(bytes(buf)), 0
            for row in rows:
                for i, want in row:
                    branch, pos = _rlong(mv, pos)
                    if branch == 0:
                        assert want is None
                        continue
                    got, pos = _decoder(specs[i][0])(mv, pos)
                    if isinstance(specs[i][0], T.FloatType):
                        import struct as _s
                        want = _s.unpack("<f", _s.pack("<f", want))[0]
                    assert got == want
            assert pos == len(mv)

        check()


class TestRoundTrip:
    def _docs(self, spark, n=50):
        rows = [(i, f"text {i}" if i % 7 else None, float(i) / 4,
                 i % 2 == 0,
                 datetime.datetime(2024, 1, 1) + datetime.timedelta(
                     hours=i, microseconds=i),
                 datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
                 bytes([i % 256, 0, 255]))
                for i in range(n)]
        return spark.createDataFrame(
            rows, "id LONG, txt STRING, score DOUBLE, flag BOOLEAN, "
                  "ts TIMESTAMP, d DATE, payload BINARY")

    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_all_types_roundtrip(self, spark, tmp_path, codec):
        df = self._docs(spark).repartition(3)
        p = str(tmp_path / "av")
        man = write_avro(df, p, codec=codec).collect()
        assert sum(r["n_rows"] for r in man) == 50
        back = read_avro(spark, p)
        assert back.schema.fieldNames() == df.schema.fieldNames()
        want = {r["id"]: tuple(r) for r in df.collect()}
        got = {r["id"]: tuple(r) for r in back.collect()}
        assert got == want

    def test_file_header_is_spec_shaped(self, spark, tmp_path):
        p = str(tmp_path / "av")
        write_avro(self._docs(spark, 5).coalesce(1), p,
                   codec="deflate").collect()
        f = glob.glob(os.path.join(p, "part-*.avro"))[0]
        raw = open(f, "rb").read()
        assert raw[:4] == _MAGIC
        schema, codec, sync, pos = _parse_header(memoryview(raw))
        assert codec == "deflate" and len(sync) == 16
        assert schema["type"] == "record"
        assert [fld["name"] for fld in schema["fields"]][:2] == ["id", "txt"]
        # block payload deflates back and the sync marker terminates it
        mv = memoryview(raw)
        cnt, pos = _rlong(mv, pos)
        size, pos = _rlong(mv, pos)
        assert cnt == 5
        zlib.decompress(raw[pos:pos + size], -15)
        assert raw[pos + size:pos + size + 16] == sync

    def test_deterministic_bytes_per_partition_content(self, spark,
                                                       tmp_path):
        import hashlib
        digests = []
        for i in range(2):
            p = str(tmp_path / f"av{i}")
            write_avro(self._docs(spark).repartition(1), p).collect()
            f = glob.glob(os.path.join(p, "part-*.avro"))[0]
            digests.append(hashlib.md5(open(f, "rb").read()).hexdigest())
        assert digests[0] == digests[1]

    def test_reexport_swaps_and_torn_swap_heals(self, spark, tmp_path):
        p = str(tmp_path / "av")
        write_avro(self._docs(spark, 40).repartition(2), p).collect()
        write_avro(self._docs(spark, 10).repartition(2), p).collect()
        assert read_avro(spark, p).count() == 10  # old parts gone
        # torn swap: retire live files, leave staged copy, no move-in
        oldd = os.path.join(p, ".old")
        os.makedirs(oldd)
        for s in glob.glob(os.path.join(p, "part-*.avro")):
            os.replace(s, os.path.join(oldd, os.path.basename(s)))
        with open(os.path.join(oldd, "_RETIRED"), "w") as fh:
            fh.write("1")
        staging = os.path.join(p, ".staging-424242")
        write_avro(self._docs(spark, 7).repartition(1), staging).collect()
        # readers resolve the torn state READ-ONLY (roll-forward view:
        # marker present → staged set is the new export) and must NOT
        # mutate — a live writer's swap transiently looks exactly like
        # this, and a reader healing it would corrupt the writer
        assert read_avro(spark, p).count() == 7
        assert os.path.isdir(oldd)  # untouched by the read
        assert read_avro(spark, p).count() == 7  # idempotent view
        # the next WRITER heals forward before exporting
        write_avro(self._docs(spark, 3).repartition(1), p).collect()
        assert not os.path.isdir(oldd)
        assert read_avro(spark, p).count() == 3

    def test_nested_types_rejected(self, spark, tmp_path):
        df = spark.createDataFrame([(1, [1, 2])], "id LONG, xs ARRAY<INT>")
        with pytest.raises(ValueError, match="unsupported type"):
            write_avro(df, str(tmp_path / "av"))

    def test_null_in_non_nullable_field_rejected(self, spark, tmp_path):
        from pyspark.sql import types as T
        # a schema CLAIMING non-nullable with a null smuggled past
        # verification — the export must FAIL (Spark's own codegen
        # rejects it before Arrow; the writer's in-partition guard is
        # the defense for rows that arrive via Arrow anyway), never
        # emit a container whose schema lies about its data
        hard = spark.createDataFrame(
            [(1, "a"), (2, None)],
            T.StructType([T.StructField("id", T.LongType(), False),
                          T.StructField("txt", T.StringType(), False)]),
            verifySchema=False)
        with pytest.raises(Exception):
            write_avro(hard, str(tmp_path / "av")).collect()
        assert not glob.glob(str(tmp_path / "av" / "part-*.avro"))


class TestBoundaryFidelity:
    """Round-6 hardening: session-tz instants, float NULL/NaN policy at
    the Arrow boundary, oversized container headers."""

    def test_non_utc_session_writes_true_utc_instants(self, spark,
                                                      tmp_path):
        """timestamp-micros stores the UTC INSTANT. A non-UTC session
        hands the encoder wall-clock naive values; the written micros
        must still be the instant (checked against the raw bytes, not a
        self-round-trip — a symmetric tz bug cancels in a round trip)."""
        prev = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone",
                           "America/New_York")
            # an unambiguous INSTANT (tz-aware input): 17:00Z, which is
            # noon in New York (EST, UTC-5) — the Arrow boundary hands
            # the encoder the NY wall clock, and the written micros
            # must still be 17:00Z
            inst = datetime.datetime(2024, 1, 15, 17, 0, 0,
                                     tzinfo=datetime.timezone.utc)
            df = spark.createDataFrame([(1, inst)],
                                       "id LONG, ts TIMESTAMP")
            p = str(tmp_path / "av")
            write_avro(df.coalesce(1), p, codec="null").collect()
            raw = open(glob.glob(os.path.join(p, "part-*.avro"))[0],
                       "rb").read()
            mv = memoryview(raw)
            _, _, _, pos = _parse_header(mv)
            _, pos = _rlong(mv, pos)        # block row count
            _, pos = _rlong(mv, pos)        # block byte size
            branch, pos = _rlong(mv, pos)   # id union branch
            assert branch == 1
            _, pos = _rlong(mv, pos)        # id value
            branch, pos = _rlong(mv, pos)   # ts union branch
            assert branch == 1
            micros, _ = _rlong(mv, pos)
            assert micros == int(inst.timestamp()) * 1_000_000
            # the read side restores the same instant (compare through
            # the SQL layer, which is instant-faithful regardless of
            # how the Python collect path renders wall clocks)
            back = read_avro(spark, p)
            got = back.select(F.unix_timestamp("ts").alias("u")) \
                .collect()[0]["u"]
            assert got == int(inst.timestamp())
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
        # re-read under UTC: still the same instant
        got = read_avro(spark, p) \
            .select(F.unix_timestamp("ts").alias("u")).collect()[0]["u"]
        assert got == int(inst.timestamp())

    def test_float_null_and_nan_policy(self, spark, tmp_path):
        """Arrow→pandas folds NULL into NaN for float columns: in a
        NULLABLE float/double column both export as NULL (documented
        lossy case, incl. np.float32 NaN which is not a Python float);
        in a NON-nullable column NaN is a legal IEEE value and must
        survive, never raise."""
        import math

        from pyspark.sql import types as T
        df = spark.createDataFrame(
            [(1, 1.5, 2.5), (2, None, float("nan")), (3, None, None)],
            "id LONG, f FLOAT, d DOUBLE")
        p = str(tmp_path / "avf")
        write_avro(df, p).collect()
        got = {r["id"]: (r["f"], r["d"]) for r in
               read_avro(spark, p).collect()}
        assert got[1] == (1.5, 2.5)
        assert got[2] == (None, None)  # NaN folded to NULL (nullable)
        assert got[3] == (None, None)
        hard = spark.createDataFrame(
            [(1, float("nan")), (2, 2.5)],
            T.StructType([T.StructField("id", T.LongType(), False),
                          T.StructField("d", T.DoubleType(), False)]))
        p2 = str(tmp_path / "avn")
        write_avro(hard, p2, codec="null").collect()
        # the FILE must carry the IEEE NaN value (spec consumers see
        # NaN, not null): decode the raw bytes of the id=1 row
        import struct as _s
        found_nan = False
        for f in glob.glob(os.path.join(p2, "part-*.avro")):
            raw = open(f, "rb").read()
            mv = memoryview(raw)
            _, _, _, pos = _parse_header(mv)
            while pos < len(mv):
                cnt, pos = _rlong(mv, pos)
                size, pos = _rlong(mv, pos)
                end = pos + size
                for _ in range(cnt):
                    rid, pos = _rlong(mv, pos)
                    d = _s.unpack_from("<d", mv, pos)[0]
                    pos += 8
                    if rid == 1:
                        assert math.isnan(d)
                        found_nan = True
                    else:
                        assert d == 2.5
                assert pos == end
                pos += 16  # sync
        assert found_nan
        # this repo's READER renders that NaN as NULL (the same pandas
        # boundary folding, in reverse) — the spec-correct bytes are
        # the contract; the rendering is the documented lossy case
        got2 = {r["id"]: r["d"] for r in read_avro(spark, p2).collect()}
        assert got2[1] is None or math.isnan(got2[1])
        assert got2[2] == 2.5

    def test_header_larger_than_64k_parses(self, spark, tmp_path):
        """The driver-side schema peek must grow its read window until
        the header parses — a fixed 64 KiB read dies on fat metadata."""
        import json as _json

        from dig_etl_engine_spark.sources.avro import _wbytes
        schema = {"type": "record", "name": "row",
                  "fields": [{"name": "id", "type": "long"}]}
        out = bytearray(_MAGIC)
        _wlong(out, 3)
        for k, v in (("avro.codec", b"null"),
                     ("avro.schema", _json.dumps(schema).encode()),
                     ("user.padding", b"x" * 200_000)):
            _wbytes(out, k.encode())
            _wbytes(out, v)
        _wlong(out, 0)
        sync = bytes(range(16))
        out += sync
        body = bytearray()
        _wlong(body, 7)  # one row: id=7 (non-null long, no union)
        _wlong(out, 1)
        _wlong(out, len(body))
        out += bytes(body) + sync
        d = tmp_path / "fat"
        d.mkdir()
        (d / "part-00000.avro").write_bytes(bytes(out))
        rows = read_avro(spark, str(d)).collect()
        assert [r["id"] for r in rows] == [7]


class TestSessionTimezoneForms:
    def test_session_tzinfo_accepts_spark_zone_ids(self):
        import datetime as dt

        from dig_etl_engine_spark.sources.avro import _session_tzinfo
        assert _session_tzinfo("UTC") is dt.timezone.utc
        assert _session_tzinfo("Etc/UTC") is dt.timezone.utc
        assert _session_tzinfo("GMT+0") is dt.timezone.utc
        assert _session_tzinfo("+08:00").utcoffset(None) == \
            dt.timedelta(hours=8)
        assert _session_tzinfo("GMT+8").utcoffset(None) == \
            dt.timedelta(hours=8)
        assert _session_tzinfo("UTC+08:00").utcoffset(None) == \
            dt.timedelta(hours=8)
        assert _session_tzinfo("-0530").utcoffset(None) == \
            -dt.timedelta(hours=5, minutes=30)
        ny = _session_tzinfo("America/New_York")
        assert ny.utcoffset(dt.datetime(2024, 1, 15)) == \
            -dt.timedelta(hours=5)

    def test_fixed_offset_session_roundtrips_instants(self, spark,
                                                      tmp_path):
        """'+08:00' is a legal spark.sql.session.timeZone; both codec
        directions must work (zoneinfo alone rejects it) and preserve
        the instant."""
        prev = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "+08:00")
            inst = datetime.datetime(2024, 6, 1, 3, 30, 0,
                                     tzinfo=datetime.timezone.utc)
            df = spark.createDataFrame([(1, inst)],
                                       "id LONG, ts TIMESTAMP")
            p = str(tmp_path / "av8")
            write_avro(df.coalesce(1), p, codec="null").collect()
            got = read_avro(spark, p) \
                .select(F.unix_timestamp("ts").alias("u")) \
                .collect()[0]["u"]
            assert got == int(inst.timestamp())
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)


def test_session_tzinfo_ut_prefix():
    """Java ZoneId's third offset prefix: bare 'UT' and 'UT+8'."""
    import datetime as dt

    from dig_etl_engine_spark.sources.avro import _session_tzinfo
    assert _session_tzinfo("UT") is dt.timezone.utc
    assert _session_tzinfo("UT+8").utcoffset(None) == dt.timedelta(hours=8)
    assert _session_tzinfo("ut-03:30").utcoffset(None) == \
        -dt.timedelta(hours=3, minutes=30)
