"""Avro object-container source + sink — spec-compliant pure-Python
codec over ``mapInPandas``.

Why hand-rolled: the Spark ``avro`` DataSource ships as a SEPARATE
module (``spark-avro_2.13``) that this container does not carry and
cannot fetch (no network) — the same situation as the Excel engines,
solved the same way this repo solved those (`sources/xlsx.py` /
`sources/xls.py`): implement the published format spec directly. The
container format and binary encoding follow the Apache Avro 1.11.x
specification (https://avro.apache.org/docs/ — magic ``Obj\\x01``,
metadata map with ``avro.schema``/``avro.codec``, zigzag-varint longs,
16-byte sync-marker-delimited blocks, ``null`` and ``deflate`` codecs).
On a deployment that can carry the real connector, swap
``read_avro``/``write_avro`` for ``spark.read.format("avro")`` — the
files interoperate (round-trips against the spec's reference vectors in
``tests/test_avro.py``); this implementation is the correctness
fallback and the spec oracle, not the 100-TB hot path (per-row Python
decode vs the connector's vectorized JVM reader).

Supported schema subset (the CDR/flat-record shapes every source in
this repo produces): one top-level ``record`` whose fields are
primitives — ``boolean int long float double string bytes`` — or
``["null", <primitive>]`` unions, plus ``long``/``timestamp-micros``
and ``int``/``date`` logical types. Nested records/arrays/maps are
rejected with a clear error (flatten first; `operators/projections`
has the tools).

Write protocol: identical staged + rename-aside swap as the WebDataset
sink (shared ``_heal_export``): executors write one container file per
partition into a hidden staging dir, the driver retires the previous
export into ``.old`` behind a ``_RETIRED`` commit marker, moves the
staged files in, then drops ``.old`` — every crash point heals forward
or backward, never to zero complete exports. File bytes are
deterministic for identical partition content: the sync marker is the
md5 of the schema JSON plus the partition id, tie-broken metadata
ordering, no timestamps.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from hashlib import md5
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from dig_etl_engine_spark.functions.localdf import local_df
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"

_SPARK_TO_AVRO: list[tuple[type, str | dict]] = [
    (T.BooleanType, "boolean"),
    (T.IntegerType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.StringType, "string"),
    (T.BinaryType, "bytes"),
    (T.TimestampType, {"type": "long", "logicalType": "timestamp-micros"}),
    (T.DateType, {"type": "int", "logicalType": "date"}),
]

_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(), "int": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(),
    "double": T.DoubleType(), "string": T.StringType(),
    "bytes": T.BinaryType(),
}


# --- binary encoding (Avro spec §"Binary Encoding") --------------------------

def _wlong(out: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # zigzag; arithmetic shift handles negatives
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _rlong(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _wbytes(out: bytearray, payload: bytes) -> None:
    _wlong(out, len(payload))
    out += payload


# --- schema bridging ---------------------------------------------------------

def _avro_schema(schema: T.StructType, name: str) -> dict:
    fields = []
    for f in schema.fields:
        at = None
        for cls, a in _SPARK_TO_AVRO:
            if isinstance(f.dataType, cls):
                at = a
                break
        if at is None:
            raise ValueError(
                f"write_avro: unsupported type {f.dataType.simpleString()} "
                f"for field {f.name!r} — the pure-Python codec covers flat "
                "primitive records; flatten nested data first")
        fields.append({"name": f.name,
                       "type": ["null", at] if f.nullable else at})
    return {"type": "record", "name": name, "fields": fields}


def _spark_field(ftype) -> tuple[T.DataType, bool]:
    """Avro field type (after json parse) → (spark type, nullable)."""
    nullable = False
    if isinstance(ftype, list):
        branches = [t for t in ftype if t != "null"]
        if len(ftype) != 2 or len(branches) != 1:
            raise ValueError(f"read_avro: unsupported union {ftype!r}")
        nullable, ftype = True, branches[0]
    if isinstance(ftype, dict):
        lt = ftype.get("logicalType")
        if lt == "timestamp-micros" and ftype.get("type") == "long":
            return T.TimestampType(), nullable
        if lt == "date" and ftype.get("type") == "int":
            return T.DateType(), nullable
        ftype = ftype.get("type")
    if ftype in _AVRO_TO_SPARK:
        return _AVRO_TO_SPARK[ftype], nullable
    raise ValueError(f"read_avro: unsupported avro type {ftype!r} — the "
                     "pure-Python codec covers flat primitive records")


# --- value encode/decode -----------------------------------------------------

def _session_tzinfo(tz: str):
    """tzinfo for a Spark ``spark.sql.session.timeZone`` id. Spark
    accepts region ids (``America/New_York``), bare fixed offsets
    (``+08:00``, ``-0530``) and GMT/UTC-prefixed offsets (``GMT+8``,
    ``UTC+08:00``); ``zoneinfo`` only resolves the region form and
    pandas rejects some offset spellings, so offset forms are parsed to
    a fixed ``datetime.timezone`` here. Returns
    ``datetime.timezone.utc`` exactly for UTC-equivalent ids (callers
    use identity as the fast-path test)."""
    import datetime
    import re
    s = tz.strip()
    if s.upper() in ("UTC", "GMT", "UT", "Z", "ETC/UTC", "ETC/GMT"):
        return datetime.timezone.utc
    # Java ZoneId (which validates the Spark conf) accepts THREE offset
    # prefixes: GMT, UTC, and UT — order UTC before UT so the regex
    # alternation matches the longer spelling first
    m = re.fullmatch(
        r"(?:GMT|UTC|UT)?\s*([+-])(\d{1,2})(?::?(\d{2}))?(?::?(\d{2}))?",
        s, re.IGNORECASE)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        delta = datetime.timedelta(hours=int(m.group(2)),
                                   minutes=int(m.group(3) or 0),
                                   seconds=int(m.group(4) or 0))
        if not delta:
            return datetime.timezone.utc
        return datetime.timezone(sign * delta)
    from zoneinfo import ZoneInfo
    return ZoneInfo(s)


def _encoder(dt: T.DataType, session_tz: str = "UTC"):
    if isinstance(dt, T.BooleanType):
        return lambda out, v: out.append(1 if v else 0)
    if isinstance(dt, (T.IntegerType, T.LongType)):
        return lambda out, v: _wlong(out, int(v))
    if isinstance(dt, T.FloatType):
        return lambda out, v: out.extend(struct.pack("<f", float(v)))
    if isinstance(dt, T.DoubleType):
        return lambda out, v: out.extend(struct.pack("<d", float(v)))
    if isinstance(dt, T.StringType):
        return lambda out, v: _wbytes(out, str(v).encode("utf-8"))
    if isinstance(dt, T.BinaryType):
        return lambda out, v: _wbytes(out, bytes(v))
    if isinstance(dt, T.TimestampType):
        # Arrow hands mapInPandas timestamps as SESSION-TZ-local naive
        # values; timestamp-micros is micros-since-epoch of the UTC
        # INSTANT, so a non-UTC session must localize before taking
        # .value (self-round-trips would hide the offset; spec-compliant
        # consumers would read wall clock as UTC). DST-ambiguous wall
        # times raise — export such data from a UTC session.
        import datetime
        tzinfo = _session_tzinfo(session_tz)
        if tzinfo is datetime.timezone.utc:
            return lambda out, v: _wlong(out, v.value // 1000)  # ns→µs
        return lambda out, v: _wlong(
            out, v.tz_localize(tzinfo).value // 1000)
    if isinstance(dt, T.DateType):
        import datetime
        epoch = datetime.date(1970, 1, 1)
        return lambda out, v: _wlong(out, (v - epoch).days)
    raise AssertionError(dt)


def _decoder(dt: T.DataType, session_tz: str = "UTC"):
    import datetime

    if isinstance(dt, T.BooleanType):
        def dec(buf, pos):
            return buf[pos] == 1, pos + 1
    elif isinstance(dt, (T.IntegerType, T.LongType)):
        dec = _rlong
    elif isinstance(dt, T.FloatType):
        def dec(buf, pos):
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
    elif isinstance(dt, T.DoubleType):
        def dec(buf, pos):
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
    elif isinstance(dt, (T.StringType, T.BinaryType)):
        as_str = isinstance(dt, T.StringType)

        def dec(buf, pos):
            n, pos = _rlong(buf, pos)
            raw = bytes(buf[pos:pos + n])
            return (raw.decode("utf-8") if as_str else raw), pos + n
    elif isinstance(dt, T.TimestampType):
        # the stored micros are a UTC instant; Spark reads a naive
        # datetime coming out of mapInPandas as SESSION-TZ wall time,
        # so render the instant in the session tz (mirror of _encoder).
        # Caveat (inherent to naive wall-time transport): an instant
        # landing in the session zone's DST fall-back hour renders to
        # an ambiguous wall time that Spark re-resolves with its own
        # offset choice — decode such data under a UTC or fixed-offset
        # session for exactness (the repo's sessions pin UTC).
        tzinfo = _session_tzinfo(session_tz)
        if tzinfo is datetime.timezone.utc:
            tzinfo = None
        utc_epoch = datetime.datetime(1970, 1, 1,
                                      tzinfo=datetime.timezone.utc)

        def dec(buf, pos):
            us, pos = _rlong(buf, pos)
            if tzinfo is None:
                return (datetime.datetime(1970, 1, 1)
                        + datetime.timedelta(microseconds=us)), pos
            inst = utc_epoch + datetime.timedelta(microseconds=us)
            return inst.astimezone(tzinfo).replace(tzinfo=None), pos
    elif isinstance(dt, T.DateType):
        def dec(buf, pos):
            d, pos = _rlong(buf, pos)
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=d), pos
    else:
        raise AssertionError(dt)
    return dec


# --- container write ---------------------------------------------------------

def _header(schema_json: str, codec: str, part: int) -> tuple[bytes, bytes]:
    sync = md5(f"{schema_json}|{part}".encode()).digest()
    out = bytearray(_MAGIC)
    _wlong(out, 2)  # metadata map: one block of two entries
    for k, v in (("avro.codec", codec), ("avro.schema", schema_json)):
        _wbytes(out, k.encode())
        _wbytes(out, v.encode())
    _wlong(out, 0)  # map end
    out += sync
    return bytes(out), sync


def write_avro(df: DataFrame, path: str, *, codec: str = "deflate",
               record_name: str = "row",
               rows_per_block: int = 4096) -> DataFrame:
    """Export ``df`` as ``part-{p:05d}.avro`` container files under
    ``path`` (one per partition), eagerly, with the staged rename-aside
    swap shared with the WebDataset sink. Returns the materialized
    manifest ``(part, path, n_rows, n_bytes)``. ``codec``: ``null`` or
    ``deflate`` (spec codecs; deflate = raw zlib). Local-FS path
    contract as the WebDataset sink (executors share the mount).

    Pandas-boundary fidelity notes (inherent to mapInPandas, not this
    codec): Arrow→pandas folds NULL into NaN for float columns, so in a
    NULLABLE float/double column NaN values export as NULL; in a
    non-nullable one NaN is encoded as the IEEE value. A nullable
    int/long column containing NULLs crosses as float64, so integer
    values above 2^53 in such a column would lose precision — export
    those as non-nullable or strings."""
    from dig_etl_engine_spark.session import ship_package
    from dig_etl_engine_spark.sinks.webdataset import (_heal_export,
                                                       _swap_export)

    if codec not in ("null", "deflate"):
        raise ValueError(f"write_avro: unsupported codec {codec!r}")
    ship_package(df.sparkSession)
    schema = df.schema
    schema_json = json.dumps(_avro_schema(schema, record_name),
                             separators=(",", ":"), sort_keys=True)
    # timestamps cross the Arrow boundary as session-tz naive values —
    # the encoder needs the tz to recover the UTC instant (see _encoder)
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone",
                                          "UTC") or "UTC"
    encs = [(f.name, f.nullable, _encoder(f.dataType, session_tz),
             isinstance(f.dataType, (T.FloatType, T.DoubleType)))
            for f in schema.fields]

    os.makedirs(path, exist_ok=True)
    # exclusive export under the shared advisory lock: the entry
    # sweep deletes every .staging-* (crashed leftovers and a live
    # second writer's dir look identical), so concurrent exporters
    # destroy each other without it — see write_webdataset
    from dig_etl_engine_spark.sinks.kg_table import table_lock
    with table_lock(path):
        _heal_export(path, "part-*.avro")
        import glob as _glob
        import shutil as _shutil
        for stale in _glob.glob(os.path.join(_glob.escape(path),
                                         ".staging-*")):
            _shutil.rmtree(stale, ignore_errors=True)
        staging = os.path.join(path, f".staging-{os.getpid()}")
        os.makedirs(staging)

        def write_partition(batches: Iterator[pd.DataFrame]
                            ) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext
            ctx = TaskContext.get()
            part = ctx.partitionId()
            header, sync = _header(schema_json, codec, part)
            fpath = os.path.join(staging, f"part-{part:05d}.avro")
            # write under a per-ATTEMPT tmp name, then os.replace: a task
            # retry or speculative duplicate never interleaves bytes into
            # the staged file (same contract as the WebDataset shard writer)
            tmp = f"{fpath}.tmp.{ctx.taskAttemptId()}"
            n_rows = 0
            with open(tmp, "wb") as fh:
                fh.write(header)
                block = bytearray()
                pending = 0

                def flush():
                    nonlocal block, pending, n_rows
                    if not pending:
                        return
                    payload = bytes(block)
                    if codec == "deflate":
                        payload = zlib.compress(payload)[2:-4]  # raw deflate
                    head = bytearray()
                    _wlong(head, pending)
                    _wlong(head, len(payload))
                    fh.write(bytes(head) + payload + sync)
                    n_rows += pending
                    block, pending = bytearray(), 0

                import numpy as np
                for b in batches:
                    cols = [b[name] for name, _, _, _ in encs]
                    for row in zip(*cols):
                        for (name, nullable, enc, is_float), v in zip(encs,
                                                                      row):
                            # pandas-boundary null test. Float columns are
                            # the documented lossy case: Arrow→pandas folds
                            # NULL into NaN (float32 NULLs arrive as
                            # np.float32 NaN — not a Python float), so in a
                            # NULLABLE float column NaN encodes as the null
                            # branch; in a non-nullable one NaN is a legal
                            # IEEE VALUE and encodes as such (never an
                            # error). Non-float NaN-likes (None/NaT/float64
                            # NaN standing in for a null int) stay nulls.
                            if is_float:
                                isnull = nullable and (
                                    v is None
                                    or (isinstance(v, (float, np.floating))
                                        and v != v))
                            else:
                                isnull = (v is None or v is pd.NaT
                                          or (isinstance(
                                              v, (float, np.floating))
                                              and v != v))
                            if nullable:
                                _wlong(block, 1 if not isnull else 0)
                                if isnull:
                                    continue
                            elif isnull:
                                raise ValueError(
                                    f"write_avro: NULL in non-nullable "
                                    f"field {name!r}")
                            enc(block, v)
                        pending += 1
                        if pending >= rows_per_block:
                            flush()
                flush()
            os.replace(tmp, fpath)  # atomic: last attempt wins whole
            yield pd.DataFrame(
                [(part, fpath, n_rows, os.path.getsize(fpath))],
                columns=["part", "path", "n_rows", "n_bytes"])

        man_schema = T.StructType([
            T.StructField("part", T.IntegerType()),
            T.StructField("path", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ])
        try:
            rows = df.mapInPandas(write_partition, man_schema).collect()
        except Exception:
            _shutil.rmtree(staging, ignore_errors=True)
            raise
        finals = _swap_export(path, "part-*.avro", [r["path"] for r in rows])
        final_rows = [(r["part"], f, r["n_rows"], r["n_bytes"])
                      for r, f in zip(rows, finals)]
        _shutil.rmtree(staging, ignore_errors=True)
        return local_df(df.sparkSession, final_rows, man_schema)


# --- container read ----------------------------------------------------------

def _parse_header(buf: memoryview) -> tuple[dict, str, bytes, int]:
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("read_avro: bad magic — not an Avro container")
    pos, meta = 4, {}
    while True:
        n, pos = _rlong(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative block count: size follows (spec)
            _, pos = _rlong(buf, pos)
            n = -n
        for _ in range(n):
            kl, pos = _rlong(buf, pos)
            k = bytes(buf[pos:pos + kl]).decode()
            pos += kl
            vl, pos = _rlong(buf, pos)
            v = bytes(buf[pos:pos + vl])
            pos += vl
            meta[k] = v
    sync = bytes(buf[pos:pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, pos


def _peek_schema(fpath: str) -> dict:
    """Driver-side header peek: read a growing prefix until the header
    parses whole — a fixed 64 KiB read dies with a bare IndexError on a
    file whose metadata (thousands of fields, foreign fat metadata
    entries) overflows it."""
    size = os.path.getsize(fpath)
    chunk = 1 << 16
    with open(fpath, "rb") as fh:
        while True:
            fh.seek(0)
            buf = memoryview(fh.read(min(chunk, size)))
            try:
                schema_j, _, _, _ = _parse_header(buf)
                return schema_j
            except IndexError:
                if chunk >= size:
                    raise ValueError(
                        f"read_avro: truncated container header in "
                        f"{fpath!r}")
                chunk *= 4


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.avro`` container files under ``path`` into a DataFrame.
    The schema comes from the first file's header (driver-side peek);
    decode is distributed via ``mapInPandas`` over a content-carrying
    ``binaryFile`` scan (container files are partition-sized by this
    repo's writer — keep them under binaryFile's ~2 GiB cap, the same
    contract as remote WebDataset shards)."""
    import glob as _glob

    from dig_etl_engine_spark.session import ship_package
    from dig_etl_engine_spark.sinks.webdataset import _effective_files

    ship_package(spark)
    if os.path.isdir(path):
        # resolve a torn export READ-ONLY — never heal from a reader
        # (a live writer's swap transiently looks torn; see
        # sinks/webdataset module docstring)
        files_list = _effective_files(path, "*.avro")
    else:
        files_list = sorted(_glob.glob(
            os.path.join(_glob.escape(path), "*.avro")))
    if not files_list:
        raise FileNotFoundError(f"read_avro: no *.avro under {path}")
    schema_j = _peek_schema(files_list[0])
    fields = [(f["name"], *_spark_field(f["type"]))
              for f in schema_j["fields"]]
    out_schema = T.StructType(
        [T.StructField(n, dt, True) for n, dt, _ in fields])
    session_tz = spark.conf.get("spark.sql.session.timeZone",
                                "UTC") or "UTC"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [n for n, _, _ in fields]
        for b in batches:
            for content in b["content"]:
                buf = memoryview(content)
                schema_j2, codec, sync, pos = _parse_header(buf)
                decs = [(n, nullable, _decoder(dt, session_tz))
                        for n, dt, nullable in
                        ((f["name"], *_spark_field(f["type"]))
                         for f in schema_j2["fields"])]
                rows = []
                while pos < len(buf):
                    cnt, pos = _rlong(buf, pos)
                    size, pos = _rlong(buf, pos)
                    payload = buf[pos:pos + size]
                    pos += size
                    if bytes(buf[pos:pos + 16]) != sync:
                        raise ValueError("read_avro: sync marker mismatch")
                    pos += 16
                    if codec == "deflate":
                        payload = memoryview(
                            zlib.decompress(bytes(payload), -15))
                    elif codec != "null":
                        raise ValueError(
                            f"read_avro: unsupported codec {codec!r}")
                    p = 0
                    for _ in range(cnt):
                        row = []
                        for _, nullable, dec in decs:
                            if nullable:
                                branch, p = _rlong(payload, p)
                                if branch == 0:
                                    row.append(None)
                                    continue
                            v, p = dec(payload, p)
                            row.append(v)
                        rows.append(tuple(row))
                yield pd.DataFrame(rows, columns=names)

    files = (spark.read.format("binaryFile")
             .load(files_list)
             .select("content"))
    return files.mapInPandas(parse, out_schema)
