"""As-of (point-in-time) join — the time-series operator Spark's join
surface lacks (named alongside range joins as the canonical custom-operator
case; DuckDB/kdb/pandas `merge_asof` all ship it natively).

Semantics: for each left row (key, t), attach the most recent right row
with the same key and right.t ≤ left.t (optionally within a tolerance).
The classic uses: price/rate lookup at event time, slowly-changing
dimension resolution, feature point-in-time correctness in training-data
pipelines (no label leakage from the future).

Spark shape (the scale-correct one): a naive inequality join is a
per-key cartesian — O(|L|·|R|) within each key — and Spark plans it as
BroadcastNestedLoop when it can't equi-join. Instead: UNION the two
sides tagged, ONE shuffle+sort on (key, t, side), and a running
`last(right_payload, ignoreNulls)` window carries each right row forward
to every later left row — O((|L|+|R|) log) per key, no cartesian, no
skew beyond the key distribution itself. At equal timestamps the right
row sorts FIRST (side 0) so a same-instant update is visible, matching
DuckDB's ``ON left.t >= right.t``.

Parallelism bound: the window partitions by the join key, so a key's
whole timeline lands in one task. For LOW-cardinality keys over huge
timelines use :func:`asof_join_bucketed` — each key splits into time
buckets with the last-known right row carried across bucket boundaries
as seed rows; for typical entity keys (symbol, user, device) the plain
shape parallelizes naturally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dtype) -> bool:
    """Spark cannot sort MapType (AnalysisException in window orderBy)."""
    if isinstance(dtype, T.MapType):
        return False
    if isinstance(dtype, T.ArrayType):
        return _orderable(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return all(_orderable(f.dataType) for f in dtype.fields)
    return True


def _payload_and_tiebreak(right: DataFrame, on: str,
                          value_cols: list[str]):
    """(payload struct carrying the whole matched row, deterministic
    tie-break struct from the ORDERABLE columns only — map-typed payloads
    still join, their ties break on the orderable subset)."""
    payload = F.struct(F.col(on).alias("_mt"),
                       *[F.col(c).alias(c) for c in value_cols])
    ord_cols = [c for c in value_cols
                if _orderable(right.schema[c].dataType)]
    tiebreak = F.struct(F.col(on).alias("_mt"),
                        *[F.col(c).alias(c) for c in ord_cols])
    return payload, tiebreak


def _in_tolerance(t_col, matched_t, dtype, tolerance_s):
    """Tolerance gate in the on-column's NATIVE type — no long-cast
    truncation. Timestamps compare as a day-time interval (full
    microsecond precision, works for TIMESTAMP and TIMESTAMP_NTZ with no
    timezone-dependent cast); numerics compare by raw subtraction, so
    fractional seconds/values within 1 unit of the boundary gate exactly
    per the documented tolerance_s semantics."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return (t_col - matched_t) <= F.expr(
            f"INTERVAL '{tolerance_s}' SECOND")
    return (t_col - matched_t) <= F.lit(tolerance_s)


def _project(carried: DataFrame, lcols: list[str], on: str,
             value_cols: list[str], suffix: str,
             tolerance_s: int | None) -> DataFrame:
    """Shared final projection: left columns + the matched row\'s fields,
    tolerance-gated when requested."""
    out = carried.filter(F.col("_side") == 1)
    keep = [F.col(c) for c in lcols]
    matched_t = F.col("_f._mt")
    if tolerance_s is not None:
        in_tol = _in_tolerance(F.col("_t"), matched_t,
                               carried.schema["_t"].dataType, tolerance_s)
        keep += [F.when(in_tol, matched_t).alias(f"{on}{suffix}")]
        keep += [F.when(in_tol, F.col(f"_f.{c}")).alias(f"{c}{suffix}")
                 for c in value_cols]
    else:
        keep += [matched_t.alias(f"{on}{suffix}")]
        keep += [F.col(f"_f.{c}").alias(f"{c}{suffix}")
                 for c in value_cols]
    return out.select(*keep)


def asof_join(left: DataFrame, right: DataFrame, *, on: str, by: str,
              value_cols: list[str], tolerance_s: int | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join: every ``left`` row, plus the latest ``right``
    values at or before its ``on`` time within the same ``by`` key
    (NULL when none, or none within ``tolerance_s`` seconds).

    ``value_cols`` are the right-side payload columns to attach, each
    renamed with ``suffix``; the matched right timestamp is exposed as
    ``{on}{suffix}``.
    """
    lcols = left.columns
    # the whole right payload rides in ONE struct so the carried match is
    # always a single right ROW — per-column carries would mix fields from
    # different right rows when a payload column is NULL (pandas
    # merge_asof / DuckDB ASOF return the matched row\'s NULLs verbatim)
    payload, tiebreak = _payload_and_tiebreak(right, on, value_cols)
    tagged_r = right.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"), F.lit(0).alias("_side"),
        payload.alias("_r"), tiebreak.alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"), F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_r"].dataType).alias("_r"),
        F.lit(None).cast(tagged_r.schema["_tb"].dataType).alias("_tb"),
        *[F.col(c) for c in lcols],
    )
    # "_tb" breaks ties among right rows with equal (key, t)
    # deterministically (max orderable payload wins) — without it the
    # carried row would depend on shuffle order
    w = (W.partitionBy("_k").orderBy("_t", "_side", "_tb")
         .rowsBetween(W.unboundedPreceding, 0))
    carried = tagged_r.unionByName(tagged_l).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f"))
    return _project(carried, lcols, on, value_cols, suffix, tolerance_s)


def asof_join_bucketed(left: DataFrame, right: DataFrame, *, on: str,
                       by: str, value_cols: list[str], bucket_width: int,
                       tolerance_s: int | None = None,
                       suffix: str = "_asof") -> DataFrame:
    """:func:`asof_join` semantics with (key, time-bucket) parallelism —
    the low-cardinality-key scale path.

    The plain shape serializes each key\'s whole timeline through one
    window task: fatal when keys are few (one global rate series, a
    handful of instrument classes) and timelines are 100 TB long. Here:

      1. bucket both sides by ``floor(t / bucket_width)``;
      2. per (key, bucket), reduce the right side to its LAST row
         (``max_by`` on the orderable tie-break), then run a window over
         the per-bucket summary (tiny: keys × populated-buckets rows)
         with ``rowsBetween(…, -1)`` — every populated bucket receives a
         SEED row = the last right row of any STRICTLY earlier bucket,
         stamped at the bucket\'s start boundary, so the carry hops over
         empty buckets;
      3. the main carry-forward window partitions by (key, bucket) —
         each bucket is an independent task.

    Two shuffles total, and the heavy window\'s partition count scales
    with timeline length instead of key count. ``on`` must be numeric
    (cast timestamps to epoch first); it is compared in its ORIGINAL
    type — no double cast, so 64-bit nanosecond epochs beyond 2^53 stay
    exact. Results are row-identical to :func:`asof_join`.
    """
    on_type = left.schema[on].dataType
    bkt = lambda c: F.floor(c / bucket_width).cast("long")  # noqa: E731

    lcols = left.columns
    payload, tiebreak = _payload_and_tiebreak(right, on, value_cols)
    tagged_r = right.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"),
        bkt(F.col(on)).alias("_b"), F.lit(0).alias("_side"),
        payload.alias("_r"), tiebreak.alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols])
    tagged_l = left.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"),
        bkt(F.col(on)).alias("_b"), F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_r"].dataType).alias("_r"),
        F.lit(None).cast(tagged_r.schema["_tb"].dataType).alias("_tb"),
        *[F.col(c) for c in lcols])

    # per-(key, bucket) last right row — max_by keeps the full payload
    # (maps included) while ordering only on the orderable tie-break
    per_bucket = (tagged_r
                  .groupBy("_k", "_b")
                  .agg(F.max_by(F.col("_r"),
                                F.struct(F.col("_t"), F.col("_tb")))
                       .alias("_last")))
    all_buckets = (tagged_r.select("_k", "_b")
                   .unionByName(tagged_l.select("_k", "_b")).distinct())
    wseed = (W.partitionBy("_k").orderBy("_b")
             .rowsBetween(W.unboundedPreceding, -1))
    seeds = (all_buckets
             .join(per_bucket, ["_k", "_b"], "left")
             .select("_k", "_b",
                     F.last("_last", ignorenulls=True).over(wseed)
                     .alias("_carry"))
             .filter(F.col("_carry").isNotNull())
             # stamped at the bucket\'s start boundary with side -1 so
             # every real row of the bucket sorts after it
             .select(F.col("_k"), F.col("_b"),
                     (F.col("_b") * bucket_width).cast(on_type)
                     .alias("_t"),
                     F.lit(-1).alias("_side"),
                     F.col("_carry").alias("_r"),
                     F.lit(None).cast(tagged_r.schema["_tb"].dataType)
                     .alias("_tb")))
    everything = (tagged_r
                  .unionByName(seeds.select(
                      "_k", "_b", "_t", "_side", "_r", "_tb",
                      *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                        for c in lcols]))
                  .unionByName(tagged_l))

    w = (W.partitionBy("_k", "_b").orderBy("_t", "_side", "_tb")
         .rowsBetween(W.unboundedPreceding, 0))
    carried = everything.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f"))
    return _project(carried, lcols, on, value_cols, suffix, tolerance_s)
