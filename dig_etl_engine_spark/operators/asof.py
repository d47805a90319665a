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
    # merge_asof / DuckDB ASOF return the matched row's NULLs verbatim)
    r_struct = F.struct(F.col(on).alias("_mt"),
                        *[F.col(c).alias(c) for c in value_cols])
    tagged_r = right.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"), F.lit(0).alias("_side"),
        r_struct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"), F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in lcols],
    )
    # "_r" in the ordering breaks ties among right rows with equal
    # (key, t) deterministically (max struct wins) — without it the
    # carried payload would depend on shuffle order
    w = (W.partitionBy("_k").orderBy("_t", "_side", "_r")
         .rowsBetween(W.unboundedPreceding, 0))
    carried = tagged_r.unionByName(tagged_l).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f"))
    out = carried.filter(F.col("_side") == 1)
    keep = [F.col(c) for c in lcols]
    matched_t = F.col("_f._mt")
    if tolerance_s is not None:
        in_tol = (F.col("_t").cast("long") - matched_t.cast("long")
                  <= F.lit(tolerance_s))
        keep += [F.when(in_tol, matched_t).alias(f"{on}{suffix}")]
        keep += [F.when(in_tol, F.col(f"_f.{c}")).alias(f"{c}{suffix}")
                 for c in value_cols]
    else:
        keep += [matched_t.alias(f"{on}{suffix}")]
        keep += [F.col(f"_f.{c}").alias(f"{c}{suffix}")
                 for c in value_cols]
    return out.select(*keep)


def asof_join_bucketed(left: DataFrame, right: DataFrame, *, on: str,
                       by: str, value_cols: list[str],
                       bucket_width: int, suffix: str = "_asof") -> DataFrame:
    """:func:`asof_join` semantics with (key, time-bucket) parallelism —
    the low-cardinality-key scale path.

    The plain shape serializes each key's whole timeline through one
    window task: fatal when keys are few (one global rate series, a
    handful of instrument classes) and timelines are 100 TB long. Here:

      1. bucket both sides by ``floor(t / bucket_width)``;
      2. per (key, bucket), reduce the right side to its LAST row, then
         run a window over the per-bucket summary (tiny: keys × buckets
         rows) carrying the last known right row forward; shift it into
         the NEXT bucket as a SEED row stamped at the bucket boundary —
         this hops over empty buckets, so every bucket starts knowing
         its carry-in;
      3. the main carry-forward window runs partitioned by
         (key, bucket) — each bucket is an independent task.

    Two shuffles total (bucketed union + the tiny summary window), and
    the heavy window's partition count scales with the timeline length
    instead of the key count. ``on`` must be numeric (cast timestamps to
    epoch first); results are row-identical to :func:`asof_join`.
    """
    bkt = lambda c: F.floor(c / bucket_width)  # noqa: E731

    r_struct = F.struct(F.col(on).alias("_mt"),
                        *[F.col(c).alias(c) for c in value_cols])
    tagged_r = right.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"),
        bkt(F.col(on)).alias("_b"), F.lit(0).alias("_side"),
        r_struct.alias("_r"))

    lcols = left.columns
    null_l = [F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in lcols]
    tagged_l = left.select(
        F.col(by).alias("_k"), F.col(on).cast("double").alias("_t"),
        bkt(F.col(on)).alias("_b"), F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in lcols])

    # per-(key, bucket) last right row — deterministic (max (_t, _r))
    per_bucket = (tagged_r
                  .groupBy("_k", "_b")
                  .agg(F.max(F.struct(F.col("_t"), F.col("_r")))
                       .alias("_last")))
    # every POPULATED bucket (left or right rows) gets a seed = last
    # right row of any STRICTLY earlier bucket (rowsBetween …, -1) — a
    # left-only bucket many empty buckets after the last rate update
    # still receives its carry-in
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
             # stamped at the bucket's start boundary with side -1 so
             # every real row of the bucket sorts after it
             .select(F.col("_k"), F.col("_b"),
                     (F.col("_b") * bucket_width).cast("double")
                     .alias("_t"),
                     F.lit(-1).alias("_side"),
                     F.col("_carry._r").alias("_r")))
    everything = (tagged_r
                  .select("_k", F.col("_t").cast("double").alias("_t"),
                          "_b", "_side", "_r", *null_l)
                  .unionByName(seeds.select("_k", "_b", "_t", "_side",
                                            "_r", *null_l))
                  .unionByName(tagged_l))

    w = (W.partitionBy("_k", "_b").orderBy("_t", "_side", "_r")
         .rowsBetween(W.unboundedPreceding, 0))
    carried = everything.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f"))
    out = carried.filter(F.col("_side") == 1)
    keep = [F.col(c) for c in lcols]
    keep += [F.col("_f._mt").alias(f"{on}{suffix}")]
    keep += [F.col(f"_f.{c}").alias(f"{c}{suffix}") for c in value_cols]
    return out.select(*keep)
