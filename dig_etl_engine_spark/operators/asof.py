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
timelines, pre-split each key into time buckets and carry the last right
row of bucket N into bucket N+1 as a seed row (two passes, same
one-shuffle character); for typical entity keys (symbol, user, device)
the plain shape parallelizes naturally.
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
