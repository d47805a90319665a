"""Bucketed range (interval) join — points matched to the intervals
containing them.

Named with the as-of join as the canonical operators Spark's join surface
lacks: `points.v BETWEEN ranges.lo AND ranges.hi` is a non-equi predicate,
so Catalyst plans a broadcast-nested-loop — O(|P|·|R|) comparisons — and
falls over when neither side broadcasts.

Scale shape here: quantize the value axis into fixed-width buckets. Each
interval explodes into the buckets it spans (fan-out = interval width /
bucket width, bounded and chosen per dataset); each point lands in exactly
ONE bucket; the join becomes an equi-join on the bucket id with the exact
containment predicate re-checked after. Every matching (point, interval)
pair meets in the point's bucket exactly once — no dedup needed. Cost:
one shuffle of points + (fanned) intervals on a uniform integer key,
candidates bounded by bucket co-occupancy instead of |P|·|R|. This is the
same strategy Databricks' range-join optimization hints implement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, ranges: DataFrame, *, point_col: str,
               lo_col: str, hi_col: str,
               bucket_width: float) -> DataFrame:
    """Inner join of each point row to every interval row with
    ``lo ≤ point < hi``. Pick ``bucket_width`` near the typical interval
    width: fan-out stays ~2 rows per interval while bucket occupancy
    stays low.
    """
    p_bucket = F.floor(F.col(point_col) / bucket_width)
    r_buckets = F.sequence(F.floor(F.col(lo_col) / bucket_width),
                           F.floor(F.col(hi_col) / bucket_width))
    fanned = ranges.withColumn("_bkt", F.explode(r_buckets))
    pts = points.withColumn("_bkt", p_bucket)
    return (pts.join(fanned, "_bkt")
            .filter((F.col(point_col) >= F.col(lo_col))
                    & (F.col(point_col) < F.col(hi_col)))
            .drop("_bkt"))


def interval_overlap_join(left: DataFrame, right: DataFrame, *,
                          lo_cols: tuple[str, str], hi_cols: tuple[str, str],
                          bucket_width: float) -> DataFrame:
    """Interval×interval overlap join: every (left, right) row pair
    whose half-open intervals intersect (``l_lo < r_hi AND r_lo <
    l_hi``) — the second non-equi join shape Catalyst would plan as a
    broadcast-nested-loop. Same bucketing strategy as :func:`range_join`
    but BOTH sides fan out to the buckets they span.

    A pair whose intervals share several buckets would meet several
    times, so each candidate is kept only in its CANONICAL bucket — the
    bucket containing ``greatest(l_lo, r_lo)``, i.e. where the overlap
    starts, which both fans necessarily cover. That makes the output
    exactly-once WITHOUT a dropDuplicates shuffle: one exchange per
    side on the uniform bucket id, predicate + canonical filter after
    the equi-join, nothing else."""
    llo, rlo = lo_cols
    lhi, rhi = hi_cols
    lf = left.withColumn("_bkt", F.explode(F.sequence(
        F.floor(F.col(llo) / bucket_width),
        F.floor(F.col(lhi) / bucket_width))))
    rf = right.withColumn("_bkt", F.explode(F.sequence(
        F.floor(F.col(rlo) / bucket_width),
        F.floor(F.col(rhi) / bucket_width))))
    canon = F.floor(F.greatest(F.col(llo), F.col(rlo)) / bucket_width)
    return (lf.join(rf, "_bkt")
            .filter((F.col(llo) < F.col(rhi)) & (F.col(rlo) < F.col(lhi))
                    & (F.col("_bkt") == canon))
            .drop("_bkt"))
