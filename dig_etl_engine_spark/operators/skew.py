"""Skew-mitigation operators.

The reference never joins at scale (SURVEY §2.6 — ES is single-index, no
relational join exists), so this is part of the engine's capability
superset: at 100 TB the shuffle keyed on a skewed join key is the classic
cluster-killer — one straggler task owns the hot key's entire partition.

Two complementary mitigations, in preference order:

1. **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on in the
   engine session defaults) — runtime splitting of oversized partitions.
   Zero code, handles moderate skew; always the first answer.
2. **Explicit two-sided salting** (this module) — for extreme skew (one
   key = 30% of rows) or when the small side is too big to broadcast but
   small enough to replicate ×S: the salt widens the hot key into S
   shuffle partitions deterministically, at the cost of an S-fold
   replication of the other side. Worth it when S ≪ partition count and
   the hot key dominates a task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(facts: DataFrame, dim: DataFrame, on: str | list[str], *,
                salt_from: str | Column, buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with the fact side salted into ``buckets`` sub-keys.

    ``salt_from`` must be a high-cardinality fact column (a row id, an
    offset) — the salt is ``pmod(xxhash64(salt_from), buckets)``, so the
    result is deterministic (no rand(): replays and retries see the same
    salt, which Spark task re-execution requires for correctness under
    fetch failure). The dim side is replicated once per bucket with
    ``explode``; the join key becomes (key…, _salt), spreading each hot
    key over ``buckets`` shuffle partitions.

    Result is row-for-row identical to ``facts.join(dim, on, how)`` for
    inner/left joins (the oracle query states exactly that).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt_col = (F.col(salt_from) if isinstance(salt_from, str)
                else salt_from)
    f = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_col), F.lit(buckets)).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    return f.join(d, [*keys, "_salt"], how).drop("_salt")


def key_skew_profile(df: DataFrame, key: str, *, top_k: int = 5) -> DataFrame:
    """Join/agg-key skew diagnostic — the measurement that DECIDES
    whether a key needs :func:`salted_join` or AQE skew handling before
    a 100 TB run, instead of discovering the straggler task in
    production: per-key counts reduced to one summary row
    ``(n_keys, n_rows, max_n, p50_n, p99_n, top_share)`` where
    ``top_share`` is the fraction of all rows held by the ``top_k``
    heaviest keys (the classic skew smell: top_share ≫ top_k/n_keys).

    Shape: ONE map-side-combined groupBy(key) — the same shuffle the
    join itself would do, but carrying only (key, count) — then a
    scalar aggregate. `percentile` is exact here; at extreme key
    cardinality swap `percentile_approx` (same plan shape). Heavy-hitter
    identification without the count shuffle at all is what
    `kmv_sketches`-style summaries are for; this profile is the exact
    tool you run once per key before committing a join strategy."""
    counts = df.groupBy(F.col(key).alias("k")) \
        .agg(F.count(F.lit(1)).alias("n"))
    # TakeOrderedAndProject, never a global window sort over all keys
    top = counts.orderBy(F.desc("n"), F.asc("k")).limit(top_k) \
        .agg(F.sum("n").alias("top_n"))
    return (counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.percentile("n", F.lit(0.5)).alias("p50_n"),
        F.percentile("n", F.lit(0.99)).alias("p99_n"))
        .join(F.broadcast(top))
        .select("n_keys", "n_rows", "max_n",
                F.round("p50_n", 4).alias("p50_n"),
                F.round("p99_n", 4).alias("p99_n"),
                F.round(F.col("top_n") / F.col("n_rows"), 6)
                .alias("top_share")))
