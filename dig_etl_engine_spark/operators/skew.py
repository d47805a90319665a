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
