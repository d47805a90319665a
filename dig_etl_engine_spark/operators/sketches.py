"""Set-sketch operators: KMV (k-minimum-values) bottom-k sketches for
cross-source duplication governance at corpus scale.

`source_overlap_matrix` (queries_corpus.py) computes EXACT cross-source
verbatim overlap via a distinct-fingerprint self-join — correct, but its
shuffle carries every distinct fingerprint. At 100 TB the governance
dashboard doesn't need exact counts; it needs a stable estimate from a
fixed-size summary. A KMV sketch (Bar-Yossef et al. 2002; the estimator
popularized by the DataSketches theta family) keeps only the k smallest
hash values per source: the sketches are k-row tables regardless of
corpus size, every pairwise Jaccard estimate is computed sketch-side,
and the whole matrix broadcasts.

Determinism: hashes are md5-hex prefixes (or xxhash64 hex in the fast
path) ordered LEXICOGRAPHICALLY — a fixed-width hex string orders the
same as its unsigned integer value, is uniform, and is reproducible
bit-for-bit in any engine, so the ESTIMATE itself is oracle-checkable
(the oracle replays the estimator, not the true Jaccard; the accuracy
of the estimator vs exact is pinned separately in unit tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.pin import pin


def _h64_hex(col, hash_mode: str):
    """Fixed-width hex hash string; lexicographic order == numeric order."""
    if hash_mode == "md5":
        return F.substring(F.md5(col), 1, 16)
    if hash_mode == "xxhash64":
        return F.lpad(F.hex(F.xxhash64(col)), 16, "0")
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def kmv_sketches(df: DataFrame, *, source_col: str = "source",
                 text_col: str = "text", k: int = 128,
                 hash_mode: str = "xxhash64",
                 prefilter_salts: int = 0) -> DataFrame:
    """Bottom-k distinct-hash sketch per source: rows
    ``(source, h, rn)`` with ``rn`` the 1-based rank of ``h`` among the
    source's distinct hashes (``rn <= k``).

    Shape: ONE map-side-combined distinct over narrow ``(source, h)``
    pairs, then per-source top-k. With ``prefilter_salts = s > 0`` the
    top-k runs in two stages — rank within ``(source, salt)`` buckets
    first, then within source over the ≤ s·k survivors — so no single
    task ever sorts a whole source's hash stream (the guard a
    billion-doc source needs; result is identical because the k global
    minima are minima of their salt bucket too).
    """
    e = (df.select(F.col(source_col).alias("source"),
                   _h64_hex(F.col(text_col), hash_mode).alias("h"))
         .distinct())
    if prefilter_salts > 0:
        wlocal = (Window.partitionBy("source", "salt").orderBy("h"))
        e = (e.withColumn("salt", F.pmod(F.crc32(F.col("h")),
                                         F.lit(prefilter_salts)))
             .withColumn("lrn", F.row_number().over(wlocal))
             .filter(F.col("lrn") <= k).drop("salt", "lrn"))
    w = Window.partitionBy("source").orderBy("h")
    return (e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


def kmv_source_overlap(df: DataFrame, *, source_col: str = "source",
                       text_col: str = "text", k: int = 128,
                       hash_mode: str = "xxhash64",
                       prefilter_salts: int = 0) -> DataFrame:
    """Pairwise source-overlap estimates from KMV sketches: for every
    unordered source pair, take the ``k_used = min(k, |union sketch|)``
    smallest distinct hashes of the two sketches' union; the fraction of
    those present in BOTH sketches estimates Jaccard(A, B) (the bottom-k
    union sketch is a uniform sample of A ∪ B, and membership in both
    bottom-k sketches is membership in A ∩ B for any hash that survives
    to the union's bottom-k).

    Returns ``(source_a, source_b, k_used, n_common, jaccard_est)`` with
    ``source_a < source_b``. Everything after the sketch build is
    sketch-sized: S sources → S·k rows → S²/2 pairs of ≤ 2k rows.
    """
    # the sketch is S·k rows but its BUILD is the corpus-sized cost (full
    # distinct + per-source top-k), and it feeds four consumers below
    # (srcs twice via the self-join, ea, eb) with no exchange reuse
    # (measured: 6× corpus scan in the executed plan unpinned) — pin the
    # few-thousand-row result so the corpus is scanned once
    sk = kmv_sketches(df, source_col=source_col, text_col=text_col,
                      k=k, hash_mode=hash_mode,
                      prefilter_salts=prefilter_salts) \
        .transform(pin, eager=False)
    srcs = sk.select("source").distinct()
    pairs = (srcs.alias("x").join(
        srcs.withColumnRenamed("source", "source_b").alias("y"),
        F.col("x.source") < F.col("y.source_b"))
        .select(F.col("x.source").alias("source_a"), "source_b"))
    ea = (pairs.join(sk.select(F.col("source").alias("source_a"),
                               "h"), "source_a")
          .select("source_a", "source_b", "h",
                  F.lit(1).alias("in_a"), F.lit(0).alias("in_b")))
    eb = (pairs.join(sk.select(F.col("source").alias("source_b"),
                               "h"), "source_b")
          .select("source_a", "source_b", "h",
                  F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    un = (ea.unionByName(eb)
          .groupBy("source_a", "source_b", "h")
          .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.partitionBy("source_a", "source_b").orderBy("h")
    bott = (un.withColumn("urn", F.row_number().over(w))
            .filter(F.col("urn") <= k))
    return (bott.groupBy("source_a", "source_b")
            .agg(F.count(F.lit(1)).alias("k_used"),
                 F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"))
            .select("source_a", "source_b",
                    F.col("k_used").cast("long").alias("k_used"),
                    F.col("n_common").cast("long").alias("n_common"),
                    F.round(F.col("n_common") / F.col("k_used"), 6)
                    .alias("jaccard_est")))
