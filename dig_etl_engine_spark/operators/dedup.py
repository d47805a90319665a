"""Deduplication operators for training-data pipelines (BASELINE.json north
star): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Hash choice: every hash is md5-of-string — deliberately, so results are
bit-reproducible across engines (the DuckDB oracle computes the identical
pipeline) and across Spark versions. At 100 TB swap ``_h`` for
``xxhash64`` (same structure, ~10× cheaper) — the operator shapes don't
change.

Scale shapes:
  * exact: one shuffle on the fingerprint (groupBy), map-side combine.
  * minhash LSH: narrow per-doc signature computation → explode b band
    hashes → self-join on (band, hash). The join key is the band bucket —
    cardinality ~docs×b, heavily skew-resistant because md5 buckets are
    uniform; candidate verification touches only colliding pairs.
  * simhash: narrow fingerprint → self-join on the 16-bit code (exact-
    bucket variant here; banded-hamming variant = explode 4-bit bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.text_analysis import fingerprint_md5

# --- exact dedup --------------------------------------------------------------


def exact_dedup(df: DataFrame, content_col: str, *, id_col: str = "doc_id"
                ) -> DataFrame:
    """Exact (normalized-content) dedup: keep the smallest id per content
    fingerprint — deterministic winner, unlike dropDuplicates which keeps
    an arbitrary row. One shuffle on the 128-bit fingerprint."""
    fp = fingerprint_md5(F.col(content_col)).alias("fingerprint")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


# --- shingles + minhash -------------------------------------------------------


def shingles(col: Column, k: int = 3) -> Column:
    """Token k-gram shingles (1 shingle per position; docs shorter than k
    tokens yield one whole-doc shingle)."""
    toks = F.split(F.trim(col), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, F.least(F.lit(k), n - i + 1))))


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: per seed s, min over shingles of md5(s ':' x).
    Hex-string min — identical lexicographic order in any engine.

    NB: the per-seed lambda must stay unary — a `lambda x, s=s:` default-arg
    capture makes PySpark treat it as a (element, index) binary lambda and
    bind the seed to the index Column. Closure factory instead.
    """
    def seed_min(s: int) -> Column:
        prefix = f"{s}:"
        return F.array_min(F.transform(
            shingle_col, lambda x: F.md5(F.concat(F.lit(prefix), x))))

    return F.array(*[seed_min(s) for s in range(num_hashes)])


def band_hashes(sig_col: Column, bands: int = 4, rows: int = 4) -> Column:
    """LSH banding: hash each band of ``rows`` consecutive signature slots;
    docs sharing any band hash become candidate pairs."""
    out = [
        F.md5(F.concat_ws(
            "|", F.lit(str(b)),
            *[F.element_at(sig_col, b * rows + r + 1) for r in range(rows)]))
        for b in range(bands)
    ]
    return F.array(*out)


def jaccard(a: Column, b: Column) -> Column:
    """Exact set Jaccard over two shingle arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def minhash_lsh_pairs(df: DataFrame, content_col: str, *,
                      id_col: str = "doc_id", k: int = 3,
                      num_hashes: int = 16, bands: int = 4,
                      threshold: float = 0.6) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    candidates = docs sharing ≥1 LSH band bucket; verified pairs = those
    with true shingle-Jaccard ≥ threshold. Returns (doc_a, doc_b, jaccard),
    doc_a < doc_b. Probability of missing a pair at similarity s is
    (1-s^r)^b — the standard S-curve; deterministic given the md5 hashes.
    """
    rows = num_hashes // bands
    sh = df.select(F.col(id_col).alias("id"),
                   shingles(F.col(content_col), k).alias("sh"))
    sig = sh.select("id", "sh", band_hashes(
        minhash_signature(F.col("sh"), num_hashes), bands, rows).alias("bands"))
    exploded = sig.select("id", "sh", F.explode("bands").alias("band"))
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
                F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- simhash ------------------------------------------------------------------

SIMHASH_BITS = 16


def _token_hash16(tok: Column) -> Column:
    """16-bit token hash: first 4 hex chars of md5 (reproducible anywhere)."""
    return F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("int")


def simhash16(col: Column) -> Column:
    """16-bit SimHash: per bit, sum ±1 contributions of token hashes; bit
    set iff the sum is positive. Computed as one pass over the token array
    with fold-per-bit — narrow, codegen'd."""
    toks = F.split(F.trim(col), r"\s+")

    def bit_sum(i: int) -> Column:
        # closure (not default-arg) capture: the fold lambda must stay
        # binary or PySpark binds extra params to lambda-variable Columns.
        div = 1 << i
        return F.aggregate(
            toks, F.lit(0),
            lambda acc, t: acc
            + ((F.floor(_token_hash16(t) / div).cast("int") % 2) * 2 - 1))

    fp = F.lit(0)
    for i in range(SIMHASH_BITS):
        fp = fp + F.when(bit_sum(i) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return fp


def simhash_bucket_pairs(df: DataFrame, content_col: str, *,
                         id_col: str = "doc_id") -> DataFrame:
    """SimHash dedup, exact-bucket variant: pairs sharing the full 16-bit
    code (hamming 0). The banded variant (split code into 4-bit bands,
    join per band, verify hamming ≤ t with bit_count(xor)) has the same
    join shape as minhash LSH."""
    h = df.select(F.col(id_col).alias("id"),
                  simhash16(F.col(content_col)).alias("simhash"))
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(b, (F.col("a.simhash") == F.col("b.simhash"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
                F.col("a.simhash").alias("simhash"))
    )


def ngram_jaccard_pairs(df: DataFrame, content_col: str, *,
                        id_col: str = "doc_id", block_col: str | None = None,
                        k: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard pairs within a blocking key (O(n²) per block —
    the blocking column bounds the quadratic term; use LSH when no natural
    block exists)."""
    cols = [F.col(id_col).alias("id"), shingles(F.col(content_col), k).alias("sh")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    sh = df.select(*cols)
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
                F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
