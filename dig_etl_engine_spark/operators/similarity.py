"""Similarity search over embedding columns (BASELINE.json north star):
brute-force cosine top-k as the exact baseline, and an IVF-style
cell-restricted variant as the scale path.

Embeddings are ``array<float>`` columns; all math is done after casting to
double (Arrow float32 → float64) so results are engine-reproducible.

Scale shapes:
  * brute force: queries broadcast against the corpus — cost |Q|·|N|·d,
    right answer for |Q| small (re-ranking, eval); the corpus never
    shuffles.
  * IVF: restrict the join to matching cell ids (here the pre-assigned
    ``label`` plays the centroid-assignment); the join becomes an
    equi-join on cell — at 1000 executors each cell's candidates
    co-locate, turning O(|Q|·|N|) into O(Σ_cell |Q_c|·|N_c|).
  * random-hyperplane LSH (`hyperplane_signs`) buckets vectors by sign
    pattern — the self-join-on-bucket shape identical to minhash LSH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_bruteforce(queries: DataFrame, corpus: DataFrame, *, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_digits: int = 4) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank), self-matches excluded,
    ties broken by neighbor id. The per-query top-k is a window over the
    broadcast-joined cross product — no corpus shuffle; the window
    partitions by query so the sort is |Q| independent k-selections.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(F.col(vec_col)).alias("cv"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qv"), F.col("cv")), round_digits)
                 .alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def knn_ivf(queries: DataFrame, corpus: DataFrame, *, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            cell_col: str = "label", round_digits: int = 4) -> DataFrame:
    """IVF-style ANN: search only within the query's cell (centroid
    assignment precomputed in ``cell_col``; nprobe=1). Same output shape as
    brute force — recall trades against the |N|/|cells| cost reduction."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(cell_col).alias("cell"),
                       as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(cell_col).alias("ncell"),
                      as_double(F.col(vec_col)).alias("cv"))
    scored = (
        q.join(c, (F.col("cell") == F.col("ncell"))
               & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qv"), F.col("cv")), round_digits)
                 .alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hyperplane_signs(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id: sign pattern of dot(v, h_j) packed
    into an int. Hyperplanes are pseudo-random ±1 vectors derived from
    md5(j,d) — deterministic, engine-reproducible, no stored model."""
    bucket = F.lit(0)
    for j in range(n_planes):
        prods = F.zip_with(
            vec,
            F.array(*[
                F.lit(1.0) if int(
                    __import__("hashlib").md5(f"{j},{d}".encode()).hexdigest()[0],
                    16) < 8 else F.lit(-1.0)
                for d in range(dim)
            ]),
            lambda x, h: x * h,
        )
        s = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def embedding_near_dup_pairs(df: DataFrame, *, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             cell_col: str = "label",
                             threshold: float = 0.99,
                             round_digits: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a cell (semantic dedup):
    pairs with cosine ≥ threshold, doc_a < doc_b."""
    v = df.select(F.col(id_col).alias("id"), F.col(cell_col).alias("cell"),
                  as_double(F.col(vec_col)).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
                F.round(cosine(F.col("a.v"), F.col("b.v")), round_digits)
                 .alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
