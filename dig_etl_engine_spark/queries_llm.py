"""Registry entries for the LLM training-data pipeline operators
(BASELINE.json north star; SURVEY §7.1 step 10): deduplication, similarity
search, text analysis, multimodal plumbing.

Near-duplicates don't occur naturally in the synthetic corpus, so dedup
queries build a corpus = documents ∪ deterministic mutants (same text plus
a short suffix / perturbed embedding, id + 100000); both engines derive the
identical corpus, and the operator under test must find the planted pairs
(plus any true corpus collisions — also identical across engines, since
every hash involved is md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.functions.localdf import local_df
from dig_etl_engine_spark.operators import dedup as D
from dig_etl_engine_spark.operators import similarity as S
from dig_etl_engine_spark.operators import text_analysis as TA
from dig_etl_engine_spark.operators.multimodal import extract_features
from dig_etl_engine_spark.queries import register

_MUTANT_SUFFIX = " zz extra trailing tokens"

_CORPUS_SQL = f"""
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || '{_MUTANT_SUFFIX}' AS text
      FROM documents WHERE doc_id % 2 = 0
    )
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus exact-text mutants for every even doc_id."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    mut = (docs.filter(F.col("doc_id") % 2 == 0)
           .select((F.col("doc_id") + 100000).alias("doc_id"),
                   F.concat(F.col("text"), F.lit(_MUTANT_SUFFIX)).alias("text")))
    return docs.unionByName(mut)


# --- dedup -------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 2 = 0
    )
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM corpus GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content fingerprint; deterministic winner
    (min id). Mutants here copy the text verbatim → every even doc has
    n_copies=2. One fingerprint shuffle at any scale."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    mut = (docs.filter(F.col("doc_id") % 2 == 0)
           .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return D.exact_dedup(docs.unionByName(mut), "text")


def _minhash_ctes(corpus_sql: str) -> str:
    """The minhash-LSH pipeline as a reusable CTE chain ending in
    ``verified(doc_a, doc_b, jaccard)``."""
    from dig_etl_engine_spark.operators.dedup import MH_A, MH_B, MH_PRIME

    mins = ", ".join(
        f"min(({MH_A[i]} * h + {MH_B[i]}) % {MH_PRIME}) AS m{i}"
        for i in range(16))
    bands = ", ".join(
        "md5('{b}' || '|' || {parts})".format(
            b=b, parts=" || '|' || ".join(f"m{b * 4 + r}::VARCHAR"
                                          for r in range(4)))
        for b in range(4))
    return f"""
    {corpus_sql},
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                 i -> array_to_string(t[i:least(i + 2, len(t))], ' ')) AS sh
      FROM toks
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(unnest(sh)), 1, 7))::BIGINT AS h
      FROM sh
    ),
    sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
    exploded AS (SELECT doc_id, unnest([{bands}]) AS band FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM exploded a JOIN exploded b
        ON a.band = b.band AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             ROUND(len(list_intersect(sa.sh, sb.sh)) /
                   greatest(len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
                            - len(list_intersect(sa.sh, sb.sh)), 1), 6) AS jaccard
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b
    )
    """


def _minhash_sql() -> str:
    return ("WITH " + _minhash_ctes(_CORPUS_SQL)
            + " SELECT doc_a, doc_b, jaccard FROM verified"
              " WHERE jaccard >= 0.5")


@register("dedup_minhash_lsh", oracle=_minhash_sql())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection, end-to-end: 3-token shingles → one
    md5 base hash each → 16 universal-hash minhash permutations → 4 LSH
    bands → bucket self-join → exact-Jaccard verify ≥ 0.5. The oracle
    replays the identical hash pipeline in SQL — bucket collisions and the
    (1-s^4)^4 candidate S-curve agree exactly."""
    return D.minhash_lsh_pairs(_corpus(spark, sf_dir), "text",
                               threshold=0.5)


_CC_CORPUS_SQL = f"""
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || '{_MUTANT_SUFFIX}' AS text
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id,
             text || '{_MUTANT_SUFFIX}' || ' yy more tail tokens' AS text
      FROM documents WHERE doc_id % 4 = 0
    )
"""


@register(
    "dedup_connected_components",
    oracle="WITH RECURSIVE " + _minhash_ctes(_CC_CORPUS_SQL) + """,
    pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT u, v FROM edges
              UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
    comp AS (SELECT u AS doc_id, least(u, MIN(v)) AS component
             FROM reach GROUP BY u)
    SELECT doc_id, component FROM comp
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: minhash-LSH pairs → connected components →
    (doc, component) with component = the canonical (min-id) survivor —
    the step that turns pairwise hits into dedup groups. The corpus plants
    two mutant generations (doc, +suffix, +suffix+tail) so components form
    multi-hop chains, not just 2-cliques; the Spark side runs alternating
    large-star/small-star (O(log² n) rounds, diameter-independent —
    `operators/dedup.py:connected_components`) and the oracle computes the
    same components by recursive transitive closure."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    mut1 = (docs.filter(F.col("doc_id") % 2 == 0)
            .select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat("text", F.lit(_MUTANT_SUFFIX)).alias("text")))
    mut2 = (docs.filter(F.col("doc_id") % 4 == 0)
            .select((F.col("doc_id") + 200000).alias("doc_id"),
                    F.concat("text", F.lit(_MUTANT_SUFFIX),
                             F.lit(" yy more tail tokens")).alias("text")))
    corpus = docs.unionByName(mut1).unionByName(mut2)
    pairs = D.minhash_lsh_pairs(corpus, "text", threshold=0.5)
    return D.connected_components(pairs)


def _simhash_sql() -> str:
    bit_sums = ", ".join(
        f"SUM(((h >> {i}) & 1) * 2 - 1) AS s{i}" for i in range(16))
    fp = " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)"
                    for i in range(16))
    return f"""
    WITH {_CORPUS_SQL},
    tok AS (
      SELECT doc_id, ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 4))::INT AS h
      FROM corpus
    ),
    sums AS (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id),
    fps AS (SELECT doc_id, {fp} AS simhash FROM sums)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash
    FROM fps a JOIN fps b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    """


@register("dedup_simhash", oracle=_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup (16-bit, md5 token hashes): per-bit ±1 vote → packed
    fingerprint → exact-bucket pair join. Mutants append 4 tokens to ~50,
    flipping few/no bits, so most planted pairs share the code."""
    return D.simhash_bucket_pairs(_corpus(spark, sf_dir), "text")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_CORPUS_SQL},
    blocked AS (
      SELECT c.doc_id, c.text, d.source AS blk
      FROM corpus c JOIN documents d ON (c.doc_id % 100000) = d.doc_id
    ),
    sh AS (
      SELECT doc_id, blk,
             list_transform(range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
                 i -> array_to_string((string_split(text,' '))[i:least(i + 2,
                          len(string_split(text,' ')))], ' ')) AS sh
      FROM blocked
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.sh, b.sh)) /
                 greatest(len(list_distinct(a.sh)) + len(list_distinct(b.sh))
                          - len(list_intersect(a.sh, b.sh)), 1), 6) AS jaccard
    FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) /
          greatest(len(list_distinct(a.sh)) + len(list_distinct(b.sh))
                   - len(list_intersect(a.sh, b.sh)), 1) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard dedup within a blocking key (source): the
    O(n²) term is bounded per block; LSH replaces blocking when no natural
    key exists. Threshold 0.5 keeps only the planted near-identical pairs."""
    corpus = _corpus(spark, sf_dir)
    docs = load_tables(spark, sf_dir)["documents"]
    blocked = (corpus.withColumn("orig_id", F.col("doc_id") % 100000)
               .join(docs.select(F.col("doc_id").alias("orig_id"), "source"),
                     "orig_id")
               .select("doc_id", "text", "source"))
    return D.ngram_jaccard_pairs(blocked, "text", block_col="source",
                                 threshold=0.5)


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, label,
             list_transform(embedding::DOUBLE[], x -> x + 0.001)
      FROM embeddings WHERE vec_id % 2 = 0
    )
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           CAST(floor(list_cosine_similarity(a.v, b.v) * 10000.0 + 0.5)
                AS BIGINT) AS cosine_e4
    FROM corpus a JOIN corpus b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE CAST(floor(list_cosine_similarity(a.v, b.v) * 10000.0 + 0.5)
               AS BIGINT) >= 9900
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (semantic dedup): within-cell pairs with
    cosine ≥ 0.99. Mutants are the original vector +0.001 per dim —
    cosine ≈ 0.9999 to their source, far from any random pair (~N(0,1/8)).
    Score emitted as a 1e-4-scaled BIGINT via the shared
    ``floor(cos·1e4 + 0.5)`` tree (continuous-round lint, r9: no engine
    round() on the sqrt-derived cosine; threshold in integer units)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    mut = (emb.filter(F.col("vec_id") % 2 == 0)
           .select((F.col("vec_id") + 100000).alias("vec_id"), "label",
                   F.transform(S.as_double(F.col("embedding")),
                               lambda x: x + F.lit(0.001)).alias("embedding")))
    corpus = emb.select("vec_id", "label",
                        S.as_double(F.col("embedding")).alias("embedding")) \
                .unionByName(mut)
    return S.embedding_near_dup_pairs(corpus, id_col="vec_id",
                                      threshold=0.99)


# --- similarity search -------------------------------------------------------


@register(
    "knn_cosine_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(floor(list_cosine_similarity(q.v, c.embedding::DOUBLE[])
                        * 10000.0 + 0.5) AS BIGINT) AS cosine_e4
      FROM q, embeddings c WHERE q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_e4, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine_e4 DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact ANN baseline): queries broadcast
    over the corpus, per-query window top-5. |Q|·|N|·d flops, no corpus
    shuffle — the right exact method when |Q| is small. Score emitted as
    a 1e-4-scaled BIGINT via the shared ``floor(cos·1e4 + 0.5)`` tree
    (continuous-round lint, r9 — closing the kernel-side blind spot the
    r8 plan-walk lint documented)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return S.knn_bruteforce(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5)


@register(
    "knn_cosine_ivf",
    oracle="""
    WITH q AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(floor(list_cosine_similarity(q.v, c.embedding::DOUBLE[])
                        * 10000.0 + 0.5) AS BIGINT) AS cosine_e4
      FROM q JOIN embeddings c ON q.label = c.label AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_e4, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine_e4 DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: nprobe=1 within the precomputed cell (label) — the
    scale path: equi-join on cell co-locates candidates, cost drops from
    |Q|·|N| to Σ_cell |Q_c|·|N_c|."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return S.knn_ivf(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5)


def _ivf_kmeans_ctes(k: int = 8, iters: int = 3, dim: int = 64,
                     v_sql: str | None = None) -> str:
    """The Lloyd's-k-means CTE chain (one (assign, update) pair per
    iteration), reusable by every oracle that needs the trained model:
    ends with ``a{iters}`` = each corpus vector's final cell assignment
    (computed from the pre-update centroids, exactly like the Spark
    trainer's last loop pass) and ``c{iters}`` = the final centroids.
    Expects no leading WITH; starts at the ``v`` CTE. ``v_sql``
    overrides the training-set CTE body (must yield ``(id,
    embedding)``) — the default is the whole embeddings table."""
    prev = "c0"
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
    a{i} AS (
      SELECT id, cluster FROM (
        SELECT vd.id, c.cluster,
               ROW_NUMBER() OVER (PARTITION BY vd.id
                 ORDER BY SUM((vd.x - c.c) * (vd.x - c.c)), c.cluster) AS rn
        FROM vd JOIN {prev} c ON vd.dim = c.dim
        GROUP BY vd.id, c.cluster
      ) WHERE rn = 1
    ),
    c{i} AS (
      SELECT p.cluster, p.dim, COALESCE(u.m, p.c) AS c
      FROM {prev} p LEFT JOIN (
        SELECT a{i}.cluster, vd.dim, AVG(vd.x) AS m
        FROM a{i} JOIN vd ON a{i}.id = vd.id
        GROUP BY a{i}.cluster, vd.dim
      ) u ON p.cluster = u.cluster AND p.dim = u.dim
    )""")
        prev = f"c{i}"
    v_body = v_sql or "SELECT vec_id AS id, embedding FROM embeddings"
    return f"""
    v AS ({v_body}),
    vd AS (
      SELECT v.id, CAST(t.range AS INT) AS dim,
             CAST(v.embedding[CAST(t.range AS INT)] AS DOUBLE) AS x
      FROM v CROSS JOIN range(1, {dim + 1}) t
    ),
    seeds AS (
      SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT) AS cluster
      FROM (SELECT id FROM v ORDER BY id LIMIT {k})
    ),
    c0 AS (SELECT s.cluster, vd.dim, vd.x AS c
           FROM seeds s JOIN vd ON s.id = vd.id),{",".join(steps)}"""


def _ivf_kmeans_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Lloyd's k-means as chained CTEs: one (assign, update) CTE pair per
    iteration. The trainer is deterministic by design (k lowest-id seeds,
    fixed iteration count, argmin ties to the lowest cluster id) precisely
    so it CAN be oracled. Cross-engine float64 noise is ~1e-13 while the
    narrowest argmin margin on the test embeddings is 6.7e-6 (measured),
    so assignments agree exactly; centroid norms emit as 1e-4-scaled
    BIGINTs via the shared ``floor(x·1e4 + 0.5)`` tree (continuous-round
    lint, r9: the norm is sqrt-derived, so engine/Python round() on it is
    the ts_rolling_anomaly divergence class — Python's round() is even
    HALF-EVEN where DuckDB's is half-away)."""
    return f"""
    WITH {_ivf_kmeans_ctes(k, iters, dim)}
    SELECT s.cluster, s.n_vectors, n.centroid_norm_e4
    FROM (SELECT cluster, COUNT(*) AS n_vectors
          FROM a{iters} GROUP BY cluster) s
    JOIN (SELECT cluster,
                 CAST(floor(SQRT(SUM(c * c)) * 10000.0 + 0.5) AS BIGINT)
                   AS centroid_norm_e4
          FROM c{iters} GROUP BY cluster) n
    ON s.cluster = n.cluster
    """


@register("ivf_kmeans_train", oracle=_ivf_kmeans_sql())
def ivf_kmeans_train_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell TRAINING (closing the loop on `knn_cosine_ivf`, which
    searches within precomputed cells): deterministic Lloyd's k-means —
    lowest-id seeds, fixed 3 iterations, BLAS assignment via Arrow
    batches, explode+groupBy centroid update; only the k×d model crosses
    the driver (`operators/similarity.py:ivf_kmeans_train`). The fixed
    seeding + iteration count make the whole training loop expressible as
    chained CTEs, so the driver gets a FULL value-hash oracle (no query
    left on the weaker rows-only contract); semantics are additionally
    pinned by a NumPy-Lloyd's parity unit test. Returns per-cell sizes +
    1e-4-scaled BIGINT centroid norms (``floor(norm·1e4 + 0.5)`` — the
    same IEEE multiply+add+floor the oracle restates; the previous
    Python ``round()`` was HALF-EVEN over a sqrt-derived continuous
    double, the exact cross-engine divergence class the r8 lint closed
    on the JVM side) — deterministic across runs and layouts."""
    import math

    import numpy as np

    emb = load_tables(spark, sf_dir)["embeddings"]
    assigned, cents = S.ivf_kmeans_train(emb, k=8, iters=3)
    sizes = assigned.groupBy("cluster") \
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    norms = [(int(i),
              int(math.floor(float(np.linalg.norm(c)) * 10000.0 + 0.5)))
             for i, c in enumerate(cents)]
    ndf = local_df(
        spark, norms, "cluster int, centroid_norm_e4 long")
    return sizes.join(ndf, "cluster").select(
        "cluster", "n_vectors", "centroid_norm_e4")


def _hyperplane_sql(n_planes: int = 8, dim: int = 64) -> str:
    import hashlib

    def coef(j: int, d: int) -> int:
        return 1 if int(hashlib.md5(f"{j},{d}".encode())
                        .hexdigest()[0], 16) < 8 else -1

    sums = ", ".join(
        "list_sum(list_transform(range(1, {n}), d -> (CASE {cases} END) * v[d])) AS s{j}"
        .format(n=dim + 1, j=j, cases=" ".join(
            f"WHEN d = {d + 1} THEN {coef(j, d)}" for d in range(dim)))
        for j in range(n_planes))
    bucket = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
                        for j in range(n_planes))
    return f"""
    WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sums AS (SELECT vec_id, v, {sums} FROM vecs),
    bucketed AS (SELECT vec_id, v, {bucket} AS bucket FROM sums)
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           CAST(floor(list_cosine_similarity(a.v, b.v) * 10000.0 + 0.5)
                AS BIGINT) AS cosine_e4
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE CAST(floor(list_cosine_similarity(a.v, b.v) * 10000.0 + 0.5)
               AS BIGINT) >= 0
    """


@register("ann_hyperplane_lsh", oracle=_hyperplane_sql())
def ann_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH (the third ANN strategy, SURVEY §7.1 step 10):
    vectors bucket by the sign pattern of 8 md5-derived ±1 hyperplanes —
    P(same bucket) = (1 - θ/π)^8, so bucket-mates are angular neighbors —
    then exact cosine verification per bucket via one Gram matrix
    (applyInPandas). Both stages are Arrow-batched BLAS (assignment is one
    matmul per batch — no interpreted HOF folds); no stored model, no
    broadcast; bucket cardinality ~n/2^planes keeps cells executor-sized
    at any corpus scale. Verification scores emit as 1e-4-scaled BIGINTs
    (continuous-round lint, r9)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    bucketed = S.assign_hyperplane_buckets(
        emb.select("vec_id",
                   S.as_double(F.col("embedding")).alias("embedding")))
    return S.embedding_near_dup_pairs(bucketed, cell_col="bucket",
                                      threshold=0.0)


# --- text analysis -----------------------------------------------------------

# The quality_score formula restated once for every oracle that needs it
# (expects CTE columns toks = string_split(lower(text)), raw_toks =
# string_split(text)).
_QUALITY_SQL = """ROUND(
    0.5 * (len(list_distinct(toks)) / greatest(len(toks), 1))
    + 0.3 * (1.0 - len(list_filter(toks, x -> x IN ('the','a','is','of','and')))
                  / greatest(len(toks), 1))
    + 0.2 * least((list_sum(list_transform(raw_toks, t -> length(t)))
                   / greatest(len(raw_toks), 1)) / 8.0, 1.0), 6)"""


@register(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks,
             string_split(text, ' ') AS raw_toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           ROUND(len(list_distinct(toks)) / greatest(len(toks), 1), 6)
             AS distinct_ratio,
           ROUND(len(list_filter(toks, x -> x IN ('the','a','is','of','and')))
                 / greatest(len(toks), 1), 6) AS stop_ratio,
           ROUND(0.5 * (len(list_distinct(toks)) / greatest(len(toks), 1))
               + 0.3 * (1.0 - len(list_filter(toks, x -> x IN ('the','a','is','of','and')))
                             / greatest(len(toks), 1))
               + 0.2 * least((list_sum(list_transform(raw_toks, t -> length(t)))
                              / greatest(len(raw_toks), 1)) / 8.0, 1.0), 6)
             AS quality
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length/stopword/diversity heuristics): the corpus-
    gating filter family. Pure column math, codegen'd, no shuffle."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        TA.token_count(F.col("text")).alias("n_tokens"),
        F.round(TA.distinct_token_ratio(F.col("text")), 6).alias("distinct_ratio"),
        F.round(TA.stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
        TA.quality_score(F.col("text")).alias("quality"),
    )


@register(
    "lang_id_heuristic",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
               FROM documents)
    SELECT doc_id, lang AS lang_declared,
           CASE WHEN len(list_filter(toks, x -> x IN ('the','a','is','of','and')))
                     / greatest(len(toks), 1) > 0.02
                THEN 'en' ELSE 'und' END AS lang_pred
    FROM t
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit argmax with 2% floor). The
    synthetic vocabulary is English-ish, so the operator predicts en/und;
    the declared lang column rides along for agreement analysis."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id", F.col("lang").alias("lang_declared"),
        TA.lang_id(F.col("text")).alias("lang_pred"),
    )


@register(
    "token_count_profile",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_ish_tokens,
           n_chars
    FROM documents
    """,
)
def token_count_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex token proxy —
    the per-doc budget accounting every training pipeline needs."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        TA.token_count(F.col("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), F.lit(0)))
         .alias("bpe_ish_tokens"),
        "n_chars",
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 of the normalized text (the exact-dedup
    / provenance key)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select("doc_id",
                       TA.fingerprint_md5(F.col("text")).alias("fingerprint"))


@register(
    "corpus_curation",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, lang, text FROM documents WHERE doc_id % 2 = 0
    ),
    fp AS (
      SELECT doc_id, lang, text,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
      FROM corpus
    ),
    keep AS (SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY f),
    t AS (
      SELECT fp.doc_id, fp.lang,
             string_split(lower(fp.text), ' ') AS toks,
             string_split(fp.text, ' ') AS raw_toks
      FROM fp JOIN keep ON fp.f = keep.f AND fp.doc_id = keep.keep_id
    )
    SELECT doc_id, lang, {_QUALITY_SQL} AS quality
    FROM t
    WHERE lang = 'en' AND {_QUALITY_SQL} >= 0.5
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus curation pass — what an LLM data
    pipeline actually runs before tokenization: exact-dedup (min-id
    winner per content fingerprint, duplicate mutants dropped) ∩
    language gate (en) ∩ quality gate (score ≥ 0.5). One fingerprint
    shuffle + one broadcast-able keep-set join + pure column math; every
    stage is an operator verified on its own elsewhere, composed here
    end-to-end."""
    from dig_etl_engine_spark.operators.text_analysis import fingerprint_md5

    docs = load_tables(spark, sf_dir)["documents"] \
        .select("doc_id", "lang", "text")
    mut = (docs.filter(F.col("doc_id") % 2 == 0)
           .select((F.col("doc_id") + 100000).alias("doc_id"),
                   "lang", "text"))
    corpus = docs.unionByName(mut) \
        .withColumn("f", fingerprint_md5(F.col("text")))
    keep = corpus.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    winners = corpus.join(
        keep, (corpus["f"] == keep["f"])
        & (corpus["doc_id"] == keep["keep_id"])).drop("keep_id")
    quality = TA.quality_score(F.col("text"))
    return (winners
            .withColumn("quality", quality)
            .filter((F.col("lang") == "en") & (F.col("quality") >= 0.5))
            .select("doc_id", "lang", "quality"))


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang,
           ('0x' || substr(md5('s|' || doc_id::VARCHAR), 1, 8))::BIGINT
             % 100 AS bucket
    FROM documents
    WHERE ('0x' || substr(md5('s|' || doc_id::VARCHAR), 1, 8))::BIGINT % 100
          < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mix design:
    per-stratum rates (en 50%, others 10%) applied via a content-hash
    bucket, NOT rand() — the sample is reproducible across runs, engines
    and partitionings, and sampling joins/unions stay consistent (the
    same doc is always in or always out). Pure column math over the
    scan; no shuffle."""
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit("s|"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 100).alias("bucket")
    rate = F.when(F.col("lang") == "en", 50).otherwise(10)
    return (docs.select("doc_id", "lang", bucket)
            .filter(F.col("bucket") < rate))


@register(
    "line_repetition_filter",
    oracle="""
    WITH lined AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(
               text || chr(10) || CASE WHEN doc_id % 3 = 0
                    THEN 'dup line' || chr(10) || 'dup line' || chr(10)
                         || 'dup line'
                    ELSE 'uniq tail ' || doc_id::VARCHAR END,
               chr(10)), l -> trim(l)), l -> l <> '') AS lines
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(lines) <= 1 THEN 0.0
                ELSE ROUND(1.0 - len(list_distinct(lines)) / len(lines), 6)
           END AS rep_ratio
    FROM lined
    """,
)
def line_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring (the C4/Gopher repeated-lines
    quality gate): docs where doc_id % 3 = 0 get three planted duplicate
    lines appended and must score a positive repetition ratio; others get
    a unique tail and stay near 0. Pure column math over the scan."""
    docs = load_tables(spark, sf_dir)["documents"]
    tail = F.when(
        F.col("doc_id") % 3 == 0,
        F.lit("dup line\ndup line\ndup line")
    ).otherwise(F.concat(F.lit("uniq tail "),
                         F.col("doc_id").cast("string")))
    txt = F.concat(F.col("text"), F.lit("\n"), tail)
    return docs.select(
        "doc_id", TA.line_repetition_ratio(txt).alias("rep_ratio"))


@register(
    "sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, doc_id % 32 AS bucket,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
               AS cum
      FROM toks
    )
    SELECT doc_id, bucket, n_tokens,
           floor((cum - n_tokens) / 2048)::BIGINT AS seq_id
    FROM packed
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing via `operators/text_analysis.py:pack_sequences`
    with the bucket count PINNED to 32 so the oracle SQL is stable; the
    operator itself defaults n_buckets to the cluster's
    defaultParallelism so the packing stage scales its task count with
    the cluster instead of capping at a constant."""
    docs = load_tables(spark, sf_dir)["documents"]
    return TA.pack_sequences(docs, budget=2048, n_buckets=32)


def _pii_sql() -> str:
    from dig_etl_engine_spark.functions.extractors import (
        EMAIL_RE, IP_RE, PHONE_RE)

    txt = ("'reach me at user' || doc_id::VARCHAR || "
           "'@mail.example.com or +1 (213) 555-' || "
           "lpad((doc_id % 10000)::VARCHAR, 4, '0') || "
           "' host 10.0.' || (doc_id % 256)::VARCHAR || '.7 ok ' || text")
    return f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace({txt},
             '{EMAIL_RE}', '[EMAIL]', 'g'),
             '{IP_RE}', '[IP]', 'g'),
             '{PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM documents
    """


@register("pii_redaction", oracle=_pii_sql())
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: planted email + phone + IPv4 per doc,
    all three replaced by typed placeholders in one native
    regexp_replace chain (`operators/text_analysis.py:redact_pii`). The
    oracle replays the identical pattern chain with DuckDB's 'g' flag —
    both engines run RE2-compatible syntax, so the replacements agree
    byte-for-byte."""
    docs = load_tables(spark, sf_dir)["documents"]
    txt = F.concat(
        F.lit("reach me at user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1 (213) 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" host 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ok "), F.col("text"))
    return docs.select("doc_id", TA.redact_pii(txt).alias("redacted"))


# --- multimodal --------------------------------------------------------------


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           n_chars AS n_bytes,
           lower(hex(substr(text, 1, 4))) AS header_hex,
           md5(text) AS feature_md5
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary plumbing: text bytes stand in for an image payload;
    mapInPandas (Arrow batches) computes length/header/md5 'features' — the
    exact batch path a real decoder plugs into (decode itself stubbed:
    operators/multimodal.py). The oracle recomputes the features from the
    source column, so the binary round-trip through Arrow is what's
    verified."""
    docs = load_tables(spark, sf_dir)["documents"]
    assets = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return extract_features(assets)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, duration_ms,
           unnest(list_transform(
             range(0, greatest(floor(duration_ms / 1000)::INT, 1)),
             i -> i * 1000))::BIGINT AS sample_ms
    FROM (SELECT doc_id, ((n_chars * 13 % 5000) + 500)::DOUBLE
                 AS duration_ms
          FROM documents)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (`operators/multimodal.py:
    frame_sample_plan`): one row per sampled timestamp at 1 fps, at least
    one frame per asset. The explode is narrow — sampled rows stay in
    their source partition, so decode parallelism follows data size; the
    decode itself is the stubbed step, the fan-out plan is what's
    verified."""
    from dig_etl_engine_spark.operators.multimodal import frame_sample_plan

    docs = load_tables(spark, sf_dir)["documents"]
    assets = docs.select(
        "doc_id",
        ((F.col("n_chars") * 13 % 5000) + 500).cast("double")
        .alias("duration_ms"))
    plan = frame_sample_plan(assets, every_ms=1000)
    return plan.select("doc_id", "duration_ms",
                       F.col("sample_ms").cast("long").alias("sample_ms"))


@register(
    "multimodal_webdataset_roundtrip",
    oracle="""
    SELECT doc_id,
           n_chars AS n_bytes,
           lower(hex(substr(text, 1, 4))) AS header_hex,
           md5(text) AS feature_md5
    FROM documents
    """,
)
def multimodal_webdataset_roundtrip(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """The multimodal storage loop closed end-to-end: binary payloads
    (text bytes standing in for images) exported as WebDataset tar
    members (`sinks/webdataset.py`, NULL text → binary-only samples),
    streamed back through `binaryFile` + Arrow member re-grouping, and
    pushed through the decode-stub feature extractor
    (`operators/multimodal.py:extract_features`). The oracle recomputes
    the features from the SOURCE column, so every byte must survive
    Arrow → tar → Arrow untouched for the md5 'features' to hash-match
    — the strongest binary-integrity check the driver can express."""
    from dig_etl_engine_spark.operators.multimodal import extract_features
    from dig_etl_engine_spark.queries_io import _scratch
    from dig_etl_engine_spark.sinks.webdataset import (
        read_webdataset, write_webdataset)
    docs = load_tables(spark, sf_dir)["documents"]
    assets = docs.select(
        "doc_id", F.lit(None).cast("string").alias("text"),
        F.encode(F.col("text"), "UTF-8").alias("payload"))
    path = _scratch("webdataset_mm")
    write_webdataset(assets, path, bin_col="payload", bin_ext="bin",
                     n_shards=8).collect()
    back = read_webdataset(spark, path)
    return extract_features(
        back.select(F.col("key").cast("long").alias("doc_id"),
                    F.col("bins")["bin"].alias("payload")))
