"""Link-graph operators for corpus quality scoring.

PageRank over a document/host citation graph is the classic web-corpus
quality prior (Page et al. 1999; CommonCrawl-derived corpora rank hosts
this way to pick crawl frontiers and down-weight link farms). The dedup
cluster step (`operators/dedup.py:connected_components`) covers the
undirected case; this module adds the directed, weighted-propagation
case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.pin import pin


def pagerank(edges: DataFrame, *, iters: int = 5, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             round_digits: int = 6) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list:
    ``r'(v) = (1-d)/N + d · Σ_{u→v} r(u)/out(u)``.

    FIXED iteration count (not convergence-tested) for the same reason
    ``similarity.ivf_kmeans_train`` fixes its loop: the whole
    computation becomes replayable arithmetic — same data in, same ranks
    out, on any engine or partitioning — so the driver can value-hash it
    against an unrolled SQL oracle. Dangling mass (vertices with no
    out-edges) is dropped, not redistributed — the simplified variant;
    ranks then sum to < 1 when dangling vertices exist, which is fine
    for a quality PRIOR where only the ordering matters. Parallel edges
    count once per occurrence (multigraph semantics).

    Returns ``(v, rank)`` for every vertex on either edge side.

    Shape per iteration: one equi-join of the edge list against the
    current rank table (both keyed on the source vertex — at warehouse
    scale pre-bucket both on vertex id and the join runs exchange-free)
    and one map-side-combined groupBy(dst). The rank table is
    |V| two-column rows, never collected; ``localCheckpoint`` truncates
    the doubling lineage each round exactly like
    ``dedup.connected_components`` (measured there: re-planning the
    full history dominates by round 2). N is the single driver scalar.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
    # eager=False (r12): count() is a full action and materializes the
    # lazy checkpoint in the same job (the connected_components entry
    # fusion); ``ed`` materializes during the caller's first action —
    # the pin is a LogicalRDD leaf either way, so the loop's lineage
    # truncation is unchanged, only the extra pin jobs are gone.
    verts = (e.select(F.col("u").alias("v"))
             .union(e.select(F.col("w").alias("v")))
             .distinct().transform(pin, eager=False))
    n = verts.count()
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "u").transform(pin, eager=False)

    ranks = verts.select("v", F.lit(1.0 / n).alias("r"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (ed.join(ranks, ed["u"] == ranks["v"])
                   .select(F.col("w").alias("v"),
                           (F.col("r") / F.col("deg")).alias("c"))
                   .groupBy("v").agg(F.sum("c").alias("s")))
        ranks = (verts.join(contrib, "v", "left")
                 .select("v", (F.lit(base) + damping
                               * F.coalesce(F.col("s"), F.lit(0.0)))
                         .alias("r"))
                 .transform(pin, eager=False))
    return ranks.select("v", F.round("r", round_digits).alias("rank"))


def label_propagation(edges: DataFrame, *, iters: int = 4,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.
    2007) over the UNDIRECTED graph of ``edges`` — the cheap community
    detector used on link/host graphs to find mutually-citing clusters
    (spam rings, mirror farms) that PageRank alone only down-weights.

    Determinism over convergence, same doctrine as :func:`pagerank`:
    every vertex starts labeled with itself; each round it adopts the
    label that is most frequent among its neighbors, ties broken by the
    SMALLEST label — synchronous updates plus a total tie order make
    the whole run replayable arithmetic (an unrolled SQL oracle can
    value-hash it), at the cost that bipartite structures may oscillate
    rather than converge within the fixed rounds. Parallel edges count
    once per occurrence (multigraph weights).

    Returns ``(v, community)`` for every vertex on either edge side.

    Shape per round: one vertex-keyed equi-join (neighbor labels), one
    map-side-combined groupBy((v, label)), and one per-vertex argmax
    window — all keyed on vertex id, so pre-bucketed storage runs the
    joins exchange-free; `localCheckpoint` truncates the doubling
    lineage each round exactly like `connected_components`."""
    from pyspark.sql import Window as W

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
    # eager=False (r12): materializes during the caller's first action
    # (see pagerank) — one fewer job, identical LogicalRDD leaf.
    bidir = (e.union(e.select(F.col("w").alias("u"),
                              F.col("u").alias("w")))
             .transform(pin, eager=False))
    labels = (bidir.select(F.col("u").alias("v")).distinct()
              .select("v", F.col("v").alias("lbl")))
    rn = F.row_number().over(
        W.partitionBy("v").orderBy(F.desc("n"), F.asc("lbl")))
    for _ in range(iters):
        nbr = (bidir.join(labels, bidir["u"] == labels["v"])
               .select(F.col("w").alias("v"), "lbl"))
        counts = nbr.groupBy("v", "lbl").agg(F.count(F.lit(1)).alias("n"))
        labels = (counts.withColumn("rn", rn).filter(F.col("rn") == 1)
                  .select("v", "lbl").transform(pin, eager=False))
    return labels.select("v", F.col("lbl").alias("community"))
