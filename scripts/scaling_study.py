"""Scaling study: run the heavy operator families on 1x/4x/16x
replicas of the sf0.1 corpus and report how wall time grows.

The registry bench (bench.py) fixes the data size; this script is the
evidence for the 100 TB story — each operator's cost curve should be
~linear (or n·log n) in corpus size if the plan shapes are right. A
super-linear curve means a quadratic candidate set, a driver
bottleneck, or a broadcast that stopped fitting.

Replication: doc_id gets a disjoint offset per copy and a per-copy
suffix token is appended to the text, so replicas are NEAR-dups (same
shingle mass, distinct fingerprints) — the worst case for dedup
families, not the trivial exact-collapse case.

Usage:  python scripts/scaling_study.py [ks] [op1,op2,...]
(ks default "1,4,16"; the optional op list restricts the run to those
kernels and materializes only their inputs). Writes one JSON line per
(op, k) to stdout and a summary table at the end. Uses /tmp scratch;
safe to re-run.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dig_etl_engine_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def scaled_docs(spark, k: int):
    base = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text", "lang", "source")
    parts = [base]
    for i in range(1, k):
        parts.append(base.select(
            (F.col("doc_id") + 1000000 * i).alias("doc_id"),
            F.concat("text", F.lit(f" copytag{i}")).alias("text"),
            "lang", "source"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_embeddings(spark, k: int):
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    parts = [base]
    for i in range(1, k):
        parts.append(base.select(
            (F.col("vec_id") + 1000000 * i).alias("vec_id"),
            F.transform("embedding",
                        lambda x: x + F.lit(float(i)) * 1e-4)
            .alias("embedding"),
            "label"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_embeddings_cells(spark, k: int, dup: int = 8):
    """k replicas with BOTH vec_id and label (the cell key) shifted into
    disjoint ranges — cell COUNT grows k×, cell SIZE stays constant.
    This is the contract scale axis for the within-cell pairwise kernels
    (`embedding_near_dup_pairs` / the incremental variant): at 100 TB the
    IVF partitioning bounds cell size, so corpus growth means more cells,
    not bigger Gram matrices. (`scaled_embeddings` deliberately does NOT
    shift labels — it is the axis for the probe-side KNN kernels whose
    corpus per cell does grow.)

    ``dup`` perturbed within-cell copies inflate each cell from the toy
    sf0.1 size (200) to an IVF-realistic one (1600 at the default), so
    the per-cell Gram actually costs something and the planted near-dup
    mass keeps the output non-vacuous at any threshold."""
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    parts = []
    for i in range(k):
        for j in range(dup):
            parts.append(base.select(
                (F.col("vec_id") + 1000000 * (i * dup + j) + 1)
                .alias("vec_id"),
                F.transform("embedding",
                            lambda x: x + F.lit(float(i * dup + j)) * 1e-4)
                .alias("embedding"),
                (F.col("label") + 1000 * i).alias("label")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _key_shifted_replicas(base, key_col: str, k: int,
                          offset: int = 10_000_000):
    """k copies of ``base`` with ``key_col`` shifted into disjoint
    ranges per replica — the relational-table replication counterpart of
    scaled_docs' near-dup text replicas."""
    rest = [c for c in base.columns if c != key_col]
    out = base
    for i in range(1, k):
        out = out.unionByName(base.select(
            (F.col(key_col) + offset * i).alias(key_col), *rest))
    return out


def scaled_lineitem(spark, k: int):
    return _key_shifted_replicas(
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_extendedprice"),
        "l_orderkey", k)


def scaled_orders(spark, k: int):
    return _key_shifted_replicas(
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_totalprice"),
        "o_orderkey", k)


def scaled_events(spark, k: int):
    """k copies of events with event_id AND user_id shifted into
    disjoint ranges per replica: more users at the same per-user
    series length — the scale axis a per-key window operator actually
    meets in production (key count grows, frame length does not)."""
    base = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_id", "ts", "user_id", "value")
    out = base
    for i in range(1, k):
        out = out.unionByName(base.select(
            (F.col("event_id") + 10_000_000 * i).alias("event_id"),
            "ts",
            (F.col("user_id") + 1_000_000 * i).alias("user_id"),
            "value"))
    return out


def ops(spark, docs_path: str, emb_path: str):
    """(name, thunk) pairs over MATERIALIZED scaled tables — the read
    is part of the timing, like bench.py."""
    from dig_etl_engine_spark.operators import dedup as D
    from dig_etl_engine_spark.operators import similarity as S
    from dig_etl_engine_spark.operators import text_analysis as TA
    from dig_etl_engine_spark.operators.sketches import kmv_source_overlap

    def docs():
        return spark.read.parquet(docs_path)

    def emb():
        return spark.read.parquet(emb_path)

    return [
        ("dedup_exact", lambda: D.exact_dedup(docs(), "text").count()),
        ("dedup_minhash_lsh",
         lambda: D.minhash_lsh_pairs(docs(), "text", threshold=0.5).count()),
        ("dedup_corpus",
         lambda: D.dedup_corpus(docs(), "text", threshold=0.5).count()),
        ("global_line_dedup",
         lambda: TA.global_line_dedup(docs()).count()),
        ("gopher_gates",
         lambda: docs().select(
             TA.gopher_gates(F.col("text")).alias("g")).count()),
        ("bpe_train_merges",
         lambda: TA.bpe_train_merges(docs(), n_merges=8).count()),
        ("kmv_source_overlap",
         lambda: kmv_source_overlap(docs(), k=128).count()),
        ("knn_cosine_ivf",
         lambda: S.knn_ivf(emb().limit(10), emb(), k=10).count()),
        ("ann_hyperplane_lsh",
         lambda: S.assign_hyperplane_buckets(emb(), n_planes=16).count()),
        ("tfidf_keywords",
         lambda: TA.tfidf_keywords(docs(), k=5).count()),
    ]


def cell_pair_ops(spark, emb_cells_path: str):
    """Round-9 kernel: the within-cell pairwise cosine operator whose
    prefilter moved to the exact quantized predicate. Scale axis = cell
    count at constant cell size (`scaled_embeddings_cells`) — expected
    ~linear: one shuffle groups cells, each cell is one constant-size
    BLAS Gram matrix, and the quantized prefilter is a vectorized
    floor+compare over the same sims block the margin compare scanned."""
    from dig_etl_engine_spark.operators import similarity as S

    def emb_cells():
        return spark.read.parquet(emb_cells_path)

    return [("embedding_near_dup_pairs",
             # 0.99 catches only the planted perturbed copies; measured
             # output stays non-vacuous (a 0-row timing proves nothing)
             lambda: S.embedding_near_dup_pairs(
                 emb_cells(), threshold=0.99).count())]


def event_ops(spark, ev_path: str):
    """Round-8 addendum kernel: the event-time window operator behind
    `ts_rolling_anomaly` (partition-by-user RANGE frame over int64
    epoch-micros, exact SUM/SUMSQ/COUNT). Scaling axis = user count at
    constant per-user series length, so expected growth is the window
    exchange's ~n·log n; a super-linear curve would mean the frame is
    rescanning instead of sliding."""
    from dig_etl_engine_spark.timeseries import convert as C

    def ev():
        return spark.read.parquet(ev_path)

    return [("rolling_anomaly",
             lambda: C.rolling_anomaly(ev()).count())]


def layout_ops(spark, li_path: str, ord_path: str, scratch: str):
    """Round-7 kernels over the scaled lineitem/orders replicas: the
    Z-order clustered write (one range shuffle + sort — should track
    the shuffle's n·log n) and the Bloom-pruned join (build aggregate +
    pruned probe — ~linear, with a CONSTANT 8 KiB collect)."""
    from dig_etl_engine_spark.operators.layout import (
        read_zorder_clustered, write_zorder_clustered)
    from dig_etl_engine_spark.operators.runtime_filter import (
        bloom_pruned_join)

    def li():
        return spark.read.parquet(li_path)

    def orders():
        return spark.read.parquet(ord_path)

    def zorder():
        path = f"{scratch}/li_z"
        write_zorder_clustered(li(), path, ["l_orderkey", "l_partkey"],
                               bits=8, num_files=16)
        return read_zorder_clustered(spark, path).count()

    def bloom():
        build = orders().filter(F.col("o_totalprice") > 400000)
        return bloom_pruned_join(li(), build, probe_key="l_orderkey",
                                 build_key="o_orderkey").count()

    return [("zorder_cluster_write", zorder),
            ("bloom_prejoin_prune", bloom)]


def table_ops(spark, table_path: str, k: int):
    """r11 kernel: the bucketed KG table's per-batch merge cost under
    the doctrine that bucket SIZE, not bucket count, stays constant as
    a table grows (the table is built with ``buckets=16*k`` — the
    rebucket-as-you-grow contract). A FIXED 100-row batch then merges
    into the k-scaled table; the O(touched-bucket-data) claim predicts
    a ~FLAT curve across k (the batch touches ≤100 buckets of constant
    size; only the manifest commit and the bucket-dir reads ride
    along). A curve tracking k would mean the merge secretly rereads
    or rewrites O(table). The table itself is built untimed in
    run_single's input-materialization step."""
    from dig_etl_engine_spark.sinks.kg_table import upsert_partitioned

    def merge():
        rows = [(10**9 + i, f"fresh doc {i}", "en", "s0", 10**9 + i)
                for i in range(100)]
        batch = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, kafka_offset long")
        upsert_partitioned(spark, table_path, batch, buckets=16 * k)
        return len(rows)

    return [("upsert_partitioned_merge_scale", merge)]


def run_single(k: int) -> None:
    """One scale factor in THIS process — invoked in a fresh
    subprocess per k by main(), which is the methodology SCALING.md
    documents (a shared session accumulates localCheckpoint blocks and
    cache entries across runs and inflates late measurements)."""
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen/Arrow warmup so the first op isn't inflated by
    # first-run overhead (which would distort the growth ratios)
    wdocs = scaled_docs(spark, 1)
    wdocs.count()
    from dig_etl_engine_spark.operators import dedup as _D
    _D.exact_dedup(wdocs, "text").count()
    droot = f"/tmp/spark_graft_scale/x{k}"
    dp, ep = f"{droot}/documents.parquet", f"{droot}/embeddings.parquet"
    lp, op = f"{droot}/lineitem.parquet", f"{droot}/orders.parquet"
    evp = f"{droot}/events.parquet"
    ecp = f"{droot}/emb_cells.parquet"
    only = None
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
    ktp = f"{droot}/kg_table"
    every = (ops(spark, dp, ep) + layout_ops(spark, lp, op, droot)
             + event_ops(spark, evp) + cell_pair_ops(spark, ecp)
             + table_ops(spark, ktp, k))
    if only is not None:
        unknown = only - {n for n, _ in every}
        if unknown:
            # a typo'd op name must fail loudly — a silently-empty run
            # prints a clean summary that reads as a completed study
            raise SystemExit(
                f"scaling_study: unknown op(s) {sorted(unknown)}; "
                f"known: {sorted(n for n, _ in every)}")
    todo = [(n, f) for n, f in every if only is None or n in only]
    names = {n for n, _ in todo}
    emb_ops = {"knn_cosine_ivf", "ann_hyperplane_lsh"}
    layout_names = {"zorder_cluster_write", "bloom_prejoin_prune"}
    cell_names = {"embedding_near_dup_pairs"}
    if only is None or names - emb_ops - layout_names - cell_names \
            - {"rolling_anomaly"}:
        scaled_docs(spark, k).write.mode("overwrite").parquet(dp)
    if only is None or emb_ops & names:
        scaled_embeddings(spark, k).write.mode("overwrite").parquet(ep)
    if only is None or layout_names & names:
        scaled_lineitem(spark, k).write.mode("overwrite").parquet(lp)
        scaled_orders(spark, k).write.mode("overwrite").parquet(op)
    if only is None or "rolling_anomaly" in names:
        scaled_events(spark, k).write.mode("overwrite").parquet(evp)
    if only is None or cell_names & names:
        scaled_embeddings_cells(spark, k).write.mode("overwrite") \
            .parquet(ecp)
    if only is None or "upsert_partitioned_merge_scale" in names:
        # untimed table build at bucket count 16*k (constant bucket
        # size across k — the rebucket-as-you-grow doctrine); a fresh
        # build per run so reruns don't accrete merged batches
        import shutil as _sh

        from dig_etl_engine_spark.sinks.kg_table import (
            upsert_partitioned)
        _sh.rmtree(ktp, ignore_errors=True)
        # (the docs parquet is always materialized by the first block:
        # this kernel's name is outside every exclusion set there)
        upsert_partitioned(
            spark, ktp,
            spark.read.parquet(dp)
            .withColumn("kafka_offset", F.col("doc_id")),
            buckets=16 * k)
    for name, fn in todo:
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 3)
        print(json.dumps({"op": name, "k": k, "sec": dt, "rows": n}),
              flush=True)


def main() -> None:
    import subprocess

    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        run_single(int(sys.argv[2]))
        return
    # usage: scaling_study.py [ks] [op1,op2,...]  — the op subset runs
    # only those kernels (and materializes only their inputs)
    ks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                           else "1,4,16").split(",")]
    op_filter = sys.argv[2] if len(sys.argv) > 2 else None
    results: dict[str, dict[int, float]] = {}
    for k in ks:
        cmd = [sys.executable, __file__, "--single", str(k)]
        if op_filter:
            cmd.append(op_filter)
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              check=True)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            results.setdefault(d["op"], {})[d["k"]] = d["sec"]
            print(line, flush=True)
    print("\n| op | " + " | ".join(f"x{k}" for k in ks)
          + (" | time growth |" if len(ks) > 1 else " |"))
    print("|---|" + "---|" * (len(ks) + (1 if len(ks) > 1 else 0)))
    data_growth = ks[-1] // ks[0] if ks[0] else ks[-1]
    for name, row in results.items():
        line = f"| {name} | " + " | ".join(f"{row[k]:.2f}s" for k in ks)
        if len(ks) > 1:
            ratio = round(row[ks[-1]] / row[ks[0]], 2)
            line += f" | {ratio}× over {data_growth}× data |"
        else:
            line += " |"
        print(line)


if __name__ == "__main__":
    main()
