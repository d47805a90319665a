"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs after a warm-up pass of the session (JVM + catalog),
timed end-to-end including the action (count of the result) — the honest
cost of planning + execution + any Python-side stages.

Measurement protocol knobs (r9, after two rounds of sub-second queries
swinging ±2x run-to-run on this VM — VERDICT r8 "settle the bench drift
with data"):
  SPARK_GRAFT_BENCH_RUNS  repeats per query (default 5; min-of-2 could
                          not resolve a 1.4x signal at 0.3 s scale)
  SPARK_GRAFT_BENCH_STAT  "median" (default — robust against one slow
                          AND one lucky run; runs one untimed warm-up
                          execution per query first, without which the
                          sweep-order-first queries sample the session's
                          codegen ramp into their median, r9
                          adjudication) or "min" (steady-state cost,
                          what a long-lived cluster amortizes to).

The DEFAULT is median-of-5-with-warm-up as of r10 (VERDICT r9 item 2):
r9 recorded min-of-3 in the driver artifact while the README argued
median-of-5 was the code-representative protocol — two numbers for one
claim. One protocol, recorded in the artifact's ``protocol`` field, ends
that. Historical lines: no field = min-of-2 (r7/r8); r9 = min-of-3.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: one representative per operator family (join/agg heavy ones
# dominate runtime at scale; extraction/LLM ops exercise the UDF paths).
HEADLINE = [
    "agg_pricing_summary",
    "join_top_orders",
    "join_region_revenue",
    "facet_terms_agg",
    "upsert_last_write_wins",
    "coarse_search_rank",
    "coarse_search_rank_materialized",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "knn_cosine_bruteforce",
    "knn_cosine_ivf",
    "ann_hyperplane_lsh",
    "text_quality_score",
    "ts_impute_forward_fill",
    # round-3 additions: the paths whose plans changed this round
    "sessionize_events",          # full-precision gap + windowed session ids
    "search_bm25_rank",           # stats now read from the materialized build
    "join_asof_rates",            # native-type tolerance gate
    "sequence_packing",           # parameterized bucket streams
    # round-4 additions: the newly-registered curation surface
    "dedup_corpus",               # composed exact->LSH->CC labeling
    "global_line_dedup",          # C4 line dedup (map-side-combined groupBy)
    "decontaminate_eval_overlap", # broadcast eval-gram semi-join
    "knn_ivf_indexed",            # persisted partition-pruned IVF probe
    "incremental_minhash_dedup",  # O(batch) dedup vs persisted band index
    "corpus_curation_full",       # the composed identity pipeline
    "ngram_lm_perplexity",        # trigram-LM counting + keyed join
    "repeated_window_dedup",      # approximate-ExactSubstr window counts
    # round-4b additions: the data-selection surface
    "semdedup",                   # learned-cluster semantic prune
    "dsir_weights",               # hashed-bucket importance LMs
    # round-4c additions: tokenizer training + sketch/join/rollup paths
    "bpe_train_merges",           # 8-iteration merge trainer (k-means-style
                                  # 1-row argmax collect per round — job
                                  # round-trips dominate at this SF)
    "kmv_source_overlap",         # bottom-k sketches + pairwise estimate
    "dedup_exact_normalized",     # CCNet normalize chain + md5 groupBy
    "join_interval_overlap",      # double-sided bucket fan-out equi-join
    "ts_downsample_ohlc",         # one-exchange OHLC time-bucket rollup
    # round-6 additions: the new capability surface
    "src_avro_roundtrip",         # pure-Python Avro container write+read
    "stream_e2e_curation",        # stateful-dedup -> decontaminate -> merge
                                  # -> rank composed streaming pipeline
    # round-7 additions: data-layout + runtime-filter surface
    "zorder_cluster_write",       # Morton-clustered write + read-back agg
    "bloom_prejoin_prune",        # bitset-pruned probe side pre-shuffle
]


def _calibrate(spark) -> float:
    """Host-window calibration anchor (r10 verdict item 4): a fixed
    pure-CPU kernel — bit_xor of xxhash64 over 400M generated longs at
    pinned parallelism 8, no I/O, no shuffle (xor, not sum: the session
    runs ANSI and summing 64-bit hashes overflows long; 400M so the
    reading is hundreds of ms, above scheduling jitter) — timed
    median-of-3 after one warm-up. Cross-round comparisons divide query times by this anchor
    to separate host drift (the 40-55 s total envelope this VM has
    shown since r6, both directions) from code signal: the kernel's
    work is identical every round, so its movement IS the host window.
    Recorded in the artifact's ``protocol.calibration_sec``."""
    import statistics

    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        spark.range(0, 400_000_000, 1, 8).select(
            F.bit_xor(F.xxhash64("id"))).collect()
        return time.perf_counter() - t0

    once()  # codegen warm-up, untimed
    return round(statistics.median(once() for _ in range(3)), 3)


def _calibrate_driver() -> float:
    """Second anchor (r12, "not yet optimized" item 5 of the r12 notes):
    the 8-way-parallel JVM kernel above under-measures SINGLE-THREAD
    driver weather, yet a large share of each query's bench time is
    driver-side Python (query construction + py4j round trips), which
    scales with single-core interpreter speed, not executor throughput.
    A fixed pure-Python LCG loop — no JVM, no I/O, deterministic —
    timed median-of-3. Construction-bound queries should be normalized
    by THIS anchor in cross-round comparisons; executor-bound ones by
    ``calibration_sec``."""
    import statistics

    def once() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x = (x * 1103515245 + i) & 0xFFFFFFFF
        return time.perf_counter() - t0

    once()  # interpreter/branch warm-up, untimed
    return round(statistics.median(once() for _ in range(3)), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # argv names = isolated adjudication run (a drift reading is judged
    # on an idle host with ONLY the query under test in the sweep, the
    # protocol the r8/r9 drift rulings were held to); no argv = full
    # headline sweep, the driver's recorded artifact. Validated BEFORE
    # the session boots so a typo fails instantly, not after a full
    # JVM startup + table warm-up.
    selected = sys.argv[1:] or HEADLINE
    unknown = [n for n in selected if n not in HEADLINE]
    if unknown:
        raise SystemExit(f"not in HEADLINE: {unknown}")

    from dig_etl_engine_spark.session import get_spark
    from dig_etl_engine_spark import queries as registry

    spark = get_spark("bench")
    qmap = registry.queries()

    # Warm-up: touch the catalog once so JVM/codegen startup isn't billed
    # to the first query.
    from dig_etl_engine_spark.catalog import load_tables
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    stat = os.environ.get("SPARK_GRAFT_BENCH_STAT", "median")
    if stat not in ("min", "median"):
        # a typo must not silently demote a median adjudication to
        # min-of-N while the protocol field records the typo as applied
        raise SystemExit(f"SPARK_GRAFT_BENCH_STAT={stat!r}: "
                         "expected 'min' or 'median'")

    timings: dict[str, float] = {}
    for name in selected:
        fn = qmap.get(name)
        if fn is None:
            if sys.argv[1:]:
                # an explicitly-requested adjudication must not degrade
                # to an empty artifact when HEADLINE and the registry
                # drift — fail loudly instead of recording a vacuous
                # reading
                raise SystemExit(f"{name}: in HEADLINE but not in the "
                                 "registry — HEADLINE is stale")
            continue
        # UI-readability label (guide §1.5) — set OUTSIDE the timed
        # region, one py4j call per query, thread-local.
        spark.sparkContext.setJobDescription(f"bench:{name}")
        # min-of-N: steady-state cost (the first run pays
        # codegen/broadcast warm-up that a long-lived cluster amortizes
        # away); median mode (default) for representative readings.
        # Median mode additionally runs one UNTIMED warm-up execution
        # per query: the queries at the HEAD of the sweep otherwise
        # sample the session's codegen/Arrow-pool ramp into every one
        # of their consecutive timed runs, and the median keeps it —
        # the r9 adjudication measured agg_pricing_summary at 1.03 s
        # median in sweep position 1 vs 0.48 s median isolated (min-of-N
        # never showed this because min absorbs the ramp).
        if stat == "median":
            fn(spark, sf_dir).count()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        if stat == "median":
            import statistics
            timings[name] = round(statistics.median(samples), 3)
        else:
            timings[name] = round(min(samples), 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # ALWAYS recorded (r9 review): the default quietly moved min-of-2 →
    # min-of-3 between r8 and r9, and a missing field made recordings
    # from different protocols indistinguishable. Historical lines
    # without the field are min-of-2 (r7/r8) — see README round notes.
    out["protocol"] = {"runs": runs, "stat": stat,
                       "warmup": stat == "median",
                       # fixed pure-CPU kernel (see _calibrate): divide
                       # per-query times by this to normalize out the
                       # host window before cross-round comparisons
                       "calibration_sec": _calibrate(spark),
                       "calibration_kernel":
                           "bit_xor(xxhash64(id)) over range(4e8), 8 parts",
                       # single-thread driver anchor (r12): pure-Python
                       # LCG loop, 2e6 iterations — normalizes the
                       # CONSTRUCTION-bound share of query times, which
                       # the parallel JVM kernel under-measures
                       "calibration_driver_sec": _calibrate_driver(),
                       "calibration_driver_kernel":
                           "python LCG loop, 2e6 iters, 1 thread"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
