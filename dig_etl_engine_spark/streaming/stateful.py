"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming at all (SURVEY §1.2: "no
watermarks, no event-time windows, no stateful streaming operators" —
its Kafka loop is purely incremental ingest, `etk_worker.py:76-157`).
This module is the Structured Streaming superset: arbitrary per-key
state kept by Spark's state store, checkpointed with the stream, so it
survives restarts and scales horizontally (state lives with the shuffle
partition that owns the key — no coordination, no driver state).

First operator: **streaming first-seen dedup** — the online form of
exact dedup (operators/dedup.py) that every training-data ingest wants:
emit a document the first time its content fingerprint appears across
the life of the stream, drop every later copy. State per fingerprint is
one counter (~16 bytes) — at 100 TB / billions of fingerprints the state
store is RocksDB-backed and partitioned by the groupBy shuffle, so per-
task state stays bounded; the fingerprint is md5 so keys are uniform
(no skewed state partition).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_dedup_stream(source: DataFrame, *, fingerprint_col: str,
                            order_col: str, output_schema: str) -> DataFrame:
    """Streaming exact-dedup: keep only the first-ever row per fingerprint.

    Semantics (deterministic):
      * within a micro-batch, the row with the smallest ``order_col`` per
        fingerprint wins (ties broken by pandas stable sort order of the
        remaining columns as delivered — supply a unique order col);
      * across micro-batches, the winner of the earliest batch that
        contained the fingerprint wins; later batches emit nothing for it.
    With an offset-ordered source (Kafka offsets, file-drop sequence
    numbers) this is exactly "global min-offset row per fingerprint".

    Scale shape: one shuffle on the fingerprint (the same shuffle exact
    batch dedup pays), tiny per-key state, Arrow-batched pandas transfer.
    """
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        # stream the Arrow chunks — NEVER pd.concat the whole group: a
        # hot fingerprint (empty-document hash, boilerplate page) can
        # carry millions of copies in one micro-batch, and the suppress
        # path needs only the row count while the emit path needs only
        # a running per-chunk min(order_col) row. Memory stays bounded
        # by one Arrow chunk regardless of per-key skew.
        if state.exists:
            (n_seen,) = state.get
            state.update((n_seen + sum(len(p) for p in pdfs),))
            return
        n = 0
        best: pd.DataFrame | None = None
        for p in pdfs:
            n += len(p)
            if not len(p):
                continue
            # nanargmin returns the FIRST row holding the chunk's
            # non-null minimum — exactly what the former stable
            # mergesort + head(1) selected (NaN sorts last under
            # mergesort, and among equal minima stability kept the
            # first occurrence), without paying a per-group sort: this
            # function runs once per key per batch, so per-call pandas
            # cost is the stateful stage's Python-side constant (r12).
            # A nullable order column arrives from Arrow as float64
            # with NaN, where plain argmin would pick the first NaN
            # row (r12 review); an all-NaN chunk falls back to row 0,
            # which is what the stable sort's head was. Across chunks
            # the earlier chunk wins ties (strict < below), preserving
            # delivered-order tie-breaks.
            vals = p[order_col].to_numpy()
            try:
                i = int(np.nanargmin(vals))
            except ValueError:   # all-NaN chunk
                i = 0
            cand = p.iloc[[i]]
            if best is None or \
                    cand[order_col].iloc[0] < best[order_col].iloc[0]:
                best = cand
        state.update((n,))
        if best is not None:
            yield best

    from dig_etl_engine_spark.session import ship_package
    ship_package(source.sparkSession)
    return source.groupBy(fingerprint_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_first_seen_dedup(source: DataFrame, *, target_path: str,
                         checkpoint_dir: str, fingerprint_col: str,
                         order_col: str, output_schema: str):
    """Drive the stateful dedup to a parquet sink with an availableNow
    drain (C4 shape): drain queued input, emit first-seen rows, stop.
    Re-running with the same checkpoint resumes the state store — copies
    of fingerprints emitted in ANY earlier run stay suppressed."""
    deduped = first_seen_dedup_stream(
        source, fingerprint_col=fingerprint_col, order_col=order_col,
        output_schema=output_schema)
    return (deduped.writeStream.outputMode("append").format("parquet")
            .option("path", target_path)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())
