"""Knowledge-graph assembly and field indexing (SURVEY.md §1.1, §3.1 stage 7).

Reference flow (`etk_worker.py:104-121` under /root/reference): modules call
``doc.kg.add_value(field, value)`` building ``knowledge_graph`` =
``{field: [{value, key, …}]}``; then ``index_knowledge_graph_fields`` (from
digsandpaper, imported at `etk_worker.py:12`) flattens it to
``indexed.<field>.<method>.<segment>.{value,key}`` plus
``indexed.<field>.high_confidence_keys``.

Spark design: the KG is a MapType column (field set = project config, not
code); the searchable form is one exploded **long-format table**
``(doc_id, field, method, segment, value, key)`` — the pushdown-friendly
replacement for 3-level nested column names (SURVEY §1.1, risk R3). At scale
the index table is written partitioned by ``field`` so query-time field
fan-out prunes partitions.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from dig_etl_engine_spark.functions.casefold import safe_lower


def kg_build(df: DataFrame, field_extractors: Mapping[str, Column],
             *, out_col: str = "knowledge_graph") -> DataFrame:
    """Assemble the KG map from per-field extractor result columns.

    ``field_extractors`` maps field name → extractor Column (each returning
    ``array<struct<value,key,method,segment>>``, see functions.extractors).
    Equivalent of a module's sequence of ``doc.kg.add_value`` calls
    (`docs/advanced.md:151-181`).
    """
    entries: list[Column] = []
    for fname, col in field_extractors.items():
        entries.extend([F.lit(fname), col])
    return df.withColumn(out_col, F.create_map(*entries))


def kg_index(df: DataFrame, *, doc_id: str = "doc_id",
             kg_col: str = "knowledge_graph") -> DataFrame:
    """Flatten the KG map into the long-format index table.

    Output: one row per (doc, field, extraction) —
    ``doc_id, field, method, segment, value, key``. Empty extraction arrays
    produce no rows (matching the reference: fields with no extractions are
    absent from ``indexed.*``).

    Spark shape: two generators (explode map → explode array), both narrow —
    no shuffle. The generated rows stay partition-local with their doc.
    """
    exploded = df.select(
        F.col(doc_id).alias("doc_id"),
        F.explode(F.col(kg_col)).alias("field", "extractions"),
    )
    return exploded.select(
        "doc_id", "field",
        F.explode("extractions").alias("x"),
    ).select(
        "doc_id", "field",
        F.col("x.method").alias("method"),
        F.col("x.segment").alias("segment"),
        F.col("x.value").alias("value"),
        F.col("x.key").alias("key"),
    )


def materialize_index(index_df: DataFrame, path: str) -> None:
    """Write the long index table PARTITIONED BY field — the physical
    layout that makes query-time field fan-out (Q6) partition pruning:
    a clause touching 3 logical fields reads 3 directories, not the
    corpus. The reference gets the same effect from ES per-field inverted
    indexes. Low-cardinality partition key (fields are project config,
    dozens not millions) → no small-file explosion."""
    index_df.write.mode("overwrite").partitionBy("field").parquet(path)


def load_index(df_or_spark, path: str) -> DataFrame:
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.read.parquet(path)


def _stats_root(path: str) -> str | None:
    """Resolve the live stats epoch under ``path``.

    Pointer first (v2 layout: ``path/_CURRENT`` holds ``<live>
    [<grace>]`` — the first token names the immutable
    ``epoch_<token>/`` directory holding BOTH tables, the optional
    second token is the previous epoch kept for in-flight readers),
    then the legacy flat layout (``corpus/`` directly under ``path``). Because the two
    tables live under ONE immutable epoch root and the pointer is read
    ONCE, a reader can never mix ``corpus`` from one build with
    ``term_df`` from another (the mixed-epoch tear of the pre-pointer
    layout, where two unlocked reads straddled a concurrent swap) and
    never observes a missing root mid-refresh (the pointer flip is a
    single ``os.replace`` — see ``sinks/kg_table.commit_pointer``)."""
    import os

    from dig_etl_engine_spark.sinks.kg_table import resolve_pointer

    payload = resolve_pointer(path)
    tok = payload.split()[0] if payload and payload.split() else None
    if tok and os.path.isdir(os.path.join(path, tok)):
        return os.path.join(path, tok)
    if os.path.isdir(os.path.join(path, "corpus")):
        return path
    return None


def _sweep_stats_epochs(path: str, keep: set[str]) -> None:
    """Drop superseded epoch roots and pointer temp files. Called by the
    writer right after its pointer commit (under the table lock when the
    caller holds it). ``keep`` always contains the just-committed epoch
    AND its immediate predecessor — both recorded IN the pointer
    payload (``<live> [<grace>]``), so every sweep, including a
    back-to-back refresh entry's orphan sweep, can tell the grace copy
    from a crashed build's orphan: orphans are epochs named by NO
    pointer token. An in-flight reader that resolved the pre-flip
    pointer keeps a complete root until two further builds land.
    Legacy flat tables (``corpus/`` at the root) get the same grace —
    their root-level tables are removed only once a previous epoch dir
    exists to cover the window."""
    import os
    import shutil

    from dig_etl_engine_spark.sinks.kg_table import sweep_pointer_tmps

    sweep_pointer_tmps(path)
    epochs = [n for n in os.listdir(path)
              if n.startswith("epoch_")
              and os.path.isdir(os.path.join(path, n))]
    for n in epochs:
        if n not in keep:
            shutil.rmtree(os.path.join(path, n), ignore_errors=True)
    # the legacy flat layout is "the epoch before epochs existed": keep
    # it as the grace copy for the FIRST pointer commit, drop it once a
    # real previous epoch provides the grace instead
    if len([n for n in epochs if n in keep]) >= 2:
        for legacy in ("corpus", "term_df"):
            shutil.rmtree(os.path.join(path, legacy), ignore_errors=True)


def materialize_bm25_stats(docs: DataFrame, path: str, *,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> None:
    """Persist the corpus statistics BM25 needs — alongside the index,
    at corpus-build time, the way the reference's Elasticsearch keeps df
    and field-length norms inside the inverted index it builds at ingest.

    Two tables under one immutable epoch root
    ``path/epoch_<token>/``, published by a pointer flip
    (``path/_CURRENT`` — ``sinks/kg_table.commit_pointer``, ONE atomic
    ``os.replace``; the ES-alias-swap analog, `manager.py:237-255`):

    * ``term_df`` — ``(term, df)`` for EVERY distinct token: one
      tokenize → per-doc distinct → explode → groupBy pass. Query time
      reads only the query's terms (parquet predicate pushdown on
      ``term``), so a 2-term query touches 2 row groups, not the corpus.
    * ``corpus`` — a single row ``(n_docs, avgdl)``.

    Tokenization matches ``plans.weights.bm25_score_column`` (lower,
    trim, whitespace split) so build-time df and query-time tf agree.

    COMMIT CONTRACT: the epoch dir is fully written BEFORE the pointer
    moves, and epochs are immutable after publication — so readers that
    resolve the pointer (:func:`load_bm25_stats`,
    :func:`bm25_stats_stale`) always see one complete, internally
    consistent build: no missing-root window, no mixed-epoch tear. A
    crash before the flip leaves the old pointer serving the old epoch
    (the orphan epoch is swept on the next build); a crash after the
    flip leaves the new build committed. The previous epoch survives, pointer-recorded as
    the grace copy, until two further builds land (see
    :func:`_sweep_stats_epochs`).

    STALENESS CONTRACT: these stats are a build-time snapshot. An
    incremental doc_id upsert (``sinks/kg_table.py:upsert_*`` — K2)
    changes the corpus WITHOUT refreshing df/avgdl, silently skewing
    BM25 scores — the same drift Elasticsearch hides by rebuilding
    df inside each segment merge. The build therefore persists a
    content signature (order-independent ``bit_xor`` of
    ``xxhash64(id, text)``) in the ``corpus`` table;
    :func:`bm25_stats_stale` recomputes it against the current corpus
    in one pass, and :func:`refresh_bm25_stats` closes the loop
    (check → crash-safe rebuild-and-flip) in the same maintenance slot
    as bucket compaction (``scripts/maintain.py --bm25-stats``) — NOT
    per query, which would re-scan the corpus and defeat the
    materialization.

    WRITER EXCLUSION: the build-and-flip runs under the store's
    advisory ``table_lock`` (r11 round-close review): two unlocked
    concurrent builders could each sweep the other's just-committed
    epoch — writer A's sweep (keeping only A's tokens) deletes B's
    fully-written epoch an instant before B's pointer flip publishes
    it, leaving the pointer naming a deleted directory, and a
    freshness-marker cache (``queries_search._corpus_cache_path``
    checks ``_CURRENT`` exists) would then treat the wreck as built
    forever. With the lock, builders serialize and the loser simply
    rebuilds over the winner's epoch (kept as its grace copy).
    ``refresh_bm25_stats`` already holds the lock and calls the
    unlocked internal (the mkdir lock is not reentrant).
    """
    from dig_etl_engine_spark.sinks.kg_table import table_lock

    with table_lock(path):
        _materialize_bm25_stats_locked(docs, path, text_col=text_col,
                                       id_col=id_col)


def _materialize_bm25_stats_locked(docs: DataFrame, path: str, *,
                                   text_col: str, id_col: str) -> None:
    import uuid

    from dig_etl_engine_spark.sinks.kg_table import commit_pointer

    prev = _stats_root(path)
    tok = f"epoch_{uuid.uuid4().hex[:8]}"
    root = f"{path}/{tok}"
    toks = F.split(F.trim(safe_lower(F.col(text_col))), r"\s+")
    (docs.select(F.explode(F.array_distinct(toks)).alias("term"))
         .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
         .write.mode("overwrite").parquet(f"{root}/term_df"))
    (docs.agg(F.count(F.lit(1)).alias("n_docs"),
              F.avg(F.size(toks)).alias("avgdl"),
              _corpus_signature(id_col, text_col).alias("corpus_sig"))
         .write.mode("overwrite").parquet(f"{root}/corpus"))
    import os

    from dig_etl_engine_spark.sinks.kg_table import _fsync_tree

    # data durability before the pointer may reference it: Spark wrote
    # the epoch's parquet without fsync, and the fsynced pointer must
    # never name torn files after a power loss (same contract as the
    # KG table's staged-epoch flush — see kg_table.FSYNC_STAGED_DATA)
    _fsync_tree(root)
    payload = tok
    if prev and prev != path:
        payload = f"{tok} {os.path.basename(prev)}"
    commit_pointer(path, payload)
    _sweep_stats_epochs(path, set(payload.split()))


def _corpus_signature(id_col: str, text_col: str):
    """Order-independent corpus content signature: bit_xor of one
    xxhash64 per (id, text) row — one narrow map-side-combining pass,
    no shuffle beyond the single scalar, insensitive to partitioning
    and row order. Detects adds, deletes AND in-place content rewrites
    (an id-only signature would miss last-write-wins text updates)."""
    return F.bit_xor(F.xxhash64(F.col(id_col).cast("string"),
                                F.col(text_col)))


def bm25_stats_stale(docs: DataFrame, path: str, *,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> bool:
    """True when the persisted BM25 stats no longer describe ``docs``
    (see the staleness contract on :func:`materialize_bm25_stats`).
    Pre-signature builds (no ``corpus_sig`` column) report stale —
    freshness can't be proven, so the maintenance job rebuilds once and
    gains the signature. O(corpus) scan; maintenance-time only."""
    from pyspark.errors import AnalysisException

    spark = docs.sparkSession
    root = _stats_root(path)
    if root is None:
        return True
    try:
        row = spark.read.parquet(f"{root}/corpus").head()
    except AnalysisException:
        return True
    if row is None or "corpus_sig" not in row.asDict():
        return True
    cur = docs.agg(
        _corpus_signature(id_col, text_col).alias("sig")).head()["sig"]
    return (cur or 0) != (row["corpus_sig"] or 0)


def refresh_bm25_stats(docs: DataFrame, path: str, *,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       force: bool = False,
                       lock_timeout: float = 300.0) -> bool:
    """Maintenance-slot refresh closing the staleness loop that
    :func:`bm25_stats_stale` only *detects*: rebuild the persisted
    stats when (and only when) the corpus has drifted from the
    snapshot, so a table served through incremental upserts
    (``sinks/kg_table.upsert_*``) never keeps serving skewed df/avgdl.
    Reference contract: the ES index the sandpaper queries execute
    against never serves stale term stats — segment merges rebuild df
    continuously (`sandpaper/sandbox/config/etk/config.json:38-47`);
    this is the batch-engine equivalent, scheduled beside bucket
    compaction in ``scripts/maintain.py``.

    Returns True when a rebuild happened (False = stats already fresh
    and ``force`` unset — the no-op costs one signature pass, never a
    rebuild). The rebuild writes a fresh immutable epoch root and
    publishes it with ONE atomic pointer rename
    (``sinks/kg_table.commit_pointer`` — the shared publication
    primitive; see :func:`materialize_bm25_stats` for the commit
    contract). Reader contract: ``load_bm25_stats`` takes NO lock and
    needs none — it resolves the pointer once and reads both tables
    from that one immutable epoch, so a concurrent refresh can neither
    show it a missing root (the old epoch keeps serving until the flip,
    and survives, pointer-recorded, until two further builds land) nor mix stats from
    two corpus builds (the pre-pointer layout's two unlocked reads
    could straddle a swap). The check→build→flip runs under the
    layouts' shared advisory ``table_lock`` so two overlapping
    maintenance runs serialize instead of racing the flip; entry-time
    recovery heals pre-pointer-era crash leftovers (``.__old__`` /
    ``.__tmp__*`` from the retired rename-aside protocol) and sweeps
    orphaned pointer temps and unreferenced epochs.
    """
    from dig_etl_engine_spark.sinks.kg_table import (
        _recover_upsert, table_lock)

    with table_lock(path, timeout=lock_timeout):
        # heal pre-pointer-era crash states (path renamed aside, orphan
        # staging roots) and drop orphaned epochs/pointer temps from a
        # crashed pointer-era build
        _recover_upsert(path)
        import os
        if os.path.isdir(path):
            from dig_etl_engine_spark.sinks.kg_table import resolve_pointer
            payload = resolve_pointer(path) or ""
            # keep every pointer-named epoch (live + grace) — only a
            # crashed build's orphans are unreferenced
            _sweep_stats_epochs(path, set(payload.split()))
        if not force and not bm25_stats_stale(
                docs, path, id_col=id_col, text_col=text_col):
            return False
        _materialize_bm25_stats_locked(docs, path, text_col=text_col,
                                       id_col=id_col)
    return True


def load_bm25_stats(spark, path: str, terms: list[str]) -> tuple:
    """Read ``(n_docs, avgdl, {term: df})`` for the query's terms.

    Bounded driver transfer: one scalar row plus ``len(terms)`` rows via
    a pushdown ``term IN (...)`` filter on the term_df table. Terms
    absent from the corpus get df=0 (scores 0, same as the inline agg).

    Lock-free epoch consistency: the pointer is resolved ONCE and both
    tables are read from that one immutable epoch root, so a refresh
    landing between the two reads cannot mix ``n_docs``/``avgdl`` from
    one corpus build with ``df`` from another, and the flip itself
    (atomic pointer replace, old epoch kept as the pointer-recorded
    grace copy)
    never exposes a missing root. Legacy flat layouts (pre-pointer)
    resolve to ``path`` itself and keep the old read path.
    """
    root = _stats_root(path) or path
    row = spark.read.parquet(f"{root}/corpus").head()
    hits = (spark.read.parquet(f"{root}/term_df")
            .filter(F.col("term").isin(list(terms))).collect())
    df_counts = {t: 0 for t in terms}
    df_counts.update({r["term"]: r["df"] for r in hits})
    # an empty-corpus build writes n_docs=0 with a null avgdl (and a
    # pathological build could write zero rows) — degrade to zero stats
    # instead of a TypeError deep in the query path
    if row is None:
        return 0, 0.0, df_counts
    return row["n_docs"], float(row["avgdl"] or 0.0), df_counts


def high_confidence_keys(index_df: DataFrame) -> DataFrame:
    """Per (doc, field) sorted distinct keys — the
    ``indexed.<field>.high_confidence_keys`` equivalent
    (`type_field_group_by_mappings.json:6-12`: facets group by these).

    Returned sorted so the array is deterministic; a single partial-agg
    shuffle on (doc_id, field).
    """
    return (
        index_df.groupBy("doc_id", "field")
        .agg(F.array_sort(F.collect_set("key")).alias("high_confidence_keys"))
    )
