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


def materialize_bm25_stats(docs: DataFrame, path: str, *,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> None:
    """Persist the corpus statistics BM25 needs — alongside the index,
    at corpus-build time, the way the reference's Elasticsearch keeps df
    and field-length norms inside the inverted index it builds at ingest.

    Two tables under ``path``:

    * ``term_df`` — ``(term, df)`` for EVERY distinct token: one
      tokenize → per-doc distinct → explode → groupBy pass. Query time
      reads only the query's terms (parquet predicate pushdown on
      ``term``), so a 2-term query touches 2 row groups, not the corpus.
    * ``corpus`` — a single row ``(n_docs, avgdl)``.

    Tokenization matches ``plans.weights.bm25_score_column`` (lower,
    trim, whitespace split) so build-time df and query-time tf agree.

    STALENESS CONTRACT: these stats are a build-time snapshot. An
    incremental doc_id upsert (``sinks/kg_table.py:upsert_*`` — K2)
    changes the corpus WITHOUT refreshing df/avgdl, silently skewing
    BM25 scores — the same drift Elasticsearch hides by rebuilding
    df inside each segment merge. The build therefore persists a
    content signature (order-independent ``bit_xor`` of
    ``xxhash64(id, text)``) in the ``corpus`` table;
    :func:`bm25_stats_stale` recomputes it against the current corpus
    in one pass, and :func:`refresh_bm25_stats` closes the loop
    (check → crash-safe rebuild-and-swap) in the same maintenance slot
    as bucket compaction (``scripts/maintain.py --bm25-stats``) — NOT
    per query, which would re-scan the corpus and defeat the
    materialization.
    """
    toks = F.split(F.trim(safe_lower(F.col(text_col))), r"\s+")
    (docs.select(F.explode(F.array_distinct(toks)).alias("term"))
         .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
         .write.mode("overwrite").parquet(f"{path}/term_df"))
    (docs.agg(F.count(F.lit(1)).alias("n_docs"),
              F.avg(F.size(toks)).alias("avgdl"),
              _corpus_signature(id_col, text_col).alias("corpus_sig"))
         .write.mode("overwrite").parquet(f"{path}/corpus"))


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
    try:
        row = spark.read.parquet(f"{path}/corpus").head()
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
    rebuild). The rebuild goes to a staging root and commits through
    ``kg_table``'s shared rename-aside protocol (``_swap_upsert`` /
    ``_recover_upsert`` — ONE copy of the swap and its recovery, so a
    durability fix lands in both consumers): no crash point leaves
    zero complete snapshots, the between-renames window and any stale
    aside/staging leftovers heal on entry. Honest reader contract:
    ``load_bm25_stats`` takes NO lock, so a read landing exactly
    between the two renames sees a missing root (transient
    AnalysisException) — the same exposure as compaction's bucket
    swap; schedule the refresh in the maintenance slot beside
    ``compact_partitioned``, not alongside live queries. The
    check→build→swap runs under the layouts' shared advisory
    ``table_lock`` so two overlapping maintenance runs serialize
    instead of racing the swap.
    """
    import uuid

    from dig_etl_engine_spark.sinks.kg_table import (
        _recover_upsert, _swap_upsert, table_lock)

    with table_lock(path, timeout=lock_timeout):
        _recover_upsert(path)
        if not force and not bm25_stats_stale(
                docs, path, id_col=id_col, text_col=text_col):
            return False
        tmp = f"{path}.__tmp__{uuid.uuid4().hex[:8]}"
        materialize_bm25_stats(docs, tmp, text_col=text_col, id_col=id_col)
        _swap_upsert(path, tmp)
    return True


def load_bm25_stats(spark, path: str, terms: list[str]) -> tuple:
    """Read ``(n_docs, avgdl, {term: df})`` for the query's terms.

    Bounded driver transfer: one scalar row plus ``len(terms)`` rows via
    a pushdown ``term IN (...)`` filter on the term_df table. Terms
    absent from the corpus get df=0 (scores 0, same as the inline agg).
    """
    row = spark.read.parquet(f"{path}/corpus").head()
    hits = (spark.read.parquet(f"{path}/term_df")
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
