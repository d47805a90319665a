"""Registry entries for ingest-side operators: filters (SURVEY §2.3) and
per-row projections (§2.4), pinned against the DuckDB oracle on the
canonical test tables.

Where an operator's interesting path needs values the synthetic tables lack
(blanks, NULLs, unparseable dates), the query *derives* them deterministically
from key columns first — both the Spark side and the oracle SQL apply the
identical derivation, so the transform under test still decides the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.operators import filters as Fo
from dig_etl_engine_spark.operators import projections as P
from dig_etl_engine_spark.queries import register


@register(
    "filter_document_selector",
    oracle="""
    SELECT doc_id, source, lang FROM documents
    WHERE source LIKE 'src1%' AND lang = 'en'
    """,
)
def filter_document_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 document_selector: prefix + equality gate demuxing docs to a module
    (`docs/advanced.md:39-53`, `em_elicit.py:65-66`). Predicate pushes down
    to the parquet scan (StartsWith + EqualTo in PushedFilters)."""
    docs = load_tables(spark, sf_dir)["documents"]
    sel = Fo.url_prefix_selector("source", "src1") & (F.col("lang") == "en")
    return Fo.document_selector(docs, sel).select("doc_id", "source", "lang")


@register(
    "filter_guards",
    oracle="""
    SELECT doc_id, text FROM documents
    WHERE regexp_matches(text, 'merge') AND regexp_matches(text, 'window')
          AND lang = 'fr'
    """,
)
def filter_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 guards: conjunction of regex tests at paths — ALL must match
    (`dig_tabular_import.py:290-304`)."""
    docs = load_tables(spark, sf_dir)["documents"]
    g = Fo.guards([
        Fo.guard_rlike("text", "merge"),
        Fo.guard_rlike("text", "window"),
        F.col("lang") == "fr",
    ])
    return docs.filter(g).select("doc_id", "text")


@register(
    "cell_value_delete",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN NULL
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    """,
)
def cell_value_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 cell-value delete filter: per-column blacklist → null the cell
    (`dig_tabular_import.py:210-212,236-240`;
    ported test `test_cell_values_deletion.py:30-41`)."""
    cust = load_tables(spark, sf_dir)["customer"]
    out = Fo.delete_cell_values(cust, "c_mktsegment", ["BUILDING", "AUTOMOBILE"])
    return out.select("c_custkey", "c_mktsegment")


@register(
    "blank_null_removal",
    oracle="""
    SELECT doc_id,
           NULLIF(TRIM(CASE WHEN doc_id % 7 = 0 THEN '   ' ELSE '  ' || lang || ' ' END), '')
             AS lang_clean
    FROM documents
    """,
)
def blank_null_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 blank/NULL removal: strip whitespace, empty → NULL
    (`dig_tabular_import.py:96-101,255-263`). Blank cells derived
    deterministically (every 7th doc) to exercise the empty path."""
    docs = load_tables(spark, sf_dir)["documents"]
    dirty = F.when(F.col("doc_id") % 7 == 0, F.lit("   ")) \
             .otherwise(F.concat(F.lit("  "), F.col("lang"), F.lit(" ")))
    return docs.select("doc_id", Fo.clean_blank(dirty).alias("lang_clean"))


@register(
    "remove_fields_projection",
    oracle="SELECT doc_id, lang, source FROM documents",
)
def remove_fields_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 remove_fields: drop listed columns on ingest
    (`dig_tabular_import.py:103-106,229-231`). Catalyst column pruning means
    the dropped columns are never read from parquet (check ReadSchema)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return Fo.remove_fields(docs, ["text", "n_chars"])


@register(
    "doc_validity_quarantine",
    oracle="""
    WITH tagged AS (
      SELECT CASE WHEN event_id % 11 = 0 THEN NULL
                  WHEN event_id % 13 = 0 THEN ' '
                  ELSE CAST(event_id AS VARCHAR) END AS doc_id
      FROM events
    )
    SELECT 'valid' AS bucket, COUNT(*) AS n FROM tagged
      WHERE doc_id IS NOT NULL AND LENGTH(TRIM(doc_id)) > 0
    UNION ALL
    SELECT 'rejected' AS bucket, COUNT(*) AS n FROM tagged
      WHERE NOT (doc_id IS NOT NULL AND LENGTH(TRIM(doc_id)) > 0)
    """,
)
def doc_validity_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 + C5: doc validity gate with quarantine routing — reference drops
    docs lacking doc_id (`etk_worker.py:93-95`); we route rejects to an
    errors table. NULL/blank ids derived deterministically."""
    ev = load_tables(spark, sf_dir)["events"]
    tagged = ev.select(
        F.when(F.col("event_id") % 11 == 0, None)
         .when(F.col("event_id") % 13 == 0, F.lit(" "))
         .otherwise(F.col("event_id").cast("string")).alias("doc_id"))
    valid, rejected = Fo.split_valid_docs(tagged)
    return (
        valid.agg(F.count(F.lit(1)).alias("n"))
             .select(F.lit("valid").alias("bucket"), "n")
        .unionByName(
            rejected.agg(F.count(F.lit(1)).alias("n"))
                    .select(F.lit("rejected").alias("bucket"), "n"))
    )


@register(
    "template_concat",
    oracle="""
    SELECT o_orderkey,
           COALESCE(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END, '')
             || ': order placed in ' ||
           COALESCE(strftime(o_orderdate, '%Y-%m-%d'), '') AS title
    FROM orders
    """,
)
def template_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 template concatenation: `'{priority}: order placed in {date}'`,
    missing keys → '' (`dig_tabular_import.py:320-342`). NULL priority
    derived on every 5th key to exercise the missing-key path."""
    orders = load_tables(spark, sf_dir)["orders"]
    staged = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, None)
         .otherwise(F.col("o_orderpriority")).alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
    )
    return staged.select(
        "o_orderkey",
        P.template_column("{priority}: order placed in {date}").alias("title"),
    )


@register(
    "decode_dict",
    oracle="""
    SELECT event_id,
           COALESCE(CASE event_type WHEN 'click' THEN 'CLICK_EVT'
                                    WHEN 'view' THEN 'VIEW_EVT' END,
                    event_type) AS decoded_preserve,
           CASE event_type WHEN 'click' THEN 'CLICK_EVT'
                           WHEN 'view' THEN 'VIEW_EVT' END AS decoded_delete
    FROM events
    """,
)
def decode_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 decoding dict: recode values; default_action preserve|delete for
    unmapped (`dig_tabular_import.py:214-223,265-288`;
    ported tests `test_decode_dict.py:15-114`)."""
    ev = load_tables(spark, sf_dir)["events"]
    mapping = {"click": "CLICK_EVT", "view": "VIEW_EVT"}
    return ev.select(
        "event_id",
        P.decode_dict(F.col("event_type"), mapping, "preserve").alias("decoded_preserve"),
        P.decode_dict(F.col("event_type"), mapping, "delete").alias("decoded_delete"),
    )


@register(
    "constant_injection",
    oracle="""
    SELECT doc_id,
           CASE WHEN source = 'src1' THEN 'web_corpus' END AS collection,
           COALESCE(lang, CASE WHEN source = 'src1' THEN 'unknown' END) AS lang
    FROM documents
    """,
)
def constant_injection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 kg_enhancement constants: guarded constant injection; without
    priority an existing value wins (`generate_mydig_config.py:433-465`;
    ported test `test_kg_enhancement.py:17-83`)."""
    docs = load_tables(spark, sf_dir)["documents"]
    guard = F.col("source") == "src1"
    out = P.inject_constant(docs, "collection", "web_corpus", guard=guard)
    out = P.inject_constant(out, "lang", "unknown", guard=guard)  # existing lang wins
    return out.select("doc_id", "collection", "lang")


@register(
    "listify_and_rename",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type IS NULL THEN ''
                ELSE event_type END AS type_,
           CASE WHEN event_type IS NULL THEN 0 ELSE 1 END AS type_arity
    FROM events
    """,
)
def listify_and_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 listify + P6 type→type_ rename (`dig_tabular_import.py:306-318`,
    `etk_worker.py:111-113`). The array itself is projected via
    array_join/size so the oracle comparison stays scalar-typed."""
    ev = load_tables(spark, sf_dir)["events"]
    arr = P.listify(F.col("event_type"))
    staged = ev.select("event_id",
                       F.array_join(arr, "|").alias("type"),
                       F.size(arr).alias("type_arity"))
    return P.rename_reserved(staged)


@register(
    "url_id_synthesis",
    oracle="""
    SELECT 'http://example.org/corpus.csv#' || CAST(doc_id AS VARCHAR) AS url,
           doc_id
    FROM documents
    """,
)
def url_id_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 URL/id synthesis: `file_url + '#' + object_id`
    (`dig_tabular_import.py:344-390`)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        P.synthesize_url_id(F.lit("http://example.org/corpus.csv"), F.col("doc_id"))
         .alias("url"),
        "doc_id",
    )


@register(
    "date_normalization",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
                  WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
                  ELSE 'not a date' END AS raw_date
      FROM orders
    )
    SELECT o_orderkey, raw_date,
           strftime(COALESCE(try_strptime(raw_date, '%Y-%m-%d'),
                             try_strptime(raw_date, '%d/%m/%Y')), '%Y-%m-%d') AS parsed
    FROM raw
    """,
)
def date_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 multi-format date normalization: first format that parses wins;
    unparseable → NULL (`generate_mydig_config.py:233-236,614-626`). Mixed
    format strings derived deterministically from the key."""
    orders = load_tables(spark, sf_dir)["orders"]
    raw = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "dd/MM/yyyy"))
         .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "yyyy-MM-dd"))
         .otherwise(F.lit("not a date")).alias("raw_date"),
    )
    parsed = P.normalize_date(F.col("raw_date"), ["yyyy-MM-dd", "dd/MM/yyyy"])
    return raw.select("o_orderkey", "raw_date",
                      F.date_format(parsed, "yyyy-MM-dd").alias("parsed"))


@register(
    "raw_content_synthesis",
    oracle="""
    SELECT r_regionkey,
           '<html><pre>' || to_json(struct_pack(r_regionkey := r_regionkey,
                                                r_name := r_name))
                         || '</pre></html>' AS raw_content
    FROM region
    """,
)
def raw_content_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 raw_content synthesis for tabular rows: JSON of the row wrapped
    in <html><pre> (`dig_tabular_import.py:233`)."""
    region = load_tables(spark, sf_dir)["region"]
    return region.select(
        "r_regionkey",
        P.synthesize_raw_content(["r_regionkey", "r_name"]).alias("raw_content"),
    )
