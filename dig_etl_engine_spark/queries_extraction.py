"""Registry entries for the extractor library (SURVEY §2.5 X1–X12) and KG
assembly/indexing (§3.1 stages 5–7).

Pattern: the synthetic corpus has no emails/URLs/HTML, so each query first
DERIVES a deterministic enriched text from key columns (same derivation in
the oracle SQL), then runs the real extractor machinery over it — the
oracle states the expected extraction output computed from the components,
so the extractor itself is what's under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.functions.localdf import local_df
from dig_etl_engine_spark.functions import extractors as X
from dig_etl_engine_spark.functions.kg import high_confidence_keys, kg_build, kg_index
from dig_etl_engine_spark.queries import register

# Glossary terms drawn from the corpus vocabulary; multi-token entries
# exercise the n-gram path (ngrams=3, em_elicit.py:20,26).
GLOSSARY_TERMS = ["spark", "window", "hash value", "merge batch",
                  "customer query", "scan"]

_GLOSSARY_VALUES_SQL = ", ".join(f"('{t}')" for t in GLOSSARY_TERMS)


def _glossary_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, [(t,) for t in GLOSSARY_TERMS], "term string")


@register(
    "extract_regex_family",
    oracle="""
    WITH derived AS (
      SELECT doc_id,
             'contact doc' || CAST(doc_id AS VARCHAR) || '@example.com or visit '
               || 'http://host' || CAST(doc_id % 10 AS VARCHAR) || '.example.org/x '
               || 'from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 re CVE-2021-'
               || CAST(10000 + doc_id AS VARCHAR) AS txt
      FROM documents
    )
    SELECT doc_id,
           array_to_string(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'), '|') AS emails,
           array_to_string(regexp_extract_all(txt, 'https?://[^\\s"''<>]+'), '|') AS urls,
           array_to_string(regexp_extract_all(txt, 'CVE-[0-9]{4}-[0-9]{4,7}'), '|') AS cves
    FROM derived
    """,
)
def extract_regex_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7/X9 regex extractor family (email/URL/CVE — default ETK extractors,
    `generate_mydig_config.py:52-56`, `em_base.py:14-21` imports). Native
    `regexp_extract_all`, whole-stage codegen'd."""
    docs = load_tables(spark, sf_dir)["documents"]
    txt = F.concat(
        F.lit("contact doc"), F.col("doc_id").cast("string"),
        F.lit("@example.com or visit http://host"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(".example.org/x from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 re CVE-2021-"),
        (F.lit(10000) + F.col("doc_id")).cast("string"),
    )
    d = docs.select("doc_id", txt.alias("txt"))
    vals = lambda c: F.transform(c, lambda x: x["value"])  # noqa: E731
    return d.select(
        "doc_id",
        F.array_join(vals(X.extract_email(F.col("txt"))), "|").alias("emails"),
        F.array_join(vals(X.extract_url(F.col("txt"))), "|").alias("urls"),
        F.array_join(vals(X.extract_cve(F.col("txt"))), "|").alias("cves"),
    )


@register(
    "extract_crypto_ids",
    oracle="""
    SELECT doc_id,
           '1' || replace(lpad(CAST(doc_id AS VARCHAR), 28, '9'), '0', 'A')
             AS btc,
           lpad(CAST(doc_id AS VARCHAR), 32, '0') AS hashes
    FROM documents
    """,
)
def extract_crypto_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 BitcoinAddress + CryptographicHash extractors (`em_base.py:14-21`
    imports in elicit tarball). Text derives a valid base58 address and an
    md5-shaped hex digest per doc; the oracle states the expected match
    directly, so the regex machinery is what's under test."""
    docs = load_tables(spark, sf_dir)["documents"]
    txt = F.concat(
        F.lit("wallet 1"),
        F.translate(F.lpad(F.col("doc_id").cast("string"), 28, "9"), "0", "A"),
        F.lit(" checksum "), F.lpad(F.col("doc_id").cast("string"), 32, "0"),
        F.lit(" end"))
    d = docs.select("doc_id", txt.alias("txt"))
    vals = lambda c: F.transform(c, lambda x: x["value"])  # noqa: E731
    return d.select(
        "doc_id",
        F.array_join(vals(X.extract_bitcoin(F.col("txt"))), "|").alias("btc"),
        F.array_join(vals(X.extract_crypto_hash(F.col("txt"))), "|")
        .alias("hashes"),
    )


@register(
    "extract_html_tables",
    oracle="""
    SELECT doc_id, 2 AS n_rows,
           'id|name|ID ' || CAST(doc_id AS VARCHAR) || '|src ' || source
             AS cells
    FROM documents
    """,
)
def extract_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 Table extractor (ETK TableExtractor import, `em_base.py:14-21`):
    parse ``<table>`` markup into rows×cells. The derived HTML carries
    attributes, a ``<th>`` header row, nested inline tags and stray
    whitespace — all of which the parse must strip; the oracle states the
    cleaned cell matrix. Plan stays fully native (nested regexes inside
    codegen)."""
    docs = load_tables(spark, sf_dir)["documents"]
    html = F.concat(
        F.lit('<html><body><p>noise</p><table class="t"><tr><th> id </th>'
              "<th>name</th></tr><tr class=\"r\"><td><b>ID</b> "),
        F.col("doc_id").cast("string"),
        F.lit("</td><td>src "), F.col("source"),
        F.lit("</td></tr></table></body></html>"))
    d = docs.select("doc_id", html.alias("html"))
    cells = X.extract_html_tables(F.col("html"))
    return d.select(
        "doc_id",
        F.size(cells).alias("n_rows"),
        F.array_join(F.flatten(cells), "|").alias("cells"),
    )


@register(
    "glossary_extract",
    oracle=f"""
    SELECT d.doc_id, g.term
    FROM documents d
    CROSS JOIN (VALUES {_GLOSSARY_VALUES_SQL}) AS g(term)
    WHERE POSITION(' ' || g.term || ' ' IN ' ' || LOWER(d.text) || ' ') > 0
    """,
)
def glossary_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 GlossaryExtractor (`em_elicit.py:15-26`): whole-token dictionary
    match, case-insensitive, multi-token terms. Glossary side broadcast —
    corpus never shuffles."""
    docs = load_tables(spark, sf_dir)["documents"]
    return X.glossary_matches(docs, "text", _glossary_df(spark))


@register(
    "glossary_extract_ngram_join",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    grams AS (
      SELECT doc_id, unnest(list_distinct(flatten([
        list_transform(range(1, len(t) + 1),
                       i -> array_to_string(t[i:i], ' ')),
        list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                       i -> array_to_string(t[i:least(i + 1, len(t))], ' ')),
        list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:least(i + 2, len(t))], ' '))
      ]))) AS gram
      FROM toks
    )
    SELECT DISTINCT g.doc_id, g.gram AS term
    FROM grams g JOIN (VALUES {_GLOSSARY_VALUES_SQL}) v(term)
      ON g.gram = v.term
    """,
)
def glossary_extract_ngram_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4, the scale path (`docs/advanced.md:104-119` ngrams=3): token
    n-grams hash-joined against the term table — linear in corpus tokens,
    no broadcast, for glossaries too big to ship to every task. Same
    whole-token semantics as `glossary_extract`; the oracle replays the
    n-gram generation in SQL."""
    docs = load_tables(spark, sf_dir)["documents"]
    return X.glossary_matches_ngram_join(docs, "text", _glossary_df(spark))


@register(
    "extract_hostname",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS website
    FROM documents
    """,
)
def extract_hostname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 hostname/TLD from url (`em_base.py:70-79`; predefined TLD
    extractor). URL derived from source; Spark's `parse_url(HOST)` must
    recover the host the oracle states directly."""
    docs = load_tables(spark, sf_dir)["documents"]
    url = F.concat(F.lit("http://"), F.col("source"), F.lit(".example.com/page/"),
                   F.col("doc_id").cast("string"))
    host = F.element_at(X.extract_hostname(url), 1)
    return docs.select("doc_id", host["value"].alias("website"))


@register(
    "extract_dates",
    oracle="""
    WITH derived AS (
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS iso,
             year(o_orderdate) AS y
      FROM orders
    )
    SELECT o_orderkey,
           iso || '|' || iso || '|' || iso || '|' || iso || '|' || iso
               || '|' || iso
               || CASE WHEN y BETWEEN 1977 AND 2075
                       THEN '|' || iso ELSE '' END AS found_dates
    FROM derived
    """,
)
def extract_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 DateExtractor: find dates in free text and normalize to ISO
    (`em_elicit.py:52-54`). Seven embedded forms of the same day — ISO,
    M/d/yyyy, "Month d, yyyy", "d Mon yyyy", yyyy/M/d, d.M.yyyy, and
    2-digit-year M/d/yy — must all normalize to the same ISO string. The
    ref_year is pinned to 2026 so the dateutil century pivot (±50 years)
    and the ignore_past_years=100 post-filter are deterministic: order
    years 1992-1998 survive the filter, and their 2-digit forms resolve
    back to 19xx only inside the pivot window (the oracle restates the
    window arithmetic)."""
    orders = load_tables(spark, sf_dir)["orders"]
    txt = F.concat(
        F.lit("posted "), F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.lit(" updated "), F.date_format("o_orderdate", "M/d/yyyy"),
        F.lit(" on "), F.date_format("o_orderdate", "MMMM d, yyyy"),
        F.lit(" aka "), F.date_format("o_orderdate", "d MMM yyyy"),
        F.lit(" / "), F.date_format("o_orderdate", "yyyy/M/d"),
        F.lit(" EU "), F.date_format("o_orderdate", "d.M.yyyy"),
        F.lit(" short "), F.date_format("o_orderdate", "M/d/yy"),
    )
    d = orders.select("o_orderkey", txt.alias("txt"))
    found = X.extract_date_iso(F.col("txt"), two_digit_years=True,
                               ref_year=2026)
    return d.select(
        "o_orderkey",
        F.array_join(F.transform(found, lambda x: x["value"]), "|").alias("found_dates"),
    )


@register(
    "html_extract_zones",
    oracle="""
    SELECT n_nationkey,
           n_name AS title,
           'Nation ' || n_name || ' in region ' || CAST(n_regionkey AS VARCHAR)
             AS content_strict,
           n_name || ' Nation ' || n_name || ' in region '
             || CAST(n_regionkey AS VARCHAR) || ' footer' AS content_all
    FROM nation
    """,
)
def html_extract_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 HTML content zones: title + MAIN_CONTENT_STRICT (block text
    only) + ALL_TEXT (tags stripped, script dropped) — the three
    `content_extraction.*` zones (`em_base.py:41-58`,
    `type_field_mappings.json:73-75`). HTML synthesized from nation; the
    oracle states each zone's expected text."""
    nation = load_tables(spark, sf_dir)["nation"]
    html = F.concat(
        F.lit("<html><head><title>"), F.col("n_name"),
        F.lit("</title><script>var x=1;</script></head><body><p>Nation "),
        F.col("n_name"), F.lit(" in region "), F.col("n_regionkey").cast("string"),
        F.lit("</p><div> footer</div></body></html>"),
    )
    d = nation.select("n_nationkey", html.alias("raw_content"))
    return d.select(
        "n_nationkey",
        X.html_title(F.col("raw_content")).alias("title"),
        X.html_main_content(F.col("raw_content"), strict=True).alias("content_strict"),
        X.html_all_text(F.col("raw_content")).alias("content_all"),
    )


@register(
    "landmark_rule_extract",
    oracle="""
    SELECT s_suppkey,
           'Account balance: ' AS begin_ctx,
           CAST(ROUND(s_acctbal, 2) AS VARCHAR) AS extracted
    FROM supplier
    """,
)
def landmark_rule_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 Inferlink/Landmark rule: begin_regex/end_regex slice of raw HTML
    (`em_base.py:60-68`; `landmark_rules/consolidated_rules.json`). The rule
    must recover the balance embedded between its anchors."""
    sup = load_tables(spark, sf_dir)["supplier"]
    html = F.concat(
        F.lit("<tr><td>Account balance: <b>"),
        F.round(F.col("s_acctbal"), 2).cast("string"),
        F.lit("</b></td></tr>"),
    )
    d = sup.select("s_suppkey", html.alias("raw_content"))
    hit = F.element_at(
        X.landmark_rule(F.col("raw_content"), r"Account balance: <b>", r"</b>",
                        "balance"), 1)
    return d.select(
        "s_suppkey",
        F.lit("Account balance: ").alias("begin_ctx"),
        hit["value"].alias("extracted"),
    )


@register(
    "segment_selection_jsonpath",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k_value
    FROM events WHERE event_type = 'purchase'
    """,
)
def segment_selection_jsonpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 JSONPath segment selection (`docs/advanced.md:131-175`):
    extraction scoped to a JSON segment of the raw doc."""
    ev = load_tables(spark, sf_dir)["events"]
    return (ev.filter(F.col("event_type") == "purchase")
            .select("event_id",
                    X.select_segment(F.col("props"), "$.k").alias("k_value")))


@register(
    "kg_index_long",
    oracle="""
    WITH derived AS (
      SELECT doc_id, lang,
             'contact doc' || CAST(doc_id AS VARCHAR)
               || '@example.com posted 2024-01-15' AS txt
      FROM documents
    )
    SELECT doc_id, 'email' AS field, 'extract_email' AS method,
           'raw_content' AS segment,
           'doc' || CAST(doc_id AS VARCHAR) || '@example.com' AS value,
           'doc' || CAST(doc_id AS VARCHAR) || '@example.com' AS key
    FROM derived
    UNION ALL
    SELECT doc_id, 'event_date', 'extract_date', 'raw_content',
           '2024-01-15', '2024-01-15' FROM derived
    UNION ALL
    SELECT doc_id, 'language', 'extract_as_is', 'field', lang, lang FROM derived
    """,
)
def kg_index_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG assembly + field indexing end-to-end (`etk_worker.py:104-121`):
    kg_build from three extractors → kg_index long-format flattening — the
    `index_knowledge_graph_fields` equivalent. Two narrow generators, no
    shuffle."""
    docs = load_tables(spark, sf_dir)["documents"]
    txt = F.concat(F.lit("contact doc"), F.col("doc_id").cast("string"),
                   F.lit("@example.com posted 2024-01-15"))
    d = docs.select("doc_id", "lang", txt.alias("txt"))
    kg = kg_build(d, {
        "email": X.extract_email(F.col("txt")),
        "event_date": X.extract_date_iso(F.col("txt")),
        "language": X.extract_as_is(F.col("lang")),
    })
    return kg_index(kg)


@register(
    "high_confidence_keys",
    oracle=f"""
    SELECT d.doc_id,
           string_agg(DISTINCT g.term, '|' ORDER BY g.term) AS high_confidence_keys
    FROM documents d
    CROSS JOIN (VALUES {_GLOSSARY_VALUES_SQL}) AS g(term)
    WHERE POSITION(' ' || g.term || ' ' IN ' ' || LOWER(d.text) || ' ') > 0
    GROUP BY d.doc_id
    """,
)
def high_confidence_keys_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`indexed.<f>.high_confidence_keys` (`type_field_group_by_mappings
    .json:6-12`): per-doc sorted distinct keys — the facet group-by basis."""
    docs = load_tables(spark, sf_dir)["documents"]
    matches = X.glossary_matches(docs, "text", _glossary_df(spark))
    idx = matches.select("doc_id", F.lit("keyword").alias("field"),
                         F.col("term").alias("key"))
    return (high_confidence_keys(idx)
            .select("doc_id",
                    F.array_join("high_confidence_keys", "|")
                     .alias("high_confidence_keys")))


@register(
    "url_canonicalize",
    oracle="""
    SELECT doc_id,
           'http://example.com/Path/p' || doc_id::VARCHAR || '?a=1&b=2'
             AS canonical
    FROM documents
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (`functions/extractors.py:canonicalize_url`):
    scheme/host case noise, the default port, a fragment, tracking params
    and query-param order are all stripped/normalized; the oracle states
    the expected canonical form directly, so the whole transformation
    chain is what's under test. Path case is preserved."""
    docs = load_tables(spark, sf_dir)["documents"]
    noisy = F.concat(
        F.lit("HTTP://Example.COM:80/Path/p"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=x&b=2&fbclid=zz&a=1#frag"))
    return docs.select("doc_id",
                       X.canonicalize_url(noisy).alias("canonical"))
