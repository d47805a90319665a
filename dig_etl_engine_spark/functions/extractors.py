"""Extraction operators (SURVEY.md §2.5 X1–X12) as native column functions.

The reference's extractors are doc-at-a-time Python (ETK library; call sites
in /root/reference: `datasets/etk_modules/em_elicit.py`, generated
`em_base.py`, defaults wired in `utilities/data_import/
generate_mydig_config.py:45-63`). Here every extractor is a Column
expression returning `array<struct<value,key,method,segment>>` so KG
assembly is uniform (SURVEY §7.1 step 3) — and stays inside whole-stage
codegen: regex family via `regexp_extract_all`, glossaries via a broadcast
terms join, HTML via regex zone strippers. No row-at-a-time Python anywhere
(risk R1).

`key` is the search key: the normalized (lowercased, trimmed) value — the
reference computes keys in digsandpaper's field indexing; lowercase-trim is
its observable behavior on string fields.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from dig_etl_engine_spark.functions.casefold import ascii_initcap, safe_lower

# Result element type shared by all extractors (schemas.KG_VALUE minus
# confidence, which kg_build attaches).
_RESULT = "array<struct<value:string,key:string,method:string,segment:string>>"


def _results(values: Column, method: str, segment: str) -> Column:
    """Wrap an array<string> of raw matches into the uniform result shape."""
    return F.transform(
        values,
        lambda v: F.struct(
            v.alias("value"),
            safe_lower(F.trim(v)).alias("key"),
            F.lit(method).alias("method"),
            F.lit(segment).alias("segment"),
        ),
    ).cast(_RESULT)


def extract_regex(col: Column, pattern: str, *, method: str = "regex",
                  segment: str = "raw_content", group: int = 0) -> Column:
    """Generic regex extractor — the X7/X9 family backbone
    (`generate_mydig_config.py:52-56` wires these as default extractors)."""
    return _results(F.regexp_extract_all(col, F.lit(pattern), F.lit(group)),
                    method, segment)


# X7: email (`generate_mydig_config.py:52-56`)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# X9 family (imports in elicit tarball em_base.py:14-21)
URL_RE = r"https?://[^\s\"'<>]+"
IP_RE = r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b"
CVE_RE = r"CVE-\d{4}-\d{4,7}"
BTC_RE = r"\b[13][a-km-zA-HJ-NP-Z1-9]{25,34}\b"
# md5(32) / sha1(40) / sha256(64) exactly — longest alternative first so a
# sha256 isn't reported as its md5-length prefix; no 56-char false positive
HASH_RE = r"\b(?:[a-fA-F0-9]{64}|[a-fA-F0-9]{40}|[a-fA-F0-9]{32})\b"
# Phone shape contract: prefix optional ('213-555-0147' matches, the
# original mandatory \d{1,2} prefix missed it) BUT a separator, parens,
# or an explicit '+' is required — a bare 10-digit run ('1734567890',
# order ids, unix timestamps) is NOT a phone, so redact_pii can't corrupt
# numeric ids. The separated prefix is anchored ('+' or \b) so a match
# can't start mid-digit-run; E.164 compact forms (+12135550147) match via
# the last alternative. \b guards the tail; no lookbehind (the DuckDB/RE2
# oracle has none). Users needing the reference's bare 'dddddddddd' rule
# get it via the X6 token-rule compiler.
PHONE_RE = (r"(?:(?:\+|\b)\d{1,2}[\s.-])?"
            r"(?:\(\d{3}\)[\s.-]?|\b\d{3}[\s.-])"
            r"\d{3}[\s.-]?\d{4}\b"
            r"|\+\d{10,14}\b")


def extract_email(col: Column, segment: str = "raw_content") -> Column:
    return extract_regex(col, EMAIL_RE, method="extract_email", segment=segment)


def extract_url(col: Column, segment: str = "raw_content") -> Column:
    return extract_regex(col, URL_RE, method="extract_url", segment=segment)


def extract_ip(col: Column, segment: str = "raw_content") -> Column:
    return extract_regex(col, IP_RE, method="extract_ip", segment=segment)


def extract_cve(col: Column, segment: str = "raw_content") -> Column:
    return extract_regex(col, CVE_RE, method="extract_cve", segment=segment)


def extract_phone(col: Column, segment: str = "raw_content") -> Column:
    """X6 simple-shape path: phone as regex (the reference's spacy token
    rules for phone, `museum tar.gz → spacy_rules/phone.json`, reduce to a
    digit-shape regex for the common formats)."""
    return extract_regex(col, PHONE_RE, method="extract_phone", segment=segment)


def extract_bitcoin(col: Column, segment: str = "raw_content") -> Column:
    """X9 BitcoinAddress extractor (`em_base.py:14-21` imports in elicit
    tarball): base58 P2PKH/P2SH shape."""
    return extract_regex(col, BTC_RE, method="extract_bitcoin", segment=segment)


def extract_crypto_hash(col: Column, segment: str = "raw_content") -> Column:
    """X9 CryptographicHash extractor: md5/sha1/sha256 hex-digest shapes."""
    return extract_regex(col, HASH_RE, method="extract_crypto_hash",
                         segment=segment)


def extract_html_tables(col: Column) -> Column:
    """X9 Table extractor (`em_base.py:14-21`; ETK's TableExtractor parses
    ``<table>`` markup into rows of cell text). Fully native — nested
    `regexp_extract_all` + `transform`, so the parse stays JVM-side inside
    whole-stage codegen (no Python in the hot path at 100 TB):
    rows = ``<tr>`` bodies, cells = ``<td>``/``<th>`` bodies with inner
    tags stripped and whitespace trimmed. Returns array<array<string>>
    (rows × cells) for the first-and-all tables in the document."""
    rows = F.regexp_extract_all(
        col, F.lit(r"(?is)<tr[^>]*>(.*?)</tr>"), F.lit(1))
    return F.transform(
        rows,
        lambda r: F.transform(
            F.regexp_extract_all(
                r, F.lit(r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"), F.lit(1)),
            # regexp trim, not F.trim: trim() strips only ' ' — HTML cell
            # bodies carry newlines/tabs too
            lambda c: F.regexp_replace(
                F.regexp_replace(c, r"<[^>]+>", ""), r"^\s+|\s+$", "")))


def extract_hostname(url_col: Column) -> Column:
    """X8: website/hostname from url (`em_base.py:70-79` in elicit tarball;
    `predefined_extractor: "TLD"`). Native `parse_url`."""
    host = F.parse_url(url_col, F.lit("HOST"))
    return _results(F.when(host.isNotNull(), F.array(host))
                     .otherwise(F.array().cast("array<string>")),
                    "hostname", "url")


TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def canonicalize_url(col: Column) -> Column:
    """URL canonicalization — the normalization web-corpus dedup keys on
    (the reference stores raw ``url`` per CDR doc; near-identical URLs
    with tracking params / case noise / default ports would defeat
    doc_id-by-url dedup):

      * fragment dropped;  * scheme + host lowercased (path case kept);
      * default port stripped (:80 for http, :443 for https);
      * tracking params removed (utm_*, fbclid, gclid, msclkid, ref);
      * surviving query params sorted for order-independence.

    Pure native string/array expressions (regex + array_sort inside
    codegen) — deliberately regex-based rather than parse_url so an
    oracle can restate the identical transformation."""
    u = F.regexp_replace(col, r"#.*$", "")
    prefix = F.regexp_extract(u, r"^[^:/?]+://[^/?#]*", 0)
    lowered = safe_lower(prefix)
    lowered = F.when(lowered.startswith("http://"),
                     F.regexp_replace(lowered, r":80$", "")) \
        .when(lowered.startswith("https://"),
              F.regexp_replace(lowered, r":443$", "")) \
        .otherwise(lowered)
    rest = F.substring(u, F.length(prefix) + 1, F.lit(1 << 30))
    path = F.regexp_replace(rest, r"\?.*$", "")
    q = F.regexp_extract(rest, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    return F.concat(
        lowered, path,
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")))


def extract_as_is(col: Column, *, segment: str = "field") -> Column:
    """X10 identity extractor (`generate_mydig_config.py:226-231`)."""
    s = col.cast("string")
    return _results(F.when(s.isNotNull(), F.array(s))
                     .otherwise(F.array().cast("array<string>")),
                    "extract_as_is", segment)


_MONTHS_RE = (r"Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
              r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|"
              r"Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?")


def _norm_textual(d: Column) -> Column:
    """'January 5, 2021' / '5 Jan 2021' token order handled by caller; this
    normalizes a comma-stripped initcap'd candidate under both month-name
    widths."""
    # ascii_initcap: `d` is a regexp_extract match of ASCII-only date
    # patterns (month names + digits), so initcap's locale-sensitive
    # non-ASCII path is unreachable — see functions/casefold.py
    clean = ascii_initcap(F.regexp_replace(d, ",", ""))
    return F.date_format(F.coalesce(
        F.try_to_timestamp(clean, F.lit("MMMM d yyyy")),
        F.try_to_timestamp(clean, F.lit("MMM d yyyy")),
        F.try_to_timestamp(clean, F.lit("d MMMM yyyy")),
        F.try_to_timestamp(clean, F.lit("d MMM yyyy"))), "yyyy-MM-dd")


def extract_date_iso(col: Column, segment: str = "raw_content", *,
                     two_digit_years: bool = False,
                     ref_year: int | None = None,
                     ignore_past_years: int = 100) -> Column:
    """X3 DateExtractor, native path: find dates in free text and
    normalize to yyyy-MM-dd. The reference delegates to ETK's
    dateutil-backed extractor (`em_elicit.py:52-54`) with a
    ``parse_date_generic`` post-filter carrying ``ignore_past_years: 100``
    (`generate_mydig_config.py:255-267`); the normalization contract
    (found text → ISO date string) is preserved for every format a regex
    can anchor:

      * ISO ``yyyy-MM-dd``          * slash ``M/d/yyyy`` and ``yyyy/M/d``
      * textual ``Month d, yyyy`` and ``d Month yyyy`` (full or abbrev.)
      * dotted ``d.M.yyyy``
      * 2-digit-year ``M/d/yy`` (opt-in): century resolved with dateutil's
        pivot — base 2000, then ±100 toward ``ref_year`` when ≥50 away —
        so '1/5/99' → 1999, '1/5/21' → 2021.

    Candidates that fail to parse as real dates drop out (try-semantics),
    and any date more than ``ignore_past_years`` before ``ref_year``
    (default: the driver's current year at plan time) is discarded — the
    reference's post-filter. Fully native: regex + try_to_timestamp /
    make_date inside codegen, no Python in the row path."""
    import datetime

    ry = ref_year if ref_year is not None else datetime.date.today().year

    iso_raw = F.regexp_extract_all(col, F.lit(r"\b(\d{4}-\d{2}-\d{2})\b"),
                                   F.lit(1))
    # parse-validate like every other family: '2021-13-45' is a regex hit
    # but not a date
    iso = F.transform(iso_raw, lambda d: F.date_format(
        F.try_to_timestamp(d, F.lit("yyyy-MM-dd")), "yyyy-MM-dd"))
    slash = F.regexp_extract_all(col, F.lit(r"\b(\d{1,2}/\d{1,2}/\d{4})\b"), F.lit(1))
    norm_slash = F.transform(slash, lambda d: F.date_format(
        F.try_to_timestamp(d, F.lit("M/d/yyyy")), "yyyy-MM-dd"))
    # textual-month "January 5, 2021" / "Jan 5 2021" (case-insensitive)
    textual = F.regexp_extract_all(
        col, F.lit(rf"(?i)\b((?:{_MONTHS_RE})\s+\d{{1,2}},?\s+\d{{4}})\b"),
        F.lit(1))
    # day-first textual "5 Jan 2021" / "05 January 2021"
    textual_df = F.regexp_extract_all(
        col, F.lit(rf"(?i)\b(\d{{1,2}}\s+(?:{_MONTHS_RE})\s+\d{{4}})\b"),
        F.lit(1))
    # year-first slash "2021/1/5"
    ymd = F.regexp_extract_all(col, F.lit(r"\b(\d{4}/\d{1,2}/\d{1,2})\b"),
                               F.lit(1))
    norm_ymd = F.transform(ymd, lambda d: F.date_format(
        F.try_to_timestamp(d, F.lit("yyyy/M/d")), "yyyy-MM-dd"))
    # dotted day-first "5.1.2021" (European)
    dotted = F.regexp_extract_all(
        col, F.lit(r"\b(\d{1,2}\.\d{1,2}\.\d{4})\b"), F.lit(1))
    norm_dotted = F.transform(dotted, lambda d: F.date_format(
        F.try_to_timestamp(d, F.lit("d.M.yyyy")), "yyyy-MM-dd"))

    families = [iso, norm_slash,
                F.transform(textual, _norm_textual),
                F.transform(textual_df, _norm_textual),
                norm_ymd, norm_dotted]

    if two_digit_years:
        mdyy = F.regexp_extract_all(
            col, F.lit(r"\b(\d{1,2}/\d{1,2}/\d{2})\b"), F.lit(1))

        def norm_mdyy(d: Column) -> Column:
            p = F.split(d, "/")
            base = F.lit(2000) + p.getItem(2).cast("int")
            year = (F.when(base - F.lit(ry) >= 50, base - 100)
                    .when(base - F.lit(ry) <= -50, base + 100)
                    .otherwise(base))
            return F.date_format(
                F.try_to_timestamp(
                    F.concat_ws("-", year.cast("string"), p.getItem(0),
                                p.getItem(1)), F.lit("y-M-d")),
                "yyyy-MM-dd")

        families.append(F.transform(mdyy, norm_mdyy))

    found = F.filter(
        F.concat(*families),
        lambda d: d.isNotNull()
        & (F.substring(d, 1, 4).cast("int") >= ry - ignore_past_years))
    return _results(found, "extract_date", segment)


# --- X4 glossary extraction ---------------------------------------------------

def glossary_matches(docs: DataFrame, text_col: str, glossary: DataFrame,
                     term_col: str = "term", *, doc_key: str = "doc_id",
                     case_sensitive: bool = False) -> DataFrame:
    """X4 GlossaryExtractor (`em_elicit.py:15-26`; `docs/advanced.md:104-119`):
    dictionary match over token n-grams (terms up to 3 tokens,
    case_sensitive=False).

    Semantics: a term matches a doc iff it appears as a whole-token phrase
    (token-boundary, not substring). Returns (doc_key, term) distinct pairs.

    Scale shape: the glossary side is broadcast (glossaries are KB–MB), the
    doc side streams — a broadcast nested-loop with a cheap `contains`
    predicate, no shuffle of the corpus. For glossaries too large to
    broadcast, explode doc tokens and hash-join on token instead.
    """
    t = F.col(text_col) if case_sensitive else safe_lower(F.col(text_col))
    term = F.col(term_col) if case_sensitive else safe_lower(F.col(term_col))
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    # Project the padded casefold BELOW the join (r12, guide §2.4/§4.2):
    # inlined in the join condition it re-evaluates the full-text
    # lower()/translate() once per (doc, term) PAIR — |glossary|× per
    # document; as a child Project it runs once per document and the
    # per-pair work is a bare Contains. Also prunes the doc side to the
    # two columns the join needs (§2.3).
    # The dedup is repartitioned by doc_key ALONE (r12, guide §2.4):
    # HashPartitioning(doc_key) satisfies the (doc_key, term) dedup's
    # clustering requirement AND every downstream doc-keyed consumer —
    # the search compiler's per-doc dedup + score aggregation and its
    # doc join, high_confidence_keys' per-doc collect — so the whole
    # chain shares this ONE exchange instead of re-shuffling per step.
    # The trade (map-side partial dedup now happens above the exchange,
    # not below) costs nothing here: with the broadcast side distinct'd
    # the contains join emits exactly one row per matching (doc, term)
    # pair, so there are no duplicates for a partial aggregate to
    # collapse and the final distinct is pure safety.
    return (
        docs.select(F.col(doc_key), padded.alias("__pt"))
        .join(
            # distinct: exact-duplicate glossary entries (and case-fold
            # collisions) must collapse on the KB-sized broadcast side,
            # not multiply join output across the doc_key exchange —
            # this is what makes the at-most-one-row-per-(doc, term)
            # claim below true for ANY glossary (wave-6 review
            # finding 4)
            F.broadcast(glossary.select(term.alias("__term")).distinct()),
            F.col("__pt").contains(
                F.concat(F.lit(" "), F.col("__term"), F.lit(" "))),
        )
        .select(F.col(doc_key), F.col("__term").alias("term"))
        .repartition(F.col(doc_key))
        .distinct()
    )


def glossary_matches_ngram_join(docs: DataFrame, text_col: str,
                                glossary: DataFrame, term_col: str = "term",
                                *, doc_key: str = "doc_id",
                                max_ngram: int = 3) -> DataFrame:
    """X4 glossary matching, the SCALE path: for glossaries too large to
    broadcast (entity dictionaries in the millions), explode each doc's
    token n-grams (n = 1..max_ngram, the reference's ngrams=3) and
    hash-join on the normalized term string.

    Cost: corpus tokens × max_ngram rows shuffle-joined against the term
    table — linear, partitionable, skew-free (n-gram keys are near-unique);
    vs the broadcast path's docs × |glossary| `contains` evaluations.
    Semantics note: token n-grams normalize runs of whitespace to single
    spaces; multi-token glossary terms must be single-space separated
    (the broadcast path matches the raw-spacing substring instead).
    """
    from dig_etl_engine_spark.operators.dedup import shingles

    t = safe_lower(F.col(text_col))
    grams = None
    for n in range(1, max_ngram + 1):
        g = docs.select(
            F.col(doc_key),
            F.explode(F.array_distinct(shingles(t, n))).alias("gram"))
        grams = g if grams is None else grams.unionByName(g)
    terms = glossary.select(
        F.regexp_replace(F.trim(safe_lower(F.col(term_col))), r"\s+", " ")
        .alias("gram")).distinct()
    return (grams.join(terms, "gram")
            .select(F.col(doc_key), F.col("gram").alias("term"))
            .distinct())


# --- X1/X2 HTML content & metadata -------------------------------------------

_TAG_RE = r"<[^>]+>"
_SCRIPT_RE = r"(?s)<(script|style)[^>]*>.*?</\1>"


def html_all_text(col: Column) -> Column:
    """X1 strategy ALL_TEXT: strip script/style then all tags, collapse
    whitespace (`em_base.py:41-50` zones; readability's observable output
    for plain pages). Native regex chain — no Python in the row path."""
    no_script = F.regexp_replace(col, _SCRIPT_RE, " ")
    no_tags = F.regexp_replace(no_script, _TAG_RE, " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def html_title(col: Column) -> Column:
    """X2 HTMLMetadataExtractor, title part (`em_elicit.py:40-46`)."""
    return F.trim(F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title>", 1))


def html_main_content(col: Column, strict: bool = True) -> Column:
    """X1 MAIN_CONTENT_STRICT/RELAXED approximation: strict keeps only
    paragraph-ish block text (<p>, <article>); relaxed = ALL_TEXT minus
    title. The reference's readability heuristics are library-internal; the
    zone contract (3 text columns feeding `content_extraction.*`,
    `type_field_mappings.json:73-75`) is what downstream consumes."""
    if strict:
        paras = F.regexp_extract_all(
            col, F.lit(r"(?is)<(?:p|article)[^>]*>(.*?)</(?:p|article)>"), F.lit(1))
        joined = F.array_join(F.transform(
            paras, lambda p: F.regexp_replace(p, _TAG_RE, " ")), " ")
        return F.trim(F.regexp_replace(joined, r"\s+", " "))
    return html_all_text(col)


# --- X5 landmark/inferlink rules ----------------------------------------------

def landmark_rule(col: Column, begin_regex: str, end_regex: str,
                  field: str) -> Column:
    """X5 InferlinkExtractor: learned `begin_regex`/`end_regex` template
    rules slicing named fields out of raw HTML (`em_base.py:60-68`; rules
    sample `sample-projects/museum/...consolidated_rules.json`). One rule →
    one non-greedy capture regex, executed natively."""
    pat = f"(?s){begin_regex}(.*?){end_regex}"
    return extract_regex(col, pat, method="extract_from_landmark",
                         segment=field, group=1)


def landmark_ruleset(df: DataFrame, text_col: str,
                     rules_by_tld: Mapping[str, list[dict]],
                     *, tld_col: str = "tld",
                     doc_key: str = "doc_id") -> DataFrame:
    """X5, the full rule-set shape: per-TLD lists of learned ItemRules
    (museum tarball ``landmark_rules/consolidated_rules.json``: each rule
    has ``name``, ``begin_regex``, ``end_regex``, ``removehtml``,
    ``strip_end_regex``) routed by the doc's TLD — the reference's
    per-site template extraction (`em_base.py:60-68`).

    Compiles to one CASE over TLD producing an array of (field, value)
    structs, exploded to long rows — all native regex, codegen'd, no
    Python; rule routing costs one branch per TLD, not a join.
    """
    branches = []
    for tld, rules in rules_by_tld.items():
        entries = []
        for rule in rules:
            field = rule["name"].split("-")[0]
            pat = f"(?s){rule['begin_regex']}(.*?){rule['end_regex']}"
            v = F.regexp_extract(F.col(text_col), pat, 1)
            if rule.get("removehtml"):
                v = F.trim(F.regexp_replace(
                    F.regexp_replace(v, _TAG_RE, " "), r"\s+", " "))
            if rule.get("strip_end_regex"):
                v = F.trim(F.regexp_replace(
                    v, rule["strip_end_regex"] + r"\s*$", ""))
            entries.append(F.struct(F.lit(field).alias("field"),
                                    v.alias("value")))
        branches.append((tld, F.array(*entries)))

    out = F.lit(None).cast(
        "array<struct<field:string,value:string>>")
    for tld, arr in reversed(branches):
        out = F.when(F.col(tld_col) == tld, arr).otherwise(out)
    exploded = df.select(F.col(doc_key), F.explode(out).alias("x"))
    return exploded.select(
        doc_key, F.col("x.field").alias("field"),
        F.col("x.value").alias("value")).filter(F.col("value") != "")


# --- X12 segment selection ----------------------------------------------------

def select_segment(json_col: Column, json_path: str) -> Column:
    """X12 JSONPath segment selection (`docs/advanced.md:131-175`): scope
    extraction to a named doc segment. Segments are columns when the schema
    is known; for raw JSON docs, `get_json_object` evaluates the path."""
    return F.get_json_object(json_col, json_path)


def spacy_rule_extractor(col: Column, rule_doc: Mapping, *,
                         segment: str = "raw_content") -> Column:
    """X6 SpacyRuleExtractor (token-pattern rules, `em_base.py:12`; rule
    files like museum tarball ``spacy_rules/{phone,stock_ticker}.json``).

    Delegates to :mod:`dig_etl_engine_spark.functions.token_rules`: each
    active rule's token-constraint pattern compiles driver-side to ONE
    regex (shape / vocab / punctuation / number constraints — the complete
    surface the reference's shipped rules use), executed natively by
    ``regexp_extract_all``. Raises ``NotImplementedError`` only for
    POS/lemma constraints, which genuinely need an NLP model (heavy
    optional dependency, SURVEY §2.5 X6 gate).
    """
    from dig_etl_engine_spark.functions.token_rules import (
        compile_etk_rule_file)

    compiled = compile_etk_rule_file(dict(rule_doc))
    out = None
    for _ident, regexes in sorted(compiled.items()):
        for pat in regexes:
            matches = F.regexp_extract_all(col, F.lit(pat), F.lit(0))
            out = matches if out is None else F.concat(out, matches)
    if out is None:
        out = F.array().cast("array<string>")
    return _results(F.array_distinct(out), "spacy_rule_extractor", segment)
