"""Text-analysis operators for training-data pipelines (BASELINE.json north
star; SURVEY §7.1 step 10): language-ID, quality scoring, token counting,
document fingerprinting.

All native Column expressions — at 100 TB these run inside whole-stage
codegen over the corpus scan, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dig_etl_engine_spark.operators.pin import pin as _pin
from dig_etl_engine_spark.functions.bindings import bind_once
from dig_etl_engine_spark.functions.localdf import local_df
from dig_etl_engine_spark.functions.casefold import safe_lower, sql_safe_lower
from dig_etl_engine_spark.functions import exact as _ex

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# (A production pack would ship per-language frequency tables; the operator
# contract — argmax of stopword-hit ratio with a floor — is what's pinned.)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "is", "of", "and"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "est", "un"],
    "es": ["el", "la", "es", "y", "un"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization — the shared basis for all text ops."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs and
    punctuation marks — a deterministic stand-in for a tokenizer vocab
    (ratio letters/4 is the classic chars/4 heuristic; this one is exact
    over the regex classes)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"),
                                       F.lit(0)))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(safe_lower(col))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def distinct_token_ratio(col: Column) -> Column:
    """Lexical diversity: distinct/total tokens (repetition detector)."""
    toks = tokens(safe_lower(col))
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards lexical diversity and
    mid-range token length, penalizes stopword stuffing — the
    length/punct/stopword-ratio family of filters used to gate training
    corpora. Deterministic; weights documented in the expression."""
    return F.round(
        0.5 * distinct_token_ratio(col)
        + 0.3 * (1.0 - stopword_ratio(col))
        + 0.2 * F.least(mean_token_length(col) / 8.0, F.lit(1.0)),
        6,
    )


def lang_id(col: Column) -> Column:
    """Language-ID heuristic: argmax stopword-hit ratio across language
    lists; below a 2% floor → 'und'. Ties broken by language code order
    (deterministic)."""
    toks = tokens(safe_lower(col))
    n = F.greatest(F.size(toks), F.lit(1))
    best_lang = F.lit("und")
    best_ratio = F.lit(0.02)
    for code in sorted(LANG_STOPWORDS):  # later wins only on strictly-greater
        sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS[code]])
        ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n
        better = ratio > best_ratio
        best_lang = F.when(better, F.lit(code)).otherwise(best_lang)
        best_ratio = F.when(better, ratio).otherwise(best_ratio)
    return best_lang


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(safe_lower(col), r"\s+", " "))


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text — the exact-dedup
    key (a rolling/Rabin hash family reduces to this contract for whole-doc
    fingerprints)."""
    return F.md5(normalize_text(col))


def redact_pii(col: Column, *, email: bool = True, ip: bool = True,
               phone: bool = True) -> Column:
    """PII redaction for training corpora: emails / IPv4s / phone numbers
    replaced by typed placeholder tokens — the scrub pass an LLM data
    pipeline runs before tokenization.

    Native ``regexp_replace`` chain sharing the X7/X9 extractor patterns
    (one pass per class inside codegen, no Python). Application order
    email → ip → phone is part of the contract: the phone shape could
    otherwise bite into a dotted IPv4.
    """
    from dig_etl_engine_spark.functions.extractors import (
        EMAIL_RE, IP_RE, PHONE_RE)

    out = col
    if email:
        out = F.regexp_replace(out, EMAIL_RE, "[EMAIL]")
    if ip:
        out = F.regexp_replace(out, IP_RE, "[IP]")
    if phone:
        out = F.regexp_replace(out, PHONE_RE, "[PHONE]")
    return out


def pack_sequences(df, *, id_col: str = "doc_id", text_col: str = "text",
                   budget: int = 2048, n_buckets: int | None = None):
    """Sequence packing for LLM training: documents greedily packed into
    ~``budget``-token sequences by running token total, WITHIN hash
    buckets. Packing is inherently sequential, so the global order is
    sharded into ``n_buckets`` independent bucket streams that pack in
    parallel (one window shuffle on bucket); a global single-stream pack
    would serialize the corpus through one task.

    ``n_buckets`` defaults to ``sparkContext.defaultParallelism`` so the
    packing stage's task count scales with the cluster instead of
    capping at a constant — on a 1000-executor cluster the default gives
    every core a stream; pass an explicit value when reproducing a
    specific sharding (the registry's oracle query pins 32).

    seq_id = floor(tokens-before / budget): deterministic and
    reproducible across engines and bucket counts — a document's
    (bucket, seq_id) depends only on the ids hashed into its bucket.

    Output: ``(id, bucket, n_tokens, seq_id)``.
    """
    from pyspark.sql import Window as W

    if n_buckets is None:
        n_buckets = df.sparkSession.sparkContext.defaultParallelism
    toks = df.select(
        F.col(id_col).alias(id_col),
        (F.col(id_col) % F.lit(n_buckets)).alias("bucket"),
        token_count(F.col(text_col)).alias("n_tokens"))
    w = (W.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(W.unboundedPreceding, 0))
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        id_col, "bucket", "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).alias("seq_id"))


def chunk_documents(df, *, id_col: str = "doc_id", text_col: str = "text",
                    chunk_tokens: int = 512, overlap: int = 64):
    """Split documents into overlapping token-window chunks — the prep
    step for embedding/RAG indexing and for long-doc training samples.

    Chunks start every ``chunk_tokens - overlap`` tokens; the final chunk
    is the remainder (never empty, docs shorter than ``chunk_tokens``
    yield exactly one whole-doc chunk). Output: one row per chunk —
    ``(id, chunk_id, chunk_text, n_tokens)``, ``chunk_id`` 0-based in
    document order.

    Shape: pure column algebra — tokenize once, build the start-offset
    sequence, posexplode, slice + rejoin. Narrow (no shuffle); chunk rows
    stay partition-local with their document, exactly like kg_index's
    generators."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    # null text counts as empty (one empty chunk), honoring the
    # "never empty" contract and the null-coalescing convention shared
    # with quality_features / global_line_dedup — a null here would
    # posexplode to zero rows and silently drop the document
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(toks)
    # start offsets 0, stride, 2*stride, … while start < n (always ≥ one)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1),
                         lambda i: i * stride)
    return (df.select(
        F.col(id_col),
        F.size(toks).alias("_n"),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"))
        .select(
            id_col, "chunk_id",
            F.concat_ws(" ", F.slice("_toks", F.col("_start") + 1,
                                     F.lit(chunk_tokens)))
             .alias("chunk_text"),
            F.least(F.lit(chunk_tokens),
                    F.col("_n") - F.col("_start")).alias("n_tokens")))


def ngram_hashes(col: Column, n: int = 13) -> Column:
    """Hashed word n-grams of a text column (array<long>), the unit of
    benchmark decontamination. Same zip-shifted-slices shape as
    ``dedup.shingles`` (never re-split inside a per-element lambda — the
    O(n²) tokenization cliff documented there); xxhash64 because
    decontamination needs speed, not cross-engine md5 stability. Docs
    shorter than ``n`` tokens yield one whole-doc gram.

    The tokenization is BOUND ONCE per row (r10): inlined, the zip tree
    references it 2n times (n slices + n inlined length bounds) and
    generator trees get no CSE — at n=13 that re-ran the split (and the
    casefold pre-fold under it) 26× per row, 5.3× slower at sf0.1. See
    ``functions/bindings.py`` for the mechanism and measurements."""
    return bind_once(
        F.split(F.trim(safe_lower(col)), r"\s+"),
        lambda toks: _ngrams_of(toks, n))


def _ngrams_of(toks: Column, n: int) -> Column:
    """n-gram hashes of a BOUND token-array reference (see
    :func:`ngram_hashes` — callers must not pass an expensive
    expression here, that would re-inline it 2n times)."""
    n_out = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, 1 + j, n_out) for j in range(n)])
    return F.transform(
        zipped,
        lambda s: F.xxhash64(F.concat_ws(
            " ", *[s[str(j)] for j in range(n)])))


def decontaminate(corpus, eval_set, *, n: int = 13,
                  corpus_text: str = "text", eval_text: str = "text",
                  id_col: str = "doc_id"):
    """Benchmark decontamination (the GPT-3/Pile 13-gram rule): flag every
    corpus document sharing at least one word ``n``-gram with the eval
    set, so test data can be dropped from training corpora.

    Returns ``(doc_id, n_hits)`` for CONTAMINATED docs only — filtering
    is an anti-join back on the corpus. ``n_hits`` = distinct overlapping
    grams (triage signal: 1 hit is often a quoted sentence, hundreds is a
    verbatim inclusion).

    Scale shape: the eval side (benchmarks — thousands of docs, not
    billions) collapses to DISTINCT gram hashes and BROADCASTS; the
    corpus explodes to (doc, gram) rows that semi-join the broadcast
    hash set with zero shuffle of corpus data, then one groupBy(doc)
    count. Corpus text itself never moves — only 8-byte hashes."""
    grams = corpus.select(
        F.col(id_col),
        F.explode(ngram_hashes(F.col(corpus_text), n)).alias("g"))
    eval_grams = (eval_set.select(
        F.explode(ngram_hashes(F.col(eval_text), n)).alias("g"))
        .distinct())
    return (grams.join(F.broadcast(eval_grams), "g", "left_semi")
            .groupBy(id_col)
            .agg(F.count_distinct("g").alias("n_hits")))


def remove_contaminated_spans(corpus, eval_set, *, n: int = 13,
                              corpus_text: str = "text",
                              eval_text: str = "text",
                              id_col: str = "doc_id"):
    """Span-level decontamination: instead of dropping every document
    that shares an ``n``-gram with the eval set (:func:`decontaminate`),
    REMOVE just the tokens covered by a matching gram and keep the rest
    of the document — the trim-the-leak-keep-the-doc policy large
    curation pipelines apply when whole-doc dropping would cost too much
    volume. Returns ``(id, text, n_removed)`` with ``text`` rebuilt from
    the surviving tokens in order (single-space joined; a doc that was
    one big quote comes back empty) and ``n_removed`` = distinct token
    positions cut. Matching is case-insensitive; surviving tokens keep
    their original case.

    Shape: eval grams collapse to a broadcast DISTINCT set (benchmarks
    are small by contract); corpus grams carry their start position
    (posexplode over the zip-built gram array — never slice-in-lambda,
    the O(n²) cliff in ``dedup.shingles``), semi-join the broadcast set,
    and explode to covered positions (bounded by hits·n). One
    groupBy(id) rebuild shuffle — the ``global_line_dedup`` shape;
    corpus text never shuffles for detection, only for rebuild."""
    from dig_etl_engine_spark.operators.dedup import shingles

    toks = F.split(F.trim(F.col(corpus_text)), r"\s+")
    base = corpus.select(F.col(id_col).alias("id"),
                         toks.alias("toks"),
                         F.size(toks).alias("n_toks"))
    grams = corpus.select(
        F.col(id_col).alias("id"), F.size(toks).alias("n_toks"),
        F.posexplode(shingles(safe_lower(F.col(corpus_text)), n))
         .alias("pos", "gram"))
    eval_grams = (eval_set.select(
        F.explode(shingles(safe_lower(F.col(eval_text)), n)).alias("gram"))
        .distinct())
    covered = (grams.join(F.broadcast(eval_grams), "gram", "left_semi")
               .select("id", F.explode(F.sequence(
                   F.col("pos"),
                   F.least(F.col("pos") + n, F.col("n_toks")) - 1))
                   .alias("tpos"))
               .distinct())
    tok_rows = base.select(
        "id", F.posexplode("toks").alias("tpos", "tok"))
    kept = tok_rows.join(covered, ["id", "tpos"], "left_anti")
    rebuilt = (kept.groupBy("id")
               .agg(F.array_sort(F.collect_list(
                   F.struct("tpos", "tok"))).alias("ts"))
               .select("id", F.concat_ws(" ", F.transform(
                   "ts", lambda s: s["tok"])).alias("_rc_text")))
    removed = covered.groupBy("id").agg(
        F.count(F.lit(1)).alias("_rc_removed"))
    return (base.select("id")
            .join(rebuilt, "id", "left")
            .join(removed, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("_rc_text", F.lit("")).alias(corpus_text),
                    F.coalesce("_rc_removed", F.lit(0))
                     .alias("n_removed")))


def ngram_repetition_ratio(col: Column, n: int = 3) -> Column:
    """Gopher's duplicate n-gram fraction: 1 − distinct/total over word
    ``n``-grams — catches looped phrases that line- and token-level
    repetition miss (a spam page cycling one sentence has unique lines
    but massive trigram repetition). 0 for docs with < ``n`` tokens.
    Pure column math, no shuffle; grams built by the zip-shifted-slices
    shape (see ``dedup.shingles`` for why never per-position lambdas)."""
    # deferred import: dedup imports this module at top level
    from dig_etl_engine_spark.operators.dedup import shingles

    n_out = F.size(tokens(col)) - (n - 1)
    grams = shingles(safe_lower(col), n)
    return F.when(n_out <= 1, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(grams)) / n_out, 6))


def gopher_gates(col: Column, *, min_tokens: int = 50,
                 max_tokens: int = 100_000) -> Column:
    """The Gopher corpus-filter rule set as one struct column of boolean
    gates plus the combined verdict — apply with
    ``df.withColumn("g", gopher_gates(F.col("text"))).filter("g.pass_all")``.

    Gates (Rae et al. 2021, §A1.1, restated over whitespace tokens):
      * ``word_count``      — token count in [min_tokens, max_tokens]
      * ``mean_word_len``   — mean token length in [3, 10]
      * ``symbol_ratio``    — '#' or '…' to token ratio < 0.1
      * ``bullet_lines``    — < 90% of lines start with a bullet
      * ``ellipsis_lines``  — < 30% of lines end with an ellipsis
      * ``alpha_words``     — ≥ 80% of tokens contain a letter
      * ``stopword_hits``   — ≥ 2 distinct common-English stopwords

    Each sub-gate is exposed so curation reports can count WHY docs
    fail, not just how many. Pure column math, no shuffle."""
    toks = tokens(col)
    n = F.size(toks)
    lines = F.filter(F.transform(F.split(col, r"\n"),
                                 lambda l: F.trim(l)), lambda l: l != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_len = mean_token_length(col)
    # '#' chars plus ellipses in BOTH forms — the ASCII three-dot
    # ellipsis is the common one in web text, same as the line gate below
    symbols = (F.length(col) - F.length(F.translate(col, "#", ""))
               + F.size(F.regexp_extract_all(col, F.lit(r"(\.\.\.|…)"),
                                             F.lit(0))))
    bullets = F.size(F.filter(
        lines, lambda l: l.rlike(r"^([•‣▪*-])")))
    ellipses = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    sw = F.array(*[F.lit(s) for s in
                   ("the", "be", "to", "of", "and", "that", "have",
                    "with")])
    sw_hits = F.size(F.array_intersect(
        F.array_distinct(tokens(safe_lower(col))), sw))
    gates = {
        "word_count": (n >= min_tokens) & (n <= max_tokens),
        "mean_word_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "symbol_ratio": (symbols / F.greatest(n, F.lit(1))) < 0.1,
        "bullet_lines": (bullets / n_lines) < 0.9,
        "ellipsis_lines": (ellipses / n_lines) < 0.3,
        "alpha_words": (alpha / F.greatest(n, F.lit(1))) >= 0.8,
        "stopword_hits": sw_hits >= 2,
    }
    pass_all = None
    for g in gates.values():
        pass_all = g if pass_all is None else (pass_all & g)
    return F.struct(
        *[v.alias(k) for k, v in gates.items()],
        pass_all.alias("pass_all"))


def global_line_dedup(df, *, id_col: str = "doc_id",
                      text_col: str = "text",
                      keep_first: bool = True,
                      sep: str = "\n"):
    """C4's corpus-wide line dedup: a line occurring in more than one
    place survives only at its first occurrence (``keep_first=True``,
    ordered by doc id then line position) or nowhere (``False`` —
    "remove any line that appeared more than once"). Line equality is
    VERBATIM — whitespace-variant lines are distinct, matching the C4
    rule. Documents are reassembled in original line order; docs whose
    lines all vanish yield an empty string; columns other than
    ``text_col`` pass through untouched.

    ``sep`` picks the dedup granularity: the default ``"\\n"`` is the
    C4 line rule; ``"\\n\\n"`` dedups whole paragraphs (boilerplate
    blocks that repeat across a site while their individual lines may
    not). The separator is treated as a literal, not a regex.

    Shape: posexplode lines → groupBy(line) min/count (map-side partial
    aggregation, so a billion-copy boilerplate line combines per
    partition BEFORE the shuffle — the skew-safe shape a window over the
    line key would not have) → equi-join back (AQE skew-join covers the
    residual hot key) → regroup by doc. Equality is decided on the line
    VALUE, never a hash alone — 64-bit fingerprints collide at corpus
    scale and would silently delete innocent lines. Whitespace-only
    lines (including bare ``\\r`` from CRLF corpora) are structure, not
    content: they bypass dedup and are kept verbatim.
    """
    import re

    # the exploded line table feeds THREE consumers (the blank branch,
    # the stats groupBy, and the join-back) and exchange reuse does not
    # fire across them (measured: 4× corpus scan in the executed plan
    # unpinned) — pin it so the corpus is scanned and split once
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep)))
         .alias("pos", "line")).transform(_pin, eager=False)
    blank_pred = F.col("line").rlike(r"^\s*$")
    blank = lines.filter(blank_pred)
    content = lines.filter(~blank_pred)
    stats = content.groupBy("line").agg(
        F.min(F.struct(id_col, "pos")).alias("first"),
        F.count(F.lit(1)).alias("n"))
    joined = content.join(stats, "line")
    if keep_first:
        kept = joined.filter(F.struct(id_col, "pos") == F.col("first"))
    else:
        kept = joined.filter(F.col("n") == 1)
    kept = kept.select(id_col, "pos", "line").unionByName(blank)
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_sort(F.collect_list(
                   F.struct("pos", "line"))).alias("ls"))
               .select(id_col,
                       F.concat_ws(sep, F.transform(
                           "ls", lambda s: s["line"])).alias("_gld_text")))
    # docs that lost every line still appear (empty text), and every
    # other input column survives
    return (df.join(rebuilt, id_col, "left")
            .withColumn(text_col, F.coalesce("_gld_text", F.lit("")))
            .drop("_gld_text"))


def top_ngrams(df, *, text_col: str = "text", n: int = 3, k: int = 20):
    """Corpus-level most-frequent word n-grams — the boilerplate-discovery
    report run before choosing dedup/filter thresholds (the C4/Gopher
    papers' 'what repeats in this crawl' table). Returns the top ``k``
    ``(gram, n_occurrences)`` under the deterministic total order
    (count desc, gram asc).

    Shape: explode grams (zip-shifted slices — see ``dedup.shingles``) →
    groupBy(gram) count with map-side partial aggregation (a
    billion-copy boilerplate gram combines per partition BEFORE the
    shuffle) → ``orderBy(...).limit(k)``, which Spark executes as
    TakeOrderedAndProject: per-partition top-k then a k-row driver
    merge — never a single-partition global sort."""
    from dig_etl_engine_spark.operators.dedup import shingles

    grams = df.select(
        F.explode(shingles(safe_lower(F.col(text_col)), n)).alias("gram"))
    return (grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("gram"))
            .limit(k))


def tfidf_keywords(df, *, id_col: str = "doc_id", text_col: str = "text",
                   k: int = 5):
    """Per-document top-``k`` keywords by smoothed TF-IDF
    (``tf · (ln((N+1)/(df+1)) + 1)``) — the model-free doc-summary /
    routing signal (and the classic weighting the coarse search's BM25
    generalizes). Returns ``(id, token, tfidf_e6, rank)`` with the
    score as a 1e-6-scaled BIGINT.

    Shape: one explode → groupBy(id, token) count (map-side combined)
    gives tf; df reduces the SAME tf table (already distinct per doc) by
    token; N arrives as a broadcast 1-row aggregate, never a driver
    round-trip; scores stay in codegen and the per-doc top-k is one
    window over (id). Scores QUANTIZE to integers BEFORE ranking —
    ``floor(score·1e6 + 0.5)`` — so cross-engine libm noise in ln()
    can't flip a tie at the k boundary, and the hashed emission avoids
    engine ``round()`` on a continuous double entirely (the
    continuous-round lint class, r8): the quantization tree is the
    same correctly-rounded multiply+add+floor in every engine."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(safe_lower(F.col(text_col))),
                          r"\s+")).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfreq, "token")
              .join(F.broadcast(n_docs))
              .select(id_col, "token",
                      _ex.fixed(F.col("tf")
                                * (F.log((F.col("n_docs") + 1.0)
                                         / (F.col("df") + 1.0)) + 1.0),
                                6).alias("tfidf_e6")))
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf_e6"), F.asc("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def weighted_sample(df, k: int, *, weight_col: str,
                    id_col: str = "doc_id", salt: str = "ws"):
    """Deterministic weighted sampling without replacement (the
    Efraimidis–Spirakis A-ES scheme): each row draws a deterministic
    uniform u from md5(salt | id) and gets priority ``-ln(u) / w`` —
    the k SMALLEST priorities are a weighted-without-replacement sample
    (each row's inclusion probability ∝ its weight). Hash-based, not
    rand(): task retries, partitioning, and re-runs all draw the same
    sample; a new ``salt`` draws a fresh epoch — the same contract as
    ``mix_sources``/``stratified_sample``, upgraded from per-stratum
    rates to continuous per-row weights (e.g. quality scores).

    Non-positive/null weights never sample (priority NULL, filtered).
    Returns the sampled rows with their ``priority_e9`` — the A-ES
    priority as a 1e-9-scaled BIGINT (ascending = first drawn). The
    integer emission (``floor(prio·1e9 + 0.5)``, same tree in the
    oracle) replaces engine ``round()`` on the ln-derived continuous
    priority (continuous-round lint, r8); k-boundary margins are ~1/n,
    far above both libm noise and the 1e-9 quantization step.

    Shape: pure column math for the priority, then ``orderBy(...).
    limit(k)`` — TakeOrderedAndProject (per-partition top-k + k-row
    driver merge), never a global sort."""
    denom = float(1 << 32)
    u = ((F.conv(F.substring(
        F.md5(F.concat_ws("|", F.lit(salt),
                          F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("double") + 1.0) / (denom + 1.0))
    w = F.col(weight_col).cast("double")
    prio = F.when(w > 0, -F.log(u) / w)
    prio_fp = _ex.fixed(prio, 9)
    return (df.withColumn("priority_e9", prio_fp)
            .filter(F.col("priority_e9").isNotNull())
            .orderBy(F.asc("priority_e9"), F.asc(id_col))
            .limit(k))


# Compact original valence lexicon (AFINN-shaped: word → integer in
# [-5, 5]), spanning common sentiment words plus the performance-domain
# vocabulary this engine's own corpora use. Swap in a full lexicon via
# the ``lexicon`` argument — the join shape is lexicon-size-independent.
SENTIMENT_VALENCE = {
    "good": 3, "great": 4, "excellent": 5, "love": 4, "like": 2,
    "fast": 2, "quick": 2, "improved": 2, "win": 3, "best": 4,
    "stable": 2, "correct": 2, "clean": 1, "big": 1, "easy": 2,
    "bad": -3, "terrible": -4, "awful": -5, "hate": -4, "dislike": -2,
    "slow": -2, "broken": -3, "crash": -4, "fail": -3, "failed": -3,
    "error": -2, "bug": -2, "wrong": -2, "dirty": -1, "small": -1,
    "hard": -2, "worst": -4, "leak": -3, "stale": -2, "flaky": -3,
}


def sentiment_scores(df, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     lexicon: dict[str, int] | None = None,
                     threshold: float = 0.05):
    """Lexicon-valence sentiment scoring (the classic AFINN recipe — the
    'sentiment as column fns' item from the original blueprint, SURVEY
    §7.1): mean per-token valence plus a pos/neu/neg label. Model-free
    and deterministic; a learned classifier slots into the same output
    contract via `operators/quality_model.py`'s pattern.

    Returns ``(id, n_tokens, sent_sum, sentiment, label)`` with
    ``sentiment = sent_sum / n_tokens`` (rounded) and label thresholded
    at ±``threshold``.

    Shape: explode tokens → broadcast-join the lexicon (tiny by
    definition; the shape holds for 100k-word lexicons) → one
    groupBy(id) rollup with map-side combine. No interpreted HOF
    lookups — the per-token work is a hash-join probe in codegen."""
    spark = df.sparkSession
    lex = lexicon or SENTIMENT_VALENCE
    lex_df = local_df(spark, list(lex.items()),
                      "tok string, valence int")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(safe_lower(F.col(text_col))),
                          r"\s+")).alias("tok"))
    scored = (toks.join(F.broadcast(lex_df), "tok", "left")
              .groupBy("id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum(F.coalesce("valence", F.lit(0)))
                    .alias("sent_sum")))
    sent = F.round(F.col("sent_sum")
                   / F.greatest(F.col("n_tokens"), F.lit(1)), 6)
    return scored.select(
        F.col("id").alias(id_col), "n_tokens", "sent_sum",
        sent.alias("sentiment"),
        F.when(sent > threshold, "pos")
         .when(sent < -threshold, "neg")
         .otherwise("neu").alias("label"))


def vocab_coverage(corpus, reference=None, *, vocab_size: int = 1000,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Tokenizer-fit check: per-doc fraction of tokens OUTSIDE the
    reference top-``vocab_size`` vocabulary (the OOV rate a
    whitespace-proxy tokenizer would see) — high-OOV docs are the ones a
    fixed vocab will shred into bytes, and a rising corpus-level OOV
    rate is the signal to retrain the tokenizer. ``reference`` defaults
    to the corpus itself.

    Returns ``(id, n_tokens, n_oov, oov_rate)``.

    Shape: the vocabulary is a top-k over the reference token counts
    (map-side combined groupBy → TakeOrdered k rows, ties to the
    lexicographically smaller token) and BROADCASTS — vocabularies are
    small by definition; the corpus explodes once and left-anti-joins
    the broadcast vocab per token, then one groupBy(id) rollup."""
    ref = reference if reference is not None else corpus

    def toks(df):
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(safe_lower(F.col(text_col))),
                              r"\s+")).alias("t"))

    vocab = (toks(ref).groupBy("t").agg(F.count(F.lit(1)).alias("n"))
             .orderBy(F.desc("n"), F.asc("t")).limit(vocab_size)
             .select("t"))
    ct = toks(corpus)
    oov = (ct.join(F.broadcast(vocab), "t", "left_anti")
           .groupBy("id").agg(F.count(F.lit(1)).alias("n_oov")))
    tot = ct.groupBy("id").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (tot.join(oov, "id", "left")
            .select(F.col("id").alias(id_col), "n_tokens",
                    F.coalesce("n_oov", F.lit(0)).alias("n_oov"))
            .withColumn("oov_rate",
                        F.round(F.col("n_oov") / F.greatest(
                            F.col("n_tokens"), F.lit(1)), 6)))


def corpus_diff(old, new, *, id_col: str = "doc_id",
                text_col: str = "text"):
    """Snapshot diff between two corpus versions — the audit a corpus
    owner runs before re-tokenizing: which docs were added, removed, or
    content-changed since the last training run (and hence what fraction
    of cached tokenization/embedding work is reusable). Returns one row
    per doc id in either version: ``(id, status)`` with status ∈
    added / removed / changed / unchanged; changed = same id, different
    normalized content fingerprint.

    Shape: each side reduces to (id, fingerprint) — narrow column math
    over the scan — then ONE full-outer hash join on the id; no text
    moves. At warehouse scale both sides pre-bucket by id
    (``catalog.materialize_bucketed``) and the join runs
    exchange-free."""
    of = old.select(F.col(id_col).alias("id"),
                    fingerprint_md5(F.col(text_col)).alias("f_old"))
    nf = new.select(F.col(id_col).alias("id"),
                    fingerprint_md5(F.col(text_col)).alias("f_new"))
    return (of.join(nf, "id", "full_outer")
            .select(F.col("id").alias(id_col),
                    F.when(F.col("f_old").isNull(), "added")
                     .when(F.col("f_new").isNull(), "removed")
                     .when(F.col("f_old") != F.col("f_new"), "changed")
                     .otherwise("unchanged").alias("status")))


def _trigram_rows(df, *, id_col: str = "doc_id",
                  text_col: str = "text"):
    """``(id, ctx, w)`` trigram rows of ``df`` — the shared projection
    under :func:`ngram_lm_scores`.

    r12 (guide §5): the tree is assembled as ONE parsed SQL string
    instead of ~70 nested Column calls — construction measured
    197 → 92 ms per build (each F.* call is a py4j round trip + a
    JVM-side hop; the parser takes the whole tree in one call), and
    :func:`ngram_lm_scores` builds the tree twice per query (reference
    + corpus). The parsed tree is ALPHA-IDENTICAL to the Column form —
    same bind-once wrap (``element_at(transform(array(toks), ...), 1)``:
    toks evaluated once per row, no generator-CSE hazard), same
    slices/zip/struct; only Catalyst's internal lambda-variable names
    differ — pinned by ``tests/test_corpus_profiling.py::
    test_trigram_sql_tree_matches_column_form`` against the Column
    reference kept in that test."""
    sl = sql_safe_lower(f"`{text_col}`")
    toks_sql = f"split(trim({sl}), '\\\\s+')"
    grams_sql = (
        "transform(arrays_zip("
        "slice(t, 1, size(t) - 2), "
        "slice(t, 2, size(t) - 2), "
        "slice(t, 3, size(t) - 2)), "
        "s -> struct(concat_ws(' ', s['0'], s['1']) AS ctx, "
        "s['2'] AS w))")
    exploded_sql = (f"explode(element_at(transform(array({toks_sql}), "
                    f"t -> {grams_sql}), 1)) AS t")
    return (df.filter(F.expr(f"size({toks_sql}) >= 3"))
            .selectExpr(f"`{id_col}` AS id", exploded_sql)
            .select("id", "t.ctx", "t.w"))


def ngram_lm_scores(corpus, reference=None, *, id_col: str = "doc_id",
                    text_col: str = "text", k_smooth: float = 0.1):
    """CCNet-style n-gram LM quality scoring (Wenzek et al. 2020): score
    every corpus doc by its mean trigram negative log-probability under
    an add-k-smoothed trigram LM trained on ``reference`` (a trusted
    corpus — CCNet uses Wikipedia; defaults to the corpus itself).
    Low score ≈ fluent/in-domain; the perplexity band then drives
    keep/drop/bucket decisions — the model-based filter family sitting
    between the heuristic gates and the MLlib classifier.

    ``P(w|ctx) = (c(ctx,w) + k) / (c(ctx) + k·V)`` with V = reference
    vocab size; unseen contexts and words degrade smoothly to ~1/V.
    Returns ``(id, n_trigrams, avg_neg_logp)`` — docs with < 3 tokens
    carry no trigram evidence and are omitted (gate them on length
    first).

    Shape: trigram counts reduce the reference once (map-side combine);
    context counts reduce the trigram table again instead of re-reading
    the reference; V arrives as a broadcast 1-row aggregate. Scoring is
    two keyed equi-joins — (ctx, w) for the trigram count, (ctx) for the
    backoff denominator; the two-level fallback genuinely needs both
    keys, the same reason KenLM keeps a trie per order — then one
    per-doc aggregate. AQE skew-join handles stop-phrase head contexts.
    Everything stays in codegen — no Python, no driver state, LM
    "training" is just distributed counting."""

    def trigrams(df):
        return _trigram_rows(df, id_col=id_col, text_col=text_col)

    ref = reference if reference is not None else corpus
    # DELIBERATELY UNPINNED: c3 feeds both the c2 derivation and the
    # scoring join, so the reference trigram aggregation runs twice —
    # but an A/B at sf0.1 measured a localCheckpoint on c3 ~20-25%
    # SLOWER (1.8 s → 2.3 s warm). The pin rule that holds across this
    # codebase: pin when the materialized table is much smaller than the
    # recompute it saves (kmv sketches, minhash signatures) — c3 is
    # distinct-trigram-sized (≈ corpus tokens), while the duplicated
    # lineage is one codegen explode + a map-side-combined shuffle, so
    # materialization costs more than the recompute at every scale where
    # the ratio holds.
    c3 = trigrams(ref).groupBy("ctx", "w").agg(
        F.count(F.lit(1)).alias("c3"))
    c2 = c3.groupBy("ctx").agg(F.sum("c3").alias("c2"))
    vocab = ref.select(F.explode(F.split(
        F.trim(safe_lower(F.col(text_col))), r"\s+")).alias("tok")) \
        .agg(F.count_distinct("tok").alias("v"))
    scored = (trigrams(corpus)
              .join(c3, ["ctx", "w"], "left")
              .join(c2, "ctx", "left")
              .join(F.broadcast(vocab))
              .select("id", (-F.log(
                  (F.coalesce(F.col("c3"), F.lit(0)) + k_smooth)
                  / (F.coalesce(F.col("c2"), F.lit(0))
                     + k_smooth * F.col("v")))).alias("nlp")))
    # Wobble lint: quantize nlp to exact 1e-9-unit int64 PER TRIGRAM
    # (identically in the oracle — nanonat precision, ≪ the 6-digit
    # display rounding), sum exactly, round by integer division: the
    # doc average of repeated rational-probability logs is the
    # round-boundary class the r5 driver caught on ts_rolling_anomaly.
    from dig_etl_engine_spark.functions.exact import fixed, round_fixed
    return (scored.groupBy(F.col("id").alias(id_col))
            .agg(F.count(F.lit(1)).alias("n_trigrams"),
                 F.sum(fixed(F.col("nlp"), 9)).alias("_s"))
            .withColumn("avg_neg_logp",
                        round_fixed(F.col("_s"), 9, 6,
                                    F.col("n_trigrams")))
            .drop("_s"))


def repeated_window_flags(df, *, id_col: str = "doc_id",
                          text_col: str = "text", w: int = 20,
                          flag_fraction: float = 0.3,
                          hash_windows: bool = True,
                          pin: bool = True):
    """Approximate ExactSubstr dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find corpus-wide
    REPEATED ``w``-token windows and score each doc by the fraction of
    its windows that repeat anywhere in the corpus (including within the
    same doc). The true algorithm builds a corpus suffix array; the
    window-hash approximation keeps the detection distributed and
    shuffle-bounded, trading exact span boundaries for ±w-token
    granularity — the standard practical substitute.

    Returns ``(id, n_windows, n_repeated, repeated_fraction, flagged)``
    with ``flagged = repeated_fraction >= flag_fraction``. Removal is
    then a filter (drop flagged docs) or a downstream span-trim.

    Shape: explode windows (zip-shifted slices, the ``dedup.shingles``
    pattern) → per-(doc, window) partial count → global window count via
    ONE groupBy with map-side combine (a billion-copy boilerplate window
    combines per partition before the shuffle) → equi-join back (AQE
    skew-join covers residual hot windows) → per-doc aggregate.

    ``hash_windows=True`` (default) replaces the ~w·6-byte window
    STRING with its 128-bit md5 before anything shuffles, cutting the
    count shuffle ~4× at w=20 — at 100 TB this shuffle IS the
    operator's cost. A collision merges two distinct windows and
    perturbs a FRACTION signal by one count (P ≈ n²/2¹²⁸; ~10¹² corpus
    windows → ~10⁻¹⁴ expected collisions) — unlike
    ``global_line_dedup``, where a collision would silently DELETE a
    line and value-equality is therefore mandatory, nothing is dropped
    here. Pass ``hash_windows=False`` for the string-equality variant
    (md5 is also the oracle-replay mode: DuckDB computes the same
    digests)."""
    from dig_etl_engine_spark.operators.dedup import shingles

    win_expr = F.explode(shingles(safe_lower(F.col(text_col)), w)).alias("win")
    wins = df.select(F.col(id_col).alias("id"), win_expr)
    if hash_windows:
        wins = wins.select("id", F.md5(F.col("win")).alias("win"))
    # `local` feeds BOTH the global count and the join-back, and neither
    # static nor AQE exchange reuse fires on this shape (verified on the
    # executed plan: 2× Scan + 2× Generate without the pin), so unpinned
    # the corpus is scanned, exploded and SHUFFLED twice. Locally the pin
    # measures as a wash (±3% at sf0.1 — the codegen explode is cheap and
    # the materialized window table is ~5× the text it came from); it
    # stays because on a cluster the avoided cost is a second full-corpus
    # NETWORK shuffle while the added cost is local-disk traffic. Kept as
    # groupBy + equi-join rather than a sum-over-window partitionBy(win):
    # the window form would put every copy of a boilerplate-storm window
    # in ONE task, and AQE can split a skewed join but not a skewed
    # window. ``pin=False`` exposes the full lineage — the checkpoint
    # replaces it with a LogicalRDD leaf, which plan-shape tests
    # (hash-before-shuffle) cannot see through.
    local = wins.groupBy("id", "win").agg(
        F.count(F.lit(1)).alias("c_local"))
    if pin:
        local = local.transform(_pin, eager=False)
    glob = local.groupBy("win").agg(F.sum("c_local").alias("n_global"))
    return (local.join(glob, "win")
            .groupBy(F.col("id").alias(id_col))
            .agg(F.sum("c_local").alias("n_windows"),
                 F.sum(F.when(F.col("n_global") > 1,
                              F.col("c_local")).otherwise(0))
                  .alias("n_repeated"))
            .select(id_col, "n_windows", "n_repeated",
                    F.round(F.col("n_repeated")
                            / F.greatest(F.col("n_windows"), F.lit(1)), 6)
                     .alias("repeated_fraction"))
            .withColumn("flagged",
                        F.col("repeated_fraction") >= flag_fraction))


def _mix_gate_hash(id_col: str, salt: str, name: str, denom: int,
                   hash_mode: str) -> Column:
    """The sampling-gate hash bucket in [0, denom): ``xxhash64`` (fast,
    default) or ``md5`` (slower, reproducible in any engine with md5 —
    the cross-engine-oracle mode, same trick as ``stratified_sample``)."""
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(F.col(id_col).cast("string"),
                                 F.lit(salt), F.lit(name)), F.lit(denom))
    if hash_mode == "md5":
        h = F.md5(F.concat_ws("|", F.lit(salt), F.lit(name),
                              F.col(id_col).cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % denom
    raise ValueError(f"mix_sources: unknown hash_mode {hash_mode!r}")


def mix_sources(sources, weights, *, target_tokens: int,
                id_col: str = "doc_id", text_col: str = "text",
                salt: str = "mix", hash_mode: str = "xxhash64"):
    """Weighted multi-source mixing to a token budget — the Pile-style
    recipe: each source contributes ``target_tokens · w_s / Σw`` tokens,
    sampled doc-wise. Returns the union with a ``source`` column and the
    per-source sampling plan (for the run report).

    Sampling is HASH-based (id + salt via ``hash_mode``), not rand():
    the same inputs always select the same docs, task retries can't
    change the mix, and changing ``salt`` draws a fresh epoch. A source
    whose allotment exceeds its size is taken whole (fraction capped at
    1) and the shortfall is logged — upweighting beyond 1 is an
    epoch-repeat decision for the trainer, not silent duplication here.

    Scale shape: ALL per-source token counts run as ONE Spark job (the
    per-source aggregates union into a single plan — k sources cost one
    driver round-trip, not k sequential ones), then a narrow hash-filter
    per source — no further shuffle, no collect beyond k scalars.
    """
    import logging

    logger = logging.getLogger(__name__)
    if not sources:
        raise ValueError("mix_sources: no sources given")
    total_w = sum(weights[name] for name in sources)
    if total_w <= 0:
        raise ValueError("mix_sources: weights sum to zero")
    # one sizing job for every source: per-source single-row aggregates
    # (map-side combined, one scalar each) unioned and collected together
    counts = None
    for name, df in sources.items():
        c = df.agg(F.sum(token_count(F.col(text_col))).alias("n")) \
            .select(F.lit(name).alias("src"), "n")
        counts = c if counts is None else counts.unionByName(c)
    have_by_src = {r["src"]: (r["n"] or 0) for r in counts.collect()}
    plan = {}
    sampled = []
    denom = 1 << 20
    for name, df in sources.items():
        have = have_by_src[name]
        want = target_tokens * weights[name] / total_w
        frac = min(1.0, want / have) if have else 0.0
        if have and want > have:
            logger.warning(
                "mix_sources: source %s has %d tokens, allotment %.0f — "
                "taking all (shortfall %.0f)", name, have, want,
                want - have)
        plan[name] = {"have": have, "want": round(want), "fraction": frac}
        # a positive allotment must never truncate to a zero gate: a huge
        # source with a tiny weight still contributes ~its smallest unit
        thr = int(frac * denom)
        if frac > 0:
            thr = max(1, thr)
        gate = _mix_gate_hash(id_col, salt, name, denom, hash_mode) < thr
        sampled.append(df.filter(gate)
                       .withColumn("source", F.lit(name)))
    out = sampled[0]
    for s in sampled[1:]:
        out = out.unionByName(s)
    return out, plan


def line_repetition_ratio(col: Column) -> Column:
    """Within-document repetition: fraction of lines that are duplicates
    of an earlier line (the C4/Gopher 'repeated lines' quality filter).
    1 - distinct/total over non-blank trimmed lines; 0 for ≤1 line.
    Native split/array math, no shuffle."""
    lines = F.filter(
        F.transform(F.split(col, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "")
    n = F.size(lines)
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(lines)) / n, 6))


def dsir_importance_weights(corpus, target, *, id_col: str = "doc_id",
                            text_col: str = "text", buckets: int = 1024,
                            k_smooth: float = 1.0,
                            hash_mode: str = "xxhash64",
                            salt: str = "dsir"):
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus doc
    by how much it looks like the TARGET distribution (a trusted,
    in-domain corpus — the paper uses Wikipedia+books) relative to the
    raw pool it came from. Features are HASHED unigrams+bigrams in
    ``buckets`` bins; both distributions are add-k-smoothed bucket LMs;
    a doc's log importance weight is the mean over its features of
    ``log p_target(b) − log p_raw(b)``. Feed the weights to
    :func:`weighted_sample` (A-ES) for the paper's resampling step.

    Returns ``(id, n_feats, avg_log_ratio)`` — higher = more
    target-like. ``hash_mode='md5'`` makes the bucket hash replayable in
    any engine (the oracle mode, same convention as
    :func:`mix_sources`); xxhash64 is the production fast path.

    Shape: both bucket LMs are ONE map-side-combined groupBy over an
    exploded gram stream, reduced to exactly ``buckets`` rows that
    BROADCAST back into a second narrow corpus pass — the corpus text
    never shuffles, and the model never touches the driver. Bigrams come
    from zip-shifted slices (the ``shingles`` pattern), not a
    self-join."""
    def grams(df):
        def uni_plus_bi(toks):
            # bound reference — inlined, toks appears 5× in the explode
            # generator (size + 2 slices × (toks + inlined n_bi) +
            # concat) and generator trees get no CSE; see
            # functions/bindings.py
            n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
            bi = F.zip_with(F.slice(toks, 1, n_bi), F.slice(toks, 2, n_bi),
                            lambda a, b: F.concat_ws(" ", a, b))
            return F.concat(toks, bi)

        return df.select(
            F.col(id_col).alias("id"),
            F.explode(bind_once(
                F.split(F.trim(safe_lower(F.col(text_col))), r"\s+"),
                uni_plus_bi)).alias("g"))

    def bucket(g):
        if hash_mode == "xxhash64":
            return F.pmod(F.xxhash64(F.lit(salt), g), F.lit(buckets))
        if hash_mode == "md5":
            h = F.md5(F.concat_ws("|", F.lit(salt), g))
            return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") \
                % buckets
        raise ValueError(f"dsir: unknown hash_mode {hash_mode!r}")

    def logp_dense(counts, name):
        """``(b, name)`` for EVERY bucket in [0, buckets): seen buckets
        get log((c+k)/(N+kB)); unseen buckets carry c=0, whose value
        log((0+k)/(N+kB)) IS the smoothing floor — bit-identical to the
        former explicit-floor coalesce (0+k == k in doubles, same
        division, same log). Densifying over the bucket domain (a
        model-constant ≤ 64k rows) lets the scoring join be a plain
        always-matching broadcast join, and N comes from ONE window
        over the counts instead of a 1-row aggregate whose broadcast
        join re-executed the whole gram pipeline per reference — the
        r12 plan audit found the target explode+count subtree THREE
        times in the executed plan (counts, the total inside its
        broadcast, and the final floor join); this shape runs it once.
        """
        from pyspark.sql import Window as W

        spark = counts.sparkSession
        dom = spark.range(buckets).select(F.col("id").alias("b"))
        dense = dom.join(counts, "b", "left") \
            .select("b", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        n = F.sum("c").over(W.partitionBy())
        return dense.select("b", F.log(
            (F.col("c") + k_smooth)
            / (n + k_smooth * buckets)).alias(name))

    # The corpus gram stream (explode + interpreted zip_with bigrams) is
    # the dominant CPU and feeds BOTH the raw-LM counts and the scoring
    # pass — checkpoint the bucketed (id, b) rows once and derive the
    # raw LM from them instead of exploding the corpus twice (measured
    # ~35% off the whole operator at sf0.1, identical output).
    cf = (grams(corpus).select("id", bucket(F.col("g")).alias("b"))
          .transform(_pin, eager=False))
    p_t = logp_dense(
        grams(target).select(bucket(F.col("g")).alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("c")), "lp_t")
    p_r = logp_dense(
        cf.groupBy("b").agg(F.count(F.lit(1)).alias("c")), "lp_r")
    return (cf.join(F.broadcast(p_t), "b")
            .join(F.broadcast(p_r), "b")
            .select("id", (F.col("lp_t") - F.col("lp_r")).alias("lr"))
            .groupBy(F.col("id").alias(id_col))
            .agg(F.count(F.lit(1)).alias("n_feats"),
                 # wobble lint: exact 1e-9-quantized sum + integer
                 # rounding (see ngram_lm_scores; lr may be negative —
                 # round_fixed is sign-correct)
                 F.sum(_ex.fixed(F.col("lr"), 9)).alias("_s"))
            .withColumn("avg_log_ratio",
                        _ex.round_fixed(F.col("_s"), 9, 6,
                                        F.col("n_feats")))
            .drop("_s"))


def bpe_pair_stats(df, *, text_col: str = "text", k: int = 20):
    """The first iteration of BPE tokenizer training (Sennrich et al.
    2016): count adjacent SYMBOL pairs (initial symbols = characters)
    across the corpus, weighted by word frequency — the statistic the
    merge rule ``argmax pair count`` consumes. Running this over the
    training corpus is how a tokenizer's merge table is born; at corpus
    scale the word-frequency table is the only shuffle that matters
    because the per-word pair explosion runs over the DISTINCT word
    table (vocabulary-sized, zipf-small), not the corpus stream.

    Returns the top-``k`` ``(pair, n)`` rows, ties broken
    lexicographically — deterministic across engines and layouts.

    Shape: corpus → word counts (ONE map-side-combined groupBy); the
    distinct-word table then explodes into (char_i, char_i+1) pairs via
    a narrow ``transform(sequence(...))`` — no Python — and a second
    vocabulary-sized groupBy sums word frequencies per pair. Top-k is
    TakeOrderedAndProject, never a global sort."""
    words = (df.select(F.explode(F.split(
        F.trim(safe_lower(F.col(text_col))), r"\s+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    pairs = words.select(
        "freq",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)))).alias("pair"))
    return (pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(k))


def assign_splits(df, fractions: dict[str, float], *,
                  id_col: str = "doc_id", salt: str = "split",
                  denom: int = 100000, hash_mode: str = "xxhash64"):
    """Deterministic train/val/test assignment — the split a training
    pipeline must make REPRODUCIBLY: the same doc lands in the same
    split on every run, any partitioning, any engine, and adding docs
    never moves existing ones (the property a random split lacks).
    ``fractions`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the last split). Assignment hashes the doc id
    into ``denom`` buckets and carves contiguous bucket ranges in the
    fractions' insertion order.

    Returns ``df`` with a ``split`` column appended. Pure narrow column
    math — no shuffle, no sampling state; ``hash_mode='md5'`` is the
    cross-engine-oracle mode (same convention as :func:`mix_sources`)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"assign_splits: fractions sum to {total} > 1")
    b = _mix_gate_hash(id_col, salt, "", denom, hash_mode)
    names = list(fractions)
    expr = None
    hi = 0.0
    for name in names[:-1]:
        hi += fractions[name]
        cond = b < int(hi * denom)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", last)


def bpe_train_merges(df, *, text_col: str = "text", n_merges: int = 8):
    """Full BPE merge-table training (Sennrich et al. 2016): the
    iterative loop that :func:`bpe_pair_stats` computes one step of.
    Each iteration counts corpus-weighted adjacent symbol pairs, picks
    the argmax (ties broken lexicographically — deterministic across
    engines and layouts), and applies the merge everywhere; after
    ``n_merges`` rounds the returned ``(step, pair, n)`` table IS the
    tokenizer's merge list.

    Scale shape: the corpus contributes exactly ONE map-side-combined
    word-count shuffle; every merge iteration then runs over the
    DISTINCT-word table (vocabulary-sized, zipf-small — ~10⁵–10⁶ rows
    even at 100 TB), cached once. Per iteration: one vocabulary-sized
    groupBy plus a 1-row argmax collect (k-scalar driver traffic, the
    same contract as the IVF k-means trainer). The merge application is
    a narrow string ``replace`` over a double-space-delimited symbol
    encoding — ``' a  b ' → ' ab '`` — where each symbol carries its own
    boundary spaces, so plain left-to-right non-overlapping replace is
    EXACTLY greedy BPE merge application: runs like ``[a,a,a]`` become
    ``[aa,a]`` (each occurrence is self-delimited; no match can cross a
    symbol boundary or share a delimiter with the next occurrence).

    Simplifications vs a production tokenizer (documented, not hidden):
    lowercased whitespace words, no end-of-word marker, single-char
    words excluded (they contribute no pairs).
    """
    merges, _ = _bpe_train(df, text_col=text_col, n_merges=n_merges)
    return local_df(df.sparkSession,
                    merges, "step INT, pair STRING, n BIGINT")


def _bpe_train(df, *, text_col: str, n_merges: int):
    """Shared training loop: returns ``(merges, vocab)`` where
    ``merges`` is the driver-side ``[(step, pair, n), ...]`` list and
    ``vocab`` is the vocabulary-sized DataFrame ``(w, freq, enc)`` with
    ``enc`` the word's final symbol encoding after all merges (the
    artifact :func:`bpe_subword_stats` joins against)."""
    words = (df.select(F.explode(F.split(
        F.trim(safe_lower(F.col(text_col))), r"\s+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    enc0 = F.concat(
        F.lit(" "),
        F.array_join(F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1))), "  "),
        F.lit(" "))
    base = words.select("w", "freq", enc0.alias("enc")).persist()
    cur = base
    try:
        merges: list[tuple[int, str, int]] = []
        for step in range(1, n_merges + 1):
            syms = F.split(F.trim(F.col("enc")), "  ")
            n = F.size(syms)
            pairs = F.zip_with(
                F.slice(syms, 1, n - 1), F.slice(syms, 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b))
            best = (cur.select("freq", F.explode(pairs).alias("pair"))
                    .groupBy("pair").agg(F.sum("freq").alias("n"))
                    .orderBy(F.desc("n"), F.asc("pair"))
                    .limit(1).collect())
            if not best:
                break
            pair, count = best[0]["pair"], int(best[0]["n"])
            a, b = pair.split(" ")
            cur = cur.withColumn("enc", F.replace(
                F.col("enc"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")))
            merges.append((step, pair, count))
        return merges, cur
    finally:
        base.unpersist()


def bpe_subword_stats(df, *, text_col: str = "text",
                      id_col: str = "doc_id", n_merges: int = 8):
    """Per-document subword statistics under a corpus-trained BPE
    tokenizer: train the ``n_merges``-step merge table
    (:func:`bpe_train_merges`), then encode every document and return
    ``(id, n_words, n_subwords)`` — the fertility/compression metric a
    tokenizer owner actually tracks (subwords-per-word ≈ how well the
    vocabulary fits the corpus).

    Encoding never re-runs the merge loop over the corpus: the trained
    VOCABULARY table ``(w → final symbol encoding)`` is vocabulary-sized
    and broadcasts; each document's words join against it and the
    symbol count is ``size(split(enc))``. Words shorter than 2 chars
    (excluded from training — they contribute no pairs) encode as one
    symbol via the left-join fallback. The vocab lineage is recomputed
    lazily here (one extra word-count pass); a production pipeline
    would persist the trained vocab as a table artifact and reuse it —
    the join shape is identical either way."""
    _, vocab = _bpe_train(df, text_col=text_col, n_merges=n_merges)
    n_sub = F.size(F.split(F.trim(F.col("enc")), "  "))
    dw = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(safe_lower(F.col(text_col))),
                          r"\s+")).alias("w"))
    return (dw.join(F.broadcast(vocab.select("w", n_sub.alias("n_sub"))),
                    "w", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.coalesce(F.col("n_sub"), F.lit(1)))
                 .alias("n_subwords")))


# CCNet-style normalization map: lowercase Latin-1 accents → ASCII.
_ACCENT_FROM = "àáâãäåèéêëìíîïòóôõöùúûüçñýÿ"
_ACCENT_TO = "aaaaaaeeeeiiiiooooouuuucnyy"
_DIGIT_FROM = "123456789"
_DIGIT_TO = "000000000"


def ccnet_normalize(col: Column) -> Column:
    """CCNet's dedup-normalization (Wenzek et al. 2020, `normalize` in
    cc_net): lowercase → strip common Latin accents → map every digit
    to 0 → drop punctuation → collapse whitespace. Deduplicating on the
    NORMALIZED form catches the case/punctuation/number variants that
    verbatim hashing misses (the paper dedups CommonCrawl paragraphs on
    exactly this key). Pure codegen column math — `translate` +
    `regexp_replace` chains, no Python, no shuffle; the same chain is
    expressible in any engine for oracle parity (accent folding uses an
    explicit translate TABLE, not locale-dependent Unicode NFD, and
    ``CCNET_NORMALIZE_SQL`` renders the identical regex classes for
    RE2 — parity is exact for ASCII, the folded accent set, and
    no-case scripts like CJK; exotic one-to-many case mappings are the
    only place engine ``lower()`` implementations can differ)."""
    x = safe_lower(col)
    x = F.translate(x, _ACCENT_FROM + _DIGIT_FROM, _ACCENT_TO + _DIGIT_TO)
    x = F.regexp_replace(x, r"[^\p{L}\p{N}\s]", "")
    return F.trim(F.regexp_replace(x, r"\s+", " "))


# DuckDB (RE2) rendering of the SAME chain — identical regex classes
# (\p{L}/\p{N} are supported by both RE2 and Java regex), identical
# explicit translate table. Parity scope: exact for ASCII plus the
# folded accent set and all no-case scripts (CJK); exotic one-to-many
# case mappings (İ, ẞ) are the only place engine lower() can differ.
CCNET_NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(translate(lower({col}), "
    f"'{_ACCENT_FROM + _DIGIT_FROM}', '{_ACCENT_TO + _DIGIT_TO}'), "
    r"'[^\p{{L}}\p{{N}}\s]', '', 'g'), '\s+', ' ', 'g'))"  # {{ }}: survives .format
)
