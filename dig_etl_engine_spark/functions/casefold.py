"""Deployment-locale-independent case folding for engine expressions.

The hazard (measured on this Spark build, r9): ``F.lower``/``F.upper``
compile to ``UTF8String.toLowerCase/.toUpperCase``, whose non-ASCII slow
path delegates to ``java.lang.String.toLowerCase()`` WITHOUT a locale
argument — i.e. the JVM's **default locale**. A cluster whose JVMs run
under ``-Duser.language=tr`` (or az/lt — the three locales with
conditional SpecialCasing rules) silently changes the engine's output on
any string containing a locale-conditional codepoint:

    lower('AÉI')  == 'aéı'   under tr_TR   (U+0131 dotless ı)
    lower('AÉI')  == 'aéi'   under en/C/root

The ASCII fast path masks this on all-ASCII data (every driver-verified
fixture here is ASCII — verified by a full-column scan), but on a real
accented corpus every case-folded surface — dedup fingerprints, CCNet
normalize keys, token/shingle streams, glossary match keys, lowercased
join keys — becomes a function of the deployment JVM's locale: the same
data deduplicates differently on differently-configured clusters, and
never matches a locale-independent oracle (DuckDB lower() is utf8proc —
locale-free). Same silent-wrongness class as the xxhash64 key-width
hazard (r8): nothing crashes, answers drift.

The fix: pre-fold the locale-conditional trigger codepoints with
locale-free ``translate``/``replace`` (1-char map + the one 1→2 mapping
İ → i̇), THEN call the engine casing. Unicode's locale-conditional
casing rules (SpecialCasing.txt, tr/az/lt sections) all condition on the
uppercase triggers I J Ì Í Ĩ Į İ (lower) / the soft-dotted i j (upper);
once those are pre-folded to their default-locale case images, no
conditional rule can fire, so the engine call behaves identically under
every JVM locale — and the pre-fold IS the default-locale mapping, so
output is byte-identical to the unwrapped call under en/C/root (the
config every verdict to date ran under; plan-shape-wise the wrappers are
two extra codegen string ops in the same stage).

Residual (documented, not closed): Lithuanian ``toUpperCase`` also
deletes a COMBINING DOT ABOVE that follows any soft-dotted character
(ĵ, ɉ, ⱼ …) — pre-folding the full soft-dotted set is not expressible
as a 1:1 translate and the engine's two ``safe_upper`` call sites feed
it machine-generated ASCII; revisit if an upper-cased surface ever
carries combining marks. Why not Spark 4's ICU path
(``lower(collate(c,'UNICODE'))`` — also measured locale-independent)?
It forfeits the all-ASCII fast path on exactly the hot normalize
surfaces (full-document lowering before tokenize/shingle), and collation
casts would ride every downstream comparison; the pre-fold keeps the
fast path and stays collation-neutral.

``tests/test_casefold.py`` pins both halves: parity with Python's
locale-free ``str.lower``/``str.upper`` on the trigger set under the
current JVM, and a subprocess JVM booted under ``-Duser.language=tr``
where the raw engine functions demonstrably diverge (the witness that
the test has teeth) while the safe wrappers hold byte-identical.
``test_registry_contract.py`` lints the package so no raw engine casing
call can reappear outside this module.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# What the wrappers actually accept: translate/replace/upper/initcap all
# take ColumnOrName, and engine call sites do pass bare column-name
# strings (e.g. safe_upper("text")) — the annotations say so.
ColumnOrName = Column | str

# Lowercase: every codepoint with a tr/az/lt-conditional LOWER mapping in
# SpecialCasing.txt, mapped to its default-locale (root) case image.
# İ (U+0130) maps 1→2 under root (i + U+0307 combining dot above), so it
# rides a replace(), not the 1:1 translate.
_LOWER_TRIGGERS = "IJÌÍĨĮ"
_LOWER_IMAGES = "ijìíĩį"
_CAP_I_DOT = "İ"          # U+0130
_SMALL_I_DOT = "i̇"  # root-locale lowercase of U+0130

# Uppercase: the soft-dotted triggers of the tr/az i→İ rule.
_UPPER_TRIGGERS = "ij"
_UPPER_IMAGES = "IJ"


def _as_col(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _is_ascii(c: Column) -> Column:
    """True iff every char is one UTF-8 byte — exactly the boundary
    below which the engine's casing never leaves its locale-free ASCII
    fast path (``UTF8String.toLowerCase`` falls back to the JDK
    default-locale path on the FIRST byte > 0x7F). Both sides are
    single cheap scans with no allocation. Exact for valid UTF-8, which
    the engine's sources guarantee (parquet/JSON are UTF-8 by format
    contract; the tabular/HTML readers decode with explicit codecs);
    a string of INVALID bytes could count one char per continuation
    byte and take the unfolded branch — garbage bytes are outside the
    casing contract either way."""
    return F.octet_length(c) == F.length(c)


def safe_lower(col: ColumnOrName) -> Column:
    """``F.lower`` with identical output under every JVM default locale
    (byte-identical to ``F.lower`` under en/C/root — the pre-fold applies
    the root-locale mapping the engine would apply anyway).

    ASCII rows skip the pre-fold entirely (r10): the engine's own ASCII
    fast path is already locale-free, and the fold's ``translate`` is a
    per-row UTF-8→UTF-16→UTF-8 round-trip in the engine — measured 2.1×
    on a full-document lower at sf0.1, and 26× in a 13-gram generator
    tree before bind-once (`functions/bindings.py`). Branch equality:
    on an all-ASCII string the fold is replace=no-op + translate I→i,
    J→j + lower — exactly ``F.lower`` — so the guard never changes
    output, only cost (pinned in test_casefold.py).

    COST CAVEAT (r10 review): the guarded form references the input
    expression 3× (guard + both branches) where the pre-r10 form
    referenced it once. Inside a generator/HOF lambda — exactly the
    no-CSE context — a caller passing an expensive COMPOSED expression
    pays it 3×. Callers in generator trees must bind expensive inputs
    first (``functions/bindings.py:bind_once``) and hand the wrapper a
    cheap bound reference; the engine's own builders all do."""
    c = _as_col(col)
    x = F.replace(c, F.lit(_CAP_I_DOT), F.lit(_SMALL_I_DOT))
    x = F.translate(x, _LOWER_TRIGGERS, _LOWER_IMAGES)
    return F.when(_is_ascii(c), F.lower(c)).otherwise(F.lower(x))


def sql_safe_lower(expr: str) -> str:
    """Spark-SQL text of :func:`safe_lower` over the SQL expression
    ``expr`` — parses to the exact tree the Column form builds (pinned
    by ``tests/test_casefold.py::test_sql_safe_lower_tree_identical``),
    rendered from the SAME module constants so the two can never drift
    silently. For call sites that assemble whole expressions as one
    parsed SQL string to cut driver-side construction cost (guide §5:
    a deep Column tree costs one py4j round trip per node; a parsed
    string costs one total). This is SPARK SQL, not DuckDB oracle SQL —
    the oracle's engines are locale-free already."""
    return (f"CASE WHEN octet_length({expr}) = length({expr}) "
            f"THEN lower({expr}) "
            f"ELSE lower(translate(replace({expr}, '{_CAP_I_DOT}', "
            f"'{_SMALL_I_DOT}'), '{_LOWER_TRIGGERS}', "
            f"'{_LOWER_IMAGES}')) END")


def safe_upper(col: ColumnOrName) -> Column:
    """``F.upper`` with the tr/az ``i → İ`` conditional rule neutralized
    (see module docstring for the Lithuanian combining-mark residual).
    ASCII rows skip the pre-fold — same guard + branch-equality argument
    as :func:`safe_lower` (translate i→I, j→J + upper ≡ upper on
    ASCII), and the same cost caveat: the input expression is referenced
    3×, so generator-tree callers must ``bind_once`` expensive inputs
    before wrapping."""
    c = _as_col(col)
    folded = F.upper(F.translate(c, _UPPER_TRIGGERS, _UPPER_IMAGES))
    return F.when(_is_ascii(c), F.upper(c)).otherwise(folded)


def ascii_initcap(col: ColumnOrName) -> Column:
    """``F.initcap`` under an ASCII-by-construction input contract.

    ``initcap`` lowercases word tails through the same default-locale
    path as ``lower``, but an all-ASCII string takes the locale-free
    fast path, so it is locale-independent exactly when the caller can
    PROVE the input ASCII. The one engine call site (date-candidate
    normalization, ``functions/extractors.py``) feeds it substrings
    matched by ASCII-only regexes — ASCII by construction. A general
    ``safe_initcap`` pre-fold is deliberately not offered: pre-folding
    word-initial İ would emit ``I + U+0307`` where root-locale initcap
    emits ``U+0130`` — byte-different for a case no current surface can
    produce. New non-ASCII initcap surfaces must come back here for a
    real design. Call sites are ALLOWLISTED per enclosing function
    (``test_registry_contract.py:_ASCII_INITCAP_ALLOWED``) so a new
    caller must re-derive the ASCII proof rather than inherit it."""
    return F.initcap(col)
