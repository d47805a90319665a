"""Engine-identical exact aggregation helpers — the hash-determinism
toolkit behind the registry's wobble lint
(``tests/test_registry_contract.py::test_no_round_over_float_aggregate``).

The failure class (caught live by the r5 driver on ``ts_rolling_anomaly``):
a floating-point AVG/STDDEV/VAR aggregate accumulates doubles in an
ENGINE-CHOSEN order, two engines (or two builds of one engine) land 1 ulp
apart, and ``round(x, d)`` sits on a half-boundary — which fixed-point
inputs hit with REAL probability, because their means are small-denominator
rationals (mean of eight 2-decimal values is an exact multiple of
1/800 → a 4-digit round boundary). The fix pattern, applied uniformly:

1. **Lift to fixed-point int64** (:func:`fixed` / :func:`sql_fixed`):
   ``round(value·10^k)`` of a value stored with k decimals lands on the
   same integer in every engine (the stored double is within 1 ulp of the
   true fixed-point rational, far from the .5 tie).
2. **Aggregate only exact quantities** — SUM / SUM-of-squares / COUNT over
   the lifted integers. Integer addition is associative: any accumulation
   order, any partial-aggregate tree, any engine gives the same bits.
3. **Derive the statistic per-row** from those exact inputs with ONE
   closed-form expression written token-for-token identically in the
   Spark plan and the DuckDB oracle. IEEE-754 ``+ - * / sqrt`` are
   correctly rounded, so identical trees on identical bits cannot diverge.
4. **Round rational outputs in pure integer arithmetic**
   (:func:`round_fixed` / :func:`sql_round_fixed`): even on identical
   doubles, engines' ``round()`` implementations may disagree when the
   TRUE value is exactly on a half-boundary (Spark rounds the double's
   exact decimal expansion via BigDecimal HALF_UP; DuckDB multiplies by
   10^d first). For a value that is exactly ``p / (10^k · n)`` the
   half-away rounding is an integer division — no float anywhere.
   Continuous outputs (sqrt/log-derived) keep plain ``round``: their
   boundary hits have measure zero once the INPUTS are exact.

Overflow headroom is the caller's contract: ``round_fixed`` doubles ``p``
(and may scale it by ``10^(digits-k)``), so keep ``|p| · 2 · 10^max(0,d-k)``
inside int64 — each call site documents its bound. Sums of squares that
exceed int64 go through DECIMAL(38,0) (Spark) / HUGEINT (DuckDB SUM of
BIGINT), both exact 128-bit paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed(col: Column, k: int) -> Column:
    """Lift a k-decimal fixed-point double to exact int64 units.

    ``floor(x·10^k + 0.5)`` instead of ``round``: Spark's Round on
    doubles allocates a BigDecimal per value (a measured ~25% tax on a
    4-measure scan), while floor is one codegen-inlined double op. The
    two differ only on exact .5 ties, which cannot occur here — a
    k-decimal value lands within 1 ulp of an integer after scaling,
    nowhere near .5 — and for continuous inputs being QUANTIZED (the
    1e-9 log lifts) the tie rule is irrelevant as long as both engines
    apply the same expression, which :func:`sql_fixed` mirrors."""
    return F.floor(col * F.lit(10 ** k) + F.lit(0.5)).cast("long")


def round_fixed(p: Column, k: int, digits: int,
                n: Column | None = None) -> Column:
    """``round_half_away(p / (10^k · n), digits)`` in pure int64.

    ``p`` is an exact sum in 10^-k units (may be negative), ``n`` an
    exact count (default 1 — plain sum). Returns double with at most
    ``digits`` decimals. Engine-identical by construction; mirror with
    :func:`sql_round_fixed` in the oracle."""
    n = F.lit(1).cast("long") if n is None else n.cast("long")
    if digits <= k:
        den = F.lit(10 ** (k - digits)) * n
        pp = p
    else:
        pp = p * F.lit(10 ** (digits - k))
        den = n
    mag = F.call_function("div", 2 * F.abs(pp) + den, 2 * den)
    signed = F.when(pp < 0, -mag).otherwise(mag)
    return signed.cast("double") / F.lit(float(10 ** digits))


def sql_fixed(expr: str, k: int) -> str:
    """DuckDB mirror of :func:`fixed` (emit into oracle SQL)."""
    return f"CAST(floor(({expr}) * {10 ** k} + 0.5) AS BIGINT)"


def sql_round_fixed(p: str, k: int, digits: int, n: str = "1") -> str:
    """DuckDB mirror of :func:`round_fixed`. ``p``/``n`` are SQL
    expressions; DuckDB's SUM(BIGINT) yields HUGEINT, on which the
    integer ops here stay exact."""
    if digits <= k:
        den = f"({10 ** (k - digits)} * ({n}))"
        pp = f"({p})"
    else:
        pp = f"(({p}) * {10 ** (digits - k)})"
        den = f"({n})"
    mag = f"((2 * abs({pp}) + {den}) // (2 * {den}))"
    signed = f"(CASE WHEN {pp} < 0 THEN -{mag} ELSE {mag} END)"
    return f"(CAST({signed} AS DOUBLE) / {float(10 ** digits)})"
