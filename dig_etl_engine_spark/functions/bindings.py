"""Bind-once evaluation for repeated Column subexpressions.

The hazard (measured r10, the ``decontaminate_eval_overlap`` +44%
adjudication): Catalyst performs common-subexpression elimination inside
whole-stage codegen Projects, but NOT across a Generate's generator
expression or inside higher-order-function lambdas — both evaluate their
expression tree as written. A zip-of-shifted-slices n-gram build
references its tokenization ``split(trim(lower(text)))`` once per slice
PLUS once per slice inside the inlined output-length bound — 2n copies
for an n-gram — so the regex split (and any casefold pre-fold riding
under it) re-runs 2n times per ROW. At n=13 that was 26 evaluations:
the grams stage of ``decontaminate_eval_overlap`` read 3.7 s at sf0.1
where the bound form reads 0.7 s (5.3×), and the casefold
``translate`` — a per-row UTF-16 round-trip in the engine — amplified
26× was exactly the r9→r8 bench regression.

The fix: evaluate the shared subexpression ONCE per row by binding it as
a higher-order-function lambda variable — ``transform(array(expr), f)``
computes ``expr`` exactly once and passes the result to ``f`` as a bound
reference. This stays a single Column (usable inside any generator or
lambda, where a separate ``.withColumn`` projection can't reach) and
adds only a 1-element array wrap. The n-gram/shingle expressions were
already in the interpreted HOF path (``transform`` lambdas are not
codegen'd), so the wrap costs no codegen span it hadn't already lost.

When the shared value is needed across OPERATORS (a filter and a
select), bind-once can't help — project the value into a column instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(expr: Column, f: Callable[[Column], Column]) -> Column:
    """``f(expr)`` with ``expr`` evaluated exactly once per row.

    Use when ``f`` would otherwise embed ``expr`` many times in one
    generator/lambda tree (no CSE there — see module docstring). The
    bound variable is a real per-row value: NULL ``expr`` flows through
    as a NULL argument exactly as the inlined form would.
    """
    return F.element_at(F.transform(F.array(expr), f), 1)
