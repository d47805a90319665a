"""Data-layout operators: Z-order (Morton) clustering for multi-column
file skipping.

Capability superset (the reference delegates all physical layout to
Elasticsearch segments — SURVEY §2.6 has no layout operator): at 100 TB
the dominant cost of a selective query is the scan, and parquet row-group
min/max statistics only prune files for predicates on the column(s) the
data happens to be sorted by. A linear sort on column A gives perfect
pruning on A and none on B; interleaving the bits of both columns into a
single Morton (Z-order) key and range-partition-sorting by it gives every
file a small bounding BOX in (A, B) space, so point/range predicates on
EITHER column skip most files. This is the standard lakehouse clustering
technique (Databricks Delta `OPTIMIZE ZORDER BY`, Iceberg's z-ordering
rewrite); here it is expressed as plain DataFrame ops so Catalyst/AQE
still own the physical plan.

Scale design:

* The Morton key is a pure codegen expression (shifts/masks over int64) —
  no UDF, no shuffle of its own. Quantization to the ``bits``-wide grid is
  integer arithmetic over exact MIN/MAX bounds (a 2-row broadcast), so the
  cell ids are bit-identical in every engine — the correctness oracle
  recomputes them in DuckDB.
* ``write_zorder_clustered`` is one range-repartition (a single shuffle,
  the unavoidable cost of any global re-clustering) + an in-partition
  sort; ``repartitionByRange`` samples key quantiles, so file sizes stay
  balanced even when the key distribution is skewed.
* ``file_skip_stats`` reads only parquet FOOTERS (pyarrow metadata, no
  data pages) — the same statistics a cluster-side scan planner consults;
  at 100 TB this is the manifest scan, proportional to file count, not
  data size.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_cell(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map an int64 value in [lo, hi] to a ``bits``-wide grid cell.

    Pure integer arithmetic — clamp to the bounds FIRST, then
    ``((v - lo) * 2^bits) div (hi - lo + 1)`` — so every engine computes
    the same cell for the same row (the div is exact; no float appears).
    Clamp-before-multiply also bounds the product: with the span guard
    in :func:`zorder_key` the multiply can never wrap int64 — Spark
    wraps silently where DuckDB errors, so an unguarded overflow would
    be a cross-engine divergence, not just a wrong answer. Out-of-range
    values land in the edge cells (a late-arriving out-of-bounds row
    degrades clustering quality, never correctness)."""
    n = 1 << bits
    v = F.least(hi, F.greatest(lo, col))
    cell = F.call_function("div", (v - lo) * F.lit(n), hi - lo + F.lit(1))
    return F.least(F.lit(n - 1), cell).cast("long")


def sql_quantize_cell(col: str, lo: str, hi: str, bits: int) -> str:
    """DuckDB mirror of :func:`quantize_cell` (same integer expression)."""
    n = 1 << bits
    v = f"LEAST({hi}, GREATEST({lo}, {col}))"
    cell = f"(({v} - {lo}) * {n}) // ({hi} - {lo} + 1)"
    return f"LEAST({n - 1}, {cell})"


def morton_key(cells: Sequence[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each cell id into one Z-order
    key: bit j of dimension i lands at position ``j * ndims + i``.

    Generated as a flat OR-tree of shift/mask terms — all int64 codegen,
    no UDF. ``ndims * bits`` must stay < 63."""
    ndims = len(cells)
    if ndims * bits >= 63:
        raise ValueError("morton key would overflow int64")
    terms = []
    for i, c in enumerate(cells):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, j * ndims + i))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def sql_morton_key(cells: Sequence[str], bits: int) -> str:
    """DuckDB mirror of :func:`morton_key` (same bit positions; integer
    ops, so any correct formulation matches bit-for-bit)."""
    ndims = len(cells)
    terms = []
    for i, c in enumerate(cells):
        for j in range(bits):
            terms.append(f"((({c} >> {j}) & 1) << {j * ndims + i})")
    return "(" + " | ".join(terms) + ")"


def zorder_key(df: DataFrame, cols: Sequence[str], *, bits: int = 8,
               bounds: dict[str, tuple[int, int]] | None = None) -> Column:
    """Z-order key over integer columns, quantized to exact per-column
    MIN/MAX bounds.

    ``bounds`` overrides the bounds scan (pass known domain bounds at
    100 TB to skip it); otherwise one tiny aggregate computes them —
    integer MIN/MAX, exact in every engine, one row collected."""
    if bounds is None:
        row = df.agg(*[f(c).alias(f"{f.__name__}_{c}")
                       for c in cols for f in (F.min, F.max)]).collect()[0]
        if any(row[f"min_{c}"] is None for c in cols):
            raise ValueError(
                "zorder_key: no rows (or all-NULL key column) — refusing "
                "to cluster an empty dataset; an empty re-cluster over a "
                "live layout is an upstream bug, not an export")
        bounds = {c: (row[f"min_{c}"], row[f"max_{c}"]) for c in cols}
    for c in cols:
        lo, hi = int(bounds[c][0]), int(bounds[c][1])
        if hi - lo + 1 > (1 << (62 - bits)):
            raise ValueError(
                f"zorder_key: span of {c!r} ({hi - lo + 1}) × 2^{bits} "
                "cells would overflow int64 cell math — reduce bits or "
                "pre-scale the key")
    cells = [quantize_cell(F.col(c).cast("long"),
                           F.lit(int(bounds[c][0])), F.lit(int(bounds[c][1])),
                           bits) for c in cols]
    return morton_key(cells, bits)


_PQ_PATTERN = "part-*.parquet"


def write_zorder_clustered(df: DataFrame, path: str, cols: Sequence[str], *,
                           bits: int = 8, num_files: int = 8,
                           bounds: dict[str, tuple[int, int]] | None = None,
                           lock_timeout: float = 300.0) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    One range-repartition on the Morton key (quantile-sampled, so files
    balance under skew) + an in-partition sort — each output file covers
    a compact (A, B) bounding box and its row-group min/max stats prune
    for predicates on ANY of ``cols``.

    A re-cluster REPLACES a live layout other jobs read, so the write
    follows the repo-wide staged-export doctrine (`sinks/webdataset.py`
    module docstring): Spark writes into a ``.staging-*`` dir inside the
    target, success swaps the part files in rename-aside under the
    advisory writer lock, and a crash at any point leaves either the old
    or the new layout recoverable — never zero complete exports. Readers
    use :func:`read_zorder_clustered` for a torn-view-safe file list.

    Empty-input semantics: with default bounds an empty ``df`` REFUSES
    (NULL min/max — an upstream bug, not an export); with explicit
    ``bounds`` the caller asked for an overwrite and gets a valid empty
    layout (schema-bearing part file), while a pathological zero-staged
    write aborts before the swap so the live layout is never retired
    with nothing to replace it."""
    from dig_etl_engine_spark.sinks.kg_table import table_lock

    os.makedirs(path, exist_ok=True)
    with table_lock(path, timeout=lock_timeout):
        _write_clustered_locked(df, path, cols, bits=bits,
                                num_files=num_files, bounds=bounds)


def _write_clustered_locked(df: DataFrame, path: str, cols: Sequence[str],
                            *, bits: int, num_files: int,
                            bounds: dict[str, tuple[int, int]] | None
                            ) -> None:
    """Staged-swap body of :func:`write_zorder_clustered`; the caller
    holds the advisory writer lock (split out so
    :func:`recluster_zorder` can keep ONE lock across its read+rewrite —
    the table_lock is mkdir-based, not reentrant)."""
    import shutil

    from dig_etl_engine_spark.sinks.webdataset import (
        _glob_in, _heal_export, _swap_export)

    z = zorder_key(df, cols, bits=bits, bounds=bounds)
    clustered = (df.withColumn("_z", z)
                 .repartitionByRange(num_files, "_z")
                 .sortWithinPartitions("_z")
                 .drop("_z"))
    _heal_export(path, _PQ_PATTERN)
    for stale in _glob_in(path, ".staging-*"):
        shutil.rmtree(stale, ignore_errors=True)
    staging = os.path.join(path, f".staging-{os.getpid()}")
    try:
        clustered.write.mode("overwrite").parquet(staging)
        staged = _glob_in(staging, _PQ_PATTERN)
        if not staged:
            # an empty staged set would make _swap_export retire the
            # whole live layout with nothing moved in — exactly the
            # zero-complete-exports state the protocol exists to prevent
            raise ValueError(
                f"write_zorder_clustered: no part files staged for "
                f"{path} (empty input?) — live layout left untouched")
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    _swap_export(path, _PQ_PATTERN, staged)
    shutil.rmtree(staging, ignore_errors=True)


def read_zorder_clustered(spark, path: str) -> DataFrame:
    """Read a :func:`write_zorder_clustered` layout through the shared
    torn-view resolution (`webdataset._effective_files`): on a healthy
    directory this is the plain parquet read; mid-crash it reconstructs
    exactly the committed export from ``path`` ∪ ``.old``/``.staging``
    per the swap invariants, so readers never see a partial layout."""
    from dig_etl_engine_spark.sinks.webdataset import _effective_files

    files = _effective_files(path, _PQ_PATTERN)
    if not files:
        raise FileNotFoundError(f"no clustered layout at {path}")
    return spark.read.parquet(*files)


def recluster_zorder(spark, path: str, cols: Sequence[str], *,
                     bits: int = 8, num_files: int = 8,
                     lock_timeout: float = 300.0) -> int:
    """Maintenance re-cluster: read the live layout and rewrite it
    Z-ordered in place — the nightly repair for a clustered table that
    accumulated appends or drifted key bounds
    (`scripts/maintain.py --zorder`). ONE writer lock spans heal + read
    + rewrite, so a concurrent export can never land between the read
    and the swap and be silently overwritten (the lost-update window
    the KG upsert closes the same way). Reading and replacing the same
    directory is safe: the read resolves concrete file paths before the
    rewrite starts and the staged swap renames them only after the
    rewrite's action completes. Returns the row count rewritten."""
    from dig_etl_engine_spark.sinks.kg_table import table_lock
    from dig_etl_engine_spark.sinks.webdataset import _heal_export

    with table_lock(path, timeout=lock_timeout):
        _heal_export(path, _PQ_PATTERN)  # settle torn state, then read live
        df = read_zorder_clustered(spark, path)
        # ONE stats pass folds the returned row count into the bounds
        # aggregate the rewrite needs anyway, so the total cost is one
        # narrow column scan + the (unavoidable) rewrite — not three
        # passes over a table whose stated target is 100 TB
        row = df.agg(F.count(F.lit(1)).alias("n"),
                     *[f(c).alias(f"{f.__name__}_{c}")
                       for c in cols for f in (F.min, F.max)]).collect()[0]
        n = row["n"]
        if n == 0:
            raise ValueError(f"recluster_zorder: {path} holds no rows — "
                             "refusing to rewrite an empty layout")
        bounds = {c: (row[f"min_{c}"], row[f"max_{c}"]) for c in cols}
        # non-empty but all-NULL key column: bounds are (None, None)
        # and zorder_key would fail later with an opaque int(None)
        # TypeError — refuse as clearly as the empty-table case
        all_null = [c for c, (lo, hi) in bounds.items()
                    if lo is None or hi is None]
        if all_null:
            raise ValueError(
                f"recluster_zorder: {path} column(s) {all_null} are "
                f"entirely NULL over {n} rows — no key bounds to "
                f"cluster on; drop the column from `cols` or backfill")
        _write_clustered_locked(df, path, cols, bits=bits,
                                num_files=num_files, bounds=bounds)
    return n


def file_skip_stats(path: str, column: str, *,
                    granularity: str = "file") -> list[dict]:
    """Min/max of ``column`` from parquet footers only, at ``file`` or
    ``rowgroup`` granularity (row groups are where engines actually
    prune — a file-level audit understates a layout whose groups are
    tighter than the whole file).

    Returns ``[{file, min, max, rows, stats_complete}, ...]`` (plus
    ``rowgroup`` index at rowgroup granularity) — the statistics a scan
    planner uses. Footer-only: cost is O(files), independent of data
    size. Local-filesystem audit tool (``os.listdir``); on an object
    store, point it at a synced copy or swap the listing for a
    pyarrow.fs call — the query-side pruning itself is Spark's own and
    needs no local access."""
    import pyarrow.parquet as pq

    if granularity not in ("file", "rowgroup"):
        raise ValueError(f"unknown granularity {granularity!r}")
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if column not in idx:
            raise KeyError(f"{column} not in {name}")
        if granularity == "rowgroup":
            if md.num_row_groups == 0:
                # a zero-row-group file must still appear in the audit —
                # omitting it would give the two granularities different
                # file populations and skip_fraction denominators
                out.append({"file": name, "rowgroup": None, "min": None,
                            "max": None, "rows": 0,
                            "stats_complete": False})
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                st = g.column(idx[column]).statistics
                has = st is not None and st.has_min_max
                out.append({"file": name, "rowgroup": rg,
                            "min": st.min if has else None,
                            "max": st.max if has else None,
                            "rows": g.num_rows, "stats_complete": has})
            continue
        cmin, cmax = None, None
        stats_complete = md.num_row_groups > 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[column]).statistics
            if st is None or not st.has_min_max:
                stats_complete = False
                continue
            cmin = st.min if cmin is None else min(cmin, st.min)
            cmax = st.max if cmax is None else max(cmax, st.max)
        out.append({"file": name, "min": cmin, "max": cmax,
                    "rows": md.num_rows, "stats_complete": stats_complete})
    return out


def skip_fraction(stats: list[dict], lo, hi) -> float:
    """Fraction of SCAN UNITS a range predicate ``[lo, hi]`` can SKIP
    given their footer min/max — the layout-quality metric (higher is
    better). The denominator is whatever granularity the ``stats``
    entries carry: one entry per file from
    ``file_skip_stats(granularity="file")`` → fraction of files; one
    entry per row group from ``granularity="rowgroup"`` → fraction of
    row groups (zero-row-group files contribute one always-skippable
    placeholder entry). The two metrics are deliberately not
    comparable across granularities — row groups are the unit engines
    actually prune, files are the unit a listing-time planner prunes.

    A unit is skippable only when it is EMPTY or carries min/max
    statistics that clear the range: a stats-less unit must be read (a
    planner cannot prove it empty of matches), so incomplete
    statistics count as must-read, never as skipped."""
    if not stats:
        return 0.0
    skipped = sum(
        1 for s in stats
        if s.get("rows", 1) == 0
        or (s.get("stats_complete", s["min"] is not None)
            and (s["max"] < lo or s["min"] > hi)))
    return skipped / len(stats)
