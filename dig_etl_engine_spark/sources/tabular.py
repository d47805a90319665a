"""CSV/TSV/.tab/Excel tabular source with row/column windowing (S2-S3).

Reference: ``utilities/data_import/dig_tabular_import.py:51-197`` —
  * 1-based ``heading_row`` (default 1) and ``content_start_row``
    (default 2); optional ``content_end_row`` (inclusive);
  * ``blank_row_ends_content``: content stops at the first blank row;
  * ``heading_columns`` (start, end) 1-based inclusive column window, with
    synthetic numeric headings;
  * encoding fallback utf-8-sig → latin-1 → utf-8 → utf-16 (`:142-156`);
  * every cell read as a string (no type inference, `auto_detect_*` off);
  * ``.tab`` treated as TSV (`:124-130`);
  * short rows padded with '' to the heading width (`:185-197`).

Spark design: the file is read as TEXT lines with a per-file line index
(``row_number()`` over ``monotonically_increasing_id()`` — JVM-only, the
same (split, intra-split position) order the former ``zipWithIndex``
used, without its per-action JVM→Python→JVM round trip), the row window
applied as a filter, and the surviving lines parsed with ``from_csv``
under an all-string schema. Row-windowed sheets are
human-authored (small) by nature; files WITHOUT windowing options should
use plain ``spark.read.csv`` (`plain_csv`) which scales to any size with
pushdown intact.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from dig_etl_engine_spark.functions.localdf import local_df
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENCODING_FALLBACK = ("utf-8-sig", "latin-1", "utf-8", "utf-16")


@dataclass
class TabularSpec:
    """The mapping-spec windowing options (1-based like the reference)."""
    sep: str = ","
    heading_row: int = 1
    content_start_row: int = 2
    content_end_row: int | None = None          # inclusive
    blank_row_ends_content: bool = False
    heading_columns: tuple[int, int] | None = None  # 1-based inclusive
    sheet_number: int = 1                       # Excel only


def sniff_encoding(path: str, sample_bytes: int = 65536) -> str:
    """The reference's try-in-order encoding fallback, applied to a head
    sample driver-side (`dig_tabular_import.py:142-156`)."""
    with open(path, "rb") as fh:
        head = fh.read(sample_bytes)
    for enc in ENCODING_FALLBACK:
        try:
            head.decode(enc)
            return enc
        except UnicodeDecodeError:
            continue
    return "utf-8"


def plain_csv(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """The no-windowing fast path: native CSV scan, all-string schema
    (header from row 1) — splittable, pushdown-capable."""
    return (spark.read.option("header", True).option("sep", sep)
            .option("inferSchema", False).csv(path))


def read_tabular(spark: SparkSession, path: str,
                 spec: TabularSpec | None = None) -> DataFrame:
    """S2: windowed tabular read, reference semantics, all cells string."""
    spec = spec or TabularSpec()
    sep = "\t" if os.path.splitext(path)[1] in (".tab", ".tsv") else spec.sep
    enc = sniff_encoding(path) if os.path.exists(path) else "utf-8"

    lines = spark.read.option("encoding", enc).text(path)
    # 1-based row numbers WITHOUT the Python boundary (r13, guide §4.1):
    # the former rdd.zipWithIndex() pickled every line JVM→Python→JVM —
    # and re-ran that round trip for every action on `indexed` (the
    # heading probe, the blank-row probe, and the final collect each
    # paid a full pass through Python workers). row_number() ordered by
    # monotonically_increasing_id() stays in the JVM and numbers rows
    # by (partition index, intra-partition position) — exactly the
    # order zipWithIndex used, so multi-split files keep the identical
    # (if split-packing-dependent) numbering and single-split files
    # (the reference's human-sized windowed sheets) keep exact file
    # order. The single-partition window sort is bounded by the same
    # doctrine that makes the zipWithIndex job acceptable.
    from pyspark.sql import Window as _W
    indexed = (
        lines.withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("row_num", F.row_number().over(_W.orderBy("_mid")))
        .select("row_num", F.col("value").alias("line"))
    )

    heading = indexed.filter(F.col("row_num") == spec.heading_row) \
                     .select("line").head()
    import csv as _csv
    heading_line = heading.line if heading else ""
    raw_headers = (next(_csv.reader([heading_line], delimiter=sep))
                   if heading_line else [])

    lo, hi = (spec.heading_columns if spec.heading_columns
              else (1, len(raw_headers)))
    if spec.heading_columns:
        # synthetic numeric headings for explicit column windows
        # (`dig_tabular_import.py:171-176`)
        headers = [str(i) for i in range(lo, hi + 1)]
    else:
        headers = [h.strip() for h in raw_headers]

    content = indexed.filter(F.col("row_num") >= spec.content_start_row)
    if spec.content_end_row is not None:
        content = content.filter(F.col("row_num") <= spec.content_end_row)
    elif spec.blank_row_ends_content:
        first_blank = (indexed
                       .filter((F.col("row_num") >= spec.content_start_row)
                               & (F.trim("line") == ""))
                       .agg(F.min("row_num")).head()[0])
        if first_blank is not None:
            content = content.filter(F.col("row_num") < first_blank)

    # Parse surviving lines with a real CSV parser (quote-aware, literal
    # separator — a naive split() would treat sep as regex and break quoted
    # fields).  All-string schema wide enough for the column window; short
    # rows yield NULL fields which coalesce to '' (the reference pads short
    # rows, `dig_tabular_import.py:185-197`) — and never throw, ANSI mode
    # included.
    width = max(hi, len(raw_headers))
    ddl = ", ".join(f"`_c{i}` STRING" for i in range(width))
    parsed = F.from_csv("line", ddl, {"sep": sep})
    cols = [
        F.coalesce(F.trim(parsed.getField(f"_c{lo - 1 + i}")), F.lit(""))
         .alias(h)
        for i, h in enumerate(headers)
    ]
    return (content.filter(F.trim("line") != "")
            .orderBy("row_num").select(*cols))


def read_excel(spark: SparkSession, path: str,
               spec: TabularSpec | None = None) -> DataFrame:
    """S3: spreadsheet source (driver-side — the reference's sheets are
    human-sized, `dig_tabular_import.py:107-160`; ``sheet_number`` 1-based,
    every cell a string). ``.xlsx`` parses with the stdlib OOXML reader
    (`sources/xlsx.py` — zipfile + ElementTree); legacy binary ``.xls``
    with the stdlib BIFF8 reader (`sources/xls.py`) — no Excel engine
    needed for either."""
    spec = spec or TabularSpec()
    ext = os.path.splitext(path)[1].lower()
    if ext == ".xls":
        from dig_etl_engine_spark.sources.xls import read_xls_grid
        rows = read_xls_grid(path, spec.sheet_number)
    else:
        from dig_etl_engine_spark.sources.xlsx import read_xlsx_grid
        rows = read_xlsx_grid(path, spec.sheet_number)
    return _grid_to_df(spark, rows, spec)


def _grid_to_df(spark: SparkSession, rows: list[list[str]],
                spec: TabularSpec) -> DataFrame:
    """Driver-side grid → windowed all-string DataFrame (shared by the
    Excel path and tests)."""
    headers = rows[spec.heading_row - 1] if rows else []
    lo, hi = (spec.heading_columns if spec.heading_columns
              else (1, len(headers)))
    names = ([str(i) for i in range(lo, hi + 1)] if spec.heading_columns
             else [h.strip() for h in headers])
    start = spec.content_start_row - 1
    end = spec.content_end_row if spec.content_end_row is not None else len(rows)
    out = []
    for row in rows[start:end]:
        if all(not str(c).strip() for c in row):
            if spec.blank_row_ends_content:
                break
            continue
        padded = row + [""] * (hi - len(row))
        out.append(tuple(str(c).strip() for c in padded[lo - 1:hi]))
    # every cell is str() above, so the stock path would infer all-string
    # anyway — pin that schema explicitly and take the LocalTableScan
    # path (functions/localdf.py): zero Python-worker tasks per action.
    # The explicit schema also fixes the empty-window case (r13 review):
    # createDataFrame([], name_list) raises "can not infer schema from
    # empty dataset", so an all-blank content window now returns an
    # empty all-string frame instead of crashing.
    schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    return local_df(spark, out, schema)
