"""Filter/predicate operators (SURVEY.md §2.3 F1–F7).

Reference semantics (file:line under /root/reference):
  F1 document_selector   — per-module boolean gate demultiplexing one doc
                           stream across ETK modules (docs/advanced.md:39-53;
                           datasets/etk_modules/em_elicit.py:65-66)
  F2 guard               — regex test at a path; ALL guards must match
                           (dig_tabular_import.py:15-40,290-304)
  F3 cell-value delete   — per-column blacklist → null the cell
                           (dig_tabular_import.py:210-212,236-240)
  F4 blank/NULL removal  — strip whitespace, drop empty values
                           (dig_tabular_import.py:96-101,255-263)
  F5 remove_fields       — drop listed columns (dig_tabular_import.py:103-106)
  F6 doc validity        — require non-empty doc_id; rejects quarantined
                           (etk_worker.py:93-95)

All are expressed as native Column ops — fully codegen'd, pushdown-eligible,
no Python in the row path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def document_selector(df: DataFrame, predicate: Column) -> DataFrame:
    """F1: gate a doc stream into one module's pipeline. The module registry
    (`pipeline.run_modules`) calls this once per registered module — the
    Spark-native replacement for ETK's `document_selector`."""
    return df.filter(predicate)


def url_prefix_selector(url_col: str, prefix: str) -> Column:
    """F1 helper: the reference's most common selector shape
    (`em_elicit.py:66` — ``doc.url.startswith(...)``)."""
    return F.col(url_col).startswith(prefix)


def guards(conditions: Sequence[Column]) -> Column:
    """F2: conjunction of guard predicates — all must match
    (`dig_tabular_import.py:290-304`). Empty guard list ⇒ pass."""
    out = F.lit(True)
    for c in conditions:
        out = out & c
    return out


def guard_rlike(path_col: str, pattern: str) -> Column:
    """F2: regex guard at a column path (`dig_tabular_import.py:15-40`)."""
    return F.col(path_col).rlike(pattern)


def delete_cell_values(df: DataFrame, column: str,
                       blacklist: Sequence[str]) -> DataFrame:
    """F3: null-out blacklisted cell values
    (`dig_tabular_import.py:210-212,236-240`;
    test `utilities/tests/test_cell_values_deletion.py:30-41`)."""
    c = F.col(column)
    return df.withColumn(column, F.when(c.isin(list(blacklist)), None).otherwise(c))


def clean_blank(column: Column) -> Column:
    """F4: trim whitespace and convert empty strings to NULL
    (`dig_tabular_import.py:96-101,255-263`)."""
    return F.nullif(F.trim(column), F.lit(""))


def remove_fields(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """F5: projection-out of listed columns (`dig_tabular_import.py:103-106`)."""
    return df.drop(*fields)


def split_valid_docs(df: DataFrame, id_col: str = "doc_id"
                     ) -> tuple[DataFrame, DataFrame]:
    """F6 + C5: validity gate with quarantine routing. The reference logs
    and drops docs without `doc_id` (`etk_worker.py:93-95`); we return
    (valid, rejected) so rejects land in an errors table instead of
    vanishing. One predicate, evaluated twice — Catalyst reuses the scan."""
    valid = F.col(id_col).isNotNull() & (F.length(F.trim(F.col(id_col).cast("string"))) > 0)
    return df.filter(valid), df.filter(~valid)
