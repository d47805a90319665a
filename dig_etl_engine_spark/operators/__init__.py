"""Operator library: reusable DataFrame/Column transforms.

Each module covers one family from SURVEY.md §2; the corresponding
``queries_*`` registry modules pin semantics against the DuckDB oracle.
"""
