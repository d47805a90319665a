"""Module pipeline API — the reference's per-document UDF surface
(SURVEY.md §2.11) re-expressed over DataFrames.

Reference: ETK modules are Python classes with ``document_selector(doc)`` +
``process_document(doc)`` (may return a LIST of documents — doc→many),
auto-discovered as ``em_*.py`` and run per message (`etk_worker.py:102-106,
210-213`; `docs/advanced.md:20-54,312-322`).

Spark design: a Module is (selector Column, process DataFrame→DataFrame).
``run_modules`` = union of each module's output over its selected slice —
set-oriented, one pass, no per-doc Python. For genuinely imperative user
logic, ``python_doc_module`` wraps a per-batch pandas function via
mapInPandas (Arrow-vectorized; doc→many naturally supported by returning
more rows than received — the reference's UDTF semantics).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame


@dataclass
class Module:
    """One ETL module: demux predicate + set-oriented transform."""
    name: str
    selector: Column | None  # None ⇒ all docs (em_base-style default module)
    process: Callable[[DataFrame], DataFrame]


def discover_modules(*dirs: str) -> list[Module]:
    """ETK-style module auto-discovery (`etk_worker.py:210-213`: the worker
    loads every ``em_*.py`` under ``working_dir/generated_additional_ems``
    and ``working_dir/generated_em``).

    Each ``em_*.py`` file is imported and contributes modules one of three
    ways, checked in order:

      * ``MODULES`` — a list of :class:`Module`;
      * ``MODULE`` — a single :class:`Module`;
      * module-level ``process(df) -> DataFrame`` plus optional
        ``document_selector() -> Column`` — the closest analogue of the
        reference's class contract (`docs/advanced.md:20-54`), wrapped into
        a :class:`Module` named after the file.

    Files load in sorted name order within each dir, dirs in the order
    given (the reference lists additional_ems before generated_em). Like
    the reference, this EXECUTES user code from the project's working
    dir — the trust boundary is the project, not the engine.
    """
    import glob
    import importlib.util
    import os

    out: list[Module] = []
    for d in dirs:
        for path in sorted(glob.glob(os.path.join(d, "em_*.py"))):
            name = os.path.splitext(os.path.basename(path))[0]
            spec = importlib.util.spec_from_file_location(name, path)
            pymod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(pymod)
            if hasattr(pymod, "MODULES"):
                out.extend(pymod.MODULES)
            elif hasattr(pymod, "MODULE"):
                out.append(pymod.MODULE)
            elif hasattr(pymod, "process"):
                selector = getattr(pymod, "document_selector", None)
                out.append(Module(
                    name=name,
                    selector=selector() if callable(selector) else None,
                    process=pymod.process))
            else:
                raise ValueError(
                    f"{path}: defines none of MODULES / MODULE / process")
    return out


def run_modules(df: DataFrame, modules: Iterable[Module]) -> DataFrame:
    """F1 demux + per-module transform + union (SURVEY §3.1 stages 3–5).

    ``unionByName(allowMissingColumns=True)`` reconciles differing module
    output schemas — the Spark equivalent of heterogeneous docs landing in
    one index (§2.8 set-op note).
    """
    outputs: list[DataFrame] = []
    for m in modules:
        selected = df.filter(m.selector) if m.selector is not None else df
        outputs.append(m.process(selected))
    if not outputs:
        return df.limit(0)
    out = outputs[0]
    for o in outputs[1:]:
        out = out.unionByName(o, allowMissingColumns=True)
    return out


def safe_python_doc_module(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
    *,
    id_col: str = "doc_id",
) -> Callable[[DataFrame], DataFrame]:
    """``python_doc_module`` with the reference's per-document error
    isolation (C5, `etk_worker.py:98-139`: per-doc try/except, log and
    continue).

    Fast path: the whole Arrow batch through ``fn`` at once. On failure
    the batch is retried document-at-a-time; failing docs emit a row with
    only (id, ``_error``) set — route ``_error IS NOT NULL`` rows to the
    quarantine table. Output schema = ``output_schema`` + ``_error``.
    """
    from pyspark.sql import types as T

    fields = [f.name for f in T._parse_datatype_string(output_schema).fields]
    schema = output_schema + ", _error string"

    def process(df: DataFrame) -> DataFrame:
        from dig_etl_engine_spark.session import ship_package

        ship_package(df.sparkSession)

        def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                try:
                    out = fn(pdf).copy()
                    out["_error"] = None
                    yield out
                    continue
                except Exception:
                    pass          # isolate: retry one doc at a time
                frames = []
                for i in range(len(pdf)):
                    single = pdf.iloc[[i]]
                    try:
                        out = fn(single).copy()
                        out["_error"] = None
                        frames.append(out)
                    except Exception as exc:
                        err = {f: [None] for f in fields}
                        err[id_col] = [single[id_col].iloc[0]]
                        err["_error"] = [f"{type(exc).__name__}: {exc}"]
                        frames.append(pd.DataFrame(err))
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        return df.mapInPandas(run, schema=schema)

    return process


def python_doc_module(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
) -> Callable[[DataFrame], DataFrame]:
    """Wrap an imperative per-batch document function as a module process.

    ``fn`` receives a pandas DataFrame of docs and returns a pandas
    DataFrame of output docs (0..n rows per input row — the reference's
    list-of-Documents return, `etk_worker.py:104-106`). Executed via
    mapInPandas: Arrow batches, no per-row serialization (risk R1).
    """
    def process(df: DataFrame) -> DataFrame:
        from dig_etl_engine_spark.session import ship_package

        ship_package(df.sparkSession)

        def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                out = fn(pdf)
                if out is not None and len(out):
                    yield out
        return df.mapInPandas(run, schema=output_schema)

    return process
