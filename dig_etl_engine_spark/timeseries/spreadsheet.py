"""Annotated-spreadsheet time-series region extraction (T2, driver-side).

Reference: ``utilities/timeseries/extractSpreadsheet.py:20-311``. A JSON
annotation names sheet indices, per-sheet TimeSeriesRegions (row- or
column-oriented), metadata sources (cell / row / col / const / sheet_name,
plus ``inline`` mode that splits a series when inline labels change), and
time-coordinate locations with optional ``backfill`` of blank labels (T3)
and a post-process hook.

Spreadsheets are small (a parse is O(cells) on one annotated workbook), so
this stays driver-side pure Python — the reference's design point too. The
output feeds :func:`timeseries_df`, after which everything is distributed.

Intentional divergences from the reference:
  * ``post_process`` is a NAME looked up in :data:`POST_PROCESS_REGISTRY`,
    never ``eval()`` of a config string (`extractSpreadsheet.py:117-119`;
    SURVEY §7.4 R4).
  * pyexcel is gated behind an import-try; grids (list-of-lists) are the
    first-class input so tests don't need Excel files.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dig_etl_engine_spark.timeseries.locations import (
    LocationRange, parse_coords, parse_range)

# Named replacements for the reference's eval'd `post_process` lambdas.
POST_PROCESS_REGISTRY: dict[str, Callable[[str], str]] = {
    "strip": str.strip,
    "upper": str.upper,
    "lower": str.lower,
    "year_prefix": lambda v: v[:4],
}


def _to_str(v: Any) -> str:
    return v if isinstance(v, str) else "" if v is None else str(v)


def _is_blank(v: Any) -> bool:
    return _to_str(v).strip() == ""


@dataclass
class TimeSeriesRegion:
    """One annotated region (`extractSpreadsheet.py:20-31`)."""
    orientation: str                       # 'row' | 'col'
    series_range: LocationRange
    data_range: LocationRange
    metadata_spec: dict[str, dict]
    time_locs: LocationRange
    time_mode: str | None                  # None | 'backfill'
    post_process: str | None               # registry key
    global_metadata: dict[str, dict]
    provenance: dict = field(default_factory=dict)

    def _coords(self, tsidx: int, dataidx: int) -> tuple[int, int]:
        return (tsidx, dataidx) if self.orientation == "row" else (dataidx, tsidx)

    def _cell(self, grid: list[list], r: int, c: int) -> Any:
        if r >= len(grid) or c >= len(grid[r]):
            raise IndexError((r, c))
        return grid[r][c]

    def _global_md(self, grid: list[list], sheet_name: str) -> dict:
        md: dict[str, Any] = {}
        for name, spec in self.global_metadata.items():
            if spec["source"] == "sheet_name":
                md[name] = sheet_name
            elif spec["source"] == "cell":
                md[name] = self._cell(grid, spec["row"], spec["col"])
            elif spec["source"] == "const":
                md[name] = spec["val"]
        md["provenance"] = dict(self.provenance)
        return md

    def _series_md(self, md: dict, grid: list[list], tsidx: int) -> dict[str, bool]:
        """Fill normal-mode metadata; raise IndexError if all blank
        (`extractSpreadsheet.py:61-88`). Returns the set of other modes."""
        modes: dict[str, bool] = {}
        all_blank = True
        for name, spec in self.metadata_spec.items():
            if spec.get("mode", "normal") != "normal":
                modes[spec["mode"]] = True
                continue
            if spec["source"] == "cell":
                md[name] = self._cell(grid, spec["loc"][0], spec["loc"][1])
                all_blank = all_blank and _is_blank(md[name])
            elif spec["source"] == "const":
                md[name] = spec["val"]
            else:  # row/col locations perpendicular to the series
                vals = []
                for idx, _ in spec["loc"]:
                    r, c = self._coords(tsidx, idx)
                    v = _to_str(self._cell(grid, r, c))
                    vals.append(v)
                    all_blank = all_blank and _is_blank(v)
                md[name] = " ".join(vals)
        if all_blank and "inline" not in modes:
            raise IndexError("all metadata values blank")
        return modes

    def _inline_md(self, grid: list[list], dataidx: int) -> dict[str, str]:
        out = {}
        for name, spec in self.metadata_spec.items():
            if spec.get("mode") == "inline":
                vals = []
                for idx, _ in spec["loc"]:
                    r, c = self._coords(idx, dataidx)
                    vals.append(_to_str(self._cell(grid, r, c)))
                out[name] = " ".join(vals)
        return out

    def _time_label(self, grid: list[list], d_idx: int) -> str:
        """Concat time-coordinate cells; blank + backfill mode → scan
        backwards for the previous non-blank (T3,
        `extractSpreadsheet.py:104-120`)."""
        labels = []
        for tc, _ in self.time_locs:
            r, c = self._coords(tc, d_idx)
            val = _to_str(self._cell(grid, r, c))
            if _is_blank(val) and self.time_mode == "backfill":
                t = d_idx - 1
                while t > 0 and _is_blank(val):
                    r, c = self._coords(tc, t)
                    val = _to_str(self._cell(grid, r, c))
                    t -= 1
            labels.append(val)
        label = " ".join(labels)
        if self.post_process:
            label = POST_PROCESS_REGISTRY[self.post_process](label)
        return label

    def parse(self, grid: list[list], sheet_name: str) -> list[dict]:
        """Extract every series in the region → [{metadata, ts}] with
        ts = [(time_label, raw_value)] (`extractSpreadsheet.py:122-194`)."""
        out: list[dict] = []
        base_md = self._global_md(grid, sheet_name)
        for ts_idx, s_comp in self.series_range:
            md = dict(base_md)
            md["provenance"] = dict(base_md["provenance"],
                                    **{self.orientation: ts_idx})
            try:
                modes = self._series_md(md, grid, ts_idx)
            except IndexError:
                if s_comp.infinite:
                    break          # blank-stop for open-ended series ranges
                raise
            points: list[tuple[str, Any]] = []
            inline_prev: dict[str, str] | None = None
            for d_idx, d_comp in self.data_range:
                try:
                    label = self._time_label(grid, d_idx)
                except IndexError:
                    if d_comp.infinite:
                        break
                    raise
                if d_comp.infinite and _is_blank(label):
                    break          # blank-stop inside infinite data ranges
                if "inline" in modes:
                    inline_cur = self._inline_md(grid, d_idx)
                    if inline_prev is not None and inline_cur != inline_prev:
                        out.append({"metadata": {**md, **inline_prev},
                                    "ts": points})
                        points = []
                    inline_prev = inline_cur
                r, c = self._coords(ts_idx, d_idx)
                points.append((label, self._cell(grid, r, c)))
            if "inline" in modes and inline_prev is not None:
                md = {**md, **inline_prev}
            out.append({"metadata": md, "ts": points})
        return out


def _parse_md_spec(md_json: list[dict], orientation: str) -> dict[str, dict]:
    """Per-region metadata spec (`extractSpreadsheet.py:247-280`): default
    source is the orientation's perpendicular axis."""
    perpendicular = {"row": "col", "col": "row"}
    out: dict[str, dict] = {}
    for spec in md_json:
        name = spec["name"]
        source = spec.get("source", perpendicular[orientation])
        entry: dict[str, Any] = {"source": source,
                                 "mode": spec.get("mode", "normal")}
        if source == "cell":
            entry["loc"] = parse_coords(spec["loc"])
        elif source in ("row", "col"):
            entry["loc"] = list(parse_range(spec["loc"]))
        elif source == "const":
            entry["val"] = spec["val"]
        out[name] = entry
    return out


def parse_annotation(annotation: dict, filename: str) -> tuple[LocationRange, list[TimeSeriesRegion]]:
    """One annotation object → (sheet_indices, regions)
    (`extractSpreadsheet.py:197-246`)."""
    sheets = parse_range(annotation["Properties"]["sheet_indices"])
    gmd: dict[str, dict] = {}
    for spec in annotation.get("GlobalMetadata", []):
        entry: dict[str, Any] = {"source": spec["source"]}
        if spec["source"] == "cell":
            entry["row"], entry["col"] = parse_coords(spec["loc"])
        elif spec["source"] == "const":
            entry["val"] = spec["val"]
        gmd[spec["name"]] = entry
    regions = []
    for tsr in annotation["TimeSeriesRegions"]:
        orientation = tsr["orientation"]
        series_spec = tsr["rows"] if orientation == "row" else tsr["cols"]
        times = tsr["times"]
        regions.append(TimeSeriesRegion(
            orientation=orientation,
            series_range=parse_range(series_spec),
            data_range=parse_range(tsr["locs"]),
            metadata_spec=_parse_md_spec(tsr.get("metadata", []), orientation),
            time_locs=parse_range(times["locs"]),
            time_mode=times.get("mode"),
            post_process=times.get("post_process"),
            global_metadata=gmd,
            provenance={"filename": filename},
        ))
    return sheets, regions


def extract_grids(grids: dict[str, list[list]], annotations: list[dict],
                  filename: str = "grid") -> list[dict]:
    """Run every annotation over named grids ({sheet_name: rows}); sheet
    indices select by position (`extractSpreadsheet.py:283-305`)."""
    names = list(grids)
    out: list[dict] = []
    for annotation in annotations:
        sheets, regions = parse_annotation(annotation, filename)
        for sheet_idx, _ in sheets:
            if sheet_idx >= len(names):
                break
            name = names[sheet_idx]
            for region in regions:
                region.provenance["sheet"] = sheet_idx
                out.extend(region.parse(grids[name], name))
    return out


def extract_spreadsheet(path: str, annotations: list[dict]) -> list[dict]:
    """Excel entry point (`extractSpreadsheet.py:283-305` reads the book
    sheet-by-sheet). ``.xlsx`` parses with the stdlib OOXML reader — all
    sheets in workbook order; legacy ``.xls`` needs pyexcel (gated)."""
    import os

    if path.lower().endswith(".xls"):
        try:
            import pyexcel  # noqa: F401
        except ImportError as exc:  # pragma: no cover - gated dependency
            raise NotImplementedError(
                "legacy .xls parsing needs pyexcel; convert to .xlsx or "
                "pass grids to extract_grids instead") from exc
        book = pyexcel.get_book(file_name=path, auto_detect_datetime=False)
        grids = {s.name: s.to_array() for s in book}
    else:
        import zipfile
        from xml.etree import ElementTree as ET

        from dig_etl_engine_spark.sources.xlsx import _NS, read_xlsx_grid

        with zipfile.ZipFile(path) as zf:
            wb = ET.fromstring(zf.read("xl/workbook.xml"))
            names = [s.get("name") or f"Sheet{i + 1}" for i, s in enumerate(
                wb.findall(f"{_NS}sheets/{_NS}sheet"))]
        grids = {name: read_xlsx_grid(path, i + 1)
                 for i, name in enumerate(names)}
    return extract_grids(grids, annotations, os.path.basename(path))


TS_SCHEMA = T.StructType([
    T.StructField("series_id", T.StringType()),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    T.StructField("points", T.ArrayType(T.StructType([
        T.StructField("label", T.StringType()),
        T.StructField("value", T.StringType()),
    ]))),
])


def timeseries_df(spark: SparkSession, parsed: list[dict],
                  dataset: str = "") -> DataFrame:
    """Parsed regions → DataFrame (metadata map + points array), the hand-off
    from driver-side parse to distributed processing. series_id follows the
    reference's Measure doc-id scheme (sha256 of '{dataset} {name}',
    `ts_converter.py:84-96`) when possible."""
    import hashlib
    import json

    rows = []
    for series in parsed:
        md = {k: _to_str(v) for k, v in series["metadata"].items()
              if k != "provenance"}
        if dataset.strip() and "name" in md:
            sid = hashlib.sha256(
                f"{dataset} {md['name']}".encode()).hexdigest().upper()
        else:
            sid = hashlib.sha1(json.dumps(
                md, sort_keys=True).encode()).hexdigest().upper()
        rows.append((sid, md,
                     [(lbl, _to_str(v)) for lbl, v in series["ts"]]))
    return spark.createDataFrame(rows, TS_SCHEMA)
