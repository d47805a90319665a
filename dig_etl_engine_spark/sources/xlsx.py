"""Minimal stdlib XLSX grid reader/writer (S3/S9 un-gate).

XLSX is a public format: a zip of OOXML parts (ECMA-376). The reference
parses spreadsheets via pyexcel with every cell read back as a string and
``sheet_number`` 1-based (``dig_tabular_import.py:107-160``); this module
reproduces exactly that observable surface with ``zipfile`` +
``xml.etree`` — no Excel engine dependency. Legacy binary ``.xls`` is NOT
a zip/XML format and stays gated.

Scale note: spreadsheets are human-authored (the reference's are project
config artifacts), so driver-side parsing into a grid then
``spark.createDataFrame`` is the right shape — the windowing/typing work
happens in ``tabular._grid_to_df`` shared with the CSV path.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 (base-26 bijective)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _cell_text(cell: ET.Element, shared: list[str]) -> str:
    t = cell.get("t", "n")
    if t == "inlineStr":
        return "".join(el.text or ""
                       for el in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    raw = v.text if v is not None and v.text is not None else ""
    if t == "s":
        return shared[int(raw)] if raw else ""
    if t == "b":
        return "TRUE" if raw == "1" else "FALSE"
    return raw


def read_xlsx_grid(path: str, sheet_number: int = 1) -> list[list[str]]:
    """Sheet N (1-based, workbook order) as a dense all-string grid —
    missing cells '', rows padded to the widest row."""
    with zipfile.ZipFile(path) as zf:
        # workbook order -> relationship id -> worksheet part
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = wb.findall(f"{_NS}sheets/{_NS}sheet")
        if not 1 <= sheet_number <= len(sheets):
            raise ValueError(f"sheet_number {sheet_number} out of range "
                             f"(workbook has {len(sheets)})")
        rid = sheets[sheet_number - 1].get(f"{_REL_NS}id")
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target = None
        for rel in rels:
            if rel.get("Id") == rid:
                target = rel.get("Target")
        if target is None:                       # pragma: no cover
            raise ValueError(f"no worksheet target for sheet {sheet_number}")
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{_NS}t"))
                      for si in ss.findall(f"{_NS}si")]

        sheet = ET.fromstring(zf.read(target))
        rows: dict[int, dict[int, str]] = {}
        for row in sheet.iter(f"{_NS}row"):
            rnum = int(row.get("r", len(rows) + 1)) - 1
            cells = rows.setdefault(rnum, {})
            auto_col = 0
            for cell in row.findall(f"{_NS}c"):
                ref = cell.get("r")
                if ref:
                    m = _CELL_REF.match(ref)
                    col = _col_index(m.group(1)) if m else auto_col
                else:
                    col = auto_col
                auto_col = col + 1
                cells[col] = _cell_text(cell, shared)

    if not rows:
        return []
    n_rows = max(rows) + 1
    n_cols = max((max(c) + 1 for c in rows.values() if c), default=0)
    return [[rows.get(r, {}).get(c, "") for c in range(n_cols)]
            for r in range(n_rows)]


def _col_ref(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(path: str, grids: list[list[list[str]]] | list[list[str]],
               sheet_names: list[str] | None = None) -> None:
    """Write one or more all-string grids as a minimal valid XLSX (inline
    strings, no styles) — enough for any OOXML reader, used by tests and
    the source round-trip query."""
    if grids and grids[0] and isinstance(grids[0][0], str):
        grids = [grids]                          # single sheet
    names = sheet_names or [f"Sheet{i + 1}" for i in range(len(grids))]

    def esc(s: str) -> str:
        # '&quot;' too: sheet names land in XML attribute values
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;"))

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(grids)))
        zf.writestr("[Content_Types].xml",
                    '<?xml version="1.0"?><Types xmlns="http://schemas.'
                    'openxmlformats.org/package/2006/content-types">'
                    '<Default Extension="rels" ContentType="application/'
                    'vnd.openxmlformats-package.relationships+xml"/>'
                    '<Default Extension="xml" ContentType="application/xml"/>'
                    '<Override PartName="/xl/workbook.xml" ContentType='
                    '"application/vnd.openxmlformats-officedocument.'
                    'spreadsheetml.sheet.main+xml"/>'
                    f'{overrides}</Types>')
        zf.writestr("_rels/.rels",
                    '<?xml version="1.0"?><Relationships xmlns="http://'
                    'schemas.openxmlformats.org/package/2006/relationships">'
                    '<Relationship Id="rId1" Type="http://schemas.'
                    'openxmlformats.org/officeDocument/2006/relationships/'
                    'officeDocument" Target="xl/workbook.xml"/>'
                    '</Relationships>')
        sheets_xml = "".join(
            f'<sheet name="{esc(names[i])}" sheetId="{i + 1}" '
            f'r:id="rId{i + 1}"/>' for i in range(len(grids)))
        zf.writestr("xl/workbook.xml",
                    '<?xml version="1.0"?><workbook xmlns="http://schemas.'
                    'openxmlformats.org/spreadsheetml/2006/main" '
                    'xmlns:r="http://schemas.openxmlformats.org/'
                    'officeDocument/2006/relationships">'
                    f'<sheets>{sheets_xml}</sheets></workbook>')
        rels_xml = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet"'
            f' Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(grids)))
        zf.writestr("xl/_rels/workbook.xml.rels",
                    '<?xml version="1.0"?><Relationships xmlns="http://'
                    'schemas.openxmlformats.org/package/2006/relationships">'
                    f'{rels_xml}</Relationships>')
        for i, grid in enumerate(grids):
            rows_xml = []
            for r, row in enumerate(grid):
                cells = "".join(
                    f'<c r="{_col_ref(c)}{r + 1}" t="inlineStr">'
                    f'<is><t>{esc(str(v))}</t></is></c>'
                    for c, v in enumerate(row))
                rows_xml.append(f'<row r="{r + 1}">{cells}</row>')
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                        '<?xml version="1.0"?><worksheet xmlns="http://'
                        'schemas.openxmlformats.org/spreadsheetml/2006/main">'
                        f'<sheetData>{"".join(rows_xml)}</sheetData>'
                        '</worksheet>')
