"""Minimal XLSX codec — stdlib only (zipfile + ElementTree).

The reference accepts XLSX/XLS uploads (backend/services/file_service.py:61)
and reads them via a DuckDB spatial-extension shim (duckdb_engine.py:258-259).
Spark has no Excel reader and this container has no openpyxl, so S4 was
gated behind NotImplementedError. An .xlsx file is a zip of XML parts,
though — this module reads the common subset (shared strings, inline
strings, numbers, booleans) and writes valid workbooks for fixtures, with
no third-party dependency. ``readers._read_excel`` prefers pandas+openpyxl
when installed and falls back here.

Spreadsheets are driver-side by nature (the format caps at ~1M rows);
bulk data belongs in parquet/csv on storage executors can scan.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def read_xlsx_rows(path: str, sheet: str | int = 0) -> list[list]:
    """Rows of the given sheet (name or 0-based index) as Python values:
    str, float/int, bool, or None for blank cells."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = wb.findall(f"{_NS}sheets/{_NS}sheet")
        if not sheets:
            raise ValueError(f"no sheets in {path}")
        rels = {
            rel.get("Id"): rel.get("Target")
            for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        }
        if isinstance(sheet, int):
            chosen = sheets[sheet]
        else:
            by_name = {s.get("name"): s for s in sheets}
            if sheet not in by_name:
                raise ValueError(f"sheet {sheet!r} not in {list(by_name)}")
            chosen = by_name[sheet]
        target = rels[chosen.get(f"{_REL_NS}id")].lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_NS}t")))

        rows: list[list] = []
        for row_el in ET.fromstring(zf.read(target)).iter(f"{_NS}row"):
            cells: dict[int, object] = {}
            for c in row_el.findall(f"{_NS}c"):
                ref = _CELL_REF.match(c.get("r", ""))
                idx = _col_index(ref.group(1)) if ref else len(cells)
                ctype = c.get("t", "n")
                v = c.find(f"{_NS}v")
                if ctype == "s":
                    cells[idx] = shared[int(v.text)] if v is not None else None
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    cells[idx] = "".join(t.text or "" for t in
                                         is_el.iter(f"{_NS}t")) \
                        if is_el is not None else None
                elif ctype == "b":
                    cells[idx] = v is not None and v.text == "1"
                elif ctype == "str":
                    cells[idx] = v.text if v is not None else None
                else:  # numeric
                    if v is None or v.text is None:
                        cells[idx] = None
                    else:
                        f = float(v.text)
                        cells[idx] = int(f) if f.is_integer() else f
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])

        width = max((len(r) for r in rows), default=0)
        return [r + [None] * (width - len(r)) for r in rows]


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    # \r must be a character reference: XML parsers normalize literal CR to
    # LF (the xlsx spec's own escaping rule)
    text = escape(str(value), {"\r": "&#13;"})
    return (f'<c r="{ref}" t="inlineStr"><is>'
            f'<t xml:space="preserve">{text}</t></is></c>')


def _col_ref(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(rows: list[list], path: str, sheet_name: str = "Sheet1") -> str:
    """Write rows (lists of str/number/bool/None) as a valid single-sheet
    .xlsx. Strings are stored inline — no shared-string table needed."""
    row_xml = []
    for r, row in enumerate(rows, start=1):
        cells = "".join(_cell_xml(f"{_col_ref(c)}{r}", v)
                        for c, v in enumerate(row))
        row_xml.append(f'<row r="{r}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(row_xml) + "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><sheets>'
        f'<sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
        '</sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return path
