"""S4 Excel: stdlib codec round-trip and reader dispatch (reference accepts
xlsx/xls uploads, backend/services/file_service.py:61; this container has no
openpyxl, so the built-in zip+XML codec carries the format)."""

import zipfile

from etl_mark1_spark.sources.excel import read_xlsx_rows, write_xlsx
from etl_mark1_spark.sources.readers import detect_format, read_file

ROWS = [
    ["id", "name", "score", "active"],
    [1, "alpha", 3.5, True],
    [2, "beta (b)", 4.25, False],
    [3, None, 5.0, True],
]


def test_codec_roundtrip(tmp_path):
    path = str(tmp_path / "t.xlsx")
    write_xlsx(ROWS, path)
    assert zipfile.is_zipfile(path)  # real xlsx container
    assert read_xlsx_rows(path) == ROWS


def test_read_file_dispatch(spark, tmp_path):
    path = str(tmp_path / "data.xlsx")
    write_xlsx(ROWS, path)
    assert detect_format(path) == "xlsx"
    out = read_file(spark, path)
    assert set(out.columns) == {"id", "name", "score", "active"}
    got = {r.id: (r.name, r.score, r.active) for r in out.collect()}
    assert got == {1: ("alpha", 3.5, True), 2: ("beta (b)", 4.25, False),
                   3: (None, 5.0, True)}
    # numerics land typed, not as strings
    assert dict(out.dtypes)["score"] == "double"


def test_shared_strings_variant(tmp_path):
    """Files written by real tools use a sharedStrings table instead of
    inline strings — hand-build one and read it back."""
    path = str(tmp_path / "shared.xlsx")
    write_xlsx([["k", "v"], [1, "x"]], path)
    # rewrite the sheet to use the shared-string form
    with zipfile.ZipFile(path) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    sheet = (
        b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        b'<worksheet xmlns="http://schemas.openxmlformats.org/'
        b'spreadsheetml/2006/main"><sheetData>'
        b'<row r="1"><c r="A1" t="s"><v>0</v></c>'
        b'<c r="B1" t="s"><v>1</v></c></row>'
        b'<row r="2"><c r="A2"><v>1</v></c>'
        b'<c r="B2" t="s"><v>2</v></c></row>'
        b'</sheetData></worksheet>'
    )
    sst = (
        b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        b'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        b'2006/main" count="3" uniqueCount="3">'
        b'<si><t>k</t></si><si><t>v</t></si><si><t>hello world</t></si></sst>'
    )
    parts["xl/worksheets/sheet1.xml"] = sheet
    parts["xl/sharedStrings.xml"] = sst
    with zipfile.ZipFile(path, "w") as zf:
        for name, data in parts.items():
            zf.writestr(name, data)
    assert read_xlsx_rows(path) == [["k", "v"], [1, "hello world"]]


def test_sheet_selection(tmp_path):
    path = str(tmp_path / "named.xlsx")
    write_xlsx([["a"], [1]], path, sheet_name="metrics")
    assert read_xlsx_rows(path, sheet="metrics") == [["a"], [1]]
