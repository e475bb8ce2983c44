"""PDF source: generator/extractor round-trip, distributed read shape, and
the catalog entry's oracle parity (reference: accepted PDF upload format
backend/services/file_service.py:61; declared-but-unimplemented pdf_extract
node backend/executor/engine.py:26-27)."""

import os

import pytest

from etl_mark1_spark.sources.pdf import (
    _extract_pages_minimal,
    _page_text,
    extract_pdf_pages,
    make_pdf,
    read_pdf,
)
from etl_mark1_spark.sources.readers import detect_format, read_file

PAGES = [
    "plain ascii page",
    "specials: (parens) \\backslash\\ and a\nnewline",
    "",  # empty page must stay a page
    "final page",
]


def test_roundtrip_compressed_and_plain():
    assert extract_pdf_pages(make_pdf(PAGES)) == PAGES
    assert extract_pdf_pages(make_pdf(PAGES, compress=False)) == PAGES


def test_minimal_parser_handles_tj_arrays_and_hex():
    content = (b"BT /F1 12 Tf [(ab) -120 (cd)] TJ (ef) Tj "
               b"<41424344> Tj <FEFF00E9> Tj ET")
    assert _page_text(content) == "abcdefABCD\xe9"
    # strings NOT followed by a show operator (e.g. Tf args) are ignored
    assert _page_text(b"(noise) Tz (shown) Tj") == "shown"


def test_stream_payload_ending_in_cr():
    """A stream payload whose final byte is 0x0D must survive extraction: a
    regex delimiter scan eats that byte as the optional \\r before
    ``endstream`` (the failure the hypothesis fuzz found on Flate payloads);
    streams are now sliced by the dict's literal /Length instead. Built
    byte-exact so the test never has to fish for a CR-tailed compression."""
    content = b"BT /F1 12 Tf 72 720 Td (cr tail) Tj ET\r"
    assert content.endswith(b"\r")
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n" + f"<< /Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert _extract_pages_minimal(pdf) == ["cr tail"]


def test_extractor_survives_xref_of_other_tools():
    # parser keys off object bodies, not the xref table — truncate it
    data = make_pdf(["page one", "page two"])
    assert _extract_pages_minimal(data[:data.rfind(b"xref")]) == \
        ["page one", "page two"]


def test_detect_and_dispatch(spark, tmp_path):
    path = str(tmp_path / "doc.pdf")
    with open(path, "wb") as fh:
        fh.write(make_pdf(PAGES))
    assert detect_format(path) == "pdf"
    out = read_file(spark, path)
    rows = sorted(out.collect(), key=lambda r: r.page)
    assert [r.text for r in rows] == PAGES
    assert rows[0].path.endswith("doc.pdf")


def test_read_pdf_directory_parallelizes_by_file(spark, tmp_path):
    """A directory of PDFs is one binaryFile scan — per-file rows come back
    tagged with their source path (the 100 TB shape: files spread across
    executors, nothing through the driver)."""
    for i in range(3):
        with open(tmp_path / f"d{i}.pdf", "wb") as fh:
            fh.write(make_pdf([f"doc {i} page {p}" for p in range(2)]))
    out = read_pdf(spark, str(tmp_path)).collect()
    assert len(out) == 6
    by_file = {os.path.basename(r.path) for r in out}
    assert by_file == {"d0.pdf", "d1.pdf", "d2.pdf"}
    # plan stays a native FileScan over binaryFile (no driver collect)
    plan = read_pdf(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
    assert "FileScan binaryFile" in plan


def test_catalog_entry_matches_documents(spark, sf_dir):
    from etl_mark1_spark.catalog import QUERIES, t

    out = QUERIES["pdf_extract"](spark, sf_dir)
    got = {(r.doc_id, r.text) for r in out.collect()}
    want = {(r.doc_id, r.text)
            for r in t(spark, sf_dir, "documents")
            .select("doc_id", "text").orderBy("doc_id").limit(100).collect()}
    assert got == want


def test_pypdf_preferred_when_available():
    """extract_pdf_pages prefers pypdf; absent here, the built-in parser
    must carry the format end-to-end (asserted above). Gate check only."""
    import importlib.util

    if importlib.util.find_spec("pypdf") is None:
        pytest.skip("pypdf not installed — built-in parser path exercised")
