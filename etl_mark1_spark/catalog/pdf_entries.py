"""PDF extraction (reference: file_service.py:61, engine.py:26-27).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# PDF extraction (reference: accepted upload format file_service.py:61 and
# declared pdf_extract node executor/engine.py:26-27, never implemented)
# ---------------------------------------------------------------------------

def _stage_pdf_fixture(spark: SparkSession, sf_dir: str, n_docs: int = 100):
    """Materialize a 100-page PDF built from the first ``n_docs`` documents,
    cached by (realpath, mtime) like the streaming staging — repeat
    invocations reuse the file. Returns (pdf_path, [(page, doc_id), ...]).
    The bounded collect is fixture generation, not a data path."""
    import hashlib
    import os
    import tempfile

    from etl_mark1_spark.sources.pdf import make_pdf

    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.stat(src).st_mtime_ns}:{n_docs}".encode()
    ).hexdigest()[:16]
    pdf_path = os.path.join(tempfile.gettempdir(), f"etl_mark1_pdf_{key}.pdf")
    rows = (t(spark, sf_dir, "documents").select("doc_id", "text")
            .orderBy("doc_id").limit(n_docs).collect())
    if not os.path.exists(pdf_path):
        tmp = pdf_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(make_pdf([r.text for r in rows]))
        os.replace(tmp, pdf_path)  # atomic vs concurrent stagers
    return pdf_path, [(i, r.doc_id) for i, r in enumerate(rows)]


@query("xml_scan", """
    SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 100
""")
def xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real XML ingestion (S5): documents staged to an XML file (cached by
    source mtime), parsed back through Spark 4's native XML source into
    typed columns, oracle-checked against the source table. The reference
    reads XML as CSV (duckdb_engine.py:260-261) — that behavior survives
    only behind read_file(compat='reference')."""
    import hashlib
    import os
    import tempfile
    from xml.sax.saxutils import escape

    from etl_mark1_spark.sources.readers import read_file

    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.stat(src).st_mtime_ns}".encode()).hexdigest()[:16]
    xml_path = os.path.join(tempfile.gettempdir(), f"etl_mark1_xml_{key}.xml")
    if not os.path.exists(xml_path):
        rows = (t(spark, sf_dir, "documents").select("doc_id", "text")
                .orderBy("doc_id").limit(100).collect())
        tmp = xml_path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("<docs>")
            for r in rows:
                fh.write(f"<doc><doc_id>{r.doc_id}</doc_id>"
                         f"<text>{escape(r.text)}</text></doc>")
            fh.write("</docs>")
        os.replace(tmp, xml_path)
    return (read_file(spark, xml_path, rowTag="doc")
            .select("doc_id", "text"))


@query("pdf_extract", """
    SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 100
""")
def pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction end-to-end: documents staged into a real
    100-page PDF, read back distributed (binaryFile scan + mapInPandas
    extraction, sources/pdf.py), page numbers joined back to doc_ids.
    Extraction is exact for the fixture, so this is oracle-checked against
    the source table — stronger than a rows-only count."""
    from etl_mark1_spark.sources.pdf import read_pdf

    pdf_path, page_map = _stage_pdf_fixture(spark, sf_dir)
    pages = read_pdf(spark, pdf_path)
    ids = spark.createDataFrame(page_map, "page int, doc_id long")
    return (pages.join(F.broadcast(ids), "page")
            .select("doc_id", "text"))


