"""PDF text-extraction source.

The reference accepts PDF uploads (backend/services/file_service.py:61),
pins pdfplumber (requirements.txt:45), and declares a ``pdf_extract``
pipeline node (backend/executor/engine.py:26-27) — but never implements the
extraction. Here it is implemented for real, in the shape that survives
scale: PDFs are scanned with Spark's ``binaryFile`` source (a normal
distributed FileScan — each executor reads its own files) and text is pulled
out per file inside ``mapInPandas``, so a corpus of millions of PDFs
parallelizes by file with zero driver materialization.

Extraction itself prefers ``pypdf`` when installed; otherwise a minimal
built-in parser handles the common case (Flate or plain content streams,
``Tj``/``TJ``/``'`` text operators, literal + hex strings). The built-in
path is exact for PDFs produced by :func:`make_pdf`, which is also the
fixture generator for tests and the catalog entry.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame, SparkSession

__all__ = ["make_pdf", "extract_pdf_pages", "read_pdf"]


# ---------------------------------------------------------------------------
# generation (fixtures / staging)
# ---------------------------------------------------------------------------

def _escape_literal(text: str) -> bytes:
    """Escape a string for a PDF literal ``(...)`` — backslash first."""
    out = (
        text.replace("\\", "\\\\")
        .replace("(", "\\(")
        .replace(")", "\\)")
        .replace("\r", "\\r")
        .replace("\n", "\\n")
    )
    return out.encode("latin-1")


def make_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Build a minimal valid PDF, one ``Tj`` text run per page.

    Text must be latin-1 encodable (the driver fixtures are ASCII). The
    output carries a correct xref table so third-party readers accept it.
    """
    objects: list[bytes] = []  # 1-indexed object bodies (dict+stream)

    n = len(pages)
    font_num = 3 + 2 * n
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")           # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())  # 2
    for i, text in enumerate(pages):
        content_num = 4 + 2 * i
        objects.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Contents {content_num} 0 R "
             f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>").encode())
        stream = (b"BT /F1 12 Tf 72 720 Td (" + _escape_literal(text)
                  + b") Tj ET")
        if compress:
            stream = zlib.compress(stream)
            head = (f"<< /Length {len(stream)} /Filter /FlateDecode >>"
                    .encode())
        else:
            head = f"<< /Length {len(stream)} >>".encode()
        objects.append(head + b"\nstream\n" + stream + b"\nendstream")
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # font

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(buf)


# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------

_OBJ = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_STREAM = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_CONTENTS = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_KIDS = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_KID_REF = re.compile(rb"(\d+)\s+\d+\s+R")


def _unescape_literal(raw: bytes) -> str:
    """Decode the body of a PDF literal string (escapes + octal)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        simple = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                  0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
        if e in simple:
            out.append(simple[e])
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j < i + 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif e in (0x0A, 0x0D):  # line continuation
            i += 1
            if e == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:
            out.append(e)
            i += 1
    return out.decode("latin-1")


def _decode_hex_string(raw: bytes) -> str:
    data = bytes.fromhex(re.sub(rb"\s", b"", raw).decode("ascii"))
    if data[:2] in (b"\xfe\xff", b"\xff\xfe"):
        return data.decode("utf-16")
    return data.decode("latin-1")


_NONSTR_TOKEN = re.compile(rb"\[|\]|Tj|TJ|'|\"")


def _tokenize(content: bytes):
    """Yield ('str', text) for literal/hex strings and ('op', b'[' | b']' |
    b'Tj' | b'TJ' | b\"'\" | b'\"') for the operators that matter to text
    extraction, in stream order. Balanced parens + escapes handled."""
    i, n = 0, len(content)
    plain_start = 0

    def flush(upto):
        for m in _NONSTR_TOKEN.finditer(content[plain_start:upto]):
            yield ("op", m.group(0))

    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            yield from flush(i)
            depth, j = 1, i + 1
            start = j
            while j < n and depth:
                cj = content[j]
                if cj == 0x5C:
                    j += 2
                    continue
                if cj == 0x28:
                    depth += 1
                elif cj == 0x29:
                    depth -= 1
                j += 1
            yield ("str", _unescape_literal(content[start:j - 1]))
            i = j
            plain_start = i
        elif c == 0x3C and i + 1 < n and content[i + 1] == 0x3C:  # << dict
            i += 2
        elif c == 0x3C:  # hex string
            yield from flush(i)
            j = content.find(b">", i + 1)
            if j == -1:
                break
            yield ("str", _decode_hex_string(content[i + 1:j]))
            i = j + 1
            plain_start = i
        else:
            i += 1
    yield from flush(n)


def _page_text(content: bytes) -> str:
    """Concatenate text runs shown by Tj / ' / \" and strings inside TJ
    arrays. TJ kerning numbers are ignored (spacing fidelity is a layout
    concern, not an extraction one)."""
    parts: list[str] = []
    last_str: str | None = None
    in_array: list[str] | None = None
    for kind, val in _tokenize(content):
        if kind == "str":
            if in_array is not None:
                in_array.append(val)
            else:
                last_str = val
        elif val == b"[":
            in_array = []
        elif val == b"]":
            last_str = None if in_array is None else "".join(in_array)
            in_array = None
        elif val == b"TJ":
            if last_str is not None:
                parts.append(last_str)
            last_str = None
        else:  # Tj, ', "
            if last_str is not None:
                parts.append(last_str)
            last_str = None
    return "".join(parts)


_LENGTH = re.compile(rb"/Length\s+(\d+)")
_STREAM_KW = re.compile(rb"stream\r?\n")


def _stream_bytes(data: bytes, obj_start: int) -> bytes | None:
    """Exact stream payload of the object starting at ``obj_start``.

    Prefers the dict's literal /Length — a regex hunt for ``endstream``
    truncates when the (binary) payload itself ends in CR or contains the
    keyword. Falls back to the delimiter scan when /Length is absent or
    indirect."""
    kw = _STREAM_KW.search(data, obj_start)
    if not kw:
        return None
    lm = _LENGTH.search(data, obj_start, kw.start())
    if lm:
        start = kw.end()
        n = int(lm.group(1))
        payload = data[start:start + n]
        after = data[start + n:start + n + 12]
        if re.match(rb"\r?\n?endstream", after):
            return payload
    sm = _STREAM.search(data, obj_start)
    return sm.group(1) if sm else None


def _extract_pages_minimal(data: bytes) -> list[str]:
    objs: dict[int, bytes] = {}
    starts: dict[int, int] = {}
    for m in _OBJ.finditer(data):
        num = int(m.group(1))
        objs[num] = m.group(2)
        starts[num] = m.start(2)
    # page order: /Kids of the page tree root(s), else object-number order
    page_nums: list[int] = []
    for body in objs.values():
        if b"/Type" in body and re.search(rb"/Type\s*/Pages\b", body):
            m = _KIDS.search(body)
            if m:
                page_nums.extend(
                    int(k.group(1)) for k in _KID_REF.finditer(m.group(1)))
    if not page_nums:
        page_nums = [num for num, body in sorted(objs.items())
                     if re.search(rb"/Type\s*/Page\b", body)
                     and not re.search(rb"/Type\s*/Pages\b", body)]
    pages: list[str] = []
    for num in page_nums:
        body = objs.get(num, b"")
        m = _CONTENTS.search(body)
        if not m:
            pages.append("")
            continue
        cnum = int(m.group(1))
        cbody = objs.get(cnum, b"")
        stream = (_stream_bytes(data, starts[cnum])
                  if cnum in starts else None)
        if stream is None:
            pages.append("")
            continue
        kw = _STREAM_KW.search(cbody)
        head = cbody[:kw.start()] if kw else cbody
        if re.search(rb"/Filter\s*/FlateDecode", head):
            stream = zlib.decompress(stream)
        pages.append(_page_text(stream))
    return pages


def extract_pdf_pages(data: bytes) -> list[str]:
    """Per-page text of a PDF byte blob. pypdf when available, else the
    built-in minimal parser."""
    try:
        import io

        from pypdf import PdfReader  # type: ignore[import-not-found]

        return [p.extract_text() or "" for p in PdfReader(io.BytesIO(data)).pages]
    except ImportError:
        return _extract_pages_minimal(data)


# ---------------------------------------------------------------------------
# the Spark source
# ---------------------------------------------------------------------------

def read_pdf(spark: SparkSession, path: str) -> DataFrame:
    """Distributed PDF extraction: ``binaryFile`` scan → per-file extraction
    in ``mapInPandas`` → one row per (path, page, text).

    ``binaryFile`` assigns whole files to tasks, so a directory of PDFs
    parallelizes by file across executors; nothing touches the driver. Pages
    are 0-based in source order.
    """
    import pandas as pd  # noqa: F401 — mapInPandas contract

    blobs = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for page_no, text in enumerate(extract_pdf_pages(bytes(content))):
                    rows.append((p, page_no, text))
            yield pd.DataFrame(rows, columns=["path", "page", "text"])

    return blobs.mapInPandas(extract, "path string, page int, text string")
