"""WARC (Web ARChive, ISO 28500) source — the container format web crawls
actually ship in (Common Crawl, Internet Archive, Heritrix output).

Extension family: the reference ingests csv/json/xlsx/xml uploads
(backend/services/file_service.py) and stops there; a crawl-derived
training corpus starts one step earlier, at ``*.warc.gz``. This module
implements that step in the shape that survives scale, mirroring the PDF
source (sources/pdf.py): WARC files are scanned with Spark's
``binaryFile`` source — a normal distributed FileScan, each executor
reading its own files — and records are walked per file inside
``mapInPandas``, so a crawl of millions of WARC files parallelizes by
file with zero driver materialization. Typical 1 GiB WARC segments fit
executor memory; per-record gzip members (the spec's recommended layout,
what Common Crawl ships) decompress with the stdlib's multi-member
``gzip.decompress``.

Parsing is strict and loud: a malformed record raises ``ValueError``
naming the byte offset — silent truncation of a crawl shard is how a
corpus quietly loses data. ``make_warc`` generates spec-shaped fixtures
(warcinfo + request/response records, per-record gzip members) for tests
and the catalog entry.
"""

from __future__ import annotations

import gzip
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["make_warc", "parse_warc", "read_warc"]

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# generation (fixtures / staging)
# ---------------------------------------------------------------------------

def _record(warc_type: str, headers: dict[str, str], payload: bytes) -> bytes:
    lines = [b"WARC/1.0"]
    lines.append(f"WARC-Type: {warc_type}".encode("ascii"))
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("ascii"))
    lines.append(f"Content-Length: {len(payload)}".encode("ascii"))
    return _CRLF.join(lines) + _SEP + payload + _SEP


def make_warc(pages: list[dict], gzip_per_record: bool = False,
              with_warcinfo: bool = True) -> bytes:
    """Spec-shaped WARC bytes from ``pages`` — dicts with ``url``, ``body``
    (str or bytes), and optional ``date`` (ISO-8601 Z), ``status`` (int),
    ``content_type``. Emits an optional leading warcinfo record then one
    response record per page; ``gzip_per_record=True`` produces the
    one-gzip-member-per-record layout the spec recommends for ``.warc.gz``
    (readers can seek to any record; the stdlib decompresses the
    concatenation transparently)."""
    records = []
    if with_warcinfo:
        info = b"software: etl-mark1-spark fixture generator\r\n"
        records.append(_record(
            "warcinfo",
            {"WARC-Date": "2026-01-01T00:00:00Z",
             "Content-Type": "application/warc-fields"},
            info))
    for page in pages:
        body = page["body"]
        if isinstance(body, str):
            body = body.encode("utf-8")
        status = int(page.get("status", 200))
        reason = {200: "OK", 301: "Moved Permanently",
                  404: "Not Found"}.get(status, "Status")
        ctype = page.get("content_type", "text/html; charset=utf-8")
        http = (f"HTTP/1.1 {status} {reason}\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                ).encode("ascii") + body
        records.append(_record(
            "response",
            {"WARC-Target-URI": page["url"],
             "WARC-Date": page.get("date", "2026-01-01T00:00:00Z"),
             "Content-Type": "application/http; msgtype=response"},
            http))
    if gzip_per_record:
        return b"".join(gzip.compress(r) for r in records)
    return b"".join(records)


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP message payload; payloads
    that do not start with ``HTTP/`` pass through as a bare body."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, _, body = payload.partition(_SEP)
    lines = head.split(_CRLF)
    parts = lines[0].split(b" ", 2)
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
    return status, ctype, body


def parse_warc(data: bytes) -> Iterator[dict]:
    """Walk WARC bytes (plain or gzip, including per-record multi-member
    ``.warc.gz``) and yield one dict per record: ``record_type``, ``url``,
    ``warc_date``, ``content_type`` (the record's), ``http_status``,
    ``http_content_type``, ``body`` (payload with any HTTP envelope
    removed). Length-based slicing — bodies may contain anything,
    including bytes that look like record separators."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data[pos:].startswith(b"WARC/"):
            raise ValueError(f"malformed WARC: no version line at "
                             f"byte {pos}")
        head_end = data.find(_SEP, pos)
        if head_end < 0:
            raise ValueError(f"malformed WARC: unterminated header block "
                             f"at byte {pos}")
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"malformed WARC: missing/bad Content-Length "
                             f"in record at byte {pos}") from None
        payload = data[head_end + 4:head_end + 4 + length]
        if len(payload) != length:
            raise ValueError(f"malformed WARC: truncated record at byte "
                             f"{pos} (want {length} payload bytes, have "
                             f"{len(payload)})")
        status, http_ctype, body = _parse_http(payload)
        yield {
            "record_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": http_ctype,
            "body": body,
        }
        pos = head_end + 4 + length


# ---------------------------------------------------------------------------
# distributed source
# ---------------------------------------------------------------------------

_REC_COLS = ["url", "warc_date", "record_type", "http_status",
             "http_content_type", "body", "text"]
_REC_SCHEMA = ("url string, warc_date string, record_type string, "
               "http_status int, http_content_type string, body binary, "
               "text string")


def parse_warc_records(df: DataFrame, content_col: str = "content",
                       record_types: tuple[str, ...] = ("response",),
                       carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """One row per kept WARC record found in each row's ``content_col``
    bytes, HTTP envelope parsed off: ``(*carry_cols, url, warc_date,
    record_type, http_status, http_content_type, body binary, text
    string)``. ``text`` is the body decoded as UTF-8 with replacement —
    feed it straight to ``operators/html.py``. Partition-preserving
    ``mapInPandas``; per-row cost linear in the WARC bytes."""
    kept = tuple(record_types)
    carry = [(c, df.schema[c].dataType.simpleString()) for c in carry_cols]
    schema = "".join(f"{c} {t}, " for c, t in carry) + _REC_SCHEMA

    def walk(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                carried = tuple(pdf[c].iloc[i] for c, _ in carry)
                for rec in parse_warc(bytes(pdf[content_col].iloc[i])):
                    if kept and rec["record_type"] not in kept:
                        continue
                    rows.append(carried + (
                        rec["url"], rec["warc_date"], rec["record_type"],
                        rec["http_status"], rec["http_content_type"],
                        rec["body"],
                        rec["body"].decode("utf-8", errors="replace"),
                    ))
            yield pd.DataFrame(
                rows, columns=[c for c, _ in carry] + _REC_COLS)

    cols = [c for c, _ in carry] + [content_col]
    return df.select(*cols).mapInPandas(walk, schema=schema)


def read_warc(spark: SparkSession, path: str,
              record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Distributed WARC ingest: ``binaryFile`` scan → per-file record walk
    (:func:`parse_warc_records`) → one row per kept record.

    ``binaryFile`` assigns whole files to tasks, so a crawl directory
    parallelizes by file across executors; nothing touches the driver."""
    blobs = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return parse_warc_records(blobs, record_types=record_types,
                              carry_cols=("path",))


_BINARYFILE_SCHEMA = ("path string, modificationTime timestamp, "
                      "length long, content binary")


def stream_warc(spark: SparkSession, path: str,
                record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Streaming WARC ingest: the crawler keeps dropping segment files
    into ``path``; each micro-batch picks up only the NEW segments
    (binaryFile file-source tracking via the query's checkpoint) and
    walks their records exactly like :func:`read_warc`. Compose with
    ``streaming/events.py:dedup_ingest_sink`` for crawl-to-corpus
    dedup-on-ingest, or any ``foreachBatch``/``writeStream`` sink.

    Record parsing is the same stateless ``mapInPandas`` as the batch
    path — no watermark or state needed; incremental-ness comes entirely
    from the file source."""
    blobs = (spark.readStream.format("binaryFile")
             .schema(_BINARYFILE_SCHEMA)
             .load(path)
             .select("path", "content"))
    return parse_warc_records(blobs, record_types=record_types,
                              carry_cols=("path",))
