"""Character-encoding curation: byte-stream decoding with detection, and
mojibake (double-encoding) repair.

Extension family — the reference assumes clean UTF-8 uploads
(backend/services/file_service.py); a real crawl does not cooperate:
bodies arrive in UTF-8, UTF-16 (with BOMs), legacy Windows-1252, and —
worst — UTF-8 that some upstream system already misdecoded as cp1252 and
re-encoded ("mojibake": ``Ã©`` where ``é`` was meant). Feeding either
straight into tokenization poisons a training corpus with phantom
vocabulary.

Both operators are deterministic pure functions over one value — no
shuffle, no state — applied via Arrow-batched ``mapInPandas``; a 100 TB
corpus decodes/repairs at scan speed, embarrassingly parallel. (The JVM
path is closed here: Spark 4's ``encode``/``decode`` expressions support
only the ISO/UTF charset list, not windows-1252, and repair needs a
strict-decode validity probe that ``decode``'s replacement semantics
cannot express.)

Detection heuristic (documented so tests and oracles can state expected
output): BOM wins (UTF-8-sig / UTF-16 LE/BE), else strict UTF-8 if the
bytes validate, else WHATWG windows-1252 — cp1252 with its five undefined
bytes (0x81 8D 8F 90 9D) passing through as C1 controls, the table every
browser implements. That decode is total, so legacy bytes never error.

Repair rule (ftfy's core trick, reduced to its deterministic kernel): a
string is mojibake-repairable iff it re-encodes under WHATWG windows-1252
AND those bytes strictly decode as UTF-8 AND the string contained a
non-ASCII character. The WHATWG table (not Python's strict cp1252) is
load-bearing: real mojibake mixes cp1252-only characters (``€`` from byte
0x80) with hole bytes (``\\x9d`` from the second byte of ``”``) in the
same string, and neither strict cp1252 nor latin-1 alone can re-encode
that. Applied iteratively (double-mojibake exists in the wild) up to
``max_passes``. ASCII text is untouchable by construction; legitimately-
accented text ("café") re-encodes to bytes that are NOT valid UTF-8, so
it is provably left alone.
"""

from __future__ import annotations

import codecs
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "detect_and_decode",
    "decode_text",
    "fix_mojibake_text",
    "fix_mojibake",
    "normalize_unicode",
    "sniff_mime",
    "CONFUSABLES",
    "fold_confusables",
]


# ---------------------------------------------------------------------------
# byte-stream decoding
# ---------------------------------------------------------------------------

_BOMS = [
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]

#: WHATWG windows-1252: cp1252 with the five undefined bytes decoding to
#: their C1 controls. Total over all 256 bytes.
_W1252_DECODE: list[str] = []
for _b in range(256):
    try:
        _W1252_DECODE.append(bytes([_b]).decode("cp1252"))
    except UnicodeDecodeError:
        _W1252_DECODE.append(chr(_b))
_W1252_ENCODE: dict[str, int] = {c: b for b, c in enumerate(_W1252_DECODE)}


def _w1252_decode(data: bytes) -> str:
    return "".join(_W1252_DECODE[b] for b in data)


def _w1252_encode(s: str) -> bytes | None:
    """WHATWG windows-1252 encode, or None if any char has no byte."""
    out = bytearray()
    for ch in s:
        b = _W1252_ENCODE.get(ch)
        if b is None:
            return None
        out.append(b)
    return bytes(out)


def detect_and_decode(data: bytes | None) -> tuple[str, str]:
    """(text, encoding_name) for a raw byte payload per the module's
    detection heuristic. ``encoding_name`` is what was USED, so corpus
    audits can group by it."""
    if data is None or len(data) == 0:
        return "", "empty"
    for bom, name in _BOMS:
        if data.startswith(bom):
            return data[len(bom):].decode(name, errors="replace"), name
    try:
        return data.decode("utf-8", errors="strict"), "utf-8"
    except UnicodeDecodeError:
        return _w1252_decode(data), "windows-1252"


def decode_text(df: DataFrame, bytes_col: str = "body",
                id_col: str = "doc_id") -> DataFrame:
    """Decode a binary column with detection:
    ``(id, text string, encoding string)``. Arrow-batched, map-side."""
    id_field = df.schema[id_col]
    schema = (f"{id_col} {id_field.dataType.simpleString()}, "
              "text string, encoding string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [detect_and_decode(
                bytes(b) if b is not None else None)
                for b in pdf[bytes_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "text": [d[0] for d in decoded],
                "encoding": [d[1] for d in decoded],
            })

    return df.select(id_col, bytes_col).mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# mojibake repair
# ---------------------------------------------------------------------------

def _repair_once(s: str) -> str | None:
    """One repair pass, or None if ``s`` is not mojibake-shaped."""
    if s.isascii():
        return None
    raw = _w1252_encode(s)
    if raw is None:
        return None
    try:
        fixed = raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None
    return fixed if fixed != s else None


def fix_mojibake_text(s: str | None, max_passes: int = 3) -> tuple[str, int]:
    """(fixed_text, passes_applied): iterated single-pass repair until the
    text stops changing or ``max_passes`` is hit (double-mojibake takes
    2). 0 passes means the input was already sound."""
    if s is None:
        return "", 0
    passes = 0
    while passes < max_passes:
        fixed = _repair_once(s)
        if fixed is None:
            break
        s = fixed
        passes += 1
    return s, passes


def fix_mojibake(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", max_passes: int = 3,
                 fixed_col: str = "fixed_text") -> DataFrame:
    """Repair a text column: ``(id, fixed_col string, mojibake_passes
    int)`` — ``mojibake_passes`` is 0 for already-sound rows, so the
    corpus-health rollup is one groupBy away. Arrow-batched, map-side."""
    id_field = df.schema[id_col]
    schema = (f"{id_col} {id_field.dataType.simpleString()}, "
              f"{fixed_col} string, mojibake_passes int")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [fix_mojibake_text(s, max_passes) for s in pdf[text_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                fixed_col: [o[0] for o in out],
                "mojibake_passes": pd.Series([o[1] for o in out],
                                             dtype="int32"),
            })

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def normalize_unicode(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", form: str = "NFC",
                      out_col: str = "norm_text") -> DataFrame:
    """Unicode normalization (NFC by default): composed ``é`` and
    decomposed ``e + U+0301`` are DIFFERENT strings to every hash, join,
    and dedup key while rendering identically — a corpus mixing sources
    must canonicalize before fingerprinting or exact dedup silently
    misses duplicates. Adds ``out_col`` (+ ``changed`` flag so the
    corpus-health rollup is one groupBy away). Arrow-batched map-side
    pandas transform (the JVM has no normalization expression); NFKC
    additionally folds compatibility forms (ligatures, fullwidth)."""
    import unicodedata

    id_field = df.schema[id_col]
    schema = (f"{id_col} {id_field.dataType.simpleString()}, "
              f"{out_col} string, changed boolean")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            norm = [unicodedata.normalize(form, s) if s is not None
                    else None for s in pdf[text_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                out_col: norm,
                "changed": [n != s for n, s in zip(norm, pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def sniff_mime(col) -> "Column":  # noqa: F821 — pyspark Column
    """Content-type from leading magic bytes — servers lie about
    Content-Type, payloads do not. Covers the formats this engine
    decodes (JPEG/PNG/GIF/BMP/RIFF-WAV/AVI, PDF, gzip, zip/xlsx, tar
    ustar, HTML with optional BOM/whitespace) plus 'text/plain' for
    printable-ASCII starts and 'application/octet-stream' otherwise.

    Pure column expressions over ``substring``/``hex`` of the first
    bytes — whole-stage codegen; classifying a 100 TB crawl's payloads
    is a single scan."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    head = F.hex(F.substring(c, 1, 8))
    # text probe: strip BOM + whitespace, lowercase the first chars
    text_start = F.lower(F.trim(F.regexp_replace(
        F.decode(F.substring(c, 1, 256), "UTF-8"), "^﻿", "")))
    riff_type = F.decode(F.substring(c, 9, 4), "UTF-8")
    printable = text_start.rlike(r"^[\x20-\x7e\s]+")
    return (
        F.when(c.isNull() | (F.octet_length(c) == 0), F.lit(None))
         .when(head.startswith("FFD8FF"), F.lit("image/jpeg"))
         .when(head.startswith("89504E470D0A1A0A"), F.lit("image/png"))
         .when(head.startswith("474946383"), F.lit("image/gif"))
         .when(head.startswith("424D"), F.lit("image/bmp"))
         .when(head.startswith("52494646") & (riff_type == "WAVE"),
               F.lit("audio/wav"))
         .when(head.startswith("52494646") & (riff_type == "AVI "),
               F.lit("video/avi"))
         .when(head.startswith("255044462D"), F.lit("application/pdf"))
         .when(head.startswith("1F8B"), F.lit("application/gzip"))
         .when(head.startswith("504B0304"), F.lit("application/zip"))
         .when(F.decode(F.substring(c, 258, 5), "UTF-8") == "ustar",
               F.lit("application/x-tar"))
         .when(text_start.startswith("<!doctype html")
               | text_start.startswith("<html"), F.lit("text/html"))
         .when(text_start.startswith("<?xml"), F.lit("application/xml"))
         .when(text_start.startswith("{")
               | text_start.startswith("["), F.lit("application/json"))
         .when(printable, F.lit("text/plain"))
         .otherwise(F.lit("application/octet-stream")))


#: Single-codepoint homoglyph -> ASCII skeleton map, a pragmatic subset
#: of Unicode TR39's confusables.txt (public data): the Cyrillic and
#: Greek letters that are pixel-identical to Latin in most fonts, plus
#: fullwidth Latin. Spam and SEO text uses these to evade exact/shingle
#: dedup and blocklists; folding before keying closes the hole. Kept
#: strictly 1:1 so the fold is a single ``translate`` — extend the map,
#: not the mechanism, for wider coverage.
CONFUSABLES = {
    # Cyrillic lowercase / uppercase
    "\u0430": "a", "\u0435": "e", "\u043e": "o", "\u0440": "p",
    "\u0441": "c", "\u0445": "x", "\u0443": "y", "\u0456": "i",
    "\u0455": "s", "\u0458": "j", "\u04bb": "h",
    "\u0410": "A", "\u0412": "B", "\u0415": "E", "\u041a": "K",
    "\u041c": "M", "\u041d": "H", "\u041e": "O", "\u0420": "P",
    "\u0421": "C", "\u0422": "T", "\u0425": "X",
    # Greek
    "\u03bf": "o", "\u03b1": "a", "\u03bd": "v",
    "\u0391": "A", "\u0392": "B", "\u0395": "E", "\u0396": "Z",
    "\u0397": "H", "\u0399": "I", "\u039a": "K", "\u039c": "M",
    "\u039d": "N", "\u039f": "O", "\u03a1": "P", "\u03a4": "T",
    "\u03a5": "Y", "\u03a7": "X",
}


def fold_confusables(col) -> "Column":  # noqa: F821 — pyspark Column
    """Fold known homoglyphs to their ASCII skeletons — run BEFORE any
    dedup/blocklist keying so visually-identical spam variants collide
    (\u0430 'а' CYRILLIC A in "p\u0430ypal" folds to 'paypal'). One
    JVM-side ``translate`` over a literal 1:1 map: whole-stage codegen,
    no Python, no shuffle — 100 TB folds at scan speed. DuckDB's
    ``translate`` has identical semantics, so folded keys stay
    oracle-exact."""
    from pyspark.sql import functions as F

    src = "".join(CONFUSABLES)
    dst = "".join(CONFUSABLES.values())
    return F.translate(col, src, dst)


#: Zero-width and other invisible codepoints used to EVADE dedup and
#: blocklists (a ZWSP inside a spam phrase defeats exact hashing and
#: literal matching while rendering identically): zero-width space /
#: non-joiner / joiner, word joiner, BOM/ZWNBSP, and the soft hyphen.
INVISIBLE_CLASS = "[\u200b\u200c\u200d\u2060\ufeff\u00ad]"


def strip_invisible(col) -> "Column":  # noqa: F821 — pyspark Column
    """Remove invisible codepoints (see :data:`INVISIBLE_CLASS`) — run
    alongside :func:`fold_confusables` before any dedup/decontam keying
    so evasion variants collide with their visible forms. One codegen'd
    ``regexp_replace``; scan speed at 100 TB, no shuffle."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, INVISIBLE_CLASS, "")


def invisible_count(col) -> "Column":  # noqa: F821 — pyspark Column
    """How many invisible codepoints the value carries (char count
    delta against :func:`strip_invisible` — counts codepoints because
    ``length`` is codepoint-based in both Spark and DuckDB)."""
    from pyspark.sql import functions as F

    return F.length(col) - F.length(strip_invisible(col))


def _register_steps() -> None:
    from etl_mark1_spark.operators.steps import register_operator

    register_operator(
        "decode_text",
        lambda df, p: decode_text(
            df, bytes_col=p.get("column", "body"),
            id_col=p.get("id_column", "doc_id")))
    register_operator(
        "fix_mojibake",
        lambda df, p: fix_mojibake(
            df, text_col=p.get("column", "text"),
            id_col=p.get("id_column", "doc_id"),
            max_passes=int(p.get("max_passes", 3))))
    register_operator(
        "normalize_unicode",
        lambda df, p: normalize_unicode(
            df, text_col=p.get("column", "text"),
            id_col=p.get("id_column", "doc_id"),
            form=p.get("form", "NFC")))


_register_steps()
