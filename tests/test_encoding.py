"""Encoding curation (operators/encoding.py): detection-decoding and
mojibake repair — WHATWG windows-1252 table, iterated repair, Spark
plumbing, and the WARC composition."""

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from etl_mark1_spark.operators.encoding import (
    _repair_once,
    _w1252_decode,
    decode_text,
    detect_and_decode,
    fix_mojibake,
    fix_mojibake_text,
)

GOOD = "café “quoted” — €"


def _corrupt(s: str) -> str:
    return _w1252_decode(s.encode("utf-8"))


# -- repair core ----------------------------------------------------------------

def test_single_and_double_mojibake_repaired():
    assert fix_mojibake_text(_corrupt(GOOD)) == (GOOD, 1)
    assert fix_mojibake_text(_corrupt(_corrupt(GOOD))) == (GOOD, 2)


def test_mixed_euro_and_hole_bytes_need_whatwg_table():
    # '”' misdecodes to 'â€\x9d': \x9d is a cp1252 HOLE; '€' needs cp1252.
    # Strict cp1252 and latin-1 each fail on one of them.
    moji = _corrupt("“q” €")
    assert "\x9d" in moji and "€" in moji
    assert fix_mojibake_text(moji) == ("“q” €", 1)


def test_sound_text_untouched():
    assert fix_mojibake_text("plain ascii, no risk") == (
        "plain ascii, no risk", 0)
    assert fix_mojibake_text("café au lait — naïve") == (
        "café au lait — naïve", 0)
    assert fix_mojibake_text(None) == ("", 0)
    assert fix_mojibake_text("") == ("", 0)


def test_max_passes_bounds_iteration():
    triple = _corrupt(_corrupt(_corrupt(GOOD)))
    fixed, n = fix_mojibake_text(triple, max_passes=2)
    assert n == 2 and fixed == _corrupt(GOOD)  # stopped one short


@settings(max_examples=200, deadline=None)
@given(st.text(
    alphabet="abc DEF.!?éàüñç€“”—…œŠž¡¿" + "é€",
    min_size=1, max_size=60))
def test_corrupt_then_repair_roundtrip(s):
    """Any sound text over a realistic alphabet survives one corruption
    round-trip exactly. 'Sound' = not itself mojibake-shaped (a string
    like 'Ã©' is indistinguishable from corrupted 'é' BY DESIGN)."""
    assume(not s.isascii())
    assume(_repair_once(s) is None)
    assert fix_mojibake_text(_corrupt(s)) == (s, 1)


# -- detection ------------------------------------------------------------------

def test_detect_utf8_bom_utf16_and_legacy():
    assert detect_and_decode("héllo".encode("utf-8")) == ("héllo", "utf-8")
    assert detect_and_decode(b"\xef\xbb\xbfx") == ("x", "utf-8-sig")
    assert detect_and_decode("é".encode("utf-16")) == ("é", "utf-16-le")
    assert detect_and_decode(
        GOOD.encode("cp1252")) == (GOOD, "windows-1252")
    # hole bytes decode as C1 controls, never error
    assert detect_and_decode(b"\x81\x8d!") == ("\x81\x8d!", "windows-1252")
    assert detect_and_decode(b"") == ("", "empty")
    assert detect_and_decode(None) == ("", "empty")


def test_detect_utf16_be_explicit():
    import codecs

    data = codecs.BOM_UTF16_BE + "bé".encode("utf-16-be")
    assert detect_and_decode(data) == ("bé", "utf-16-be")


# -- Spark plumbing -------------------------------------------------------------

def test_decode_text_dataframe(spark):
    rows = [(1, "plain".encode("utf-8")),
            (2, GOOD.encode("cp1252")),
            (3, "bom".encode("utf-8-sig")),
            (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, body binary")
    out = {r.doc_id: r for r in decode_text(df).collect()}
    assert out[1].text == "plain" and out[1].encoding == "utf-8"
    assert out[2].text == GOOD and out[2].encoding == "windows-1252"
    assert out[3].text == "bom" and out[3].encoding == "utf-8-sig"
    assert out[4].text == "" and out[4].encoding == "empty"


def test_fix_mojibake_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "sound text"), (2, _corrupt(GOOD)), (3, None)],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in fix_mojibake(df).collect()}
    assert out[1].fixed_text == "sound text"
    assert out[1].mojibake_passes == 0
    assert out[2].fixed_text == GOOD and out[2].mojibake_passes == 1
    assert out[3].fixed_text == "" and out[3].mojibake_passes == 0


def test_encoding_steps_registered_in_cold_interpreter():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "from etl_mark1_spark.operators.steps import STEP_OPERATORS; "
         "assert 'decode_text' in STEP_OPERATORS; "
         "assert 'fix_mojibake' in STEP_OPERATORS; print('ok')"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.stdout.strip() == "ok", out.stderr


def test_warc_body_decode_composition(spark, tmp_path):
    """The intended chain: WARC ingest -> byte decode with detection
    (crawl bodies are NOT all UTF-8; read_warc's convenience ``text`` is
    a lossy replace-decode, decode_text is the faithful path)."""
    from etl_mark1_spark.sources.warc import make_warc, read_warc

    (tmp_path / "s.warc").write_bytes(make_warc([
        {"url": "https://cp.example", "body": GOOD.encode("cp1252"),
         "content_type": "text/html; charset=windows-1252"},
        {"url": "https://u8.example", "body": "utf-8 é".encode("utf-8")},
    ]))
    recs = read_warc(spark, str(tmp_path)).select("url", "body")
    out = {r.url: r for r in decode_text(recs, id_col="url").collect()}
    assert out["https://cp.example"].text == GOOD
    assert out["https://cp.example"].encoding == "windows-1252"
    assert out["https://u8.example"].encoding == "utf-8"


def test_sniff_mime_magic_bytes(spark):
    from etl_mark1_spark.operators.encoding import sniff_mime

    tar = bytearray(512)
    tar[257:262] = b"ustar"
    cases = [
        (1, b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
        (2, b"\x89PNG\r\n\x1a\nrest", "image/png"),
        (3, b"GIF89a...", "image/gif"),
        (4, b"BMxxxx", "image/bmp"),
        (5, b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/wav"),
        (6, b"RIFF\x00\x00\x00\x00AVI LIST", "video/avi"),
        (7, b"%PDF-1.7", "application/pdf"),
        (8, b"\x1f\x8b\x08rest", "application/gzip"),
        (9, b"PK\x03\x04xl/", "application/zip"),
        (10, b"  <!DOCTYPE HTML><html>", "text/html"),
        (11, b"\xef\xbb\xbf<html lang=en>", "text/html"),
        (12, b'<?xml version="1.0"?>', "application/xml"),
        (13, b'{"k": 1}', "application/json"),
        (14, b"plain words here", "text/plain"),
        (15, b"\x00\x01\x02\x03", "application/octet-stream"),
        (16, None, None),
        (17, b"", None),
        (18, bytes(tar), "application/x-tar"),
    ]
    df = spark.createDataFrame([(i, b) for i, b, _ in cases],
                               "id bigint, body binary")
    got = {r.id: r.m for r in
           df.select("id", sniff_mime("body").alias("m")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)

    plan = df.select(sniff_mime("body").alias("m")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_sniff_mime_real_codec_payloads(spark):
    """Sniffing must agree with the vendored encoders' real output."""
    from etl_mark1_spark.operators.encoding import sniff_mime
    from etl_mark1_spark.operators.gif import make_gif
    from etl_mark1_spark.operators.multimodal import make_bmp, make_wav
    from etl_mark1_spark.operators.png import make_png

    import numpy as np

    pixels = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (1, 1, 1)]]
    payloads = [
        (1, make_bmp(pixels), "image/bmp"),
        (2, make_png(np.asarray(pixels, dtype=np.uint8)), "image/png"),
        (3, make_gif([[0, 1], [1, 0]], [(0, 0, 0), (255, 255, 255)]),
         "image/gif"),
        (4, make_wav([0, 100, -100, 0]), "audio/wav"),
    ]
    df = spark.createDataFrame([(i, b) for i, b, _ in payloads],
                               "id bigint, body binary")
    got = {r.id: r.m for r in
           df.select("id", sniff_mime("body").alias("m")).collect()}
    for i, _, want in payloads:
        assert got[i] == want, (i, got[i], want)


def test_normalize_unicode_nfc_and_nfkc(spark):
    from etl_mark1_spark.operators.encoding import normalize_unicode

    decomposed = "café"            # e + combining acute
    composed = "café"
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, "plain"), (4, None),
         (5, "ﬁle Ａwide")],   # fi ligature + fullwidth A
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in normalize_unicode(df).collect()}
    assert out[1].norm_text == composed and out[1].changed
    assert out[2].norm_text == composed and not out[2].changed
    assert out[3].norm_text == "plain" and not out[3].changed
    assert out[4].norm_text is None
    assert out[5].norm_text == "ﬁle Ａwide"  # NFC keeps compat

    nfkc = {r.doc_id: r.norm_text for r in
            normalize_unicode(df, form="NFKC").collect()}
    assert nfkc[5] == "file Awide"      # NFKC folds ligature + fullwidth

    # the dedup consequence: fingerprints agree only after normalization
    from etl_mark1_spark.functions.text import fingerprint_md5
    from pyspark.sql import functions as F

    pair = spark.createDataFrame([(1, decomposed), (2, composed)],
                                 "doc_id bigint, text string")
    raw = pair.select(fingerprint_md5("text").alias("f")).distinct().count()
    normed = (normalize_unicode(pair)
              .select(fingerprint_md5("norm_text").alias("f"))
              .distinct().count())
    assert raw == 2 and normed == 1


def test_normalize_unicode_step_registered():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "from etl_mark1_spark.operators.steps import STEP_OPERATORS; "
         "assert 'normalize_unicode' in STEP_OPERATORS; print('ok')"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.stdout.strip() == "ok", out.stderr


def test_fold_confusables_collides_spoofed_variants(spark):
    from pyspark.sql import functions as F

    from etl_mark1_spark.operators.encoding import fold_confusables

    rows = [
        (1, "pаypal login"),          # Cyrillic а
        (2, "paypal login"),
        (3, "Ρаssword"),          # Greek Rho + Cyrillic а
        (4, "plain ascii stays put"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["folded"] for r in df.select(
        "doc_id", fold_confusables(F.col("text")).alias("folded"))
        .collect()}
    assert got[1] == got[2] == "paypal login"
    assert got[3] == "Password"
    assert got[4] == "plain ascii stays put"


def test_fold_confusables_map_is_one_to_one():
    from etl_mark1_spark.operators.encoding import CONFUSABLES

    assert all(len(s) == 1 and len(d) == 1
               for s, d in CONFUSABLES.items())
    assert len(set(CONFUSABLES)) == len(CONFUSABLES)
