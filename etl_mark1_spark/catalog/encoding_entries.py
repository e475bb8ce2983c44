"""Character-encoding curation entries (extension family;
operators/encoding.py).

Same planted-expected pattern as the HTML/WARC entries: byte payloads and
corrupted strings are synthesized deterministically per doc (JVM ``encode``
for UTF-8/UTF-16, ``unhex`` literals for windows-1252 bytes, precomputed
mojibake constants whose C1 control characters splice in via ``chr``), the
REAL detector/repairer runs on the Spark side, and the oracle states the
expected recovery from the components. The mojibake constants are the
WHATWG-windows-1252 misdecodings of ``'café “quoted” — €'`` (single and
double corruption) — the mixed euro-byte/hole-byte case that strict
cp1252 or latin-1 repair provably cannot round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.operators.encoding import decode_text, fix_mojibake

#: 'café “quoted” — €' through one / two rounds of UTF-8-bytes-misread-as-
#: WHATWG-windows-1252 (computed by operators/encoding.py:_w1252_decode;
#: \x9d is the hole byte that forces the WHATWG table).
_GOOD = "café “quoted” — €"
_MOJI1 = "cafÃ© â€œquotedâ€\x9d â€” â‚¬"
_MOJI2 = ("cafÃƒÂ© Ã¢â‚¬Å“quotedÃ¢â‚¬Â\x9d Ã¢â‚¬â€\x9d Ã¢â€šÂ¬")


@query("decode_bytes_docs", """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN text
           WHEN 1 THEN '¡utf16! ' || text
           ELSE '“€smart ' || text
       END AS text,
       CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'utf-8'
           WHEN 1 THEN 'utf-16-be'
           ELSE 'windows-1252'
       END AS encoding
FROM documents
""")
def decode_bytes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-stream decoding with detection over a mixed-encoding corpus:
    a third each of plain UTF-8, BOM'd UTF-16 (Java's UTF-16 writes the
    BE BOM), and windows-1252 (smart-quote 0x93 + euro 0x80 prefix bytes
    spliced via unhex make the stream invalid UTF-8). The oracle states
    the recovered text AND which decoder must have fired."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = (
        F.when(did % 3 == 0, F.encode(F.col("text"), "UTF-8"))
         .when(did % 3 == 1,
               F.encode(F.concat(F.lit("¡utf16! "), F.col("text")),
                        "UTF-16"))
         .otherwise(F.concat(
             F.unhex(F.lit("9380")),
             F.encode(F.concat(F.lit("smart "), F.col("text")), "UTF-8"))))
    return decode_text(d.select("doc_id", body.alias("body")))


@query("mojibake_repair_docs", """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN text
           ELSE 'café “quoted” — € ' || text
       END AS fixed_text,
       CAST(doc_id % 3 AS INT) AS mojibake_passes
FROM documents
""")
def mojibake_repair_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair over a corpus where a third of the docs are sound
    ASCII (must pass through untouched, 0 passes), a third carry the
    single-corrupted constant (1 pass), and a third the double-corrupted
    one (2 passes — the iterated repair). The repaired text and the pass
    count are both stated by the oracle."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    corrupted = (
        F.when(did % 3 == 0, F.col("text"))
         .when(did % 3 == 1,
               F.concat(F.lit(_MOJI1 + " "), F.col("text")))
         .otherwise(F.concat(F.lit(_MOJI2 + " "), F.col("text"))))
    return fix_mojibake(d.select("doc_id", corrupted.alias("text")))

@query("sniff_mime_docs", """
SELECT doc_id,
       CASE CAST(doc_id % 6 AS INT)
           WHEN 0 THEN 'image/jpeg'
           WHEN 1 THEN 'image/png'
           WHEN 2 THEN 'application/pdf'
           WHEN 3 THEN 'text/html'
           WHEN 4 THEN 'application/json'
           ELSE 'text/plain'
       END AS mime
FROM documents
""")
def sniff_mime_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte MIME sniffing over a mixed-payload corpus: a sixth
    each of JPEG/PNG/PDF-prefixed bytes, HTML (doctype after
    whitespace), JSON, and plain text — the classifier a crawl pipeline
    trusts over the server's Content-Type header. The oracle states the
    expected type from the synthesis branch."""
    from etl_mark1_spark.operators.encoding import sniff_mime

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    tb = F.encode(F.col("text"), "UTF-8")
    body = (
        F.when(did % 6 == 0, F.concat(F.unhex(F.lit("FFD8FFE0")), tb))
         .when(did % 6 == 1,
               F.concat(F.unhex(F.lit("89504E470D0A1A0A")), tb))
         .when(did % 6 == 2,
               F.concat(F.encode(F.lit("%PDF-1.7\n"), "UTF-8"), tb))
         .when(did % 6 == 3,
               F.encode(F.concat(F.lit("  <!doctype html><p>"),
                                 F.col("text")), "UTF-8"))
         .when(did % 6 == 4,
               F.encode(F.concat(F.lit('{"text": "x"}'), F.lit("")),
                        "UTF-8"))
         .otherwise(tb))
    return d.select("doc_id",
                    sniff_mime(body).alias("mime"))


@query("unicode_nfc_docs", """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN text
           ELSE 'café résumé — ' || text
       END AS norm_text,
       doc_id % 3 = 1 AS changed
FROM documents
""")
def unicode_nfc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC canonicalization over a mixed-composition corpus: a third of
    the docs carry the DECOMPOSED spelling of an accented lead (e +
    combining acute, 'changed' must flip), a third the composed spelling
    (already canonical — untouched), a third plain ASCII. The oracle
    builds the expected composed text with DuckDB's own nfc_normalize-
    independent literal arithmetic (composed literals + chr-spliced
    combining marks on the input side only)."""
    from etl_mark1_spark.operators.encoding import normalize_unicode

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    decomposed = "café résumé — "   # e + U+0301
    composed = "café résumé — "                        # precomposed
    text = (F.when(did % 3 == 1,
                   F.concat(F.lit(decomposed), F.col("text")))
             .when(did % 3 == 2,
                   F.concat(F.lit(composed), F.col("text")))
             .otherwise(F.col("text")))
    return normalize_unicode(d.select("doc_id", text.alias("text")))


@query("homoglyph_fold_docs", """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 7 = 0
                THEN length(text) - length(translate(text, 'aeo', ''))
                ELSE 0 END AS BIGINT) AS n_confusables,
           (doc_id % 7 = 0
            AND length(text) > length(translate(text, 'aeo', '')))
             AS key_changed
    FROM documents
""")
def homoglyph_fold_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homoglyph-folding audit (operators/encoding.py:fold_confusables,
    a TR39-confusables subset): every 7th document is SPOOFED by
    swapping its a/e/o for the pixel-identical Cyrillic letters (the
    exact-dedup/blocklist evasion trick), the fold runs over the
    spoofed text, and the entry reports how many confusable codepoints
    each doc carried and whether its dedup key changed under folding.
    The gate also proves the fold RECOVERS the original (folded ==
    original asserted Spark-side via the filter below — a row escaping
    recovery would change the count). Both the spoof and the fold are
    single ``translate`` calls — codegen, map-side, scan-speed; DuckDB's
    translate has identical semantics, keeping the oracle exact."""
    from etl_mark1_spark.operators.encoding import fold_confusables

    did = F.col("doc_id")
    spoof = F.when(did % 7 == 0,
                   F.translate(F.col("text"), "aeo", "\u0430\u0435\u043e")) \
        .otherwise(F.col("text"))
    base = (t(spark, sf_dir, "documents")
            .select("doc_id", F.col("text").alias("_t"),
                    spoof.alias("_sp"))
            .withColumn("_fold", fold_confusables(F.col("_sp"))))
    return (base
            .filter(F.col("_fold") == F.col("_t"))   # fold must round-trip
            .select("doc_id",
                    (F.length("_sp") - F.length(F.translate(
                        F.col("_sp"), "\u0430\u0435\u043e", "")))
                    .cast("bigint").alias("n_confusables"),
                    (F.col("_sp") != F.col("_fold")).alias("key_changed")))
