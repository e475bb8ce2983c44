"""Sentence segmentation entries (extension family;
operators/sentences.py).

RE2 (DuckDB) has no lookarounds, so the oracle cannot re-run the Java
boundary regex — instead each doc's text is synthesized by JOINING known
sentences (abbreviations, an initial, a decimal, and ``. ! ?`` enders all
planted inside them) and the oracle states those sentences back with
their positions. A splitter that breaks inside ``Dr.`` / ``No. 5`` /
``7.50`` or misses a ``! ?`` boundary changes the row set and breaks the
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.operators.sentences import split_sentences


@query("split_sentences_docs", """
WITH gen AS (
    SELECT doc_id, unnest(range(4)) AS i FROM documents
)
SELECT doc_id, CAST(i AS INT) AS sent_idx,
       CASE CAST(i AS INT)
           WHEN 0 THEN 'Document ' || doc_id
                       || ' begins with Dr. Adams at No. '
                       || (doc_id % 9) || '.'
           WHEN 1 THEN 'It costs ' || (doc_id % 7) || '.50 dollars!'
           WHEN 2 THEN 'The end came quickly?'
           ELSE 'Yes.'
       END AS sentence
FROM gen
""")
def split_sentences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation over planted four-sentence documents: the
    first sentence embeds two protected abbreviations, the second a
    decimal, the third and fourth end on ``?`` and a terminal period.
    The oracle regenerates the exact (doc_id, sent_idx, sentence) rows
    the splitter must recover from the joined text."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    text = F.concat(
        F.lit("Document "), did, F.lit(" begins with Dr. Adams at No. "),
        (did % 9), F.lit(". It costs "), (did % 7),
        F.lit(".50 dollars! The end came quickly? Yes."))
    return split_sentences(d.select("doc_id", text.alias("text")))


@query("sentence_decontam_docs", """
SELECT doc_id, CAST(1 AS INT) AS sent_idx,
       'Benchmark item ' || (doc_id % 5) || ' must never leak.'
           AS sentence
FROM documents
WHERE doc_id % 10 = 0
""")
def sentence_decontam_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-sentence decontamination: every 10th doc embeds one of
    five benchmark sentences (with case noise — the match is on the
    normalized form) between its intro and closing; the flagger must
    return exactly those docs, the planted sentence, and its position.
    The benchmark side broadcasts; the corpus never shuffles."""
    from etl_mark1_spark.operators.sentences import flag_benchmark_sentences

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = F.when(
        did % 10 == 0,
        F.concat(F.lit("Benchmark item "), did % 5,
                 F.lit(" must never leak. "))).otherwise(F.lit(""))
    text = F.concat(
        F.lit("Intro for document "), did, F.lit(". "), planted,
        F.lit("Closing remark number "), (did % 7), F.lit("."))
    bench = spark.range(5).select(
        F.concat(F.lit("BENCHMARK ITEM "), F.col("id"),
                 F.lit(" MUST NEVER LEAK.")).alias("sentence"))
    flagged = flag_benchmark_sentences(
        d.select("doc_id", text.alias("text")), bench)
    return flagged.select("doc_id", "sent_idx", "sentence")