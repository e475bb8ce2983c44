"""Line-level structural dedup entries (extension family;
operators/lines.py).

Planted-expected pattern: multi-line documents are synthesized around
``documents.text`` with known repeated / corpus-common / blank / unique
lines, the real operators run Spark-side, and the oracle states the
surviving text verbatim. The corpus-common threshold is derived from the
corpus size (``count/10``) so the entries hold at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.operators.lines import (
    dedup_lines_within_doc,
    remove_common_lines,
)


@query("dedup_lines_docs", """
SELECT doc_id,
       text || chr(10) || substr(text, 1, 40) AS clean_text
FROM documents
""")
def dedup_lines_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line removal: each doc becomes three
    lines — its text, a unique prefix line, its text AGAIN — and only
    the first two may survive (order preserved). Pure column expression
    end to end."""
    d = t(spark, sf_dir, "documents")
    three = F.concat(F.col("text"), F.lit("\n"),
                     F.substring("text", 1, 40), F.lit("\n"),
                     F.col("text"))
    out = dedup_lines_within_doc(d.withColumn("text", three))
    return out.select("doc_id", "clean_text")


@query("remove_common_lines_docs", """
SELECT doc_id,
       'intro ' || doc_id || chr(10) || chr(10) || text AS clean_text,
       CAST(3 AS INT) AS lines_kept,
       CAST(2 AS INT) AS lines_removed
FROM documents
""")
def remove_common_lines_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus boilerplate line removal: every synthesized doc is
    [unique intro] [corpus-wide subscribe prompt] [1-of-5 promo footer]
    [blank] [unique body]. At threshold corpus/10 the prompt (df = n) and
    the promos (df = n/5) must vanish from every document while the blank
    line — paragraph structure, exempt by contract — and both unique
    lines survive."""
    d = t(spark, sf_dir, "documents")
    n = d.count()  # one scalar job; sets the sf-proportional threshold
    page = F.concat(
        F.lit("intro "), F.col("doc_id"),
        F.lit("\nSUBSCRIBE NOW to our newsletter\npromo code "),
        (F.col("doc_id") % 5), F.lit("\n\n"), F.col("text"))
    return remove_common_lines(
        d.withColumn("text", page), min_docs=max(2, n // 10))


@query("corpus_datacard", """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 4) AS avg_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(median(n_chars) AS DOUBLE) AS median_chars,
       CAST(count(DISTINCT md5(lower(trim(regexp_replace(
           text, '\\s+', ' ', 'g'))))) AS BIGINT) AS n_unique_texts
FROM documents
GROUP BY lang, source
""")
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card rollup per (lang, source) stratum: volume, length
    distribution (exact median), and exact-dedup uniqueness via the
    engine-portable md5 fingerprint (functions/text.py:fingerprint_md5)
    — the table a dataset release publishes. One shuffle, map-side
    partial aggregation; the median is an exact percentile aggregate
    computed per group, no global sort."""
    from etl_mark1_spark.functions.text import fingerprint_md5

    d = t(spark, sf_dir, "documents")
    return (d.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                 F.min("n_chars").cast("bigint").alias("min_chars"),
                 F.max("n_chars").cast("bigint").alias("max_chars"),
                 F.expr("percentile(n_chars, 0.5)").cast("double")
                  .alias("median_chars"),
                 F.count_distinct(fingerprint_md5(F.col("text")))
                  .cast("bigint").alias("n_unique_texts")))