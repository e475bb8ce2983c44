"""Unicode script profiling entries (extension family;
functions/text.py:script_profile).

Pairing note: Spark compiles Java regex (``\\p{IsCyrillic}``), DuckDB
compiles RE2 (``\\p{Cyrillic}``) — both implement the Unicode Script
property, so per-script character counts computed independently by the
two engines over the same synthesized mixed-script strings must agree
exactly; the dominant-script column is additionally stated by the oracle
straight from the synthesis branch, independent of any counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.functions.text import script_profile

_CYR = "Привет мир это документ на русском языке"
_GRK = "Καλημέρα κόσμε αυτό είναι ελληνικό κείμενο"
_HAN = "这是一份中文文档内容很长可以用来测试"


@query("script_profile_docs", f"""
WITH mixed AS (
    SELECT doc_id,
           CASE CAST(doc_id % 5 AS INT)
               WHEN 1 THEN '{_CYR}'
               WHEN 2 THEN '{_GRK}'
               WHEN 3 THEN '{_HAN}'
               WHEN 4 THEN text || ' слово'
               ELSE text
           END AS s
    FROM documents
)
SELECT doc_id,
       CASE CAST(doc_id % 5 AS INT)
           WHEN 1 THEN 'cyrillic' WHEN 2 THEN 'greek' WHEN 3 THEN 'han'
           ELSE 'latin'
       END AS dominant_script,
       CAST(length(regexp_replace(s, '[^\\p{{Latin}}]', '', 'g')) AS INT)
           AS latin_chars,
       CAST(length(regexp_replace(s, '[^\\p{{Cyrillic}}]', '', 'g')) AS INT)
           AS cyrillic_chars,
       CAST(length(regexp_replace(s, '[^\\p{{Greek}}]', '', 'g')) AS INT)
           AS greek_chars,
       CAST(length(regexp_replace(s, '[^\\p{{Han}}]', '', 'g')) AS INT)
           AS han_chars
FROM mixed
""")
def script_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script detection over a synthesized mixed-script corpus: pure-Latin
    docs, pure-Cyrillic/Greek/Han docs, and Latin docs with a planted
    Cyrillic word (wrong-script contamination — Latin must stay dominant,
    the Cyrillic count must surface it). Dominant script is stated by the
    oracle from the branch; the per-script counts are computed by BOTH
    engines' independent Unicode Script tables and must match."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    mixed = (F.when(did % 5 == 1, F.lit(_CYR))
              .when(did % 5 == 2, F.lit(_GRK))
              .when(did % 5 == 3, F.lit(_HAN))
              .when(did % 5 == 4, F.concat(F.col("text"), F.lit(" слово")))
              .otherwise(F.col("text")))
    prof = script_profile(d.withColumn("text", mixed))
    return prof.select("doc_id", "dominant_script", "latin_chars",
                       "cyrillic_chars", "greek_chars", "han_chars")