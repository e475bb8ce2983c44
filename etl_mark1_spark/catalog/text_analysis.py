"""Text analysis (extension; SURVEY.md SS7.2 step 8).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Text analysis (extension; SURVEY.md §7.2 step 8)
# ---------------------------------------------------------------------------

@query("text_stats", r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
               AS n_tokens,
           CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS BIGINT)
               AS n_punct
    FROM documents
""")
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import punct_count, whitespace_token_count

    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.length("text").cast("long").alias("n_chars_calc"),
                    whitespace_token_count("text").cast("long").alias("n_tokens"),
                    punct_count("text").cast("long").alias("n_punct")))


@query("text_tokens_bpe", r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(
               text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
               AS n_bpe_tokens
    FROM documents
""")
def text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import bpe_ish_token_count

    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens")))


def _stopword_sql(lang: str) -> str:
    from etl_mark1_spark.functions.text import STOPWORDS

    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (f"len(list_filter(regexp_extract_all(lower(text), '[a-z]+'), "
            f"x -> x IN ({words})))")


@query("text_lang_id", f"""
    WITH scored AS (
        SELECT doc_id,
               {_stopword_sql('en')} AS en, {_stopword_sql('de')} AS de,
               {_stopword_sql('fr')} AS fr, {_stopword_sql('es')} AS es
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
                WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                WHEN de >= fr AND de >= es THEN 'de'
                WHEN fr >= es THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM scored
""")
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import lang_id

    return (t(spark, sf_dir, "documents")
            .select("doc_id", lang_id("text").alias("lang_pred")))


@query("text_quality", f"""
    WITH stats AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END
                    AS DOUBLE) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
                   AS n_punct,
               CAST({_stopword_sql('en')} + {_stopword_sql('de')}
                    + {_stopword_sql('fr')} + {_stopword_sql('es')} AS DOUBLE)
                   AS n_stop
        FROM documents
    )
    SELECT doc_id,
           round(100.0 * (0.4 * least(n_chars / 500.0, 1.0)
                 + 0.3 * (1.0 - least(5.0 * n_punct / greatest(n_chars, 1.0), 1.0))
                 + 0.3 * least(4.0 * n_stop / greatest(n_tokens, 1.0), 1.0)), 2)
               AS quality
    FROM stats
""")
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import text_quality_score

    return (t(spark, sf_dir, "documents")
            .select("doc_id", text_quality_score("text").alias("quality")))


@query("doc_fingerprint", r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
    FROM documents
""")
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import fingerprint_md5

    return (t(spark, sf_dir, "documents")
            .select("doc_id", fingerprint_md5("text").alias("fingerprint")))




@query("bpe_roundtrip_docs", r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
           AS restored
FROM documents
""")
def bpe_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation invertibility, corpus-wide: segment every document
    under a fixed merge list (invertibility must hold under ANY merges,
    so none need training here), then bpe_decode the tokens back. The
    restored text must equal the segmenter's normalized view — stated by
    the oracle straight from the raw text. A merge that glues across a
    word boundary, a decode that mishandles the end-of-word marker, or a
    tokenizer/normalizer drift all break the hash."""
    from etl_mark1_spark.operators.bpe import bpe_decode, bpe_segment

    merges = [("t", "h"), ("th", "e"), ("the", "</w>"), ("a", "</w>"),
              ("e", "</w>"), ("s", "</w>"), ("r", "o"), ("w", "i"),
              ("ro", "w</w>"), ("o", "r"), ("d", "e")]
    d = t(spark, sf_dir, "documents")
    toks = bpe_segment(d, merges)
    return bpe_decode(toks).select(
        "doc_id", F.col("decoded_text").alias("restored"))


#: Hand-specified quality model for the oracle entry: training
#: coefficients vary run to run (solver), but INFERENCE must be
#: engine-exact under any fixed model — which is what the driver checks.
_LR_MODEL = {"intercept": -1.5,
             "coefficients": {"log_chars": 0.35, "punct_ratio": -6.0,
                              "stop_ratio": 4.0, "mean_word_len": -0.12}}


@query("quality_lr_score_docs", f"""
WITH stats AS (
    SELECT doc_id,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END
                AS DOUBLE) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
               AS n_punct,
           CAST({_stopword_sql('en')} + {_stopword_sql('de')}
                + {_stopword_sql('fr')} + {_stopword_sql('es')} AS DOUBLE)
               AS n_stop
    FROM documents
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(
           -1.5 + 0.35 * ln(n_chars + 1.0)
                - 6.0 * (n_punct / greatest(n_chars, 1.0))
                + 4.0 * (n_stop / greatest(n_tokens, 1.0))
                - 0.12 * (n_chars / greatest(n_tokens, 1.0))))), 6)
           AS lr_quality
FROM stats
""")
def quality_lr_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality scoring (operators/quality_model.py) as
    pure codegen: the fixed model's sigmoid-of-dot-product over the
    portable feature battery, replayed feature by feature in SQL. The
    TRAINED path is pinned by tests (MLlib-vs-expression parity and
    separation on planted labels); the driver pins that compiled
    inference is engine-exact."""
    from etl_mark1_spark.operators.quality_model import quality_score_expr

    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        quality_score_expr(_LR_MODEL, "text").alias("lr_quality"))
