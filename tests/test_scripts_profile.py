"""Unicode script profiling (functions/text.py:script_profile)."""

from pyspark.sql import functions as F

from etl_mark1_spark.functions.text import (
    dominant_script,
    script_counts,
    script_profile,
)


def _dom(spark, s):
    return spark.range(1).select(
        dominant_script(F.lit(s)).alias("d")).first()["d"]


def test_dominant_script_basics(spark):
    assert _dom(spark, "plain english words") == "latin"
    assert _dom(spark, "Привет мир") == "cyrillic"
    assert _dom(spark, "Καλημέρα κόσμε") == "greek"
    assert _dom(spark, "مرحبا بالعالم") == "arabic"
    assert _dom(spark, "这是中文") == "han"
    assert _dom(spark, "ひらがな です") == "hiragana"
    assert _dom(spark, "カタカナ テスト") == "katakana"
    assert _dom(spark, "한국어 텍스트") == "hangul"
    assert _dom(spark, "यह हिंदी है") == "devanagari"


def test_dominant_script_majority_and_none(spark):
    assert _dom(spark, "mostly english text with один word") == "latin"
    assert _dom(spark, "42 + 17 = 59 !!!") == "none"
    assert _dom(spark, "") == "none"


def test_script_counts_ignore_digits_punct_space(spark):
    counts = script_counts(F.lit("ab, 12 я!"))
    row = spark.range(1).select(
        counts["latin"].alias("lat"), counts["cyrillic"].alias("cyr"),
        counts["han"].alias("han")).first()
    assert (row.lat, row.cyr, row.han) == (2, 1, 0)


def test_script_profile_frame_and_codegen(spark):
    df = spark.createDataFrame(
        [(1, "latin text"), (2, "Привет"), (3, None)],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in script_profile(df).collect()}
    assert out[1].dominant_script == "latin"
    assert out[1].latin_chars == 9 and out[1].scripted_chars == 9
    assert out[2].dominant_script == "cyrillic"
    assert out[3].dominant_script is None  # null text passes through
    plan = script_profile(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_mixed_script_contamination_surfaces(spark):
    """The curation use case: a 'monolingual' Latin corpus where one doc
    carries embedded Cyrillic — dominant stays latin, the count flags it."""
    df = spark.createDataFrame(
        [(1, "a long english sentence with слово inside")],
        "doc_id bigint, text string")
    r = script_profile(df).first()
    assert r.dominant_script == "latin"
    assert r.cyrillic_chars == 5
