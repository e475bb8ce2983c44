"""Line-level structural dedup (operators/lines.py)."""

from pyspark.sql import functions as F

from etl_mark1_spark.operators.lines import (
    dedup_lines_within_doc,
    remove_common_lines,
)


def test_within_doc_keeps_first_occurrence_in_order(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb\na"), (2, "only"), (3, ""), (4, None)],
        "doc_id bigint, text string")
    out = {r.doc_id: r.clean_text
           for r in dedup_lines_within_doc(df).collect()}
    assert out[1] == "a\nb\nc"
    assert out[2] == "only"
    assert out[3] == ""
    assert out[4] is None  # null text passes through


def test_within_doc_blank_lines_collapse_to_first(spark):
    df = spark.createDataFrame([(1, "x\n\ny\n\nz")],
                               "doc_id bigint, text string")
    assert dedup_lines_within_doc(df).first().clean_text == "x\n\ny\nz"


def test_within_doc_custom_separator_is_literal(spark):
    df = spark.createDataFrame([(1, "a|b|a|c")],
                               "doc_id bigint, text string")
    out = dedup_lines_within_doc(df, sep="|").first().clean_text
    assert out == "a|b|c"


def test_within_doc_is_codegen_no_python(spark):
    df = spark.createDataFrame([(1, "a\na")], "doc_id bigint, text string")
    plan = dedup_lines_within_doc(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_remove_common_lines_thresholds_and_counts(spark):
    docs = spark.createDataFrame(
        [(i, f"unique {i}\nCOMMON AD\n\nbody {i}") for i in range(12)]
        + [(50, "COMMON AD"), (51, None)],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in remove_common_lines(docs, 10).collect()}
    assert out[0].clean_text == "unique 0\n\nbody 0"
    assert out[0].lines_kept == 3 and out[0].lines_removed == 1
    # a document that was ALL boilerplate survives as empty
    assert out[50].clean_text == "" and out[50].lines_removed == 1
    # null-text documents still surface
    assert out[51].clean_text == "" and out[51].lines_kept == 0
    assert len(out) == 14


def test_remove_common_lines_trim_normalizes_but_blank_exempt(spark):
    # '  AD  ' and 'AD' count as the same line; blank lines never removed
    docs = spark.createDataFrame(
        [(i, f"  AD  \n\nkeep {i}") if i % 2 else (i, f"AD\n\nkeep {i}")
         for i in range(10)],
        "doc_id bigint, text string")
    out = remove_common_lines(docs, 10).orderBy("doc_id").first()
    assert out.clean_text == "\nkeep 0"
    assert out.lines_removed == 1


def test_remove_common_lines_broadcasts_the_common_side(spark):
    docs = spark.createDataFrame(
        [(i, f"u{i}\nAD") for i in range(10)], "doc_id bigint, text string")
    plan = remove_common_lines(docs, 5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_line_steps_registered_in_cold_interpreter():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "from etl_mark1_spark.operators.steps import STEP_OPERATORS; "
         "assert 'dedup_lines' in STEP_OPERATORS; "
         "assert 'remove_common_lines' in STEP_OPERATORS; print('ok')"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.stdout.strip() == "ok", out.stderr
