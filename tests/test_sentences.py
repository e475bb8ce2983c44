"""Sentence segmentation (operators/sentences.py)."""

from etl_mark1_spark.operators.sentences import split_sentences


def _sents(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = split_sentences(df).orderBy("sent_idx").collect()
    assert [r.sent_idx for r in rows] == list(range(len(rows)))
    return [r.sentence for r in rows]


def test_basic_boundaries(spark):
    assert _sents(spark, "One here. Two there! Three? Four.") == [
        "One here.", "Two there!", "Three?", "Four."]


def test_abbreviations_and_initials_protected(spark):
    got = _sents(spark, "Dr. Smith met Mr. Jones. They argued, e.g. "
                        "loudly. J. Doe watched. Prof. X left at No. 5. "
                        "Done.")
    assert got == [
        "Dr. Smith met Mr. Jones.",
        "They argued, e.g. loudly.",
        "J. Doe watched.",
        "Prof. X left at No. 5.",
        "Done.",
    ]


def test_abbreviation_guards_are_token_anchored(spark):
    # Regression (round-8 ADVICE): the unanchored "al." guard (from
    # "et al.") used to suppress the boundary after ANY "-al."-suffixed
    # word, merging real sentences. Same class for "-No."/"Fig."-suffixed
    # words and all-caps words ending in a capital before the period.
    assert _sents(spark, "Normal. Next one.") == ["Normal.", "Next one."]
    assert _sents(spark, "It was surreal. Then it ended.") == [
        "It was surreal.", "Then it ended."]
    assert _sents(spark, "She joined NASA. Liftoff followed.") == [
        "She joined NASA.", "Liftoff followed."]
    # ...while the standalone tokens still protect:
    assert _sents(spark, "See Smith et al. For details read on.") == [
        "See Smith et al. For details read on."]
    assert _sents(spark, "J. Doe arrived. Done.") == [
        "J. Doe arrived.", "Done."]


def test_decimals_never_split(spark):
    assert _sents(spark, "It costs 3.14 dollars. Cheap.") == [
        "It costs 3.14 dollars.", "Cheap."]


def test_lowercase_continuation_not_a_boundary(spark):
    assert _sents(spark, "ends here. not really. Really.") == [
        "ends here. not really.", "Really."]


def test_multiple_terminators_and_whitespace(spark):
    assert _sents(spark, "What?!  Are you sure...\n\nYes.") == [
        "What?!", "Are you sure...", "Yes."]


def test_empty_and_null_yield_no_rows(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "One. Two.")],
                               "doc_id bigint, text string")
    rows = split_sentences(df).collect()
    assert {r.doc_id for r in rows} == {3}


def test_splitter_is_codegen_no_python(spark):
    df = spark.createDataFrame([(1, "A. B.")], "doc_id bigint, text string")
    plan = split_sentences(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_sentence_step_registered_in_cold_interpreter():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "from etl_mark1_spark.operators.steps import STEP_OPERATORS; "
         "assert 'split_sentences' in STEP_OPERATORS; print('ok')"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.stdout.strip() == "ok", out.stderr


def test_flag_benchmark_sentences_broadcast_and_normalized(spark):
    from etl_mark1_spark.operators.sentences import flag_benchmark_sentences

    docs = spark.createDataFrame(
        [(1, "Clean doc here. Nothing leaks."),
         (2, "Start. THE SECRET   answer IS 42. End here."),
         (3, "the secret answer is 42.")],  # whole doc IS the leak
        "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [("The Secret Answer is 42.",), ("Unused eval row.",)],
        ["sentence"])
    out = flag_benchmark_sentences(docs, bench)
    rows = {(r.doc_id, r.sent_idx) for r in out.collect()}
    assert rows == {(2, 1), (3, 0)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
