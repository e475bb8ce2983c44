"""Aho–Corasick multi-pattern scan (operators/matching.py) and SFT
loss-mask spans (operators/sentences.py:loss_mask_spans)."""

import random

from etl_mark1_spark.operators.matching import (build_automaton,
                                                multi_pattern_scan,
                                                scan_text)


def test_automaton_matches_overlapping_and_nested_patterns():
    auto = build_automaton(["he", "she", "his", "hers"])
    # classic Aho-Corasick example: "ushers" matches she, he, hers
    hits = {auto["patterns"][i] for i in scan_text(auto, "ushers")}
    assert hits == {"she", "he", "hers"}


def test_automaton_fuzz_vs_naive():
    rng = random.Random(31)
    alpha = "ab"
    for trial in range(40):
        pats = list({"".join(rng.choice(alpha)
                             for _ in range(rng.randint(1, 4)))
                     for _ in range(rng.randint(1, 6))})
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        auto = build_automaton(pats)
        got = {auto["patterns"][i] for i in scan_text(auto, text)}
        want = {p for p in pats if p in text}
        assert got == want, (trial, pats, text)


def test_multi_pattern_scan_counts_and_first_term(spark):
    df = spark.createDataFrame([
        (1, "the quick brown fox"),
        (2, "a FOX and an ox and a box"),      # case-folded match
        (3, "nothing relevant here"),
        (4, "ox fox box"),
        (5, None),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_terms"], r["first_term"]) for r in
           multi_pattern_scan(df, ["fox", "box", "quick brown"]).collect()}
    assert got == {1: (2, "fox"),           # fox + "quick brown"
                   2: (2, "box"),
                   4: (2, "box")}


def test_pattern_whitespace_normalized_like_text():
    """A pattern containing a tab/newline/doubled space matches text
    whose whitespace was collapsed — patterns fold through the SAME
    normalization as the scanned text (round-12 ADVICE regression)."""
    import pytest

    auto = build_automaton(["quick\t\nbrown", "lazy  dog"])
    assert auto["patterns"] == ["quick brown", "lazy dog"]
    hits = {auto["patterns"][i]
            for i in scan_text(auto, "the quick brown lazy dog")}
    assert hits == {"quick brown", "lazy dog"}
    with pytest.raises(ValueError):
        build_automaton([" \t\n "])    # normalizes to empty


def test_multi_pattern_scan_dedups_normalized_duplicates(spark):
    """Two inputs normalizing to the same pattern count once."""
    df = spark.createDataFrame([(1, "a fox ran")], ["doc_id", "text"])
    got = multi_pattern_scan(df, ["fox", "FOX", " fox\t"]).collect()
    assert len(got) == 1 and got[0]["n_terms"] == 1
    assert got[0]["first_term"] == "fox"


def test_multi_pattern_scan_whitespace_normalized(spark):
    """Multi-word patterns match across collapsed whitespace, like the
    index/dedup families' normalization."""
    df = spark.createDataFrame([(1, "quick   \n  brown stuff")],
                               ["doc_id", "text"])
    got = multi_pattern_scan(df, ["quick brown"]).collect()
    assert len(got) == 1 and got[0]["n_terms"] == 1


def test_loss_mask_spans_offsets(spark):
    from etl_mark1_spark.operators.sentences import (loss_mask_spans,
                                                     parse_dialog_turns)

    df = spark.createDataFrame(
        [(1, "user: hi there assistant: hello user: bye assistant: ok")],
        ["doc_id", "text"])
    turns = parse_dialog_turns(df)
    got = {r["turn_idx"]: (r["start_char"], r["end_char"]) for r in
           loss_mask_spans(turns).collect()}
    # canonical rendering: "user: hi there\nassistant: hello\nuser: bye\n..."
    render = "user: hi there\nassistant: hello\nuser: bye\nassistant: ok\n"
    assert render[got[2][0]:got[2][1]] == "hello"
    assert render[got[4][0]:got[4][1]] == "ok"
    assert set(got) == {2, 4}          # only assistant turns


def test_loss_mask_spans_custom_role_and_sep(spark):
    from etl_mark1_spark.operators.sentences import (loss_mask_spans,
                                                     parse_dialog_turns)

    df = spark.createDataFrame([(7, "assistant: a user: long answer")],
                               ["doc_id", "text"])
    turns = parse_dialog_turns(df)
    got = loss_mask_spans(turns, train_role="user", sep_len=2).collect()
    render = "assistant: a##user: long answer##".replace("##", "XX")
    r = got[0]
    assert render[r["start_char"]:r["end_char"]] == "long answer"
