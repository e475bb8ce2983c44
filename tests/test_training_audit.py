"""Unit tests for the round-10 second-tranche audit operators:
water-filling budgets, Luhn card scanning, readability, n-gram novelty,
OOV rate, and invisible-codepoint stripping."""

import math

import pytest
from pyspark.sql import functions as F

from etl_mark1_spark.operators.corpus import (luhn_valid, ngram_novelty,
                                              oov_rate, scan_card_numbers,
                                              waterfill_budget)


def _brute_waterfill(counts: dict[str, int], budget: int) -> dict:
    """Independent reference: binary-search the cap instead of the
    closed-form knee, then allocate min(n, cap)."""
    total = sum(counts.values())
    if total <= budget:
        return {"cap": None, "alloc": {s: float(n)
                                       for s, n in counts.items()}}
    lo, hi = 0.0, float(max(counts.values()))
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(n, mid) for n in counts.values()) < budget:
            lo = mid
        else:
            hi = mid
    cap = (lo + hi) / 2
    return {"cap": cap,
            "alloc": {s: min(float(n), cap) for s, n in counts.items()}}


def _docs_with_tokens(spark, counts: dict[str, int]):
    """One row per stratum whose text carries exactly n whitespace
    tokens."""
    rows = [(s, " ".join(["tok"] * n)) for s, n in counts.items()]
    return spark.createDataFrame(rows, ["source", "text"])


@pytest.mark.parametrize("counts,budget", [
    # knee in the middle: small strata survive whole, big ones trimmed
    ({"a": 10, "b": 100, "c": 1000, "d": 5000}, 2000),
    # budget below m * n_min: every stratum capped (istar is NULL)
    ({"a": 50, "b": 60, "c": 70}, 90),
    # everything fits: NULL cap, alloc = n
    ({"a": 5, "b": 7}, 1000),
    # knee exactly at a stratum boundary
    ({"a": 10, "b": 20, "c": 30}, 40),
])
def test_waterfill_matches_bruteforce(spark, counts, budget):
    out = {r["source"]: r for r in
           waterfill_budget(_docs_with_tokens(spark, counts),
                            budget=budget).collect()}
    ref = _brute_waterfill(counts, budget)
    assert set(out) == set(counts)
    for s, n in counts.items():
        assert out[s]["n_tokens"] == n
        assert out[s]["alloc_tokens"] == pytest.approx(
            ref["alloc"][s], abs=1e-4)
        if ref["cap"] is None:
            assert out[s]["cap"] is None
        else:
            assert out[s]["cap"] == pytest.approx(ref["cap"], abs=1e-4)
    if ref["cap"] is not None:
        assert sum(r["alloc_tokens"] for r in out.values()) == \
            pytest.approx(budget, abs=1e-3)


def test_luhn_valid_known_numbers(spark):
    cases = [("4539578763621486", True),    # visa test number
             ("5555555555554444", True),    # mastercard test number
             ("378282246310005", True),     # amex test number (15 digits)
             ("6011111111111117", True),    # discover test number
             ("4539578763621487", False),   # checksum broken by one
             ("1234567890123456", False),
             ("123456789012", False)]       # 12 digits: too short
    df = spark.createDataFrame([(n,) for n, _ in cases], ["num"])
    got = {r["num"]: r["ok"] for r in
           df.select("num", luhn_valid(F.col("num")).alias("ok"))
           .collect()}
    for num, expect in cases:
        assert got[num] is expect, num


def test_scan_card_numbers_counts_and_filter(spark):
    df = spark.createDataFrame([
        (1, "pay 4539578763621486 or 4539578763621487 today"),
        (2, "no digits here"),
        (3, "id 999 then 5555555555554444"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in scan_card_numbers(df).collect()}
    assert set(got) == {1, 3}          # doc 2 has no candidates
    assert got[1]["n_candidates"] == 2 and got[1]["n_valid"] == 1
    assert got[3]["n_candidates"] == 1 and got[3]["n_valid"] == 1


def test_ngram_novelty_attribution(spark):
    # doc 1: 6 words -> 4 distinct 3-grams, all first-seen (novel 1.0);
    # doc 2 repeats doc 1's first 5 words (3 old grams) then diverges
    # with 2 fresh grams -> 2/5 novel.
    df = spark.createDataFrame([
        (1, "a b c d e f"),
        (2, "a b c d e x y"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert got[1]["n_grams"] == 4 and got[1]["novel_frac"] == 1.0
    assert got[2]["n_grams"] == 5
    assert got[2]["novel_frac"] == pytest.approx(0.4)


def test_ngram_novelty_short_docs_dropped(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c")],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert set(got) == {2} and got[2]["n_grams"] == 1


def test_oov_rate_against_hand_count(spark):
    # corpus counts: a=4, b=3, c=2, d=1 -> top-2 vocab {a, b}
    df = spark.createDataFrame([
        (1, "a a b c"),
        (2, "a b b d"),
        (3, "a c"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in oov_rate(df, vocab_size=2).collect()}
    assert got[1]["oov_rate"] == pytest.approx(0.25)   # c
    assert got[2]["oov_rate"] == pytest.approx(0.25)   # d
    assert got[3]["oov_rate"] == pytest.approx(0.5)    # c


def test_strip_invisible_roundtrip(spark):
    from etl_mark1_spark.operators.encoding import (invisible_count,
                                                    strip_invisible)
    dirty = "﻿pay­pal ze​ro‌‍ wo⁠rd"
    clean = "paypal zero word"
    df = spark.createDataFrame([(dirty,), (clean,)], ["text"])
    got = df.select(
        strip_invisible(F.col("text")).alias("clean"),
        invisible_count(F.col("text")).alias("n")).collect()
    assert got[0]["clean"] == clean and got[0]["n"] == 6
    assert got[1]["clean"] == clean and got[1]["n"] == 0


def test_flesch_reading_ease_hand_computed(spark):
    from etl_mark1_spark.functions.text import flesch_reading_ease
    text = "The cat sat on the mat. It was happy!"
    # words=9, sentences=2, vowel groups: e,a,a,o,e,a,i,a,a,y = 10
    expect = 206.835 - 1.015 * (9 / 2) - 84.6 * (10 / 9)
    df = spark.createDataFrame([(text,), ("",)], ["text"])
    got = df.select(
        flesch_reading_ease(F.col("text")).alias("f")).collect()
    assert got[0]["f"] == pytest.approx(expect, abs=1e-9)
    assert got[1]["f"] is None


def test_waterfill_fuzz_against_bruteforce(spark):
    import random
    rnd = random.Random(10)
    for trial in range(5):
        m = rnd.randint(1, 8)
        counts = {f"s{i}": rnd.randint(1, 500) for i in range(m)}
        budget = rnd.randint(1, sum(counts.values()) + 100)
        out = {r["source"]: r["alloc_tokens"] for r in
               waterfill_budget(_docs_with_tokens(spark, counts),
                                budget=budget).collect()}
        ref = _brute_waterfill(counts, budget)
        for s in counts:
            assert out[s] == pytest.approx(ref["alloc"][s], abs=1e-3), \
                (trial, counts, budget)


def test_containment_detects_embedded_excerpt(spark):
    """The asymmetry that motivates the operator: a short doc embedded
    in a long one has high containment (short -> long) but low Jaccard,
    and the reverse direction must NOT qualify."""
    from etl_mark1_spark.operators.dedup import containment_join

    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([(1, small), (2, big)],
                               ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): r["containment"]
           for r in containment_join(df, threshold=0.9,
                                     ngram=1).collect()}
    assert got == {(1, 2): 1.0}


def test_containment_join_randomized_bruteforce_parity(spark):
    """Seeded randomized corpus: the prefix + positional filters must
    reproduce the brute-force directed containment join exactly at
    several thresholds (same recall-proof structure as the setsim
    fuzz)."""
    import random
    from itertools import permutations

    from etl_mark1_spark.operators.dedup import containment_join

    rng = random.Random(103)
    pool = [f"tok{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choices(pool, k=rng.randint(3, 14))))
            for i in range(25)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def toks(t):
        return set(t.split())

    for thr in (0.5, 0.7, 0.9):
        got = {(r["doc_a"], r["doc_b"]): r["containment"] for r in
               containment_join(df, threshold=thr, ngram=1).collect()}
        want = {}
        for (ia, ta), (ib, tb) in permutations(rows, 2):
            a, b = toks(ta), toks(tb)
            cont = len(a & b) / len(a)
            if cont >= thr:
                want[(ia, ib)] = round(cont, 6)
        assert set(got) == set(want), f"threshold {thr}"
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, (thr, k)


def test_containment_duplicate_heavy_both_directions(spark):
    """Verbatim copies emit containment 1.0 in BOTH directions (the
    relation is reflexive-symmetric on identical sets), and the
    collapse must not drop cross-set directed pairs."""
    from etl_mark1_spark.operators.dedup import containment_join

    small = "alpha beta gamma"
    big = small + " extra words beyond the quote here"
    rows = [(1, small), (2, small), (3, big)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]) for r in
           containment_join(df, threshold=0.95, ngram=1).collect()}
    assert got == {(1, 2), (2, 1), (1, 3), (2, 3)}


def test_key_skew_report_hand_counts(spark):
    from etl_mark1_spark.operators.skew import key_skew_report
    # counts: a=5, b=3, c=1, d=1 -> total 10, 4 keys, mean 2.5
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, ["k"])
    got = {r["rank"]: r for r in
           key_skew_report(df, "k", top_k=2).collect()}
    assert set(got) == {1, 2}
    assert got[1]["key"] == "a" and got[1]["cnt"] == 5
    assert got[1]["share"] == pytest.approx(0.5)
    assert got[1]["skew_ratio"] == pytest.approx(2.0)   # 5 / 2.5
    assert got[2]["key"] == "b"
    assert got[2]["skew_ratio"] == pytest.approx(1.2)   # 3 / 2.5


def test_plan_shards_ceil_division(spark):
    from etl_mark1_spark.sources.writers import plan_shards
    rows = [("s1", "x" * 100)] * 3 + [("s2", "y" * 10)]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {r["source"]: r for r in
           plan_shards(df, target_bytes=250).collect()}
    assert got["s1"]["n_bytes"] == 300 and got["s1"]["n_shards"] == 2
    assert got["s1"]["mean_shard_bytes"] == pytest.approx(150.0)
    assert got["s2"]["n_bytes"] == 10 and got["s2"]["n_shards"] == 1


def test_dedup_survivorship_report(spark):
    rows = [(1, "same text"), (2, "same text"), (5, "same text"),
            (3, "unique one"), (4, "other text"), (9, "other text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["survivor"]: r for r in
           spark.createDataFrame(
               df.groupBy("text")
               .agg(F.min("doc_id").cast("bigint").alias("survivor"),
                    F.count(F.lit(1)).cast("bigint").alias("n_copies"))
               .filter(F.col("n_copies") > 1)
               .select("survivor", "n_copies",
                       ((F.col("n_copies") - 1)
                        * F.octet_length("text")).cast("bigint")
                       .alias("bytes_saved")).collect())
           .collect()}
    assert set(got) == {1, 4}
    assert got[1]["n_copies"] == 3
    assert got[1]["bytes_saved"] == 2 * len("same text")
    assert got[4]["n_copies"] == 2


def test_embedding_norm_and_variance_hand_computed(spark):
    import math
    rows = [(0, [3.0, 4.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0]),
            (3, [6.0, 8.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    nrm = F.sqrt(F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    got = {r["vec_id"]: r["n"] for r in
           df.select("vec_id", nrm.alias("n")).collect()}
    assert got[0] == pytest.approx(5.0) and got[3] == pytest.approx(10.0)
    assert got[1] == 0.0 and got[2] == pytest.approx(math.sqrt(2))
    # per-dim variance: dim0 values [3,0,1,6] -> mean 2.5, var 5.25
    p = (df.select(F.posexplode("embedding").alias("dim", "v"))
         .groupBy("dim")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
              F.sum(F.col("v") * F.col("v")).alias("ss"))
         .select("dim", (F.col("ss") / F.col("n")
                         - (F.col("s") / F.col("n")) ** 2).alias("var")))
    var = {r["dim"]: r["var"] for r in p.collect()}
    assert var[0] == pytest.approx(5.25)
    assert var[1] == pytest.approx(9.6875)  # [4,0,1,8]: 20.25 - 3.25^2


def test_luhn_hypothesis_vs_pure_python(spark):
    """Property test: the column expression agrees with a direct
    pure-Python Luhn implementation on arbitrary digit strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def luhn_py(s):
        tot = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            tot += d
        return len(s) >= 13 and tot % 10 == 0

    collected = []

    @settings(max_examples=30, deadline=None)
    @given(st.text(alphabet="0123456789", min_size=1, max_size=19))
    def gather(s):
        collected.append(s)

    gather()
    df = spark.createDataFrame([(s,) for s in set(collected)], ["num"])
    got = {r["num"]: r["ok"] for r in
           df.select("num", luhn_valid(F.col("num")).alias("ok"))
           .collect()}
    for s, ok in got.items():
        assert ok is luhn_py(s), s


def test_waterfill_hypothesis_invariants(spark):
    """Property test: allocations never exceed counts, never exceed the
    cap, and sum to min(budget, total) within float tolerance."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cases = []

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=2000),
                    min_size=1, max_size=10),
           st.integers(min_value=1, max_value=25000))
    def gather(ns, budget):
        cases.append((tuple(ns), budget))

    gather()
    for ns, budget in set(cases):
        counts = {f"s{i}": n for i, n in enumerate(ns)}
        out = waterfill_budget(_docs_with_tokens(spark, counts),
                               budget=budget).collect()
        total = sum(ns)
        allocs = {r["source"]: r["alloc_tokens"] for r in out}
        assert set(allocs) == set(counts)
        for s, n in counts.items():
            assert allocs[s] <= n + 1e-6, (ns, budget)
        got_sum = sum(allocs.values())
        assert got_sum == pytest.approx(min(budget, total), abs=1e-2), \
            (ns, budget)


def test_parse_dialog_turns_segments_and_roles(spark):
    from etl_mark1_spark.operators.sentences import parse_dialog_turns
    df = spark.createDataFrame([
        (1, "user: hello there assistant: hi user: bye"),
        (2, "no markers at all"),
        (3, "preamble text user: question assistant: answer words"),
    ], ["doc_id", "text"])
    got = {(r["doc_id"], r["turn_idx"]): r for r in
           parse_dialog_turns(df).collect()}
    assert {(k[0]) for k in got} == {1, 3}          # doc 2: no rows
    assert got[(1, 1)]["role"] == "user"
    assert got[(1, 1)]["utterance"] == "hello there"
    assert got[(1, 2)]["role"] == "assistant"
    assert got[(1, 3)]["utterance"] == "bye"
    # text before the first marker is dropped, turns still 1-based
    assert got[(3, 1)]["utterance"] == "question"
    assert got[(3, 2)]["n_words"] == 2


def test_dialog_alternation_report_flags_violations(spark):
    from etl_mark1_spark.operators.sentences import (
        dialog_alternation_report, parse_dialog_turns)
    df = spark.createDataFrame([
        (1, "user: a assistant: b user: c"),            # clean
        (2, "user: a assistant: b assistant: c"),       # 1 violation
        (3, "assistant: a user: b user: c user: d"),    # opens wrong, 2
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dialog_alternation_report(parse_dialog_turns(df)).collect()}
    assert got[1]["n_turns"] == 3 and got[1]["n_violations"] == 0
    assert got[1]["opens_user"] is True
    assert got[2]["n_violations"] == 1
    assert got[3]["opens_user"] is False
    assert got[3]["n_violations"] == 2


def test_special_token_scan_masks_substring_overlap(spark):
    """'<s>' must not fire on the substring inside '</s>'."""
    from etl_mark1_spark.catalog.training_audit import special_token_scan_docs  # noqa: F401
    df = spark.createDataFrame(
        [(1, "ends with </s> only"),
         (2, "has <s> open marker"),
         (3, "both </s><s> adjacent"),
         (4, "clean text")], ["doc_id", "text"])
    tx = F.col("text")
    masked = F.replace(tx, F.lit("</s>"), F.lit(""))
    found = F.filter(F.array(
        F.when(tx.contains("</s>"), "</s>"),
        F.when(masked.contains("<s>"), "<s>")),
        lambda x: x.isNotNull())
    got = {r["doc_id"]: r["f"] for r in
           df.select("doc_id", F.array_join(found, ",").alias("f"))
           .collect()}
    assert got[1] == "</s>"          # no false '<s>' from the substring
    assert got[2] == "<s>"
    assert got[3] == "</s>,<s>"
    assert got[4] == ""


def test_code_block_extraction_counts(spark):
    tx = "pre ```a b c``` mid ```xy``` post"
    blocks = F.regexp_extract_all(F.lit(tx), F.lit(r"```[^`]*```"),
                                  F.lit(0))
    chars = F.aggregate(blocks, F.lit(0).cast("bigint"),
                        lambda acc, b: acc + F.length(b) - 6)
    r = spark.range(1).select(F.size(blocks).alias("n"),
                              chars.alias("c")).collect()[0]
    assert r["n"] == 2 and r["c"] == len("a b c") + len("xy")


def test_streaming_interval_join_equals_batch(spark, sf_dir):
    """AvailableNow stream-stream interval join must equal the batch
    interval join on the bounded fixture (everything in-watermark)."""
    from etl_mark1_spark.catalog.training_audit import \
        streaming_interval_join

    got = {(r["view_event"], r["click_event"]): r["gap_us"]
           for r in streaming_interval_join(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    v = ev.filter(F.col("event_type") == "view") \
        .select(F.col("event_id").alias("ve"), F.col("ts").alias("vt"),
                F.col("user_id").alias("vu"))
    c = ev.filter(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("ce"), F.col("ts").alias("ct"),
                F.col("user_id").alias("cu"))
    want = {(r["ve"], r["ce"]):
            r["g"] for r in v.join(
                c, (F.col("vu") == F.col("cu"))
                & (F.col("ct") >= F.col("vt"))
                & (F.col("ct") <= F.col("vt") + F.expr(
                    "INTERVAL 2 HOURS")))
            .select("ve", "ce", (F.unix_micros("ct")
                                 - F.unix_micros("vt"))
                    .cast("bigint").alias("g")).collect()}
    assert got == want and len(got) > 0


def test_luhn_valid_definite_boolean_on_nondigits(spark):
    """Round-10 ADVICE: non-digit input must yield false, never NULL
    (the per-digit cast('int') would otherwise propagate NULL through
    the aggregate)."""
    cases = ["4539-5787-6362-1486",      # digits + separators
             "abcdefghijklmnop",         # 16 non-digits
             "45395787636214x6",         # one alpha in a 16-run
             ""]                         # empty string
    df = spark.createDataFrame([(s,) for s in cases], ["num"])
    got = df.select(luhn_valid(F.col("num")).alias("ok")).collect()
    assert all(r["ok"] is False for r in got)


def test_parse_dialog_turns_strips_preexisting_sentinel(spark):
    """Round-10 ADVICE: input text already containing \\x01 must not
    mis-segment turns — the sentinel is stripped before insertion."""
    from etl_mark1_spark.operators.sentences import parse_dialog_turns
    df = spark.createDataFrame([
        (1, "user: hel\x01lo assistant: wor\x01ld end"),
        (2, "\x01user: leading sentinel assistant: ok"),
    ], ["doc_id", "text"])
    got = {(r["doc_id"], r["turn_idx"]): r for r in
           parse_dialog_turns(df).collect()}
    assert got[(1, 1)]["utterance"] == "hello"
    assert got[(1, 2)]["utterance"] == "world end"
    assert got[(2, 1)]["utterance"] == "leading sentinel"
    assert got[(2, 2)]["role"] == "assistant"
    assert max(k[1] for k in got if k[0] == 1) == 2


def test_plan_shards_zero_byte_stratum_gets_one_shard(spark):
    """Round-10 ADVICE: a stratum whose payloads are all empty must
    plan n_shards=1 with a definite mean, not 0 shards and NULL."""
    from etl_mark1_spark.sources.writers import plan_shards
    rows = [("s1", "x" * 100), ("empty", ""), ("empty", "")]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {r["source"]: r for r in
           plan_shards(df, target_bytes=250).collect()}
    assert got["empty"]["n_bytes"] == 0
    assert got["empty"]["n_shards"] == 1
    assert got["empty"]["mean_shard_bytes"] == pytest.approx(0.0)
    assert got["s1"]["n_shards"] == 1


def test_ngram_novelty_fans_out_narrow_scan(spark, sf_dir):
    """Plan pin (round-13-opt): a compact single-split corpus fans out
    (round-robin) BEFORE gram generation — the generation stage is the
    entry's dominant CPU cost and previously ran on ONE core at sf0.1
    (profiled 4.0 s single-task stage; isolated A/B 3.9 -> 1.3 s)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(docs.inputFiles()) < spark.sparkContext.defaultParallelism
    plan = ngram_novelty(docs, n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan, plan
