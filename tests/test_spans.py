"""Span-level exact substring dedup (operators/spans.py).

Planted-fixture tests pin the semantics the catalog oracle then re-checks
at corpus scale: window flagging is cross-document (>= min_docs DISTINCT
docs, self-repetition alone never flags), overlapping/adjacent flagged
windows merge into maximal spans, and stripping removes exactly the
spanned tokens.
"""

import pytest
from pyspark.sql import functions as F

from etl_mark1_spark.operators.spans import (
    duplicate_spans,
    strip_duplicate_spans,
)

SHARED = "one two three four five six seven eight"          # 8 tokens
SHARED2 = "alpha beta gamma delta epsilon zeta eta theta"    # 8 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, f"{SHARED} tail1 x y z"),
        (2, f"head2 {SHARED} mid {SHARED2}"),
        (3, f"{SHARED2} only"),
        (4, "no duplicated content here at all friends today ok"),
        (5, SHARED),                                  # fully duplicated
        (6, "short doc"),                             # < n tokens
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_spans_planted(docs):
    got = sorted(tuple(r) for r in duplicate_spans(docs, n=8).collect())
    assert got == [
        (1, 1, 8, 8),
        (2, 2, 9, 8),    # "head2" shifts the shared block by one
        (2, 11, 18, 8),  # two distinct shared blocks stay separate spans
        (3, 1, 8, 8),
        (5, 1, 8, 8),
    ]


def test_hash_grams_variant_agrees(docs):
    exact = sorted(tuple(r) for r in duplicate_spans(docs, n=8).collect())
    hashed = sorted(tuple(r) for r in
                    duplicate_spans(docs, n=8, hash_grams=True).collect())
    assert exact == hashed


def test_self_repetition_does_not_flag(spark):
    """A single doc repeating its own 8-gram is not a CROSS-document
    duplicate; min_docs counts distinct documents."""
    d = spark.createDataFrame(
        [(1, f"{SHARED} {SHARED}"), (2, "totally different words here "
                                        "nothing shared at all today")],
        ["doc_id", "text"])
    assert duplicate_spans(d, n=8).count() == 0


def test_overlapping_windows_merge_to_one_span(spark):
    """A 10-token shared block yields three overlapping 8-token windows;
    they must merge into one maximal span of 10 tokens."""
    block = "a b c d e f g h i j"
    d = spark.createDataFrame(
        [(1, f"{block} unique1 filler1"), (2, f"other2 {block} end2")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
           for r in duplicate_spans(d, n=8).collect()}
    assert got == {1: (1, 10, 10), 2: (2, 11, 10)}


def test_strip_removes_exactly_spanned_tokens(docs):
    clean = {r["doc_id"]: r["clean_text"]
             for r in strip_duplicate_spans(docs, n=8).collect()}
    assert clean == {
        1: "tail1 x y z",
        2: "head2 mid",
        3: "only",
        4: "no duplicated content here at all friends today ok",
        5: "",
        6: "short doc",
    }


def test_strip_normalizes_whitespace_and_case(spark):
    d = spark.createDataFrame(
        [(1, "  No   Dups\tHere  ")], ["doc_id", "text"])
    got = strip_duplicate_spans(d, n=8).collect()[0]["clean_text"]
    assert got == "no dups here"


def test_island_window_is_per_document(docs):
    """The gaps-and-islands window must partition by doc_id — never a
    global sort. Assert no single-partition Window in the plan."""
    plan = (duplicate_spans(docs, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" in plan
    # a global window would plan as 'Window [...], []' with empty
    # partition spec; ours always carries the doc_id partition key
    for line in plan.splitlines():
        if "Window [" in line:
            assert "doc_id" in line


def test_spans_randomized_python_reference_parity(spark):
    """Seeded randomized corpus with recurring phrase blocks: the Spark
    span merge must match a direct Python reference implementation."""
    import random
    from collections import defaultdict

    from etl_mark1_spark.operators.spans import duplicate_spans

    rng = random.Random(13)
    blocks = [" ".join(f"b{k}w{j}" for j in range(10)) for k in range(4)]
    rows = []
    for i in range(25):
        parts = [f"u{i}x{j}" for j in range(rng.randint(3, 8))]
        for _ in range(rng.randint(0, 2)):
            parts.insert(rng.randrange(len(parts) + 1), rng.choice(blocks))
        rows.append((i, " ".join(parts)))
    n = 8
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(tuple(r) for r in duplicate_spans(df, n=n).collect())

    # reference: flag n-gram starts seen in >= 2 docs, merge islands
    gram_docs = defaultdict(set)
    toks = {i: t.split() for i, t in rows}
    for i, tl in toks.items():
        for s in range(len(tl) - n + 1):
            gram_docs[" ".join(tl[s:s + n])].add(i)
    want = []
    for i, tl in toks.items():
        starts = sorted(s + 1 for s in range(len(tl) - n + 1)
                        if len(gram_docs[" ".join(tl[s:s + n])]) >= 2)
        cur = None
        for s in starts:
            if cur and s <= cur[1] + 1:
                cur[1] = max(cur[1], s + n - 1)
            else:
                if cur:
                    want.append((i, cur[0], cur[1], cur[1] - cur[0] + 1))
                cur = [s, s + n - 1]
        if cur:
            want.append((i, cur[0], cur[1], cur[1] - cur[0] + 1))
    assert got == sorted(want)


def test_keep_first_retains_earliest_occurrence(docs):
    """RefinedWeb-style keep-first: the corpus-wide first occurrence of
    each duplicated span survives; every later verbatim copy is cut."""
    from etl_mark1_spark.operators.spans import strip_spans_keep_first

    got = {r["doc_id"]: r["clean_text"]
           for r in strip_spans_keep_first(docs, n=8).collect()}
    # doc1 holds the first occurrence of SHARED -> fully retained
    assert got[1] == f"{SHARED} tail1 x y z"
    # doc2's SHARED copy is cut, but its SHARED2 is the FIRST occurrence
    # (position 11 beats doc3's position 1 on doc order) and survives
    assert got[2] == f"head2 mid {SHARED2}"
    assert got[3] == "only"
    assert got[5] == ""
    assert got[4] == "no duplicated content here at all friends today ok"
    assert got[6] == "short doc"


def test_keep_first_strips_within_doc_repeats(spark):
    """Unlike the cross-document variant, keep-first also removes a
    document's OWN later repetition of a span (the suffix-array
    semantics: any second verbatim occurrence goes)."""
    from etl_mark1_spark.operators.spans import strip_spans_keep_first

    d = spark.createDataFrame([(1, f"{SHARED} {SHARED}")],
                              ["doc_id", "text"])
    got = strip_spans_keep_first(d, n=8).collect()
    assert got[0]["clean_text"] == SHARED


def test_coverage_counts_merged_spans_once(docs):
    from etl_mark1_spark.operators.spans import span_dedup_coverage

    got = {r["doc_id"]: (r["total_tokens"], r["dup_tokens"], r["dup_frac"])
           for r in span_dedup_coverage(docs, n=8).collect()}
    assert got == {
        1: (12, 8, round(8 / 12, 6)),
        2: (18, 16, round(16 / 18, 6)),
        3: (9, 8, round(8 / 9, 6)),
        5: (8, 8, 1.0),
    }


def test_keep_first_randomized_python_reference_parity(spark):
    """Seeded randomized corpus with repeated phrase blocks (across AND
    within docs): strip_spans_keep_first must match a direct Python
    reference of the rank>1 flag / island merge / strip pipeline."""
    import random
    from collections import defaultdict

    from etl_mark1_spark.operators.spans import strip_spans_keep_first

    rng = random.Random(77)
    n = 8
    blocks = [" ".join(f"k{k}w{j}" for j in range(9)) for k in range(3)]
    rows = []
    for i in range(22):
        parts = [f"u{i}x{j}" for j in range(rng.randint(2, 7))]
        for _ in range(rng.randint(0, 3)):    # up to 3 inserts, repeats OK
            parts.insert(rng.randrange(len(parts) + 1), rng.choice(blocks))
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["clean_text"]
           for r in strip_spans_keep_first(df, n=n).collect()}

    # reference: global first occurrence per gram by (doc, pos); every
    # later occurrence flags its window, merge per-doc islands, strip
    toks = {i: t.split() for i, t in rows}
    first = {}
    for i in sorted(toks):
        tl = toks[i]
        for s in range(len(tl) - n + 1):
            g = " ".join(tl[s:s + n])
            if g not in first:
                first[g] = (i, s)
    flagged = defaultdict(list)
    for i in sorted(toks):
        tl = toks[i]
        for s in range(len(tl) - n + 1):
            if first[" ".join(tl[s:s + n])] != (i, s):
                flagged[i].append(s + 1)        # 1-based
    want = {}
    for i, tl in toks.items():
        remove = set()
        for s in flagged[i]:
            remove.update(range(s, s + n))
        want[i] = " ".join(t for j, t in enumerate(tl, 1)
                           if j not in remove)
    assert got == want
