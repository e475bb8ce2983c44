"""Multi-pattern text scanning: Aho–Corasick dictionary matching as a
broadcast automaton.

The C4/Gopher-style safety pass scans every document against a BANNED-
PHRASE dictionary that real deployments grow to tens of thousands of
entries. The naive Spark expression — OR of ``contains()`` per term —
is codegen, but its cost is O(terms x doc_len) per document and the
expression tree itself grows with the dictionary (the round-8 codegen-
size cliff). Measured at sf0.1: 200 patterns — automaton 2.9 s vs
contains-OR 4.0 s (identical hit sets, a free cross-validation); 1000
patterns — automaton 2.8 s (flat) while the contains-OR expression no
longer ANALYZES (Catalyst StackOverflowError building the tree). The
naive shape does not degrade at dictionary scale, it stops compiling.

Aho–Corasick (Aho & Corasick 1975, public algorithm) scans in
O(doc_len + matches) INDEPENDENT of dictionary size: the automaton is
built once driver-side (dictionary-sized, KBs–MBs), broadcast, and run
inside ``mapInPandas`` over Arrow batches — documents never shuffle, and
the dictionary never re-parses per row.

Matching is over the same normalized form the dedup/index families use
(lowercase, whitespace-collapsed), substring semantics; callers wanting
word-boundary behavior pad patterns with spaces themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def build_automaton(patterns: list[str]) -> dict:
    """Build the Aho–Corasick automaton: a dict of
    ``{goto: list[dict char->state], fail: list[int],
    out: list[list[pattern_index]], patterns: list[str]}``.
    States are ints; state 0 is the root. Pure stdlib, picklable —
    safe to broadcast."""
    import re as _re

    if not patterns:
        raise ValueError("build_automaton needs at least one pattern")
    # Patterns go through the SAME normalization the scanner applies to
    # text (whitespace-collapse + lowercase) — a pattern containing a
    # tab/newline/doubled space could otherwise never match despite the
    # docstring's shared-normalized-form contract (round-12 ADVICE fix).
    norm = [_re.sub(r"\s+", " ", p).strip().lower() for p in patterns]
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for idx, pat in enumerate(norm):
        if not pat:
            raise ValueError(
                "pattern normalizes to empty (whitespace-only input)")
        state = 0
        for ch in pat:
            nxt = goto[state].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[state][ch] = nxt
            state = nxt
        out[state].append(idx)
    # BFS failure links (classic construction)
    from collections import deque

    fail = [0] * len(goto)
    q = deque()
    for ch, s in goto[0].items():
        fail[s] = 0
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
            out[s] = out[s] + out[fail[s]]
    return {"goto": goto, "fail": fail, "out": out, "patterns": norm}


def scan_text(auto: dict, text: str) -> set[int]:
    """Pattern indexes matched anywhere in ``text`` (already-normalized
    input expected). O(len(text) + matches)."""
    goto, fail, out = auto["goto"], auto["fail"], auto["out"]
    state = 0
    hits: set[int] = set()
    for ch in text:
        while state and ch not in goto[state]:
            state = fail[state]
        state = goto[state].get(ch, 0)
        if out[state]:
            hits.update(out[state])
    return hits


def multi_pattern_scan(df: DataFrame, patterns: list[str],
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document dictionary-scan report: for every document matching
    at least one pattern, ``(id_col, n_terms bigint, first_term string)``
    — distinct matched-pattern count and the lexicographically smallest
    matched pattern (deterministic evidence column for review queues).

    The automaton broadcasts once; each Arrow batch normalizes its text
    (same lower/whitespace-collapse as the index family, in pandas) and
    runs the linear scan. No shuffle at all — the result is a projection
    of the corpus scan, and dictionary growth changes broadcast size,
    never the plan."""
    import re as _re

    from pyspark.sql import functions as F  # noqa: F401  (signature parity)
    from pyspark.sql import types as T

    from etl_mark1_spark.operators.dedup import ensure_parallelism

    auto = df.sparkSession.sparkContext.broadcast(
        build_automaton(patterns))
    id_type = df.schema[id_col].dataType.simpleString()
    schema = T._parse_datatype_string(
        f"{id_col} {id_type}, n_terms bigint, first_term string")
    ws = _re.compile(r"\s+")

    def run(batches):
        import pandas as pd

        a = auto.value
        pats = a["patterns"]
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                normed = ws.sub(" ", str(text)).strip().lower()
                hits = scan_text(a, normed)
                if hits:
                    # distinct NORMALIZED patterns (two inputs may
                    # normalize to the same string; count it once)
                    matched = sorted({pats[i] for i in hits})
                    rows.append((rid, len(matched), matched[0]))
            yield pd.DataFrame(rows, columns=[id_col, "n_terms",
                                              "first_term"])

    return (ensure_parallelism(df).select(id_col, text_col)
            .mapInPandas(run, schema))
