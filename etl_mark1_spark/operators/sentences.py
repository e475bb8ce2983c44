"""Sentence segmentation — the unit under sentence-level dedup and
decontamination.

Extension family: span dedup (operators/spans.py) works on character
shingles and line dedup (operators/lines.py) on layout lines; benchmark
decontamination pipelines usually match at SENTENCE granularity. The
splitter is rule-based and fully deterministic: a boundary is a run of
``. ! ?`` followed by whitespace and an upper-case letter or digit,
EXCEPT after a known abbreviation (``Dr.``, ``e.g.`` …); decimals
(``3.14``) never match because the boundary requires whitespace after
the punctuation.

Implementation is a pure column expression two-step — mark boundaries
with a sentinel via one ``regexp_replace`` (Java regex: bounded
lookbehinds per abbreviation, one lookahead), then ``split`` +
``posexplode``. Whole-stage codegen, no Python, no shuffle: a 100 TB
corpus segments at scan speed. RE2 (DuckDB) has no lookarounds, so the
catalog oracle states expected sentences from planted synthesis instead
of re-running the regex — an independent check, not a shared bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ABBREVIATIONS", "split_sentences", "sentence_boundaries_marked"]

#: Tokens whose trailing period never ends a sentence. Each becomes one
#: bounded negative lookbehind, so the list must stay short and fixed-width
#: per entry (Java requires bounded lookbehind).
ABBREVIATIONS = (
    "Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "St.", "No.", "Fig.",
    "vs.", "etc.", "e.g.", "i.e.", "cf.", "al.",
)

_SENTINEL = "\x00"


def _boundary_pattern() -> str:
    # Each guard is anchored with \b so only the STANDALONE abbreviation
    # token suppresses the boundary: an unanchored (?<!al\.) would also
    # match any word ending in "-al." ("surreal.", "Normal.") and silently
    # merge real sentences — which then miss verbatim benchmark matches in
    # flag_benchmark_sentences. \b is zero-width, so the lookbehind stays
    # bounded (a Java-regex requirement).
    guards = "".join(
        f"(?<!\\b{a.replace('.', chr(92) + '.')})" for a in ABBREVIATIONS)
    # also guard single-letter initials ("J. Smith") — \b-anchored for the
    # same reason ("NASA." must still end a sentence)
    return rf"(?<=[.!?]){guards}(?<!\b[A-Z]\.)\s+(?=[A-Z0-9])"


def sentence_boundaries_marked(col) -> F.Column:
    """The text with every sentence boundary replaced by a NUL sentinel —
    the shared first pass, exposed for testing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _boundary_pattern(), _SENTINEL)


def split_sentences(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One row per sentence: ``(id, sent_idx, sentence)``, document order,
    whitespace-trimmed, empties dropped. NULL/empty text yields no rows
    (matching the explode shape every other text exploder here uses)."""
    marked = sentence_boundaries_marked(text_col)
    arr = F.filter(
        F.transform(F.split(marked, _SENTINEL, -1), lambda s: F.trim(s)),
        lambda s: s != "")
    return (df.select(id_col, F.posexplode(arr).alias("sent_idx",
                                                      "sentence"))
              .withColumn("sent_idx", F.col("sent_idx").cast("int")))


def flag_benchmark_sentences(docs: DataFrame, benchmark: DataFrame,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             bench_col: str = "sentence") -> DataFrame:
    """Sentence-level exact decontamination: every corpus sentence whose
    normalized form (lowercase, whitespace collapsed) appears in the
    benchmark sentence set — ``(id, sent_idx, sentence)`` rows to strip
    or to kill the whole document over.

    Eval sets are small by nature, so the benchmark side BROADCASTS into
    a semi join: the corpus explodes to sentences map-side and never
    shuffles. Complements n-gram decontam (operators/dedup.py:
    minhash_cross_dedup / bloom prefilter), which catches paraphrase-level
    overlap; this catches the verbatim-sentence leak at exact precision."""
    def norm(c):
        return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))

    sents = split_sentences(docs, text_col=text_col, id_col=id_col)
    bench = benchmark.select(norm(F.col(bench_col)).alias("_bkey")) \
        .distinct()
    return sents.join(F.broadcast(bench),
                      norm(F.col("sentence")) == F.col("_bkey"),
                      "left_semi")


def _register_steps() -> None:
    from etl_mark1_spark.operators.steps import register_operator

    register_operator(
        "split_sentences",
        lambda df, p: split_sentences(
            df, text_col=p.get("column", "text"),
            id_col=p.get("id_column", "doc_id")))


_register_steps()
