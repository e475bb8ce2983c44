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


def parse_dialog_turns(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       roles: tuple[str, ...] = ("user", "assistant"),
                       ) -> DataFrame:
    """Split ``role: utterance`` transcripts into one row per turn —
    the first step of every instruction-tuning pipeline (turn-level
    filtering, role-alternation checks, and loss masking all need the
    transcript EXPLODED, not the flat string).

    Marker detection inserts a \\x01 sentinel before each ``role:``
    label and splits on it — deliberately NOT a lookahead split,
    because RE2 engines (DuckDB, Go) have no lookahead, and the oracle
    must replay the exact segmentation. Pre-existing \\x01 characters
    in the input are stripped first so adversarial text cannot
    mis-segment turns. Everything is codegen'd regexp work inside the
    scan plus one posexplode; no shuffle, no UDF.
    Returns (id_col, turn_idx 1-based, role, utterance, n_words);
    text before the first marker (or docs with no marker) yields no
    rows."""
    alt = "|".join(roles)
    sanitized = F.regexp_replace(F.col(text_col), "\x01", "")
    marked = F.regexp_replace(sanitized, rf"\b({alt}): ", "\x01$1: ")
    parts = F.split(marked, "\x01")
    turns = (df.select(F.col(id_col),
                       F.posexplode(parts).alias("_i", "_part"))
             .filter(F.col("_part").rlike(rf"^({alt}): ")))
    role = F.regexp_extract("_part", rf"^({alt}): ", 1)
    utter = F.trim(F.regexp_replace("_part", rf"^({alt}): ", ""))
    from etl_mark1_spark.functions.text import whitespace_token_count

    return turns.select(
        F.col(id_col), F.col("_i").cast("bigint").alias("turn_idx"),
        role.alias("role"), utter.alias("utterance"),
        whitespace_token_count(utter).cast("bigint").alias("n_words"))


def dialog_alternation_report(turns: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """Per-transcript dialog hygiene from the exploded turns: turn
    count, whether the transcript opens with the user, and the number
    of ALTERNATION VIOLATIONS (consecutive same-role turns — the
    artifact that corrupts chat-template training). One per-doc
    aggregation; the violation count compares each turn's role to the
    previous via an ordered collect, so the shuffle carries (role,
    turn_idx) pairs only."""
    pairs = (turns.groupBy(id_col)
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_turns"),
                  F.array_sort(F.collect_list(
                      F.struct("turn_idx", "role"))).alias("_seq")))
    viol = F.size(F.filter(
        F.zip_with(F.slice("_seq", 1, F.size("_seq") - 1),
                   F.slice("_seq", 2, F.size("_seq") - 1),
                   lambda a, b: a["role"] == b["role"]),
        lambda x: x))
    return pairs.select(
        F.col(id_col), "n_turns",
        (F.element_at("_seq", 1)["role"] == "user").alias("opens_user"),
        F.when(F.size("_seq") >= 2, viol).otherwise(0)
        .cast("bigint").alias("n_violations"))


def loss_mask_spans(turns: DataFrame, id_col: str = "doc_id",
                    train_role: str = "assistant",
                    sep_len: int = 1) -> DataFrame:
    """Character-offset loss-mask table for instruction tuning: given
    exploded turns (:func:`parse_dialog_turns`), the [start_char,
    end_char) span of every TRAINABLE turn's utterance in the canonical
    rendering ``"role: utterance" + sep`` per turn — the table an SFT
    pipeline feeds the collator so loss lands only on ``train_role``
    tokens (training on user turns teaches the model to ask itself
    questions; masking by re-tokenizing downstream instead of carrying
    offsets re-does this work per epoch).

    Offsets are a running sum of prior rendered-turn lengths — one
    per-document window ordered by turn_idx (partitioned by the doc key,
    so tasks scale with documents, never a global sort; a transcript's
    turns are bounded). ``sep_len`` is the byte length of the join
    separator the renderer uses (1 for "\\n"). Returns (id_col,
    turn_idx, start_char, end_char) for ``train_role`` turns; end_char
    excludes the separator."""
    from pyspark.sql import Window

    rendered_len = (F.length("role") + F.lit(2) + F.length("utterance")
                    + F.lit(sep_len))
    w = (Window.partitionBy(id_col).orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    turn_start = F.coalesce(F.sum(rendered_len).over(w), F.lit(0))
    utter_start = turn_start + F.length("role") + F.lit(2)
    return (turns
            .withColumn("start_char", utter_start.cast("bigint"))
            .withColumn("end_char",
                        (utter_start + F.length("utterance"))
                        .cast("bigint"))
            .filter(F.col("role") == train_role)
            .select(F.col(id_col), "turn_idx", "start_char", "end_char"))
