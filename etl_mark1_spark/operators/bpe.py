"""Distributed BPE training: learn byte-pair-encoding merges from a corpus.

The tokenizer-prep stage the vocab-build/encode operators (corpus.py)
stop short of: actually LEARNING the subword vocabulary. Implements the
classic word-frequency BPE (Sennrich et al., the public algorithm behind
GPT-2/RoBERTa-style tokenizers): start from characters plus an
end-of-word marker, repeatedly count adjacent symbol pairs weighted by
word frequency, and merge the most frequent pair everywhere.

Shape at scale: training never touches the corpus after ONE word-count
aggregation — every iteration runs over the unique-WORD table (Zipf
collapses billions of tokens to a vocabulary-sized frame), as a map-side
pair explode + one count aggregation + a single-row top-pair collect +
a map-side regexp merge. The driver holds one (left, right) pair per
round, never data. The word table is checkpointed per iteration (the
merge is a lineage-growing self-map, pagerank's loop discipline) and
released at the end.

Determinism: ties on pair count break lexicographically (left, then
right), so the learned merge list is a pure function of the corpus —
differential-tested against an independent pure-Python reference
implementation in tests/test_corpus.py.

Symbols are space-joined inside a padded string (`` a b c </w> ``), and
a merge is one ``regexp_replace`` with a lookahead trailing boundary —
consuming the trailing space would skip every other occurrence in runs
like ``b b b b``. Words are normalized to [a-z0-9]+, so symbols never
contain regex metacharacters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    words = (df.select(F.explode(F.split(F.lower(F.col(text_col)),
                                         r"[^a-z0-9]+")).alias("w"))
             .filter(F.length("w") > 0)
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    sym = F.concat(F.lit(" "),
                   F.regexp_replace(F.col("w"), "(.)", "$1 "),
                   F.lit(END), F.lit(" "))
    return words.select("w", "cnt", sym.alias("sym"))


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    toks = F.expr("slice(split(trim(sym), ' '), 1, size(split(trim(sym), "
                  "' ')))")
    n = F.size(toks)
    return (words.filter(n >= 2)
            .select("cnt",
                    F.slice(toks, F.lit(1), n - 1).alias("_l"),
                    F.slice(toks, F.lit(2), n - 1).alias("_r"))
            .select("cnt", F.explode(F.arrays_zip("_l", "_r")).alias("p"))
            .select(F.col("p._l").alias("left"),
                    F.col("p._r").alias("right"), "cnt")
            .groupBy("left", "right").agg(F.sum("cnt").alias("n")))


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 30) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges; returns them in rank order.
    Stops early when no adjacent pair remains."""
    from etl_mark1_spark.operators.dedup import release_checkpoint

    words = _word_counts(df, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            top = (_adjacent_pairs(words)
                   .orderBy(F.col("n").desc(), "left", "right")
                   .limit(1).collect())
            if not top:
                break
            left, right = top[0]["left"], top[0]["right"]
            merges.append((left, right))
            pattern = f" {left} {right}(?= )"
            nxt = words.withColumn(
                "sym", F.regexp_replace("sym", pattern,
                                        f" {left}{right}")) \
                .localCheckpoint()
            release_checkpoint(words)
            words = nxt
    finally:
        release_checkpoint(words)
    return merges


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]],
                text_col: str = "text",
                out_col: str = "bpe_tokens") -> DataFrame:
    """Segment text under a learned merge list: ``out_col`` holds the
    subword tokens of the whole document (end-of-word markers kept, so
    the segmentation is invertible). Applying the merges is a chain of
    map-side regexp passes over the per-word symbol strings — ranked
    order matters and matches training exactly."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                     lambda w: w != "")
    symized = F.transform(
        words,
        lambda w: F.concat(F.regexp_replace(w, "(.)", "$1 "), F.lit(END)))
    sym = F.concat(F.lit(" "), F.array_join(symized, " "), F.lit(" "))
    for left, right in merges:
        sym = F.regexp_replace(sym, f" {left} {right}(?= )",
                               f" {left}{right}")
    toks = F.filter(F.split(F.trim(sym), " "), lambda x: x != "")
    return df.withColumn(out_col, toks)


def merges_df(spark: SparkSession,
              merges: list[tuple[str, str]]) -> DataFrame:
    """Merge list as a (rank, left, right) DataFrame for cataloging."""
    return spark.createDataFrame(
        [(i, left, right) for i, (left, right) in enumerate(merges)],
        "rank long, left string, right string")


def bpe_decode(df: DataFrame, tokens_col: str = "bpe_tokens",
               out_col: str = "decoded_text") -> DataFrame:
    """Invert :func:`bpe_segment`: concatenate the subword tokens and turn
    each end-of-word marker back into a word boundary. Recovers the
    segmenter's NORMALIZED view of the document (lowercased words joined
    by single spaces — segmentation drops punctuation by design), under
    ANY merge list, trained or not. Pure column expressions, map-side."""
    joined = F.array_join(F.col(tokens_col), "")
    return df.withColumn(
        out_col, F.trim(F.regexp_replace(joined, END, " ")))
