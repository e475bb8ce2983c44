"""Multinomial Naive Bayes text classification as PLAIN AGGREGATIONS.

The classic first-line quality/language filter of large-corpus pipelines
(CCNet-style fastText gates have this exact shape: linear scores over
token counts). Implemented entirely with groupBy/join/sum — no MLlib, no
UDFs, no iteration — which buys three things at 100 TB:

- training is ONE pass over the exploded token stream (two aggregates:
  token x label counts and per-label totals) — decomposable partials,
  map-side combine, no driver state beyond two scalar counts;
- scoring is a broadcast-join of the token stream against the (small)
  word-likelihood table plus one per-(doc, label) aggregation — the
  model never leaves the cluster;
- the arithmetic is exact-integer counts pushed through ``ln`` once per
  term, so an external engine can replay it bit-for-bit modulo float
  summation order — the nb_lang_classifier catalog entry holds the
  whole trained-model-plus-inference path to a DuckDB oracle.

With Laplace smoothing alpha, the per-(doc d, label L) score is::

    ln P(L) + sum_w [ ln(cnt(w, L) + alpha) - ln(alpha) ]   (seen pairs)
            + |d| * [ ln(alpha) - ln(n_tokens(L) + alpha * V) ]

which for alpha = 1 collapses to ``ln prior + sum ln(cnt+1) -
|d| * ln(n_tokens_L + V)`` — the form both engines compute with only
exactly-representable inputs to each ``ln``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _token_stream(df: DataFrame, text_col: str, id_col: str,
                  label_col: str | None = None) -> DataFrame:
    from etl_mark1_spark.functions.text import normalized_text

    cols = [F.col(id_col)] + ([F.col(label_col)] if label_col else [])
    return (df.select(*cols,
                      F.explode(F.split(normalized_text(F.col(text_col)),
                                        " ")).alias("token"))
            .filter(F.col("token") != ""))


def nb_train(df: DataFrame, text_col: str = "text",
             label_col: str = "lang", id_col: str = "doc_id",
             alpha: float = 1.0, min_count: int = 1,
             max_size: int | None = None) -> dict:
    """Train the classifier; returns a model dict of small DataFrames +
    scalars: ``word`` (token, _label, cnt), ``classes`` (_label,
    n_tokens, log_prior), ``vocab`` (distinct-token count), ``alpha``.
    Two scalar count jobs run here (corpus size, vocabulary size) — the
    same bounded-collect class as Bloom auto-sizing.

    ``min_count``/``max_size`` bound the vocabulary with build_vocab's
    discipline (operators/corpus.py:653): tokens whose corpus-wide count
    falls below ``min_count`` are pruned, then the top ``max_size``
    tokens by (count DESC, token ASC) survive — the cap compiles to
    TakeOrderedAndProject, never a global sort. ``nb_score`` BROADCASTS
    the word table, so at web scale the typo/URL long tail must not
    ride into it: set both (e.g. ``min_count=5, max_size=1_000_000``).
    Pruned tokens score exactly like never-seen tokens — the smoothed
    alpha/(n_tokens + alpha*V) unseen mass with V the SURVIVING
    vocabulary — so the defaults (no pruning) reproduce the historical
    model bit-for-bit."""
    toks = _token_stream(df, text_col, id_col, label_col)
    word = (toks.groupBy("token", F.col(label_col).alias("_label"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    if min_count > 1 or max_size is not None:
        totals = (word.groupBy("token")
                  .agg(F.sum("cnt").alias("_tot"))
                  .filter(F.col("_tot") >= min_count))
        if max_size is not None:
            totals = totals.orderBy(F.col("_tot").desc(), "token") \
                .limit(max_size)
        word = word.join(F.broadcast(totals.select("token")), "token")
    n_total = df.count()
    vocab = word.select("token").distinct().count()
    classes = (toks.groupBy(F.col(label_col).alias("_label"))
               .agg(F.count(F.lit(1)).alias("n_tokens"))
               .join(df.groupBy(F.col(label_col).alias("_label"))
                     .agg(F.count(F.lit(1)).alias("n_docs")), "_label")
               .select("_label", "n_tokens",
                       F.log(F.col("n_docs") / F.lit(float(n_total)))
                       .alias("log_prior")))
    return {"word": word, "classes": classes, "vocab": int(vocab),
            "alpha": float(alpha)}


def nb_score(df: DataFrame, model: dict, text_col: str = "text",
             id_col: str = "doc_id",
             round_digits: int = 6) -> DataFrame:
    """Score every document against every class; returns
    (id, _label, score) with score rounded tie-deterministically so a
    cross-engine argmax never flips on float summation order. Documents
    whose normalized text has no tokens are dropped (no evidence)."""
    alpha, v = model["alpha"], model["vocab"]
    toks = _token_stream(df, text_col, id_col)
    dlen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    seen = (toks.join(F.broadcast(model["word"]), "token")
            .groupBy(id_col, "_label")
            .agg(F.sum(F.log(F.col("cnt") + F.lit(alpha))
                       - F.lit(math.log(alpha))).alias("_seen")))
    score = (F.col("log_prior")
             + F.col("_n") * (F.lit(math.log(alpha))
                              - F.log(F.col("n_tokens")
                                      + F.lit(alpha * v)))
             + F.coalesce(F.col("_seen"), F.lit(0.0)))
    rscale = F.lit(float(10 ** round_digits))
    return (dlen.crossJoin(F.broadcast(model["classes"]))
            .join(seen, [id_col, "_label"], "left")
            .select(id_col, "_label",
                    (F.floor(score * rscale + F.lit(0.5)) / rscale)
                    .alias("score")))


def nb_predict(df: DataFrame, model: dict, text_col: str = "text",
               id_col: str = "doc_id",
               out_col: str = "predicted") -> DataFrame:
    """Argmax over the rounded class scores (ties break on label asc —
    deterministic in any engine); returns (id, predicted, margin) with
    margin = best minus runner-up score."""
    scores = nb_score(df, model, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "_label")
    return (scores.withColumn("_rk", F.row_number().over(w))
            .withColumn("_next", F.lead("score").over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col(id_col), F.col("_label").alias(out_col),
                    F.round(F.col("score") - F.col("_next"), 6)
                    .alias("margin")))
