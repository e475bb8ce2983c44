"""Trained quality classifier: fastText-style document quality scoring as
logistic regression over cheap surface features.

Extension family — the classifier-filtering step of web-corpus curation
(GPT-3/LLaMA-style "looks like reference text" scoring) between the
rule-based Gopher gate (functions/text.py:gopher_quality_flags) and
dedup. The division of labor is deliberately Spark-shaped:

- TRAINING is the small problem (a labeled sample, thousands-to-millions
  of rows): pyspark.ml LogisticRegression, coefficients extracted
  immediately.
- INFERENCE is the 100 TB problem: :func:`quality_score_expr` compiles
  the fitted model into a PURE COLUMN EXPRESSION — sigmoid of a dot
  product over the feature expressions — so scoring runs inside
  whole-stage codegen at scan speed, with no MLlib model object, no
  Python, and no pipeline stage at all on the big read path.

Features are the portable surface battery already oracle-proven
elsewhere (length, token count, punctuation ratio, multilingual stopword
ratio, mean word length) — every one expressible identically in any SQL
engine, which is what makes the scoring entry oracle-exact.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_mark1_spark.functions.text import (
    punct_count,
    stopword_hits,
    whitespace_token_count,
)

__all__ = ["QUALITY_FEATURES", "quality_features",
           "train_quality_classifier", "quality_score_expr"]

#: Fixed feature order — training and the compiled expression must agree.
QUALITY_FEATURES = ("log_chars", "punct_ratio", "stop_ratio",
                    "mean_word_len")


def quality_features(col: Column | str) -> dict[str, Column]:
    """The feature battery as column expressions (deterministic per-row
    double arithmetic in a fixed order — reproducible in plain SQL)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tokens = whitespace_token_count(c).cast("double")
    n_punct = punct_count(c).cast("double")
    n_stop = (stopword_hits(c, "en") + stopword_hits(c, "de")
              + stopword_hits(c, "fr") + stopword_hits(c, "es")) \
        .cast("double")
    return {
        "log_chars": F.log(n_chars + F.lit(1.0)),
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1.0)),
        "stop_ratio": n_stop / F.greatest(n_tokens, F.lit(1.0)),
        "mean_word_len": n_chars / F.greatest(n_tokens, F.lit(1.0)),
    }


def train_quality_classifier(labeled: DataFrame, text_col: str = "text",
                             label_col: str = "label",
                             max_iter: int = 100,
                             reg_param: float = 0.0) -> dict:
    """Fit logistic regression on a labeled sample and return the model
    as plain numbers: ``{"intercept": b, "coefficients": {feature: w}}``
    — everything :func:`quality_score_expr` needs, nothing a 1000-executor
    scoring job has to deserialize."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(text_col)
    rows = labeled.select(
        F.col(label_col).cast("double").alias("label"),
        *[feats[name].alias(name) for name in QUALITY_FEATURES])
    assembled = VectorAssembler(inputCols=list(QUALITY_FEATURES),
                                outputCol="features").transform(rows)
    model = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                               standardization=False).fit(assembled)
    coefs = {name: float(w) for name, w in
             zip(QUALITY_FEATURES, model.coefficients)}
    return {"intercept": float(model.intercept), "coefficients": coefs}


def quality_score_expr(model: dict, col: Column | str,
                       precision: int | None = 6) -> Column:
    """Compile a trained (or hand-specified) model into the scoring
    column: ``sigmoid(intercept + w · features)``. ``precision`` rounds
    the final probability (different libms disagree in exp()'s last ulp;
    6 digits is far beyond any curation threshold's sensitivity) — pass
    None for the raw double."""
    feats = quality_features(col)
    z = F.lit(float(model["intercept"]))
    for name in QUALITY_FEATURES:
        w = float(model["coefficients"].get(name, 0.0))
        if w != 0.0:
            z = z + F.lit(w) * feats[name]
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return F.round(score, precision) if precision is not None else score


def sigmoid(x: float) -> float:
    """Driver-side reference sigmoid for tests/thresholds."""
    return 1.0 / (1.0 + math.exp(-x))
