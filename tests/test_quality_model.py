"""Trained quality classifier (operators/quality_model.py)."""

from pyspark.sql import functions as F

from etl_mark1_spark.operators.quality_model import (
    QUALITY_FEATURES,
    quality_score_expr,
    sigmoid,
    train_quality_classifier,
)


def _labeled_corpus(spark):
    """Separable planted labels: prose-like positives (stopword-rich,
    punctuation-light) vs junk negatives (symbol soup)."""
    good = [(i, 1, ("the quick brown fox and the lazy dog ran to the "
                    "river for water and rest in the shade of a tree "
                    f"episode {i} of the long calm story"))
            for i in range(40)]
    bad = [(100 + i, 0, ("$$$ !!! ### " * 6 + f"@@@{i}%%%&&&*** ((()))"
                         " ~~~^^^ ||| ;;; :::"))
           for i in range(40)]
    return spark.createDataFrame(good + bad,
                                 "doc_id bigint, label int, text string")


def test_training_separates_planted_labels(spark):
    labeled = _labeled_corpus(spark)
    model = train_quality_classifier(labeled)
    assert set(model["coefficients"]) == set(QUALITY_FEATURES)
    scored = labeled.select(
        "label", quality_score_expr(model, "text").alias("p"))
    rows = scored.collect()
    pos = [r.p for r in rows if r.label == 1]
    neg = [r.p for r in rows if r.label == 0]
    assert min(pos) > max(neg)  # fully separable by construction


def test_compiled_expression_matches_mllib_probabilities(spark):
    """The codegen scoring path must reproduce MLlib's own transform()
    probabilities — the proof the compilation is faithful."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from etl_mark1_spark.operators.quality_model import quality_features

    labeled = _labeled_corpus(spark)
    model = train_quality_classifier(labeled)

    feats = quality_features("text")
    rows = labeled.select(
        "doc_id", F.col("label").cast("double").alias("label"),
        *[feats[n].alias(n) for n in QUALITY_FEATURES])
    assembled = VectorAssembler(inputCols=list(QUALITY_FEATURES),
                                outputCol="features").transform(rows)
    lr = LogisticRegression(maxIter=100, regParam=0.0,
                            standardization=False).fit(assembled)
    # predictProbability driver-side: transform() would ship the model in
    # a task closure, and LogisticRegressionModel.trainingSummary is not
    # java-serializable under every conf the suite runs with
    mllib = {r.doc_id: float(lr.predictProbability(r.features)[1])
             for r in assembled.select("doc_id", "features").collect()}

    ours = {r.doc_id: r.p for r in labeled.select(
        "doc_id",
        quality_score_expr({"intercept": lr.intercept,
                            "coefficients": dict(zip(QUALITY_FEATURES,
                                                     lr.coefficients))},
                           "text", precision=None).alias("p")).collect()}
    for k in mllib:
        assert abs(mllib[k] - ours[k]) < 1e-9, (k, mllib[k], ours[k])


def test_score_expr_is_codegen_no_python(spark):
    df = spark.createDataFrame([(1, "some text")],
                               "doc_id bigint, text string")
    model = {"intercept": 0.1,
             "coefficients": {n: 0.5 for n in QUALITY_FEATURES}}
    plan = df.select(quality_score_expr(model, "text").alias("p")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_hand_model_matches_reference_sigmoid(spark):
    import math

    df = spark.createDataFrame([(1, "aaaa")], "doc_id bigint, text string")
    model = {"intercept": -1.0, "coefficients": {"log_chars": 2.0}}
    got = df.select(quality_score_expr(model, "text", precision=None)
                    .alias("p")).first().p
    want = sigmoid(-1.0 + 2.0 * math.log(5.0))
    assert abs(got - want) < 1e-12
