"""Funnel / cohort retention semantics + exact-k weighted sampling."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_mark1_spark.operators.funnel import cohort_retention, funnel_counts


def _ev(uid, etype, hour):
    return (uid, etype, dt.datetime(2024, 3, 4) + dt.timedelta(hours=hour))


def test_funnel_strict_temporal_order(spark):
    """Hand-checkable funnel: out-of-order completions must NOT count —
    a click before the first view contributes nothing, and a purchase
    between view and click (but before the click) doesn't reach stage 3."""
    rows = [
        _ev(1, "view", 0), _ev(1, "click", 1), _ev(1, "purchase", 2),  # full
        _ev(2, "click", 0), _ev(2, "view", 1),   # click precedes view: s1 only
        _ev(3, "view", 0), _ev(3, "purchase", 1),          # skipped click
        _ev(4, "view", 0), _ev(4, "purchase", 1), _ev(4, "click", 2),
        # user 4: purchase BEFORE the click -> stages 1-2 only
        _ev(5, "signup", 0),                               # never enters
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r.step: (r.step_idx, r.n_users) for r in
           funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": (1, 4), "click": (2, 2), "purchase": (3, 1)}


def test_funnel_min_path_maximizes_completion(spark):
    """Min-timestamp semantics: the EARLIEST step-1 time is the anchor,
    so a later redundant view cannot hide an intermediate click."""
    rows = [_ev(1, "view", 0), _ev(1, "click", 1), _ev(1, "view", 5)]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r.step: r.n_users for r in
           funnel_counts(df, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(df, [])


def test_cohort_retention_triangle(spark):
    """Two cohorts, known activity: offset-0 cells equal cohort sizes and
    each later cell counts exactly the returning users."""
    rows = [
        _ev(1, "view", 0), _ev(2, "view", 1),       # cohort week of Mar 4
        _ev(1, "view", 24 * 7), _ev(1, "view", 24 * 7 + 1),  # u1 returns w+1
        _ev(3, "view", 24 * 7),                     # cohort week of Mar 11
        _ev(1, "view", 24 * 21), _ev(3, "view", 24 * 21),    # both at w+3/w+2
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {(str(r.cohort), r.period_offset): r.n_active
           for r in cohort_retention(df).collect()}
    assert got == {
        ("2024-03-04", 0): 2, ("2024-03-04", 1): 1, ("2024-03-04", 3): 1,
        ("2024-03-11", 0): 1, ("2024-03-11", 2): 1,
    }
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="month")


def test_weighted_sample_exact_k_properties(spark):
    """A-ES sampling: exactly k rows, deterministic under repartitioning,
    weight-monotone in expectation (heavier half overrepresented), and
    non-positive weights never selected."""
    from etl_mark1_spark.operators.corpus import weighted_sample_exact_k

    rows = [(i, 1000.0 if i < 100 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = weighted_sample_exact_k(df, F.col("w"), 50)
    ids = sorted(r.doc_id for r in got.collect())
    assert len(ids) == 50
    # determinism across physical layouts
    again = sorted(r.doc_id for r in weighted_sample_exact_k(
        df.repartition(13), F.col("w"), 50).collect())
    assert again == ids
    # 1000:1 weights: the heavy half must dominate the sample
    assert sum(1 for i in ids if i < 100) >= 45
    # zero/negative weights are excluded even when k exceeds the rest
    mixed = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0)], ["doc_id", "w"])
    kept = [r.doc_id for r in
            weighted_sample_exact_k(mixed, F.col("w"), 3).collect()]
    assert kept == [1]
