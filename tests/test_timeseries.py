"""Resample/gap-fill semantics (operators/timeseries.py); cross-engine
value parity is the resample_ffill_events oracle."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_mark1_spark.operators.timeseries import resample_ffill, truncate_ntz


@pytest.fixture()
def events(spark):
    rows = [
        (1, "2024-01-01 10:15:00", 1.0),
        (1, "2024-01-01 10:45:00", 2.0),   # same bucket as above -> sums
        (1, "2024-01-01 13:05:00", 8.0),   # 11:00 and 12:00 are gaps
        (2, "2024-01-01 00:30:00", 5.0),
    ]
    return (spark.createDataFrame(rows, "user_id long, ts string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp_ntz")))


def test_gaps_filled_and_sums_bucketed(events):
    out = {(r.user_id, str(r.bucket)): r.val
           for r in resample_ffill(events).collect()}
    assert out[(1, "2024-01-01 10:00:00")] == 3.0   # 1.0 + 2.0
    assert out[(1, "2024-01-01 11:00:00")] == 3.0   # gap: carried forward
    assert out[(1, "2024-01-01 12:00:00")] == 3.0   # gap: carried forward
    assert out[(1, "2024-01-01 13:00:00")] == 8.0   # real bucket overrides
    assert out[(2, "2024-01-01 00:00:00")] == 5.0   # single-bucket key
    # grid is exactly each key's [min, max] span — no rows outside
    assert len(out) == 4 + 1


def test_empty_input(spark):
    empty = spark.createDataFrame(
        [], "user_id long, ts timestamp_ntz, value double")
    assert resample_ffill(empty).count() == 0


def test_truncate_ntz_is_timezone_proof(spark):
    df = spark.createDataFrame([("2024-06-01 23:59:59",)], "ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/Los_Angeles", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = df.select(truncate_ntz("ts", "hour").alias("b")).first().b
            assert str(got) == "2024-06-01 23:00:00"
            got_d = df.select(truncate_ntz("ts", "day").alias("b")).first().b
            assert str(got_d) == "2024-06-01 00:00:00"
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)

    with pytest.raises(ValueError, match="unit"):
        truncate_ntz("ts", "fortnight")


def test_resample_interpolate_hand_computed(spark):
    """Grid 10:00-14:00 with observations at 10:00 (1.0) and 14:00 (9.0):
    the three gap hours interpolate to 3, 5, 7; a leading-edge-only key
    nearest-fills."""
    import datetime as dt

    from etl_mark1_spark.operators.timeseries import resample_interpolate

    rows = [(1, dt.datetime(2024, 1, 1, 10, 5), 1.0),
            (1, dt.datetime(2024, 1, 1, 14, 20), 9.0),
            (2, dt.datetime(2024, 1, 1, 8, 0), 4.0),
            (2, dt.datetime(2024, 1, 1, 10, 0), 2.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {(r.user_id, r.bucket.hour): r.val
           for r in resample_interpolate(df).collect()}
    assert got[(1, 10)] == 1.0 and got[(1, 14)] == 9.0
    assert got[(1, 11)] == 3.0 and got[(1, 12)] == 5.0 and got[(1, 13)] == 7.0
    # key 2: gap hour 9 interpolates between 8:00 (4.0) and 10:00 (2.0)
    assert got[(2, 9)] == 3.0


def test_seasonal_decompose_recovers_planted_pattern(spark):
    """A pure 'level + periodic pattern' series must decompose into a
    flat trend at the level, seasonal means matching the zero-centered
    pattern, and ~zero residuals; edges carry NULLs. Covers both the odd
    (single centered window) and even (2xMA) trend paths."""
    import datetime as dt

    from etl_mark1_spark.operators.timeseries import seasonal_decompose

    pattern = [4.0, -1.0, -2.0, -1.0]          # mean zero, period 4
    rows = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
             10.0 + pattern[h % 4]) for h in range(48)]
    df = spark.createDataFrame(rows, ["user_id", "bucket", "val"])
    out = seasonal_decompose(df, period=4).collect()
    mid = [r for r in out if r.trend is not None]
    assert len(mid) == 48 - 4                  # 2 edge rows lost each side
    assert all(abs(r.trend - 10.0) < 1e-9 for r in mid)
    for r in mid:
        phase = int((r.bucket - dt.datetime(2024, 1, 1)).total_seconds()
                    // 3600) % 4
        assert abs(r.seasonal - pattern[phase]) < 1e-9
        assert abs(r.resid) < 1e-9
    edges = [r for r in out if r.trend is None]
    assert all(r.seasonal is None and r.resid is None for r in edges)

    pattern5 = [5.0, 0.0, -1.0, -2.0, -2.0]    # mean zero, period 5
    rows5 = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
              20.0 + pattern5[h % 5]) for h in range(50)]
    out5 = seasonal_decompose(
        spark.createDataFrame(rows5, ["user_id", "bucket", "val"]),
        period=5).collect()
    mid5 = [r for r in out5 if r.trend is not None]
    assert len(mid5) == 50 - 4                 # 2 lost each side (half=2)
    assert all(abs(r.trend - 20.0) < 1e-9 and abs(r.resid) < 1e-9
               for r in mid5)


def test_seasonal_decompose_value_scale_keeps_6dp_inputs(spark):
    """The default value_scale=100 quantizes inputs to 2 decimals — exact
    for resample_ffill's sums, lossy for resample_interpolate's
    6-decimal output. With value_scale=10**6 a 6-decimal series must
    reconstruct exactly: value == trend + seasonal + resid on every
    full-window row."""
    import datetime as dt

    from etl_mark1_spark.operators.timeseries import seasonal_decompose

    pattern = [0.123456, -0.041152, -0.041152, -0.041152]  # ~zero mean
    rows = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
             2.5 + pattern[h % 4]) for h in range(48)]
    df = spark.createDataFrame(rows, ["user_id", "bucket", "val"])
    fine = seasonal_decompose(df, period=4, value_scale=10**6).collect()
    mid = [r for r in fine if r.trend is not None]
    assert len(mid) == 48 - 4
    for r in mid:
        assert abs(r.val - (r.trend + r.seasonal + r.resid)) < 2e-6, r
    # the default scale on the same input visibly truncates (documented)
    coarse = seasonal_decompose(df, period=4).collect()
    worst = max(abs(r.val - (r.trend + r.seasonal + r.resid))
                for r in coarse if r.trend is not None)
    assert worst > 2e-6


def test_seasonal_decompose_is_single_branch_no_join(spark, sf_dir):
    """Plan pin (round 8): the seasonal profile is a second window over
    (key, phase) riding the trend window's by-key partitioning — the old
    groupBy + join-back formulation consumed the grid subtree twice and
    Spark re-executed it per consumer (1.6x end-to-end). No join, no
    extra exchange: the by-key hashpartitioning already satisfies the
    (key, phase) clustering."""
    from etl_mark1_spark.operators.timeseries import (resample_ffill,
                                                      seasonal_decompose)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = seasonal_decompose(resample_ffill(ev), period=24) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_resample_window_width_is_pinned_against_aqe_coalescing(spark, sf_dir):
    """Plan pin (round-13-opt): the exchange feeding the lag window (and
    everything after it: the gap explode that multiplies rows ~10x plus
    two more window sorts in the seasonal consumer) is an EXPLICIT
    repartition on the key at defaultParallelism — REPARTITION_BY_NUM,
    which AQE cannot coalesce. Left to ENSURE_REQUIREMENTS, AQE sized
    the exchange on its few-MB INPUT and collapsed the whole dense-grid
    chain to one partition (profiled: a 3.4 s single-task stage at
    sf0.1 while 31 cores idled; isolated A/B 4.0 -> 1.5 s)."""
    from etl_mark1_spark.operators.timeseries import resample_ffill

    import inspect

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = resample_ffill(ev)
    # the expected key comes from the function's own signature and the
    # width from the session (never constants); the plan is walked by
    # node CLASS, not explain-string regexes (ADVICE r13 — rendering
    # drifts across Spark versions)
    key = inspect.signature(resample_ffill).parameters["key_col"].default
    want = max(spark.sparkContext.defaultParallelism,
               int(spark.conf.get("spark.sql.shuffle.partitions")))
    stack = [df._jdf.queryExecution().executedPlan()]
    found = False
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name.startswith("AdaptiveSparkPlan"):
            stack.append(node.initialPlan())
            continue
        if (name.startswith("ShuffleExchange")
                and "REPARTITION_BY_NUM" in node.shuffleOrigin().toString()):
            part = node.outputPartitioning()
            assert part.numPartitions() == want, (part.numPartitions(), want)
            assert key in part.expressions().mkString(","), key
            found = True
        it = node.children().iterator()
        while it.hasNext():
            stack.append(it.next())
    assert found, "no REPARTITION_BY_NUM shuffle exchange in the plan"
