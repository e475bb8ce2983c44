"""Time-series resampling: regular grids and gap filling over event data.

The reference has no time-series operators (its events never leave raw
SQL); these cover the standard prep steps for metrics/feature pipelines:
bucket to a regular grid, materialize missing buckets, forward-fill.

Scale shape: one aggregation (map-side partials) to bucket actuals, a
per-key sequence+explode to build the grid (grid size is bounded by
span/step per key, never by raw event count), one equi-join back, and one
window for the fill — all partitioned by key, so keys resample in
parallel. Timezone-proof bucketing via make_timestamp_ntz (F.date_trunc
would coerce NTZ through the session timezone and shift wall times).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: per-bucket aggregation precision (the 2-decimal money contract every
#: resample oracle replays); OUTPUT precision is each function's
#: ``round_digits`` — see the note in resample_interpolate.
_AGG_SUM_DIGITS = 2


def _spread_by_key(df: DataFrame, key_col: str) -> DataFrame:
    """Explicit hash repartition on ``key_col`` at the cluster's default
    parallelism — the exchange the downstream per-key window REQUIRES
    anyway, pinned to a width AQE cannot coalesce away.

    Why (round-13-opt, guide §2): the observed-buckets frame is a few
    compressed MB after aggregation, so AQE's partition coalescing
    (sized on the exchange's INPUT bytes) collapses it to ONE partition
    — and everything downstream (the gap explode that multiplies rows
    ~10x and two more window sorts over the dense grid) then runs on a
    single core while the rest idle (profiled at sf0.1: one 3.4 s
    single-task stage). AQE is blind to the explode behind the shuffle;
    the operator is not. The partition count derives from
    ``defaultParallelism`` (cores locally, cluster width on a real
    deployment), never a constant, and the frame being spread is the
    post-aggregation observed series (keys x observed buckets), far
    smaller than raw events, so default parallelism is a sane width at
    any scale.

    Round-14 (ADVICE r13): the width is max(defaultParallelism,
    spark.sql.shuffle.partitions) — under dynamic allocation,
    defaultParallelism at plan-build time reflects only the executors
    registered so far (possibly very few at job start), and
    REPARTITION_BY_NUM opts this exchange out of AQE coalescing AND
    skew handling, so a cold cluster must not get permanently pinned
    narrow; shuffle.partitions is the operator-agnostic width the rest
    of the job plans with."""
    spark = df.sparkSession
    target = max(spark.sparkContext.defaultParallelism,
                 int(spark.conf.get("spark.sql.shuffle.partitions", "200")))
    return df.repartition(target, key_col)

_TRUNC_FIELDS = {
    "hour": lambda c: (F.year(c), F.month(c), F.dayofmonth(c), F.hour(c),
                       F.lit(0), F.lit(0)),
    "day": lambda c: (F.year(c), F.month(c), F.dayofmonth(c), F.lit(0),
                      F.lit(0), F.lit(0)),
}


def truncate_ntz(ts_col: Column | str, unit: str) -> Column:
    """Wall-clock truncation of a TIMESTAMP_NTZ column, independent of the
    session timezone."""
    if unit not in _TRUNC_FIELDS:
        raise ValueError(f"unit must be one of {sorted(_TRUNC_FIELDS)}")
    return F.make_timestamp_ntz(*_TRUNC_FIELDS[unit](F.col(ts_col)
                                if isinstance(ts_col, str) else ts_col))


def resample_ffill(df: DataFrame, unit: str = "hour",
                   step: str = "1 hour", key_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value",
                   round_digits: int = 2) -> DataFrame:
    """Per-key regular time grid with forward-filled values.

    1. bucket actual events to the grid unit, sum ``value_col`` per bucket;
    2. ONE lag window over the observed rows pairs each observation with
       its predecessor;
    3. a narrow explode of ``sequence(prev + step, cur)`` generates the
       gap buckets directly, each carrying the predecessor's value (the
       forward fill), with the first observation per key emitted alone.

    Same result as the classical grid-then-window formulation (the grid
    ``[lo, hi]`` is exactly {first obs} ∪ ⋃ (prev, cur] spans, and grid
    endpoints are always observed), but the window pass touches only
    OBSERVED rows, not the dense grid, and the grid/actual join — two
    extra shuffles at 100 TB — disappears entirely: after the one
    aggregation shuffle everything is a narrow map/explode. Rewritten
    round 7; measured 27.6 s -> (see BENCH notes) on the interpolate
    sibling's composite entry at sf0.1.

    Returns (key, bucket, val) sorted nowhere — order is the consumer's
    business. Empty input yields an empty frame.
    """
    bucket = truncate_ntz(ts_col, unit).alias("bucket")
    actual = _spread_by_key(
        df.groupBy(key_col, bucket)
        .agg(F.round(F.sum(value_col), round_digits).alias("_v")), key_col)
    w = Window.partitionBy(key_col).orderBy("bucket")
    step_iv = F.expr(f"interval {step}")
    lagged = actual.select(
        key_col, F.col("bucket").alias("_cb"), "_v",
        F.lag("bucket").over(w).alias("_pb"),
        F.lag("_v").over(w).alias("_pv"))
    exploded = lagged.select(
        key_col, "_cb", "_v", "_pv",
        F.explode(
            F.when(F.col("_pb").isNull(), F.array(F.col("_cb")))
            .otherwise(F.sequence(F.col("_pb") + step_iv, F.col("_cb"),
                                  step_iv))).alias("bucket"))
    val = F.when(F.col("bucket") == F.col("_cb"), F.col("_v")) \
        .otherwise(F.col("_pv"))
    return exploded.select(key_col, "bucket", val.alias("val"))


def resample_interpolate(df: DataFrame, unit: str = "hour",
                         step: str = "1 hour", key_col: str = "user_id",
                         ts_col: str = "ts", value_col: str = "value",
                         round_digits: int = 6) -> DataFrame:
    """Per-key regular time grid with LINEAR interpolation across gaps —
    the smooth sibling of :func:`resample_ffill` for continuous signals
    (sensor readings, account balances) where a step function misstates
    the between-sample trajectory.

    Gap buckets get ``prev + (next - prev) * elapsed/gap`` between their
    nearest observed neighbors (time-weighted, so it is correct for any
    grid ``step``). Like :func:`resample_ffill` (rewritten round 7), the
    dense grid is never materialized through a join: one lag window over
    the OBSERVED rows pairs neighbors, then a narrow explode of
    ``sequence(prev + step, cur)`` emits each gap bucket already knowing
    both interpolation endpoints. The grid's edges are always observed
    buckets (lo/hi are min/max of observations), so the old back-/
    forward-fill edge fallback only ever fired for single-observation
    keys — which the first-row branch emits directly. Arithmetic is
    bit-identical to the two-window formulation: same frac, same
    endpoint short-circuit (IEEE ``pv + (nv-pv)*1.0`` need not equal
    ``nv``), same tie-deterministic rounding.

    At scale: one aggregation shuffle, a window over observed rows only,
    then map-side explode — no grid join, no unbounded frames over the
    dense series.
    """
    bucket = truncate_ntz(ts_col, unit).alias("bucket")
    # NB the per-bucket SUM is rounded to _AGG_SUM_DIGITS (2, the money
    # contract shared with resample_ffill and the SQL oracles), NOT to
    # ``round_digits`` — round_digits controls only the precision of the
    # INTERPOLATED output values (ADVICE r13: documented as intentional;
    # widening the sum would change every oracle-pinned result).
    actual = _spread_by_key(
        df.groupBy(key_col, bucket)
        .agg(F.round(F.sum(value_col), _AGG_SUM_DIGITS).alias("_v")),
        key_col)
    w = Window.partitionBy(key_col).orderBy("bucket")
    step_iv = F.expr(f"interval {step}")
    lagged = actual.select(
        key_col, F.col("bucket").alias("_cb"), "_v",
        F.lag("bucket").over(w).alias("_pb"),
        F.lag("_v").over(w).alias("_pv"))
    exploded = lagged.select(
        key_col, "_cb", "_v", "_pb", "_pv",
        F.explode(
            F.when(F.col("_pb").isNull(), F.array(F.col("_cb")))
            .otherwise(F.sequence(F.col("_pb") + step_iv, F.col("_cb"),
                                  step_iv))).alias("bucket"))
    frac = (F.expr("timestampdiff(SECOND, _pb, bucket)")
            / F.expr("timestampdiff(SECOND, _pb, _cb)"))
    val = (F.when(F.col("bucket") == F.col("_cb"), F.col("_v"))
           .otherwise(F.col("_pv") + (F.col("_v") - F.col("_pv")) * frac))
    # interpolating 2-decimal sums by dyadic fractions (1/2, 1/4, ...)
    # lands on exact representable halves constantly, where engines split
    # (Spark rounds half-up, DuckDB half-even) — so round tie-DETERMINISTIC:
    # floor(v * 10^d + 0.5) is the same IEEE arithmetic everywhere
    scale = F.lit(float(10 ** round_digits))
    return exploded.select(key_col, "bucket",
                           (F.floor(val * scale + F.lit(0.5)) / scale)
                           .alias("val"))


def seasonal_decompose(df: DataFrame, period: int = 24,
                       key_col: str = "user_id", ts_col: str = "bucket",
                       value_col: str = "val",
                       round_digits: int = 6,
                       value_scale: int = 100) -> DataFrame:
    """Classical additive decomposition of a REGULAR series (run
    :func:`resample_ffill` / :func:`resample_interpolate` first):
    ``value = trend + seasonal + resid`` with a centered moving-average
    trend (odd periods: one centered window; even periods: the classical
    2 x MA, two off-center windows averaged so end rows get half
    weight), per-phase seasonal means of the detrended values, and the
    leftover residual — the anomaly-detection prep that separates "3am
    is always quiet" from "this 3am is wrong".

    Edge rows whose centered window is incomplete carry NULL trend (and
    NULL seasonal/resid) rather than a biased partial average. Shape at
    scale: one per-key window pass for the trend, a (key x period)-sized
    aggregate for the seasonal profile joined back on (key, phase) —
    keys decompose in parallel, nothing global.

    Cross-engine determinism: frame AVERAGES of a 2-decimal series land
    on exact decimal rounding boundaries by construction (denominators
    divide the quantum), and engines accumulate frames in different
    orders (DuckDB's windowed sums use segment trees), so two
    1e-13-apart doubles straddle the boundary and round() diverges. The
    windows therefore SUM exact scaled integers (value*100 as BIGINT) —
    identical in any engine — and every double derives from those
    integers by one literal division, making the pre-rounding doubles
    bit-identical before tie-deterministic rounding applies.

    ``value_scale`` is that integer quantum: inputs are treated as exact
    multiples of ``1/value_scale``, so values carrying MORE precision
    than the scale are truncated before decomposition and
    trend+seasonal+resid reconstructs the quantized series, not the
    input. The default 100 matches :func:`resample_ffill`'s 2-decimal
    sums; :func:`resample_interpolate` emits 6 decimals — pass
    ``value_scale=10**6`` for lossless decomposition of its output.
    """
    half = period // 2
    scale_den = float((period if period % 2 else 2 * period) * value_scale)
    phase = F.pmod(
        (F.unix_timestamp(F.col(ts_col).cast("timestamp"))
         / 3600).cast("bigint"), F.lit(period)).alias("_phase")
    iv = F.round(F.col(value_col) * value_scale).cast("bigint")
    base = df.select(key_col, ts_col, value_col, phase, iv.alias("_iv"))
    if period % 2:
        w = (Window.partitionBy(key_col).orderBy(ts_col)
             .rowsBetween(-half, half))
        full = F.count("_iv").over(w) == period
        ssum = F.sum("_iv").over(w)
        mult = period
    else:
        w1 = (Window.partitionBy(key_col).orderBy(ts_col)
              .rowsBetween(-half, half - 1))
        w2 = (Window.partitionBy(key_col).orderBy(ts_col)
              .rowsBetween(-half + 1, half))
        full = (F.count("_iv").over(w1) == period) \
            & (F.count("_iv").over(w2) == period)
        ssum = F.sum("_iv").over(w1) + F.sum("_iv").over(w2)
        mult = 2 * period
    with_trend = base.select(
        key_col, ts_col, value_col, "_phase", "_iv",
        F.when(full, ssum).alias("_ts"),
        F.when(full, F.col("_iv") * mult - ssum).alias("_det"))
    # Per-phase seasonal means as a SECOND WINDOW over (key, phase) rather
    # than a groupBy + join back (round 8): the join formulation consumed
    # ``with_trend`` twice, and Spark re-executed the whole grid+trend
    # subtree for each consumer (no exchange reuse across the two
    # branches — measured 1.6x end-to-end). The trend window's
    # hashpartitioning(key) already SATISFIES the (key, phase) clustering
    # (a partitioning on a subset of the keys co-locates every group), so
    # this adds only an in-partition sort — no exchange, no recompute.
    # sum/count of the same BIGINT _det values: engine-exact, identical
    # output (the NULL-det rows are excluded by count/sum semantics just
    # as the filter did).
    wp = Window.partitionBy(key_col, "_phase")
    out = with_trend.withColumn("_gs", F.sum("_det").over(wp)) \
                    .withColumn("_gn", F.count("_det").over(wp))
    rscale = F.lit(float(10 ** round_digits))

    def rnd(c):
        return F.floor(c * rscale + F.lit(0.5)) / rscale

    trend_d = F.col("_ts") / F.lit(scale_den)
    seasonal_d = F.col("_gs") / F.col("_gn") / F.lit(scale_den)
    resid_d = F.col("_det") / F.lit(scale_den) - seasonal_d
    return out.select(
        key_col, ts_col, F.col(value_col),
        rnd(trend_d).alias("trend"),
        F.when(F.col("_ts").isNotNull(),
               rnd(seasonal_d)).alias("seasonal"),
        F.when(F.col("_ts").isNotNull(),
               rnd(resid_d)).alias("resid"))
