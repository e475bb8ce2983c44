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
    2. explode each key's [min, max] bucket span into a complete sequence
       (gap buckets appear with NULL);
    3. forward-fill with last-non-null over an unbounded-preceding window.

    Returns (key, bucket, val) sorted nowhere — order is the consumer's
    business. Empty input yields an empty frame.
    """
    bucket = truncate_ntz(ts_col, unit).alias("bucket")
    actual = (df.groupBy(key_col, bucket)
              .agg(F.round(F.sum(value_col), round_digits).alias("_actual")))
    bounds = actual.groupBy(key_col).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
                  ).alias("bucket"))
    w = (Window.partitionBy(key_col).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(actual, [key_col, "bucket"], "left")
            .select(key_col, "bucket",
                    F.last("_actual", ignorenulls=True).over(w).alias("val")))


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
    grid ``step``); leading/trailing edges fall back to nearest-value
    (back-/forward-fill). Same shape at scale as the ffill variant — grid
    size bounded by span/step per key, two frames over one per-key window
    ordering instead of one — everything partitions by key.
    """
    bucket = truncate_ntz(ts_col, unit).alias("bucket")
    actual = (df.groupBy(key_col, bucket)
              .agg(F.round(F.sum(value_col), 2).alias("_actual")))
    bounds = actual.groupBy(key_col).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
                  ).alias("bucket"))
    back = (Window.partitionBy(key_col).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fwd = (Window.partitionBy(key_col).orderBy("bucket")
           .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_bucket = F.when(F.col("_actual").isNotNull(), F.col("bucket"))
    joined = (grid.join(actual, [key_col, "bucket"], "left")
              .select(key_col, "bucket", "_actual",
                      F.last("_actual", ignorenulls=True).over(back)
                      .alias("_pv"),
                      F.last(obs_bucket, ignorenulls=True).over(back)
                      .alias("_pb"),
                      F.first("_actual", ignorenulls=True).over(fwd)
                      .alias("_nv"),
                      F.first(obs_bucket, ignorenulls=True).over(fwd)
                      .alias("_nb")))
    frac = (F.expr("timestampdiff(SECOND, _pb, bucket)")
            / F.expr("timestampdiff(SECOND, _pb, _nb)"))
    val = (F.when(F.col("_actual").isNotNull(), F.col("_actual"))
           .when(F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
                 F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac)
           .otherwise(F.coalesce("_pv", "_nv")))
    # interpolating 2-decimal sums by dyadic fractions (1/2, 1/4, ...)
    # lands on exact representable halves constantly, where engines split
    # (Spark rounds half-up, DuckDB half-even) — so round tie-DETERMINISTIC:
    # floor(v * 10^d + 0.5) is the same IEEE arithmetic everywhere
    scale = F.lit(float(10 ** round_digits))
    return joined.select(key_col, "bucket",
                         (F.floor(val * scale + F.lit(0.5)) / scale)
                         .alias("val"))
