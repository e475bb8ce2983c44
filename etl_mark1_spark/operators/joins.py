"""Temporal join operators Spark lacks natively.

The reference has no named join operator at all (SURVEY.md §2.3 — joins
arrive only through raw SQL), so these are extension surface: the event-
alignment primitives a training-data pipeline needs.

``asof_join`` is implemented as union + sort + last-non-null window — ONE
shuffle/sort over (keys, time), no range explosion, no per-key quadratic
work. That's the formulation that survives 100 TB: the alternative
(join on key then filter + row_number) materializes every (left, right)
key pair before pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the payload of the nearest
    right row with equal keys — ``direction="backward"`` takes the latest
    right row with ``right_ts <= left_ts`` (DuckDB/pandas ASOF default;
    ties resolve to the right row, matching ``<=``),
    ``direction="forward"`` the earliest right row with
    ``right_ts >= left_ts`` (next-scheduled-event lookups).

    value_cols: right columns to carry (default: all non-key, non-ts).
    tolerance: optional max lookback/lookahead as an INTERVAL string
    (e.g. ``'30 minutes'``) — matches farther than that become NULL.

    Mechanics: tag sides, align schemas, union, then one window pass per
    key ordered by (ts, side) taking the last (backward) or first
    (forward) non-null payload; the side tag orders right rows toward
    the frame at equal timestamps so ties match in both directions.
    Single exchange on the keys; sort is the only extra cost.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    out_cols = [f"{c}{suffix}" for c in value_cols]
    l2 = left
    for c in out_cols:
        l2 = l2.withColumn(c, F.lit(None))
    left_side = 1 if direction == "backward" else 0
    l2 = l2.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(left_side))

    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_side", F.lit(1 - left_side))
    for c in left.columns:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None))

    unioned = l2.unionByName(r2.select(l2.columns))

    if direction == "backward":
        w = (Window.partitionBy(*keys).orderBy("_ts", "_side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        nearest = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (Window.partitionBy(*keys).orderBy("_ts", "_side")
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        nearest = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    right_flag = F.col("_side") == (1 - left_side)
    filled = unioned
    if tolerance is not None:
        # remember the nearest right timestamp; null out stale matches
        filled = filled.withColumn(
            "_rts", nearest(F.when(right_flag, F.col("_ts"))))
    for c in out_cols:
        filled = filled.withColumn(c, nearest(F.col(c)))
    if tolerance is not None:
        if direction == "backward":
            stale = (F.col("_rts")
                     < F.col("_ts") - F.expr(f"INTERVAL {tolerance}"))
        else:
            stale = (F.col("_rts")
                     > F.col("_ts") + F.expr(f"INTERVAL {tolerance}"))
        for c in out_cols:
            filled = filled.withColumn(
                c, F.when(stale | F.col("_rts").isNull(), F.lit(None))
                .otherwise(F.col(c)))
        filled = filled.drop("_rts")

    return filled.filter(F.col("_side") == F.lit(left_side)).drop(
        "_ts", "_side")
