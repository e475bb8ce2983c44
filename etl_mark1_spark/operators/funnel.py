"""Behavioral event analytics: ordered funnels and cohort retention.

The reference exposes its events only through raw SQL passthrough
(backend/services/duckdb_engine.py:84-119) — users wanting funnel or
retention numbers hand-write the CTE chains every time. These are the
two canonical event-analytics shapes, as first-class operators:

- :func:`funnel_counts` — how many users completed step 1, then step 2
  AFTER their step 1, then step 3 after that, ... (strict temporal
  ordering per user; min-timestamp semantics at every stage).
- :func:`cohort_retention` — the classic retention triangle: users
  grouped by first-activity period, counted per period offset since.

Scale shape: everything keys on the user id. The funnel is a chain of
(filter -> per-user min aggregate -> equi-join on user) steps — each
stage touches only the event type it matches, every shuffle hashes the
same user key so AQE/exchange reuse keeps stages co-partitioned, and no
window function or per-user array materialization appears (a
sort-events-per-user formulation would carry the full event list through
the shuffle; this carries one timestamp per user per stage). Retention
is two user-keyed aggregates and one join. Both end in metadata-sized
outputs (steps / cohort x offset grid).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Strict-order funnel: a user reaches step i+1 only with an event of
    that type STRICTLY AFTER their (earliest-path) step-i time. Uses
    min-timestamp semantics — the earliest completion of each prefix —
    which maximizes each user's chance to complete later steps (matching
    the standard analytics definition). Returns
    (step_idx, step, n_users) with step_idx 1-based.
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    reached = []  # per step: frame of (user_col, _t) — time step was reached
    prev: DataFrame | None = None
    for step in steps:
        matched = events.filter(F.col(type_col) == step)
        if prev is not None:
            matched = (matched
                       .join(prev.select(user_col, "_t").withColumnRenamed(
                           "_t", "_prev_t"), user_col)
                       .filter(F.col(ts_col) > F.col("_prev_t")))
        cur = matched.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        reached.append(cur)
        prev = cur
    counts = [
        cur.agg(F.lit(i + 1).cast("bigint").alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).cast("bigint").alias("n_users"))
        for i, (step, cur) in enumerate(zip(steps, reached))
    ]
    return reduce(DataFrame.unionAll, counts)


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     period: str = "week") -> DataFrame:
    """Retention triangle: users bucketed by their FIRST activity period
    (the cohort), then counted distinct per (cohort, periods-elapsed)
    cell. Returns (cohort, period_offset, n_active); offset 0 is the
    cohort's own period, so its n_active equals the cohort size.

    ``period`` is any date_trunc unit with a fixed day width ("week" =
    ISO weeks via date_trunc, offset in 7-day steps; "day" likewise) —
    calendar-variable units (month) would need month arithmetic instead
    of the day-diff division.
    """
    days = {"week": 7, "day": 1}
    if period not in days:
        raise ValueError(f"period must be one of {sorted(days)}")
    act = events.select(
        F.col(user_col),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("_p"))
    first = act.groupBy(user_col).agg(F.min("_p").alias("cohort"))
    return (act.join(first, user_col)
            .groupBy("cohort",
                     (F.datediff(F.col("_p"), F.col("cohort"))
                      / days[period]).cast("bigint").alias("period_offset"))
            .agg(F.count_distinct(F.col(user_col)).alias("n_active")))
