"""Temporal joins (as-of / range; DuckDB ASOF JOIN oracles).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Temporal joins (extension; oracle uses DuckDB's native ASOF JOIN)
# ---------------------------------------------------------------------------

@query("asof_last_error", """
    SELECT e.event_id, e.user_id,
           r.event_id AS err_event_id_asof,
           r.value    AS err_value_asof
    FROM events e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON e.user_id = r.user_id AND e.ts >= r.ts
""")
def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event annotated with the user's most recent
    'error' event at-or-before it. Spark side is the union+window
    formulation (operators/joins.py); oracle is DuckDB's native ASOF JOIN —
    agreeing results validate the custom operator end-to-end."""
    from etl_mark1_spark.operators.joins import asof_join

    events = t(spark, sf_dir, "events")
    errors = events.filter("event_type = 'error'").select(
        "user_id", "ts", F.col("event_id").alias("err_event_id"),
        F.col("value").alias("err_value"))
    joined = asof_join(events, errors, on="user_id",
                       value_cols=["err_event_id", "err_value"])
    return joined.select("event_id", "user_id",
                         F.col("err_event_id_asof"),
                         F.col("err_value_asof"))


@query("asof_next_error", """
    SELECT e.event_id, e.user_id,
           r.event_id AS err_event_id_asof,
           r.value    AS err_value_asof
    FROM events e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON e.user_id = r.user_id AND e.ts <= r.ts
""")
def asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each event annotated with the user's next
    'error' event at-or-after it (time-to-failure lookups) — the mirrored
    direction of asof_last_error, same union+window formulation with a
    following frame (operators/joins.py:asof_join direction='forward');
    oracle is DuckDB's native forward ASOF."""
    from etl_mark1_spark.operators.joins import asof_join

    events = t(spark, sf_dir, "events")
    errors = events.filter("event_type = 'error'").select(
        "user_id", "ts", F.col("event_id").alias("err_event_id"),
        F.col("value").alias("err_value"))
    joined = asof_join(events, errors, on="user_id",
                       value_cols=["err_event_id", "err_value"],
                       direction="forward")
    return joined.select("event_id", "user_id",
                         F.col("err_event_id_asof"),
                         F.col("err_value_asof"))


_RANGE_JOIN_SQL = """
    SELECT o_orderkey, count(*) AS n_shipped_30d
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
                 AND l_shipdate >= o_orderdate
                 AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderkey
"""


@query("range_join_shipments", _RANGE_JOIN_SQL)
def range_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a range predicate (interval arithmetic shared across
    dialects): lineitems shipped within 30 days of their order."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _RANGE_JOIN_SQL, sources={
        "orders": t(spark, sf_dir, "orders"),
        "lineitem": t(spark, sf_dir, "lineitem"),
    }, limit=None)


