"""Windows / rollup / cube (SURVEY.md SS2.4).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Windows / rollup / cube (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

@query("window_topk_orders", """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) ranked WHERE rn <= 3
""")
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 ranking window (the reference's only window) as deterministic
    per-group top-k."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey"))
    return (t(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).cast("long").alias("rn"))
            .filter(F.col("rn") <= 3))


@query("window_running_sum", """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_value
    FROM events
""")
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frame (running sum) — reachable only via raw SQL in
    the reference; first-class here."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (t(spark, sf_dir, "events")
            .select("event_id", "user_id",
                    F.round(F.sum("value").over(w), 4).alias("running_value")))


@query("window_lag_lead", """
    SELECT event_id, user_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (t(spark, sf_dir, "events")
            .select("event_id", "user_id",
                    F.lag("event_type").over(w).alias("prev_type"),
                    F.lead("event_type").over(w).alias("next_type")))


@query("rollup_agg", """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS qty_sum, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
""")
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (t(spark, sf_dir, "lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("qty_sum"),
                 F.count(F.lit(1)).alias("n")))


@query("cube_agg", """
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS price_sum, count(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
""")
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (t(spark, sf_dir, "orders")
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
                 F.count(F.lit(1)).alias("n")))


