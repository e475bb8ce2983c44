"""SQL passthrough: joins / grouping sets (SURVEY.md SS2.3, SS2.7).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# SQL passthrough: joins / grouping sets (SURVEY.md §2.3, §2.7)
# ---------------------------------------------------------------------------

_Q3_SQL = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < '1995-03-15'
      AND l_shipdate  > '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@query("sql_join_q3", _Q3_SQL)
def sql_join_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL passthrough (§2.7) carrying a 3-way join + top-k — the same
    statement runs in both engines. Catalyst broadcasts the filtered
    customer side automatically (AQE)."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q3_SQL, sources={
        name: t(spark, sf_dir, name) for name in ("customer", "orders", "lineitem")
    }, limit=None)


_Q5_SQL = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= '1996-01-01'
      AND o_orderdate <  '1997-01-01'
    GROUP BY n_name
"""


@query("sql_q5_region_revenue", _Q5_SQL)
def sql_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join through the SQL passthrough; dimension tables broadcast."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q5_SQL, sources={
        name: t(spark, sf_dir, name)
        for name in ("customer", "orders", "lineitem", "supplier", "nation",
                     "region")
    }, limit=None)


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@query("grouping_sets", _GROUPING_SETS_SQL)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _GROUPING_SETS_SQL,
                       sources={"lineitem": t(spark, sf_dir, "lineitem")},
                       limit=None)


@query("semi_join_customers", """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS)."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (customer.join(orders, customer.c_custkey == orders.o_custkey,
                          "left_semi")
            .select("c_custkey", "c_name"))


@query("anti_join_customers", """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (customer.join(orders, customer.c_custkey == orders.o_custkey,
                          "left_anti")
            .select("c_custkey", "c_name"))


@query("intersect_nations", """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
""")
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query("except_nations", """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
""")
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


