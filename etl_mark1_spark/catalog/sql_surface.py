"""Window first/last, FILTER agg, scalar subquery, explode, union distinct.

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Final surface batch: window first/last, FILTER aggregation, correlated
# scalar subquery, explode/unnest, union distinct
# ---------------------------------------------------------------------------

@query("window_first_last", """
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (t(spark, sf_dir, "events")
            .select("event_id", "user_id",
                    F.first("value").over(w).alias("first_val"),
                    F.last("value").over(w).alias("last_val"),
                    F.nth_value("value", 2).over(w).alias("second_val")))


@query("window_relative_rank", """
    SELECT o_orderkey, o_orderstatus,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(dense_rank() OVER w AS BIGINT) AS drank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
""")
def window_relative_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window battery: percent_rank, cume_dist,
    dense_rank per status ordered by price. One hash shuffle on the
    partition key; ties broken on the key for determinism."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice",
                                                    "o_orderkey")
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus",
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cume"),
                    F.dense_rank().over(w).cast("bigint").alias("drank")))


_FILTERED_AGG_SQL = """
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           count(*) FILTER (WHERE l_quantity >= 25)  AS n_bulk,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
"""


@query("filtered_agg", _FILTERED_AGG_SQL)
def filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER clause — one scan, several conditional aggregates."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _FILTERED_AGG_SQL,
                       sources={"lineitem": t(spark, sf_dir, "lineitem")},
                       limit=None)


_SCALAR_SUBQ_SQL = """
    SELECT c_custkey,
           (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
               AS n_orders
    FROM customer
"""


@query("scalar_subquery", _SCALAR_SUBQ_SQL)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into a join."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _SCALAR_SUBQ_SQL, sources={
        "customer": t(spark, sf_dir, "customer"),
        "orders": t(spark, sf_dir, "orders"),
    }, limit=None)


@query("explode_embeddings", """
    SELECT vec_id, unnest(embedding) AS component
    FROM embeddings WHERE vec_id <= 20
""")
def explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode (UNNEST) — one row per vector component."""
    return (t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") <= 20)
            .select("vec_id", F.explode("embedding").alias("component")))


@query("union_distinct_segments", """
    SELECT c_mktsegment AS segment FROM customer
    UNION
    SELECT o_orderpriority AS segment FROM orders
""")
def union_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dedup in one set operation."""
    c = t(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("segment"))
    o = t(spark, sf_dir, "orders").select(F.col("o_orderpriority").alias("segment"))
    return c.union(o).distinct()


@query("conditional_exprs", """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0.05 THEN 'discounted'
                WHEN l_tax > 0.06 THEN 'taxed'
                ELSE 'plain' END AS bucket,
           greatest(l_discount, l_tax)       AS max_rate,
           least(l_discount, l_tax)          AS min_rate,
           nullif(l_returnflag, 'N')         AS flag_or_null,
           coalesce(nullif(l_returnflag, 'N'), l_linestatus) AS flag_fb
    FROM lineitem
""")
def conditional_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-expression battery: CASE/greatest/least/nullif/coalesce."""
    df = t(spark, sf_dir, "lineitem")
    bucket = (F.when(F.col("l_discount") > 0.05, "discounted")
              .when(F.col("l_tax") > 0.06, "taxed")
              .otherwise("plain"))
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return df.select(
        "l_orderkey", "l_linenumber",
        bucket.alias("bucket"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        flag.alias("flag_or_null"),
        F.coalesce(flag, F.col("l_linestatus")).alias("flag_fb"),
    )


@query("regexp_extract_groups", r"""
    SELECT p_partkey,
           regexp_extract(p_brand, 'Brand#(\d)(\d)', 1) AS brand_major,
           regexp_extract(p_brand, 'Brand#(\d)(\d)', 2) AS brand_minor
    FROM part
""")
def regexp_extract_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group extraction (same group semantics in both engines)."""
    return (t(spark, sf_dir, "part")
            .select("p_partkey",
                    F.regexp_extract("p_brand", r"Brand#(\d)(\d)", 1)
                    .alias("brand_major"),
                    F.regexp_extract("p_brand", r"Brand#(\d)(\d)", 2)
                    .alias("brand_minor")))


