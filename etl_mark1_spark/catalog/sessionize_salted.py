"""Sessionization (batch), salted aggregation, corpus stats.

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Sessionization (batch), salted aggregation, corpus stats
# ---------------------------------------------------------------------------

_SESSIONIZE_SQL = """
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, event_id, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM numbered
    GROUP BY user_id, session_seq
"""


@query("sessionize_batch", _SESSIONIZE_SQL)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: the window-function formulation of
    the streaming sessionizer (streaming/events.py:sessionize) — lag to flag
    session starts, running sum to number them, group to aggregate. One
    shuffle/sort per window + one aggregation."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _SESSIONIZE_SQL,
                       sources={"events": t(spark, sf_dir, "events")},
                       limit=None)


@query("salted_aggregate_lineitem", """
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS l_quantity_sum,
           count(l_orderkey)         AS l_orderkey_count,
           max(l_extendedprice)      AS l_extendedprice_max
    FROM lineitem GROUP BY l_returnflag
""")
def salted_aggregate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py) — identical results
    to a plain groupBy, verified by the oracle; the salt only reshapes the
    shuffle for skewed key distributions."""
    from etl_mark1_spark.operators.skew import salted_aggregate

    out = salted_aggregate(
        t(spark, sf_dir, "lineitem"), ["l_returnflag"],
        {"l_quantity": "sum", "l_orderkey": "count", "l_extendedprice": "max"})
    return out.select(
        "l_returnflag",
        F.round("l_quantity_sum", 2).alias("l_quantity_sum"),
        "l_orderkey_count", "l_extendedprice_max")


@query("corpus_stats", r"""
    SELECT count(*) AS n_docs,
           count(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))
               AS n_unique,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           lang, source
    FROM documents
    GROUP BY lang, source
""")
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus summary per (lang, source): doc count, exact-dup-free
    count via content fingerprint, total characters."""
    from etl_mark1_spark.functions.text import fingerprint_md5

    return (t(spark, sf_dir, "documents")
            .groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct(fingerprint_md5("text")).alias("n_unique"),
                 F.sum("n_chars").cast("long").alias("total_chars"))
            .select("n_docs", "n_unique", "total_chars", "lang", "source"))


