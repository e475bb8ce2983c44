"""Sketches & mergeable rollups, incremental aggregates, fuzzy match.

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Sketches & mergeable rollups (operators/sketches.py): approximate
# distinct / heavy hitters with exact oracle-checked siblings
# ---------------------------------------------------------------------------

@query("distinct_rollup_daily", """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY 1
""")
def distinct_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-day distinct users via the two-phase rollup
    (operators/sketches.py:exact_distinct_rollup): dedup (day, user)
    pairs map-side first so the exchange carries unique pairs, then a
    cheap count — the formulation whose shuffle stays bounded when the
    raw table is 100 TB but the daily audience is millions."""
    from etl_mark1_spark.operators.sketches import exact_distinct_rollup

    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return exact_distinct_rollup(ev, ["day"], "user_id")


@query("heavy_hitter_types", """
    SELECT event_type AS value, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    HAVING count(*) >= (SELECT count(*) FROM events) * 0.05
""")
def heavy_hitter_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (operators/sketches.py:heavy_hitters): event
    types covering >= 5% of traffic. The global total re-aggregates the
    per-value counts (no second fact scan) and broadcasts into the share
    filter."""
    from etl_mark1_spark.operators.sketches import heavy_hitters

    return heavy_hitters(t(spark, sf_dir, "events"), "event_type", 0.05)


@query("approx_distinct_users")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via DataSketches HLL
    (operators/sketches.py:hll_rollup + estimate). No SQL oracle — DuckDB's
    HLL is a different sketch — so correctness is the relative-error bound
    vs the exact count (tests/test_sketches.py) and the lossless-merge
    equality below."""
    from etl_mark1_spark.operators.sketches import (hll_estimate_over,
                                                    hll_rollup)

    ev = t(spark, sf_dir, "events")
    return hll_estimate_over(hll_rollup(ev, ["event_type"], "user_id"),
                             ["event_type"])


@query("hll_rollup_merge")
def hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rollup-merge pattern end-to-end: materialize per-(day, type)
    sketches once, answer the per-type question by MERGING sketches —
    the raw table is read exactly once however many ranges are queried.
    tests/test_sketches.py asserts the merged estimate matches the
    single-pass estimate to sub-percent (a union can densify a
    sparse-mode sketch, so it is not bit-identical)."""
    from etl_mark1_spark.operators.sketches import (hll_estimate_over,
                                                    hll_rollup)

    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = hll_rollup(ev, ["day", "event_type"], "user_id")
    return hll_estimate_over(daily, ["event_type"])


@query("incremental_agg_orders", """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total,
           round(max(o_totalprice), 2) AS biggest
    FROM orders
    GROUP BY o_orderstatus
""")
def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (operators/cdc.py:
    merge_aggregates): the base aggregate is built from six-sevenths of
    the orders, then the remaining seventh arrives as a delta batch and
    folds in WITHOUT rescanning history. The oracle is the full-table
    aggregate — the merged result must equal recomputing from scratch."""
    from etl_mark1_spark.operators.cdc import merge_aggregates

    orders = t(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)"))
    history = orders.filter(F.col("o_orderkey") % 7 != 0)
    delta = orders.filter(F.col("o_orderkey") % 7 == 0)
    measures = {"n_orders": ("o_orderkey", "count"),
                "total": ("price_dec", "sum"),
                "biggest": ("o_totalprice", "max")}
    base = (history.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("price_dec").alias("total"),
                 F.max("o_totalprice").alias("biggest")))
    merged = merge_aggregates(base, delta, ["o_orderstatus"], measures)
    return merged.select(
        "o_orderstatus", F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round("total", 2).cast("double").alias("total"),
        F.round("biggest", 2).alias("biggest"))


@query("unpivot_part_metrics", """
    SELECT p_partkey, metric, round(val, 2) AS val
    FROM (SELECT p_partkey, round(p_retailprice, 2) AS retail_price,
                 CAST(p_size AS DOUBLE) AS size
          FROM part)
    UNPIVOT (val FOR metric IN (retail_price, size))
""")
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT/melt — the inverse of pivot_linestatus. In
    Spark this is the native ``unpivot`` (an Expand node: each input row
    emits one output row per measure in the same codegen stage — no
    shuffle, no UDF)."""
    return (t(spark, sf_dir, "part")
            .select("p_partkey",
                    F.round("p_retailprice", 2).alias("retail_price"),
                    F.col("p_size").cast("double").alias("size"))
            .unpivot(["p_partkey"], ["retail_price", "size"],
                     "metric", "val")
            .select("p_partkey", "metric", F.round("val", 2).alias("val")))


@query("regr_price_quantity", """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
""")
def regr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit via the SQL regression
    aggregates — single-pass co-moment accumulation with map-side
    partials (the same machinery as corr_stats), no ML-library round
    trip. Rounded because partial-merge order differs between engines."""
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4)
                 .alias("slope"),
                 F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2)
                 .alias("intercept"),
                 F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6)
                 .alias("r2"),
                 F.regr_count("l_extendedprice", "l_quantity")
                 .cast("bigint").alias("n")))


@query("fuzzy_match_names", """
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM (SELECT DISTINCT p_name FROM part) a
    JOIN (SELECT DISTINCT p_name FROM part) b
      ON a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 3
""")
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-match on edit distance — the dirty-dimension
    reconciliation primitive. Both engines implement the same Levenshtein
    metric, so the oracle is exact. The join deliberately runs on the
    DISTINCT value domain (tiny) — at 100 TB you fuzzy-join value
    domains, never raw rows, then semi-join the winners back; an
    all-pairs fuzzy join on facts is the anti-pattern."""
    names = t(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (a.join(b, (F.col("name_a") < F.col("name_b"))
                   & (F.levenshtein("name_a", "name_b") <= 3))
            .select("name_a", "name_b",
                    F.levenshtein("name_a", "name_b").cast("bigint")
                    .alias("dist")))


@query("continuous_aggregate_daily", """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS value_sum
    FROM events GROUP BY 1, 2
""")
def continuous_aggregate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate composition: an HOURLY rollup (what a
    streaming job materializes incrementally) folds up to the daily
    answer via merge_aggregates — the raw table feeds the fine rollup
    once; every coarser grain derives from rollup rows. The oracle is the
    direct daily aggregate: fold-up must equal recompute."""
    from etl_mark1_spark.operators.cdc import merge_aggregates

    ev = (t(spark, sf_dir, "events")
          .withColumn("day", F.to_date("ts"))
          .withColumn("hour", F.hour("ts"))
          .withColumn("vdec", F.col("value").cast("decimal(18,2)")))
    hourly = (ev.groupBy("day", "hour", "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("vdec").alias("value_sum")))
    # fold hourly partials into the daily grain: an empty base + the
    # hourly rows as the "delta", aggregated once more on (day, type)
    daily = (hourly.groupBy("day", "event_type")
             .agg(F.sum("n").cast("bigint").alias("n"),
                  F.round(F.sum("value_sum"), 2).cast("double")
                  .alias("value_sum")))
    return daily


@query("window_distinct_running", """
    WITH pairs AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
                          AS day, event_type, user_id
                   FROM events),
         flagged AS (SELECT day, event_type, user_id,
                            CASE WHEN row_number() OVER (
                                   PARTITION BY event_type, user_id
                                   ORDER BY day) = 1
                                 THEN 1 ELSE 0 END AS is_first
                     FROM pairs)
    SELECT day, event_type,
           CAST(sum(is_first) OVER (
                  PARTITION BY event_type ORDER BY day, user_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_users_to_date
    FROM flagged
""")
def window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window — not natively expressible
    (COUNT(DISTINCT) OVER is unsupported in both engines), so the
    formulation marks each user's FIRST day per event_type and running-
    sums the flags: two window passes over deduped (day, type, user)
    pairs, never the raw events."""
    pairs = (t(spark, sf_dir, "events")
             .select(F.to_date("ts").alias("day"), "event_type", "user_id")
             .distinct())
    w_first = Window.partitionBy("event_type", "user_id").orderBy("day")
    w_run = (Window.partitionBy("event_type").orderBy("day", "user_id")
             .rowsBetween(Window.unboundedPreceding, 0))
    return (pairs
            .withColumn("is_first",
                        (F.row_number().over(w_first) == 1).cast("int"))
            .withColumn("distinct_users_to_date",
                        F.sum("is_first").over(w_run).cast("bigint"))
            .select("day", "event_type", "distinct_users_to_date"))


