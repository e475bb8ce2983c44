"""Flagship + step-DSL operators (SURVEY.md SS2.2/SS2.4).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.operators.steps import apply_steps

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


