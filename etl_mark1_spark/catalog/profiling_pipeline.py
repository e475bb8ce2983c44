"""Profiling / pipeline (SURVEY.md SS2.4 A4-A7, SS2.6).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

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




@query("k_anonymity_customers", """
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000)
                                             AS BIGINT)
    HAVING count(*) < 3
""")
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy release audit (plans/quality.py:k_anonymity_audit,
    Sweeney's k-anonymity): every (nation, market segment, balance
    bucket) quasi-identifier combination shared by fewer than k=3
    customers — the groups a public-data join re-identifies. One hash
    aggregate shuffling only the quasi-identifier columns with
    map-side partials; the under-k output is small by construction, so
    the audit of a 100 TB table emits KBs. An empty result certifies
    the release at that k."""
    from etl_mark1_spark.plans.quality import k_anonymity_audit

    cust = t(spark, sf_dir, "customer").withColumn(
        "bal_bucket",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint"))
    return k_anonymity_audit(
        cust.select("c_nationkey", "c_mktsegment", "bal_bucket"),
        ["c_nationkey", "c_mktsegment", "bal_bucket"], k=3)
