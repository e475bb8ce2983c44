"""Extended SQL surface: TPC-H-shaped joins, JSON, percentiles, pivot.

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

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
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
               AS priorities,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders GROUP BY o_orderstatus
""")
def collect_set_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregation battery: collected distinct values are a SET —
    sort before comparing (collect order is partition-dependent in any
    distributed engine). Final output is the sorted set JOINED to one
    string: array columns violate the output-typing convention
    (catalog/__init__.py — the driver's pandas canonicalizer can't sort
    list cells), and the joined form is the same canonical value."""
    return (t(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.array_join(F.array_sort(F.collect_set("o_orderpriority")),
                              ",").alias("priorities"),
                 F.count_distinct("o_orderpriority").cast("bigint")
                 .alias("n_priorities")))


@query("multi_quantiles_quantity", """
    SELECT l_returnflag,
           round(qarr[1], 6) AS q25,
           round(qarr[2], 6) AS q50,
           round(qarr[3], 6) AS q75
    FROM (SELECT l_returnflag,
                 quantile_cont(l_quantity, [0.25, 0.5, 0.75]) AS qarr
          FROM lineitem GROUP BY l_returnflag)
""")
def multi_quantiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile in one aggregation: exact interpolated quartiles
    computed in a single percentile pass (the array form), then projected
    to three scalar DOUBLE columns — the aggregation stays one-pass while
    the OUTPUT obeys the no-array typing convention
    (catalog/__init__.py)."""
    q = F.percentile("l_quantity",
                     F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(q.alias("qarr"))
            .select("l_returnflag",
                    F.round(F.col("qarr")[0], 6).alias("q25"),
                    F.round(F.col("qarr")[1], 6).alias("q50"),
                    F.round(F.col("qarr")[2], 6).alias("q75")))


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


