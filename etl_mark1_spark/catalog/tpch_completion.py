"""TPC-H shape completion (EXISTS / NOT EXISTS / correlated subqueries).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

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
    SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS part_value
    FROM pv, tot
    WHERE val * 5000 > total
""")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key value HAVING > a fraction of the GLOBAL
    total (a scalar subquery). One aggregation feeds both sides — the
    global total re-aggregates the per-part sums instead of rescanning
    the fact table; the comparison is exact decimal (val*5000 > total)
    so no engine disagrees at the threshold. Only the FINAL rounded
    column is cast to DOUBLE (output-typing convention,
    catalog/__init__.py — wide decimals don't survive the driver's
    canonicalizer; the threshold math above stays exact decimal)."""
    li = t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_vol()).alias("val"))
    tot = pv.agg(F.sum("val").alias("total"))
    return (pv.crossJoin(F.broadcast(tot))
            .filter(F.col("val") * 5000 > F.col("total"))
            .select("l_partkey",
                    F.round("val", 2).cast("double").alias("part_value")))


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
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS totacctbal
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
    the customer key. The final summed balance is rounded then cast to
    DOUBLE (output-typing convention, catalog/__init__.py) — the sum of
    decimal(18,2) widens past precision 18, which the driver's
    canonicalizer hashes engine-dependently."""
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
                 F.round(F.sum(bal), 2).cast("double").alias("totacctbal")))


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


