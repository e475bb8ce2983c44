"""LIVE JDBC source/sink tests against embedded Derby (the JDBC driver
Spark itself ships for the Hive metastore — no external service needed).
These de-gate S10/K5 from code-only to executed-against-a-real-database:
the same spark.read/write JDBC code path a MySQL/Postgres deploy uses,
with only the url/driver pair differing (deploy-time config)."""

import pytest
from pyspark.sql import functions as F

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path, name):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_jdbc_write_read_roundtrip(spark, tmp_path):
    """write_jdbc -> read_jdbc round-trips rows, schema, and NULLs; the
    overwrite mode truncates-and-replaces."""
    from etl_mark1_spark.sources.readers import read_jdbc
    from etl_mark1_spark.sources.writers import write_jdbc

    url = _url(tmp_path, "db1")
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None), (3, None, -2.25)],
        ["id", "name", "score"])
    write_jdbc(df, url, "people", driver=DRIVER)
    back = read_jdbc(spark, url, table="people", driver=DRIVER)
    got = {r.id: (r.name, r.score) for r in back.collect()}
    assert got == {1: ("alpha", 1.5), 2: ("beta", None), 3: (None, -2.25)}

    write_jdbc(df.filter(F.col("id") == 1), url, "people",
               mode="overwrite", driver=DRIVER)
    assert read_jdbc(spark, url, table="people", driver=DRIVER).count() == 1


def test_jdbc_query_pushdown_and_append(spark, tmp_path):
    """query= pushes the SQL to the database (aggregation runs DB-side);
    append mode accumulates; partitioned parallel read returns the same
    rows as the single-connection read."""
    from etl_mark1_spark.sources.readers import read_jdbc
    from etl_mark1_spark.sources.writers import write_jdbc

    url = _url(tmp_path, "db2")
    orders = spark.range(100).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 7).cast("int").alias("bucket"),
        (F.col("id") * 1.25).alias("amount"))
    write_jdbc(orders, url, "orders", driver=DRIVER)
    write_jdbc(orders.withColumn("id", F.col("id") + 100), url, "orders",
               mode="append", driver=DRIVER)

    # Spark's JDBC writer quotes COLUMN identifiers (case-sensitive
    # lowercase in Derby) but passes the table name through unquoted, so
    # pushed-down SQL quotes columns and leaves the table bare
    agg = read_jdbc(
        spark, url,
        query='SELECT "bucket", count(*) AS "n" FROM orders '
              'GROUP BY "bucket"',
        driver=DRIVER)
    got = {r.bucket: r.n for r in agg.collect()}
    assert sum(got.values()) == 200 and len(got) == 7

    parallel = read_jdbc(spark, url, table="orders", driver=DRIVER,
                         partitionColumn="id", lowerBound="0",
                         upperBound="200", numPartitions="4")
    assert parallel.rdd.getNumPartitions() == 4
    assert sorted(r.id for r in parallel.collect()) == list(range(200))


def test_jdbc_connector_and_dag_db_insert(spark, tmp_path):
    """The connector registry's JDBC connector and the DAG db_insert
    node run against the live database too (K9 de-gated)."""
    from etl_mark1_spark.plans.dag import PipelineExecutor
    from etl_mark1_spark.sources.readers import read_jdbc

    url = _url(tmp_path, "db3")
    src = str(tmp_path / "in.parquet")
    spark.range(25).select(F.col("id").cast("int").alias("id")).write \
        .parquet(src)
    definition = {
        "nodes": [
            {"id": "in", "type": "file_input",
             "config": {"path": src, "format": "parquet"}},
            {"id": "db", "type": "db_insert",
             "config": {"url": url, "table": "sink_rows",
                        "options": {"driver": DRIVER}}},
        ],
        "edges": [{"source": "in", "target": "db"}],
    }
    report = PipelineExecutor(spark).execute(definition)
    assert report.status == "succeeded", report.node_logs
    back = read_jdbc(spark, url, table="sink_rows", driver=DRIVER)
    assert sorted(r.id for r in back.collect()) == list(range(25))
