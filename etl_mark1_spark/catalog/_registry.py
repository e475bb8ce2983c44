"""Registration machinery for the query catalog.

``QUERIES``/``ORACLE`` are filled by the per-family modules as they are
imported (in a fixed order) by ``catalog/__init__.py``, which then moves the
``DRIVER_PREFIX`` entries to the front — registration order is a load-bearing
contract (the external driver's CORRECTNESS snapshot checks the first 50).

Determinism rules that make the order-insensitive value-hash comparison
against the DuckDB oracles meaningful:

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

from pyspark.sql import DataFrame, SparkSession

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
