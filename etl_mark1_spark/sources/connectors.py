"""Connector registry — S9-S12/K5-K6 in SURVEY.md §2.1.

The reference registers csv/json/http/mysql connectors with read/write/
test_connection methods (reference: backend/connectors/builtin.py:187-192).
Same registry shape here, but reads return DataFrames instead of temp-file
paths. (The reference's module docstring also claims a postgres connector
that its registry never defines — we register postgres for real via JDBC.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class Connector:
    """Base connector protocol (reference: backend/connectors/base.py)."""

    name = "base"

    def test_connection(self, **params) -> bool:
        return True

    def read(self, spark: SparkSession, **params) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, **params) -> None:
        raise NotImplementedError


class CsvConnector(Connector):
    """csv (builtin.py:26-33): path read/write."""

    name = "csv"
    _format = "csv"

    def read(self, spark: SparkSession, path: str = None, **params) -> DataFrame:
        from etl_mark1_spark.sources.readers import read_file

        return read_file(spark, path, file_format=self._format, **params)

    def write(self, df: DataFrame, path: str = None, **params) -> None:
        from etl_mark1_spark.sources.writers import write_file

        write_file(df, path, file_format=self._format, **params)


class JsonConnector(CsvConnector):
    """json (builtin.py:48-58)."""

    name = "json"
    _format = "json"


class HttpConnector(Connector):
    """http (builtin.py:61-121): driver-side fetch with bearer/api-key auth."""

    name = "http"

    def test_connection(self, url: str = None, **params) -> bool:
        import urllib.request

        try:
            req = urllib.request.Request(url, method="HEAD")
            with urllib.request.urlopen(req, timeout=10):  # noqa: S310
                return True
        except Exception:
            return False

    def read(self, spark: SparkSession, url: str = None, token: str = None,
             api_key: str = None, headers: dict | None = None, **params) -> DataFrame:
        from etl_mark1_spark.sources.readers import read_http

        hdrs = dict(headers or {})
        if token:
            hdrs["Authorization"] = f"Bearer {token}"
        if api_key:
            hdrs["X-API-Key"] = api_key
        return read_http(spark, url, headers=hdrs, **params)


class JdbcConnector(Connector):
    """mysql/postgres (builtin.py:124-183) generalized to any JDBC URL.
    Reads support query pushdown + partitioned parallel scans; writes are
    distributed with bounded connections per executor."""

    name = "jdbc"
    _url_prefix = "jdbc:"

    def read(self, spark: SparkSession, url: str = None, query: str = None,
             table: str = None, **params) -> DataFrame:
        from etl_mark1_spark.sources.readers import read_jdbc

        return read_jdbc(spark, url, query=query, table=table, **params)

    def write(self, df: DataFrame, url: str = None, table: str = None,
              mode: str = "overwrite", **params) -> None:
        from etl_mark1_spark.sources.writers import write_jdbc

        write_jdbc(df, url, table, mode=mode, **params)


class MySqlConnector(JdbcConnector):
    name = "mysql"


class PostgresConnector(JdbcConnector):
    name = "postgres"


_REGISTRY: dict[str, Connector] = {
    c.name: c()
    for c in (CsvConnector, JsonConnector, HttpConnector, JdbcConnector,
              MySqlConnector, PostgresConnector)
}


def get_connector(name: str) -> Connector:
    """Registry lookup (builtin.py:195-200 equivalent)."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown connector type: {name}") from None


def register_connector(connector: Connector) -> None:
    _REGISTRY[connector.name] = connector
