"""etl_mark1_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL platform (shonejj/etl-mark1, surveyed in SURVEY.md), re-expressed
Spark-first: DataFrames as the unit of data (file-as-table), lazy logical-plan
composition instead of stacked views, Catalyst/AQE for optimization, and
distributed writes for sinks.

Layout
------
- ``session``    : SparkSession factory tuned for local + cluster use
- ``dtypes``     : DuckDB <-> Spark type-name alias map
- ``operators``  : step-DSL operators, dedup family, similarity search,
                   multimodal column plumbing
- ``sources``    : readers (csv/json/parquet/xlsx/xml), writers, connectors,
                   export adapters
- ``functions``  : scalar/text function library (lang-id, quality, tokens,
                   fingerprints)
- ``plans``      : SQL passthrough, DAG pipeline executor, data profiling
- ``streaming``  : Structured Streaming veneer over event tables
"""

__version__ = "0.1.0"

from etl_mark1_spark.session import get_spark  # noqa: F401
