"""Raw-SQL passthrough + preview/schema — the reference's real query surface.

``POST /api/transforms/sql`` registers each source file as a view, substitutes
``{{input}}``, and executes arbitrary SQL wrapped in a safety LIMIT
(reference: backend/services/duckdb_engine.py:84-119, views at :103-107,
limit wrapper at :109). Spark equivalent: temp views + ``spark.sql`` — the
whole ANSI surface (joins, windows, set ops, grouping sets, CTEs) rides
through Catalyst on this one primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_mark1_spark.dtypes import schema_to_dicts

#: Reference defaults: preview 200 rows, raw SQL 1000 rows
#: (backend/api/files.py:71, backend/api/transforms.py:42).
DEFAULT_PREVIEW_LIMIT = 200
DEFAULT_SQL_LIMIT = 1000


def execute_sql(
    spark: SparkSession,
    sql: str,
    sources: dict[str, DataFrame | str] | None = None,
    input_df: DataFrame | None = None,
    limit: int | None = DEFAULT_SQL_LIMIT,
    dialect: str | None = None,
) -> DataFrame:
    """Run SQL with named sources registered as temp views.

    ``sources`` values may be DataFrames or file paths (read with format
    autodetect). ``input_df`` binds the ``{{input}}`` placeholder like
    backend/api/transforms.py:51. ``limit=None`` disables the safety wrapper
    (the reference always wraps; at scale the limit matters only for
    driver-bound previews — Catalyst pushes it into the plan either way).
    ``dialect="duckdb"`` runs the statement through the best-effort DuckDB
    dialect shim (plans/dialect.py) first.
    """
    from etl_mark1_spark.sources.readers import read_file

    if dialect == "duckdb":
        from etl_mark1_spark.plans.dialect import translate

        sql = translate(sql)

    for name, src in (sources or {}).items():
        df = src if isinstance(src, DataFrame) else read_file(spark, src)
        df.createOrReplaceTempView(name)
    if input_df is not None:
        input_df.createOrReplaceTempView("_data")
        sql = sql.replace("{{input}}", "_data")
    out = spark.sql(sql)
    return out.limit(limit) if limit is not None else out


def preview(df: DataFrame, limit: int = DEFAULT_PREVIEW_LIMIT) -> dict:
    """Rows-as-dicts preview + total count, the DataPreviewResponse shape
    (duckdb_engine.py:28-60, backend/schemas/schemas.py:232-235).

    ``limit().collect()`` compiles to CollectLimitExec — no full scan for the
    rows; the total count is a separate aggregate-only job.
    """
    rows = [r.asDict(recursive=True) for r in df.limit(limit).collect()]
    return {
        "columns": list(df.columns),
        "rows": rows,
        "total_rows": df.count(),
        "preview_rows": len(rows),
    }


def infer_schema(df: DataFrame) -> list[dict]:
    """Schema as the reference's {"name","type","nullable"} list
    (duckdb_engine.py:62-82) with DuckDB-style type names."""
    return schema_to_dicts(df.schema)
