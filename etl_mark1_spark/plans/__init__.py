from etl_mark1_spark.plans.sql import execute_sql, infer_schema, preview  # noqa: F401
from etl_mark1_spark.plans.quality import quality_report  # noqa: F401
