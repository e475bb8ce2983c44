from etl_mark1_spark.functions import text  # noqa: F401
