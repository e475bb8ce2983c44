from etl_mark1_spark.sources.readers import detect_format, read_file  # noqa: F401
from etl_mark1_spark.sources.writers import write_file  # noqa: F401
