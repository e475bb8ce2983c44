from etl_mark1_spark.operators.steps import STEP_OPERATORS, apply_steps  # noqa: F401
