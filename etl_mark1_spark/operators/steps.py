"""The step-DSL operators — the reference's core transform surface.

The reference compiles JSON steps ``{"operator": ..., "params": ...}`` into a
chain of stacked DuckDB views (reference: backend/services/duckdb_engine.py:
271-370, chain assembly at :128-143). Here each operator is a pure
``(DataFrame, params) -> DataFrame`` function and a step list folds left over
a DataFrame — Spark's lazy logical plan is the idiomatic equivalent of the
view chain, and Catalyst optimizes the folded plan as one query.

Parameter names match the reference exactly (from_name/to_name, column/
target_type, expression, columns, find/replace, pattern/replacement,
name/expression, column/delimiter/new_names, columns/separator/new_name,
sql, group_by/aggregations).

Documented divergences from reference bugs (SURVEY.md §7.4.4):
- ``trim_whitespace`` actually trims (the reference builds a TRIM list and
  discards it — duckdb_engine.py:287-295 is a no-op).
- ``drop_nulls`` with an empty column list drops rows with a null in *any*
  column (the reference emits ``WHERE `` — invalid SQL).
- ``aggregate`` with an empty ``group_by`` is a global aggregation (the
  reference emits ``SELECT , ...`` — invalid SQL).
- ``merge_columns`` honors ``separator`` (the reference reads it at :351 and
  never uses it).
- keyed ``deduplicate_rows`` does not leak a ``_rn`` helper column (the
  reference's ``SELECT *`` leaks it — duckdb_engine.py:306-314).
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_mark1_spark.dtypes import to_spark_type_name

StepFn = Callable[[DataFrame, dict], DataFrame]


def op_rename_column(df: DataFrame, params: dict) -> DataFrame:
    """P1 — rename one column in place (duckdb_engine.py:277-280)."""
    return df.withColumnRenamed(params["from_name"], params["to_name"])


def op_cast_type(df: DataFrame, params: dict) -> DataFrame:
    """P2 — CAST a column in place; target is a DuckDB type name
    (duckdb_engine.py:282-285), mapped via the alias table.

    try_cast, not cast: malformed values become NULL instead of failing the
    whole job (under ANSI mode a single bad cell would otherwise kill a
    100 TB run). ``strict=True`` restores error-on-malformed, which is what
    the reference's raw ``CAST`` does."""
    col = params["column"]
    target = to_spark_type_name(params["target_type"])
    caster = F.col(col).cast if params.get("strict") else F.col(col).try_cast
    return df.withColumn(col, caster(target))


def op_trim_whitespace(df: DataFrame, params: dict) -> DataFrame:
    """P3 — trim listed columns; ``["*"]`` or empty trims every string column.

    The reference declares this operator but both branches return the input
    unchanged (duckdb_engine.py:287-295); we implement the evident intent.
    """
    cols = params.get("columns", []) or ["*"]
    if cols == ["*"]:
        cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    out = df
    for c in cols:
        out = out.withColumn(c, F.trim(F.col(c)))
    return out


def op_filter_rows(df: DataFrame, params: dict) -> DataFrame:
    """P4 — raw SQL predicate (duckdb_engine.py:297-299)."""
    return df.filter(params["expression"])


def op_drop_nulls(df: DataFrame, params: dict) -> DataFrame:
    """P5 — drop rows with NULL in the listed columns; empty list means any
    column (the reference's empty-list branch emits invalid SQL)."""
    cols = params.get("columns", [])
    return df.na.drop(how="any", subset=cols or None)


def op_deduplicate_rows(df: DataFrame, params: dict) -> DataFrame:
    """A2/A3 — keyed or full dedup (duckdb_engine.py:306-315).

    ``keep="any"`` (default) uses ``dropDuplicates`` — one shuffle on the
    keys, scales to arbitrary data. ``keep="first"`` mirrors the reference's
    ``ORDER BY ROWID`` keep-first-file-order semantics via
    ``monotonically_increasing_id`` (ids grow with partition index, i.e.
    file order for an in-order read). The ``_rn`` helper never leaks.
    """
    cols = params.get("columns", [])
    if not cols:
        return df.distinct()
    if params.get("keep", "any") == "first":
        w = Window.partitionBy(*cols).orderBy(F.monotonically_increasing_id())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return df.dropDuplicates(subset=cols)


def op_replace_text(df: DataFrame, params: dict) -> DataFrame:
    """P6 — literal substring replace, in place (duckdb_engine.py:317-324)."""
    col = params["column"]
    return df.withColumn(
        col, F.replace(F.col(col), F.lit(params["find"]), F.lit(params["replace"]))
    )


def op_regex_replace(df: DataFrame, params: dict) -> DataFrame:
    """P7 — global regexp replace (duckdb_engine.py:326-333; the reference
    passes the 'g' flag — Spark's regexp_replace is global by default)."""
    col = params["column"]
    return df.withColumn(
        col, F.regexp_replace(F.col(col), params["pattern"], params["replacement"])
    )


def op_add_derived_column(df: DataFrame, params: dict) -> DataFrame:
    """P8 — computed column from a raw SQL expression (duckdb_engine.py:335-338)."""
    return df.withColumn(params["name"], F.expr(params["expression"]))


def op_split_column(df: DataFrame, params: dict) -> DataFrame:
    """P9 — split on a *literal* delimiter into new columns
    (duckdb_engine.py:340-347; DuckDB string_split is literal and 1-based,
    Spark split is regex and 0-based — we escape the delimiter and shift the
    index). Out-of-range segments are NULL, matching DuckDB list indexing."""
    col = params["column"]
    delim = params["delimiter"]
    new_names = params.get("new_names", [f"{col}_1", f"{col}_2"])
    parts = F.split(F.col(col), re.escape(delim), -1)
    out = df
    for i, name in enumerate(new_names):
        # F.get (not getItem): NULL on out-of-range under ANSI mode, matching
        # DuckDB's NULL for list index past the end.
        out = out.withColumn(name, F.get(parts, i))
    return out


def op_merge_columns(df: DataFrame, params: dict) -> DataFrame:
    """P10 — concat columns, NULL->'' per column, separator-joined
    (duckdb_engine.py:349-354; the reference reads ``separator`` and then
    builds the concat without it — we honor it). concat_ws would skip NULLs
    entirely, so coalesce first to keep empty-string placeholders."""
    cols = params["columns"]
    sep = params.get("separator", " ")
    coalesced = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    return df.withColumn(params["new_name"], F.concat_ws(sep, *coalesced))


def op_sql_transform(df: DataFrame, params: dict) -> DataFrame:
    """§2.7 — arbitrary SQL with ``{{input}}`` bound to the current frame
    (duckdb_engine.py:356-359). The frame is registered as a temp view and
    the statement goes through Catalyst unchanged — joins, windows, set ops,
    grouping sets all arrive through this single primitive.

    The input view is content-addressed (md5, not PYTHONHASHSEED-dependent
    ``hash``) and dropped immediately after analysis — ``spark.sql`` resolves
    the view into the returned plan eagerly, so the catalog stays clean even
    across thousands of steps in a long-lived session."""
    import hashlib

    view = f"_input_{hashlib.md5(params['sql'].encode()).hexdigest()[:12]}"
    df.createOrReplaceTempView(view)
    try:
        return df.sparkSession.sql(params["sql"].replace("{{input}}", view))
    finally:
        df.sparkSession.catalog.dropTempView(view)


def op_aggregate(df: DataFrame, params: dict) -> DataFrame:
    """A1 — group-by with one agg function per column, outputs aliased
    ``{col}_{func}`` (duckdb_engine.py:361-366). Function names are raw SQL
    (sum/avg/min/max/count/...) evaluated via F.expr, so anything Spark SQL
    accepts works. Empty ``group_by`` is a global aggregation (reference
    emits invalid SQL there). Map-side partial aggregation and AQE handle
    scale; no custom work needed."""
    group_by = params.get("group_by", [])
    aggs = params.get("aggregations", {})
    agg_cols = [
        F.expr(f"{func}(`{col}`)").alias(f"{col}_{func}") for col, func in aggs.items()
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*agg_cols)
    return df.agg(*agg_cols)


def op_passthrough(df: DataFrame, params: dict) -> DataFrame:
    """Unknown-operator pass-through (duckdb_engine.py:368-370)."""
    return df


STEP_OPERATORS: dict[str, StepFn] = {
    "rename_column": op_rename_column,
    "cast_type": op_cast_type,
    "trim_whitespace": op_trim_whitespace,
    "filter_rows": op_filter_rows,
    "drop_nulls": op_drop_nulls,
    "deduplicate_rows": op_deduplicate_rows,
    "replace_text": op_replace_text,
    "regex_replace": op_regex_replace,
    "add_derived_column": op_add_derived_column,
    "split_column": op_split_column,
    "merge_columns": op_merge_columns,
    "sql_transform": op_sql_transform,
    "aggregate": op_aggregate,
}


def register_operator(name: str, fn: StepFn) -> None:
    """Plugin hook — the reference declares a TransformOperatorBase ABC with
    an empty registry (backend/connectors/base.py:40-74); here registration
    is live."""
    STEP_OPERATORS[name] = fn


def apply_steps(df: DataFrame, steps: list[dict[str, Any]]) -> DataFrame:
    """Fold a step list over a DataFrame — the ``apply_transforms`` equivalent
    (duckdb_engine.py:121-157). Lazy composition means the whole chain
    optimizes as one Catalyst plan, exactly like DuckDB inlining the stacked
    views."""
    for step in steps:
        fn = STEP_OPERATORS.get(step.get("operator", ""), op_passthrough)
        df = fn(df, step.get("params", {}) or {})
    return df


# corpus-prep operators register themselves as steps on import; importing
# here makes them available to every step-DSL consumer without a separate
# opt-in (the import is at the bottom: corpus.py calls register_operator,
# which must exist first)
from etl_mark1_spark.operators import corpus as _corpus  # noqa: E402,F401
from etl_mark1_spark.operators import web as _web  # noqa: E402,F401
from etl_mark1_spark.operators import html as _html  # noqa: E402,F401
from etl_mark1_spark.operators import encoding as _encoding  # noqa: E402,F401
from etl_mark1_spark.operators import lines as _lines  # noqa: E402,F401
from etl_mark1_spark.operators import sentences as _sentences  # noqa: E402,F401
