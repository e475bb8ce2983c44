"""Step-DSL operator semantics — including each documented divergence from
reference bugs (SURVEY.md §7.4.4)."""

import pytest
from pyspark.sql import Row

from etl_mark1_spark.operators.steps import STEP_OPERATORS, apply_steps


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([
        Row(id=1, name="  Alice  ", cat="a/b/c", price="10.5", note="x&y"),
        Row(id=2, name="Bob", cat="d/e", price="N/A", note="q(TM)z"),
        Row(id=3, name=None, cat="f", price=None, note="plain"),
        Row(id=3, name=None, cat="f", price=None, note="plain"),
    ])


def step(op, **params):
    return {"operator": op, "params": params}


def test_rename_column(df):
    out = apply_steps(df, [step("rename_column", from_name="name", to_name="n")])
    assert "n" in out.columns and "name" not in out.columns


def test_cast_type_duckdb_names(df):
    out = apply_steps(df, [step("cast_type", column="price", target_type="DOUBLE")])
    assert dict(out.dtypes)["price"] == "double"
    vals = {r.id: r.price for r in out.collect()}
    assert vals[1] == 10.5
    assert vals[2] is None  # bad cast -> NULL, not error


def test_trim_whitespace_actually_trims(df):
    # reference's branch is a no-op (duckdb_engine.py:287-295); ours trims
    out = apply_steps(df, [step("trim_whitespace", columns=["name"])])
    assert {r.name for r in out.collect()} == {"Alice", "Bob", None}


def test_trim_star_trims_all_string_columns(df):
    out = apply_steps(df, [step("trim_whitespace", columns=["*"])])
    row = out.filter("id = 1").first()
    assert row.name == "Alice"


def test_filter_rows_expression(df):
    out = apply_steps(df, [step("filter_rows", expression="id >= 2")])
    assert out.count() == 3


def test_drop_nulls_subset_and_empty(df):
    assert apply_steps(df, [step("drop_nulls", columns=["name"])]).count() == 2
    # empty column list -> any-column (reference emits invalid SQL here)
    assert apply_steps(df, [step("drop_nulls", columns=[])]).count() == 2


def test_deduplicate_rows_no_rn_leak(df):
    out = apply_steps(df, [step("deduplicate_rows", columns=["id"])])
    assert out.count() == 3
    assert "_rn" not in out.columns  # reference leaks _rn (duckdb_engine.py:306-314)


def test_deduplicate_rows_keep_first(spark):
    data = spark.createDataFrame(
        [Row(k="a", v=1), Row(k="a", v=2), Row(k="b", v=3)])
    out = apply_steps(data, [step("deduplicate_rows", columns=["k"], keep="first")])
    assert {(r.k, r.v) for r in out.collect()} == {("a", 1), ("b", 3)}


def test_deduplicate_rows_distinct(df):
    assert apply_steps(df, [step("deduplicate_rows")]).count() == 3


def test_replace_text_literal(df):
    out = apply_steps(df, [step("replace_text", column="note", find="(TM)",
                                replace="!")])
    assert {r.note for r in out.collect()} == {"x&y", "q!z", "plain"}


def test_regex_replace_global(df):
    out = apply_steps(df, [step("regex_replace", column="cat", pattern="/",
                                replacement="-")])
    assert out.filter("id = 1").first().cat == "a-b-c"  # all occurrences


def test_add_derived_column(df):
    out = apply_steps(df, [step("add_derived_column", name="double_id",
                                expression="id * 2")])
    assert out.filter("id = 2").first().double_id == 4


def test_split_column_literal_delim_and_oob(df):
    out = apply_steps(df, [step("split_column", column="cat", delimiter="/",
                                new_names=["c1", "c2", "c3"])])
    r1 = out.filter("id = 1").first()
    assert (r1.c1, r1.c2, r1.c3) == ("a", "b", "c")
    r3 = out.filter("id = 3").first()
    assert (r3.c1, r3.c2, r3.c3) == ("f", None, None)  # OOB -> NULL


def test_split_column_default_names(df):
    out = apply_steps(df, [step("split_column", column="cat", delimiter="/")])
    assert {"cat_1", "cat_2"} <= set(out.columns)


def test_split_column_regex_metachar_is_literal(spark):
    data = spark.createDataFrame([Row(s="a.b.c")])
    out = apply_steps(data, [step("split_column", column="s", delimiter=".",
                                  new_names=["x", "y"])])
    r = out.first()
    assert (r.x, r.y) == ("a", "b")


def test_merge_columns_separator_and_nulls(df):
    # reference reads separator and never uses it (duckdb_engine.py:349-354)
    out = apply_steps(df, [step("merge_columns", columns=["name", "cat"],
                                separator="|", new_name="m")])
    vals = {r.id: r.m for r in out.dropDuplicates(["id"]).collect()}
    assert vals[2] == "Bob|d/e"
    assert vals[3] == "|f"  # NULL -> '' placeholder kept, not skipped


def test_sql_transform_placeholder(df):
    out = apply_steps(df, [step("sql_transform",
                                sql="SELECT id, count(*) AS n FROM {{input}} "
                                    "GROUP BY id")])
    assert {(r.id, r.n) for r in out.collect()} == {(1, 1), (2, 1), (3, 2)}


def test_sql_transform_leaves_catalog_clean(spark, df):
    """Repeated sql_transform steps must not accumulate temp views — the
    input view is dropped right after analysis."""
    before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    out = df
    for _ in range(3):
        out = apply_steps(out, [step(
            "sql_transform", sql="SELECT * FROM {{input}}")])
    assert out.count() == 4  # plans still execute after the views dropped
    after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert after == before


def test_aggregate_grouped_naming(df):
    out = apply_steps(df, [step("aggregate", group_by=["cat"],
                                aggregations={"id": "sum"})])
    assert set(out.columns) == {"cat", "id_sum"}


def test_aggregate_global(df):
    # empty group_by -> global aggregation (reference emits invalid SQL)
    out = apply_steps(df, [step("aggregate", group_by=[],
                                aggregations={"id": "max"})])
    assert out.collect() == [Row(id_max=3)]


def test_unknown_operator_passthrough(df):
    out = apply_steps(df, [step("email_notify")])
    assert out.columns == df.columns and out.count() == df.count()


def test_registry_covers_reference_surface():
    # the 13 named branches of _step_to_sql (duckdb_engine.py:271-370)
    expected = {"rename_column", "cast_type", "trim_whitespace", "filter_rows",
                "drop_nulls", "deduplicate_rows", "replace_text",
                "regex_replace", "add_derived_column", "split_column",
                "merge_columns", "sql_transform", "aggregate"}
    assert expected <= set(STEP_OPERATORS)
