"""Property-style parity: each corpus statement is valid DuckDB SQL; the
shim's translation must produce the SAME values from Spark. Statements are
self-contained (literals only) so both engines run them verbatim — this is
the check that keeps the shim honest: every handled DuckDB-ism is proven
against DuckDB itself, not against our reading of its docs."""

import datetime

import duckdb
import pytest

from etl_mark1_spark.plans.dialect import DialectError, translate

CORPUS = [
    # strftime formats (letter literals, 12h clock, day names, %%)
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%d') AS x",
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%dT%H:%M:%S') AS x",
    "SELECT strftime(TIMESTAMP '2024-03-05 17:08:09', '%I:%M %p') AS x",
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%d/%m/%y') AS x",
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', 'week %a, month %B') AS x",
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '100%% day %j') AS x",
    # strptime
    "SELECT strptime('2024-03-05 07:08', '%Y-%m-%d %H:%M') AS x",
    "SELECT strptime('05/03/2024', '%d/%m/%Y') AS x",
    # string_split combos: index, bare, slice
    "SELECT string_split('a.b.c.d', '.')[2] AS x",
    "SELECT string_split('a.b.c.d', '.') AS x",
    "SELECT string_split('a.b.c.d', '.')[2:3] AS x",
    "SELECT string_split('a,b,c,d', ',')[2:] AS x",
    # string-literal slice / index; array-literal index
    "SELECT 'abcdef'[2:4] AS x",
    "SELECT 'abcdef'[3] AS x",
    "SELECT [10, 20, 30][2] AS x",
    "SELECT [10, 20, 30][2:] AS x",
    # list functions
    "SELECT list_contains([1, 2, 3], 2) AS x",
    "SELECT list_unique([1, 2, 2, 3]) AS x",
    "SELECT list_concat([1, 2], [3]) AS x",
    "SELECT array_length([1, 2, 3]) AS x",
    # epoch_ms (bigint -> timestamp direction)
    "SELECT epoch_ms(1700000000000) AS x",
    # regexp_matches (partial-match semantics in both)
    "SELECT regexp_matches('abcd', 'bc') AS x",
    "SELECT regexp_matches('abcd', '^bc') AS x",
]

REFUSED = [
    "SELECT len('abc') AS x",
    "SELECT list_distinct([1, 2, 2]) AS x",
    "SELECT strftime(ts, fmt_col) FROM t",       # non-literal format
    "SELECT strftime(TIMESTAMP '2024-01-01', '%G') AS x",  # unknown directive
    "SELECT some_col[2:3] AS x",                 # untyped slice target
]


def _canon(v):
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return [_canon(x) for x in v]
    return v


@pytest.mark.parametrize("sql", CORPUS)
def test_translation_matches_duckdb(spark, sql):
    want = [_canon(v) for v in duckdb.sql(sql).fetchall()[0]]
    got = [_canon(v) for v in spark.sql(translate(sql)).first()]
    assert got == want, f"{sql!r} -> {translate(sql)!r}: {got} != {want}"


@pytest.mark.parametrize("sql", REFUSED)
def test_unsafe_constructs_refuse(sql):
    with pytest.raises(DialectError):
        translate(sql)


def test_nested_and_quoted_args_survive():
    out = translate(
        "SELECT strftime(coalesce(a, b), '%Y, %m') AS x, 'strftime(' AS y")
    assert "date_format(coalesce(a, b), 'yyyy, MM')" in out
    assert "'strftime('" in out  # quoted text is not treated as a call
