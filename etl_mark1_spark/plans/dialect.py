"""Best-effort DuckDB -> Spark SQL dialect shim (SURVEY.md §4.2 item 4).

The reference's raw-SQL surface is DuckDB SQL, so user statements may carry
DuckDB-isms Spark doesn't parse. This shim rewrites the *safe* subset and
refuses loudly on constructs whose silent mistranslation would corrupt
results. It is conservative by design: a translation layer that guesses
wrong is worse than a parse error.

Handled:
- function renames with identical semantics (string_split -> split with the
  delimiter regex-escaped when literal, list_contains -> array_contains, ...)
- ``ROWID`` -> ``monotonically_increasing_id()`` (same role: a stable
  file-order-ish row tag)
- 1-based list indexing ``expr[1]`` is NOT rewritten: Spark's bracket is
  0-based but ``element_at`` is 1-based like DuckDB — users should write
  element_at; we rewrite the common ``string_split(...)[n]`` combo only.

Refused (raise DialectError):
- ``SELECT * REPLACE/EXCLUDE`` — needs schema expansion, use withColumn/drop
- ``read_csv_auto / read_parquet / read_json_auto`` table functions — register
  sources via execute_sql(sources=...) instead
- ``len(...)`` — DuckDB len() is both string length and list cardinality;
  without the argument's type a rewrite guesses. Write ``length()`` for
  strings (valid in both dialects) or ``cardinality()`` for arrays
  (DuckDB's list spelling is ``array_length``).
"""

from __future__ import annotations

import re


class DialectError(ValueError):
    pass


_REFUSE = [
    (re.compile(r"\*\s+(REPLACE|EXCLUDE)\s*\(", re.IGNORECASE),
     "SELECT * REPLACE/EXCLUDE needs schema expansion; use DataFrame "
     "withColumn/drop or list columns explicitly"),
    (re.compile(r"\bread_(csv_auto|json_auto|parquet)\s*\(", re.IGNORECASE),
     "DuckDB table functions are not available; register the file as a "
     "source via execute_sql(sources={name: path})"),
    (re.compile(r"(?<![a-zA-Z_])len\s*\(", re.IGNORECASE),
     "DuckDB len() is ambiguous (string length vs list cardinality) and a "
     "wrong rewrite fails Spark analysis; use length() for strings (valid "
     "in both dialects) or cardinality() for arrays (DuckDB: array_length)"),
]

#: fn renames where semantics AND argument order match exactly.
#: Deliberately absent: strftime (format strings differ: %Y vs yyyy),
#: str_split/string_to_array (need literal-escaping like string_split).
_FN_RENAMES = {
    "list_contains": "array_contains",
    "list_has": "array_contains",
    "list_unique": "array_distinct",
    "list_concat": "concat",
    "list_cat": "concat",
    "regexp_matches": "rlike",
    "epoch_ms": "timestamp_millis",
}

_STRING_SPLIT_IDX = re.compile(
    r"string_split\s*\(([^,]+),\s*'([^']*)'\s*\)\s*\[\s*(\d+)\s*\]",
    re.IGNORECASE)
_STRING_SPLIT = re.compile(
    r"string_split\s*\(([^,]+),\s*'([^']*)'\s*\)", re.IGNORECASE)
_ROWID = re.compile(r"\bROWID\b", re.IGNORECASE)


def translate(sql: str) -> str:
    """Rewrite the safe DuckDB-isms; raise DialectError on unsafe ones."""
    for pattern, message in _REFUSE:
        if pattern.search(sql):
            raise DialectError(message)

    out = sql

    # string_split(x, 'd')[n]  ->  element_at(split(x, 'escaped'), n)
    # (both 1-based; DuckDB splits on a literal, Spark on a regex). The
    # regex-escape backslashes must be doubled again for the SQL string
    # literal — Spark collapses unknown escapes like '\.' down to '.'.
    def _sql_regex_literal(delim: str) -> str:
        return re.escape(delim).replace("\\", "\\\\")

    def idx_repl(m):
        expr, delim, n = m.group(1), m.group(2), m.group(3)
        return f"element_at(split({expr}, '{_sql_regex_literal(delim)}'), {n})"

    out = _STRING_SPLIT_IDX.sub(idx_repl, out)

    def split_repl(m):
        expr, delim = m.group(1), m.group(2)
        return f"split({expr}, '{_sql_regex_literal(delim)}')"

    out = _STRING_SPLIT.sub(split_repl, out)
    out = _ROWID.sub("monotonically_increasing_id()", out)

    for src, dst in _FN_RENAMES.items():
        out = re.sub(rf"\b{src}\s*\(", f"{dst}(", out, flags=re.IGNORECASE)
    return out
