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
- ``strftime(ts, '%fmt')`` -> ``date_format(ts, 'java fmt')`` and
  ``strptime(s, '%fmt')`` -> ``to_timestamp(s, 'java fmt')`` with the
  %-directives mapped to Java DateTimeFormatter patterns (unknown
  directives refuse; non-literal formats refuse).
- ``list_unique(x)`` -> ``cardinality(array_distinct(x))`` — DuckDB's
  list_unique returns the COUNT of unique elements, not the deduplicated
  list (a rename to array_distinct would silently change the type).
- 1-based list indexing ``expr[1]`` is NOT rewritten: Spark's bracket is
  0-based but ``element_at`` is 1-based like DuckDB — users should write
  element_at; we rewrite the common ``string_split(...)[n]`` combo only.
- slices ``expr[a:b]`` (inclusive, 1-based in DuckDB): rewritten to
  ``slice(expr, a, b-a+1)`` when ``expr`` is provably array-valued (a
  split/array-function call), to ``substring`` when it is a string
  literal; refused otherwise — bracket slicing is type-overloaded in
  DuckDB and a wrong guess silently corrupts.

Refused (raise DialectError):
- ``SELECT * REPLACE/EXCLUDE`` — needs schema expansion, use withColumn/drop
- ``read_csv_auto / read_parquet / read_json_auto`` table functions — register
  sources via execute_sql(sources=...) instead
- ``len(...)`` — DuckDB len() is both string length and list cardinality;
  without the argument's type a rewrite guesses. Write ``length()`` for
  strings (valid in both dialects) or ``cardinality()`` for arrays
  (DuckDB's list spelling is ``array_length``).
- ``list_distinct`` — DuckDB does not define the output order and in
  practice differs from Spark's first-occurrence order; order-sensitive
  results would silently diverge.
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
    (re.compile(r"\blist_distinct\s*\(", re.IGNORECASE),
     "DuckDB list_distinct has no defined element order and differs from "
     "Spark array_distinct's first-occurrence order; sort explicitly "
     "(array_sort) if order doesn't matter to you"),
]

#: fn renames where semantics AND argument order match exactly.
#: Deliberately absent: str_split/string_to_array (need literal-escaping
#: like string_split), list_distinct (order differs — refused above).
_FN_RENAMES = {
    "list_contains": "array_contains",
    "list_has": "array_contains",
    "list_concat": "concat",
    "list_cat": "concat",
    "array_length": "cardinality",
    "list_length": "cardinality",
    "regexp_matches": "rlike",
    "epoch_ms": "timestamp_millis",
}

#: DuckDB strftime %-directive -> Java DateTimeFormatter pattern.
_STRF_MAP = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd",
    "H": "HH", "I": "hh", "M": "mm", "S": "ss",
    "f": "SSSSSS", "j": "DDD", "a": "EEE", "A": "EEEE",
    "b": "MMM", "B": "MMMM", "p": "a", "%": "%",
}


def _strf_to_java(fmt: str) -> str:
    """Translate a strftime format to a Java DateTimeFormatter pattern.
    Literal letters are single-quoted (Java reserves all letters); unknown
    %-directives refuse rather than guess."""
    out: list[str] = []
    quoted: list[str] = []

    def flush():
        if quoted:
            out.append("'" + "".join(quoted).replace("'", "''") + "'")
            quoted.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise DialectError("dangling % in strftime format")
            d = fmt[i + 1]
            if d not in _STRF_MAP:
                raise DialectError(
                    f"strftime directive %{d} has no safe Java equivalent")
            flush()
            out.append(_STRF_MAP[d])
            i += 2
        elif ch.isalpha():
            quoted.append(ch)
            i += 1
        elif ch == "'":
            flush()
            out.append("''")
            i += 1
        else:
            flush()
            out.append(ch)
            i += 1
    flush()
    return "".join(out)


_SQL_STR = re.compile(r"'((?:[^']|'')*)'")


def _literal_spans(sql: str) -> list[tuple[int, int]]:
    return [(m.start(), m.end()) for m in _SQL_STR.finditer(sql)]


def _in_literal(spans: list[tuple[int, int]], pos: int) -> bool:
    return any(s <= pos < e for s, e in spans)


def _rewrite_calls(sql: str, name: str, rewriter) -> str:
    """Replace every ``name( args )`` call (case-insensitive, balanced
    parens, quote-aware) with ``rewriter(arg_strings)``."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    out: list[str] = []
    pos = 0
    while True:
        m = pat.search(sql, pos)
        while m and _in_literal(_literal_spans(sql), m.start()):
            m = pat.search(sql, m.end())
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        out.append(sql[pos:m.start()])
        depth, i, n = 1, m.end(), len(sql)
        arg_start, args = i, []
        while i < n and depth:
            c = sql[i]
            if c == "'":  # skip string literal ('' is two adjacent skips)
                j = i + 1
                while j < n:
                    if sql[j] == "'":
                        if j + 1 < n and sql[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                i = j + 1
                continue
            if c in "([":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "]":
                depth -= 1
            elif c == "," and depth == 1:
                args.append(sql[arg_start:i])
                arg_start = i + 1
            i += 1
        if depth:
            raise DialectError(f"unbalanced parentheses in {name}() call")
        args.append(sql[arg_start:i])
        out.append(rewriter([a.strip() for a in args]))
        pos = i + 1


def _literal_text(arg: str) -> str | None:
    """The unescaped text of ``arg`` if it is exactly one SQL string
    literal, else None."""
    m = _SQL_STR.fullmatch(arg.strip())
    return m.group(1).replace("''", "'") if m else None


def _strftime_repl(args: list[str]) -> str:
    if len(args) != 2:
        raise DialectError("strftime with other than 2 args is not handled")
    fmt = _literal_text(args[1])
    expr = args[0]
    if fmt is None:  # DuckDB also accepts strftime(format, timestamp)
        fmt, expr = _literal_text(args[0]), args[1]
    if fmt is None:
        raise DialectError(
            "strftime with a non-literal format can't be translated; "
            "use date_format with a Java pattern directly")
    java = _strf_to_java(fmt).replace("'", "''")
    return f"date_format({expr}, '{java}')"


def _strptime_repl(args: list[str]) -> str:
    if len(args) != 2:
        raise DialectError("strptime with other than 2 args is not handled")
    fmt = _literal_text(args[1])
    if fmt is None:
        raise DialectError(
            "strptime with a non-literal format can't be translated; "
            "use to_timestamp with a Java pattern directly")
    java = _strf_to_java(fmt).replace("'", "''")
    return f"to_timestamp({args[0]}, '{java}')"


def _list_unique_repl(args: list[str]) -> str:
    if len(args) != 1:
        raise DialectError("list_unique takes exactly one argument")
    return f"cardinality(array_distinct({args[0]}))"


#: call-expressions that provably yield arrays (targets for [a:b] slices)
_ARRAY_FNS = ("split", "array", "array_distinct", "sequence", "collect_list",
              "array_sort", "array_union", "array_intersect", "array_except",
              "slice", "transform")

_SLICE = re.compile(r"\[\s*(\d+)\s*:\s*(\d*)\s*\]")


def _rewrite_array_literals(sql: str) -> str:
    """DuckDB bracket list literals ``[e1, e2]`` -> ``array(e1, e2)``.
    A ``[`` directly after an identifier / ``)`` / ``]`` / string literal is
    indexing or slicing, not a literal, and is left alone."""
    i = 0
    while i < len(sql):
        spans = _literal_spans(sql)
        if sql[i] != "[" or _in_literal(spans, i):
            i += 1
            continue
        # indexing/slicing has the bracket IMMEDIATELY after the expression
        # (no whitespace); anything else is a list literal
        prev = sql[i - 1] if i > 0 else ""
        if prev and (prev.isalnum() or prev in ")]'_"):
            i += 1
            continue
        depth, j = 1, i + 1
        while j < len(sql) and depth:
            if _in_literal(spans, j):
                j += 1
                continue
            if sql[j] == "[":
                depth += 1
            elif sql[j] == "]":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth:
            raise DialectError("unbalanced [ in list literal")
        inner = sql[i + 1:j]
        sql = sql[:i] + f"array({inner})" + sql[j + 1:]
        # re-scan from i: inner may hold nested literals now shifted
    return sql


def _rewrite_slices(sql: str) -> str:
    """``expr[a:b]`` (DuckDB: 1-based, inclusive) -> ``slice(expr, a,
    b-a+1)`` for array-valued exprs, ``substring`` for string literals.
    Open-ended ``[a:]`` uses the base's cardinality (arrays) or the 2-arg
    substring form (strings)."""
    while True:
        m = _SLICE.search(sql)
        while m and _in_literal(_literal_spans(sql), m.start()):
            m = _SLICE.search(sql, m.end())
        if m is None:
            return sql
        start = int(m.group(1))
        open_ended = not m.group(2)
        length = None if open_ended else str(int(m.group(2)) - start + 1)
        # find the sliced expression by scanning backwards
        end = m.start()
        base_start = None
        prefix = sql[:end].rstrip()
        if prefix.endswith(")"):
            depth, j = 0, len(prefix) - 1
            while j >= 0:
                if prefix[j] == ")":
                    depth += 1
                elif prefix[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            fn_m = re.search(r"([A-Za-z_][A-Za-z_0-9]*)\s*$", prefix[:j])
            if fn_m and fn_m.group(1).lower() in _ARRAY_FNS:
                base_start = fn_m.start(1)
        elif prefix.endswith("'"):
            lit = None
            for lm in _SQL_STR.finditer(prefix):
                if lm.end() == len(prefix):
                    lit = lm
            if lit is not None:
                base_start = lit.start()
        if base_start is None:
            raise DialectError(
                "bracket slice [a:b] is type-overloaded in DuckDB (list vs "
                "string); write slice(arr, start, length) or "
                "substring(s, start, length) explicitly")
        base = sql[base_start:len(prefix)]
        if prefix.endswith("'"):
            repl = (f"substring({base}, {start})" if open_ended
                    else f"substring({base}, {start}, {length})")
        elif open_ended:
            repl = (f"slice({base}, {start}, "
                    f"greatest(0, cardinality({base}) - {start} + 1))")
        else:
            repl = f"slice({base}, {start}, {length})"
        sql = sql[:base_start] + repl + sql[m.end():]


_INDEX = re.compile(r"\[\s*(\d+)\s*\]")


def _rewrite_indexes(sql: str) -> str:
    """``expr[n]`` (DuckDB: 1-based) -> ``element_at(expr, n)`` for
    array-valued call exprs (Spark brackets are 0-based, element_at is
    1-based like DuckDB), ``substring(s, n, 1)`` for string literals.
    Unknown bases are left alone — a bare ``col[1]`` may be a Spark map/
    array access the user wrote deliberately."""
    pos = 0
    while True:
        m = _INDEX.search(sql, pos)
        while m and _in_literal(_literal_spans(sql), m.start()):
            m = _INDEX.search(sql, m.end())
        if m is None:
            return sql
        n = int(m.group(1))
        prefix = sql[:m.start()].rstrip()
        base_start = None
        if prefix.endswith(")"):
            depth, j = 0, len(prefix) - 1
            while j >= 0:
                if prefix[j] == ")":
                    depth += 1
                elif prefix[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            fn_m = re.search(r"([A-Za-z_][A-Za-z_0-9]*)\s*$", prefix[:j])
            if fn_m and fn_m.group(1).lower() in _ARRAY_FNS:
                base_start = fn_m.start(1)
        elif prefix.endswith("'"):
            for lm in _SQL_STR.finditer(prefix):
                if lm.end() == len(prefix):
                    base_start = lm.start()
        if base_start is None:
            pos = m.end()
            continue
        base = sql[base_start:len(prefix)]
        repl = (f"substring({base}, {n}, 1)" if prefix.endswith("'")
                else f"element_at({base}, {n})")
        sql = sql[:base_start] + repl + sql[m.end():]
        pos = 0


_ROWID = re.compile(r"\bROWID\b", re.IGNORECASE)


def _sql_regex_literal(delim: str) -> str:
    """Escape a literal delimiter for Spark's regex split, doubled again for
    the SQL string literal — Spark collapses unknown escapes like '\\.'
    down to '.'."""
    return re.escape(delim).replace("\\", "\\\\")


def _string_split_repl(args: list[str]) -> str:
    if len(args) != 2:
        raise DialectError("string_split takes exactly two arguments")
    delim = _literal_text(args[1])
    if delim is None:
        raise DialectError(
            "string_split with a non-literal delimiter can't be translated "
            "(DuckDB splits on a literal, Spark on a regex); use split() "
            "with an escaped pattern directly")
    return f"split({args[0]}, '{_sql_regex_literal(delim)}')"


def translate(sql: str) -> str:
    """Rewrite the safe DuckDB-isms; raise DialectError on unsafe ones."""
    for pattern, message in _REFUSE:
        if pattern.search(sql):
            raise DialectError(message)

    out = sql
    out = _rewrite_calls(out, "string_split", _string_split_repl)
    out = _rewrite_calls(out, "strftime", _strftime_repl)
    out = _rewrite_calls(out, "strptime", _strptime_repl)
    out = _rewrite_calls(out, "list_unique", _list_unique_repl)
    out = _rewrite_array_literals(out)  # [1,2] -> array(1,2)
    out = _rewrite_slices(out)   # after the rewrites above: base is known
    out = _rewrite_indexes(out)  # split(...)[n] -> element_at(split(...), n)
    out = _ROWID.sub("monotonically_increasing_id()", out)

    for src, dst in _FN_RENAMES.items():
        out = re.sub(rf"\b{src}\s*\(", f"{dst}(", out, flags=re.IGNORECASE)
    return out
