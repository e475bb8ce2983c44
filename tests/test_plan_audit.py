"""The plan-audit sweep's classifier, tested on synthetic plan strings
(the full sweep itself runs as a script and gates on exit code)."""

import scripts.plan_audit as pa


def _kinds(name, plan):
    return {k for k, _ in pa.audit_one(name, plan)}


def test_cartesian_and_python_udf_flagged():
    assert _kinds("x", "CartesianProduct\n") == {"CARTESIAN"}
    assert _kinds("x", "BatchEvalPython [f(y#1)]\n") == {"PY_ROW"}
    # the Arrow-batched escapes are sanctioned, not findings
    assert _kinds("x", "ArrowEvalPython\nMapInPandas\n") == set()


def test_global_sort_respects_allowlist():
    plan = "Exchange rangepartitioning(a#1 ASC, 32)\n"
    assert _kinds("some_entry", plan) == {"GLOBAL_SORT"}
    allowed = next(iter(pa.GLOBAL_SORT_OK))
    assert _kinds(allowed, plan) == set()


def test_global_window_heuristic():
    empty = ("Window [row_number() windowspecdefinition(c#3L DESC NULLS "
             "LAST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
             "currentrow$()))]")
    keyed = ("Window [sum(v#2L) windowspecdefinition(k#1, ts#4 ASC NULLS "
             "FIRST, specifiedwindowframe(RangeFrame, unboundedpreceding$(),"
             " currentrow$()))]")
    assert _kinds("some_entry", empty) == {"GLOBAL_WINDOW"}
    assert _kinds("some_entry", keyed) == set()
    allowed = next(iter(pa.GLOBAL_WINDOW_OK))
    assert _kinds(allowed, empty) == set()


def test_scan_width_only_flags_wide_tables():
    wide = ("Location: InMemoryFileIndex [file:/data/lineitem.parquet]\n"
            "ReadSchema: struct<" + ",".join(
                f"c{i}:bigint" for i in range(16)) + ">")
    narrow = ("Location: InMemoryFileIndex [file:/data/lineitem.parquet]\n"
              "ReadSchema: struct<l_quantity:double,l_discount:double>")
    small_full = ("Location: InMemoryFileIndex [file:/data/region.parquet]\n"
                  "ReadSchema: struct<a:int,b:int,c:int>")
    assert _kinds("x", wide) == {"SCAN_WIDTH"}
    assert _kinds("x", narrow) == set()
    assert _kinds("x", small_full) == set()  # <=5-col tables exempt
