"""Print the optimized + executed plan of any catalog entry.

Usage: python scripts/explain.py <entry> [sf_dir]
       python scripts/explain.py --list

The fastest way to audit an operator's scale behavior: check pushed
filters, broadcast vs sort-merge joins, Exchange count, and codegen spans
without writing a harness. tests/test_plans.py pins the properties that
must not regress; this script is for eyeballing the rest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from etl_mark1_spark.catalog import QUERIES

    if len(sys.argv) < 2 or sys.argv[1] == "--list":
        for name in sorted(QUERIES):
            print(name)
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    if name not in QUERIES:
        sys.exit(f"unknown entry {name!r}; --list shows all")

    from etl_mark1_spark import get_spark

    spark = get_spark(app_name="explain")
    df = QUERIES[name](spark, sf_dir)
    df.explain("formatted")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    print(f"\n-- summary: exchanges={n_exchange} broadcast_joins={n_bhj} "
          f"sort_merge_joins={n_smj}")
    spark.stop()


if __name__ == "__main__":
    main()
