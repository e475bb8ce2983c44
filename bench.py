"""Benchmark harness: headline queries at SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver-side result transfer) so the timings measure the engine, not
collect(). Every query runs twice and the SECOND run is timed: the first
run compiles the generated code (whole-stage codegen classes + the JVM C2
queue behind them — measured at 2-7x inflation on the first run, with
multi-second variance, once a session has executed many plans). One-time
compilation amortizes to zero at the 100 TB design point, so steady-state
is the number that predicts cluster behavior. Set SPARK_GRAFT_NO_WARMUP=1
for single-run cold numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_mark1_spark import get_spark
from etl_mark1_spark.catalog import QUERIES

#: Headline set: scan+agg, multi-join, window, events, dedup (exact + LSH),
#: similarity, text scoring, streaming, selective-filter agg, big-group
#: having, percentiles. Keep names stable across rounds — BENCH_r{N}.json
#: files are compared line-by-line.
HEADLINE = [
    "q1_pricing_summary",
    "sql_join_q3",
    "sql_q5_region_revenue",
    "window_topk_orders",
    "events_hourly",
    "dedup_exact_documents",
    "minhash_neardup",
    "embedding_cosine_topk",
    "text_quality",
    "streaming_hourly",
    "asof_last_error",
    "sessionize_batch",
    "q6_forecast_revenue",
    "q18_large_orders",
    "percentile_by_status",
    # round-2 additions (new names append; earlier names stay comparable)
    "q8_market_share",
    "q21_sole_late_supplier",
    "distinct_rollup_daily",
    "hll_rollup_merge",
    "upsert_orders",
    "zorder_values",
]


def run_query(spark, name: str, sf_dir: str) -> float:
    started = time.monotonic()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - started


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # code-cache sizing for this generated-code-heavy workload lives in
    # get_spark's defaults (session.py)
    spark = get_spark(app_name="bench", driver_memory="24g")

    # one tiny action to absorb JVM startup outside the timings
    spark.range(1).count()

    do_warmup = not os.environ.get("SPARK_GRAFT_NO_WARMUP")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        try:
            if do_warmup:  # first run compiles; the timed run is steady-state
                run_query(spark, name, sf_dir)
            timings[name] = round(run_query(spark, name, sf_dir), 3)
        except Exception as exc:  # a broken query shows as null, not a crash
            print(f"bench error in {name}: {exc}", file=sys.stderr)
            timings[name] = None

    total = round(sum(v for v in timings.values() if v is not None), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
