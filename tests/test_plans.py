"""Physical-plan regression tests: the plan properties that matter at scale
are asserted, not assumed — a change that silently drops a pushdown or
broadcast fails here before it costs anything on a cluster."""

import pytest

from etl_mark1_spark.catalog import QUERIES


def executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = executed_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan


def test_q6_is_scan_plus_aggregate_only(spark, sf_dir):
    df = QUERIES["q6_forecast_revenue"](spark, sf_dir)
    plan = executed_plan(df)
    # (the PushedFilters list is truncated in toString, so match the scan's
    # DataFilters instead)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "1996-01-01" in plan
    assert "Join" not in plan  # no spurious joins in a scan+agg query


@pytest.mark.parametrize("name", ["sql_join_q3", "sql_q5_region_revenue",
                                  "q10_returned_items", "q14_promo_revenue"])
def test_dim_joins_broadcast(spark, sf_dir, name):
    """At test scale every dimension side fits the broadcast threshold: no
    join in these plans should fall back to shuffle-based strategies."""
    df = QUERIES[name](spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = QUERIES["dedup_distinct"](spark, sf_dir)
    plan = executed_plan(df)
    # only the two grouping columns are read, not all 11 lineitem columns
    assert "ReadSchema: struct<l_returnflag:string,l_linestatus:string>" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    """cosine_topk must compile to TakeOrderedAndProject (per-partition
    heaps + k-row merge), never a global sort."""
    from etl_mark1_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in emb.first().embedding]
    df = cosine_topk(emb, query, k=5)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_semi_anti_join_strategies(spark, sf_dir):
    for name, kind in [("semi_join_customers", "LeftSemi"),
                       ("anti_join_customers", "LeftAnti")]:
        plan = executed_plan(QUERIES[name](spark, sf_dir))
        assert kind in plan, name


def test_step_chain_collapses_to_one_plan(spark, sf_dir):
    """A folded step chain must optimize as ONE plan: the filter from a late
    step reaches the scan even with rename/derive steps stacked before it."""
    from etl_mark1_spark.operators.steps import apply_steps

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = apply_steps(df, [
        {"operator": "rename_column",
         "params": {"from_name": "l_quantity", "to_name": "qty"}},
        {"operator": "add_derived_column",
         "params": {"name": "rev",
                    "expression": "l_extendedprice * (1 - l_discount)"}},
        {"operator": "filter_rows", "params": {"expression": "qty < 10"}},
    ])
    plan = executed_plan(out.select("l_orderkey", "qty", "rev"))
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10" \
        in plan


def test_aggregate_has_partial_phase(spark, sf_dir):
    """Map-side partial aggregation must precede the shuffle."""
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = executed_plan(df)
    assert "partial_sum" in plan


def test_events_scan_is_native_parquet(spark, sf_dir):
    """The events table must read through a distributed FileScan, never a
    driver-side materialization — the scan prunes columns like any parquet
    read. The fixture's ts precision decides the scan schema: ns-era data
    takes the nanosAsLong path (ts:bigint + JVM rebuild), µs data the plain
    native path (ts:timestamp_ntz) — both are correct; driver fixtures have
    shipped both over time."""
    from etl_mark1_spark.catalog import t as read_table
    from etl_mark1_spark.sources.readers import _parquet_nanos_fields

    df = read_table(spark, sf_dir, "events").select("ts", "event_type")
    plan = executed_plan(df)
    assert "Scan parquet" in plan
    assert "ExistingRDD" not in plan
    assert "LocalTableScan" not in plan
    # pruning: only the two referenced source columns reach the scan
    if _parquet_nanos_fields(f"{sf_dir}/events.parquet"):
        assert "ReadSchema: struct<ts:bigint,event_type:string>" in plan
    else:
        assert "ReadSchema: struct<ts:timestamp_ntz,event_type:string>" in plan


def test_ns_parquet_compat_path(spark, tmp_path):
    """Regression for the TIMESTAMP(NANOS) compat path now that the shared
    fixtures are µs: a synthesized ns parquet must (a) be detected, (b) read
    through a distributed FileScan as bigint + JVM-side rebuild, and (c)
    rebuild the exact wall-clock values with ns->µs truncation."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_mark1_spark.sources.readers import (
        _parquet_nanos_fields,
        read_parquet_compat,
    )

    path = str(tmp_path / "ns_events.parquet")
    base = 1_700_000_000_000_000_000  # epoch ns
    tbl = pa.table({
        "ts": pa.array([base, base + 1_234_567_891, base + 999],
                       type=pa.timestamp("ns")),
        "k": pa.array([1, 2, 3], type=pa.int64()),
    })
    pq.write_table(tbl, path, store_schema=False)

    assert _parquet_nanos_fields(path) == ["ts"]
    df = read_parquet_compat(spark, path)
    plan = executed_plan(df.select("ts", "k"))
    assert "Scan parquet" in plan and "ExistingRDD" not in plan
    assert "ReadSchema: struct<ts:bigint,k:bigint>" in plan

    got = [r.ts for r in df.orderBy("k").collect()]
    want = [datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=ns // 1000)
            for ns in (base, base + 1_234_567_891, base + 999)]
    assert got == want


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    """The 100 TB co-location story: both sides bucketed by the join key ->
    the sort-merge join runs with NO Exchange (shuffle) on either side."""
    import uuid

    suffix = uuid.uuid4().hex[:8]
    orders_tbl, lineitem_tbl = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join down the SMJ path so bucketing is what's measured
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable(orders_tbl))
        (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable(lineitem_tbl))

        left = spark.table(lineitem_tbl)
        right = spark.table(orders_tbl)
        joined = left.join(right, left.l_orderkey == right.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing replaced the shuffle
        assert "Bucketed: true" in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql(f"DROP TABLE IF EXISTS {orders_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {lineitem_tbl}")


def test_train_test_split_is_shuffle_free(spark, sf_dir):
    """Split membership is a map-side expression — ANY Exchange here means
    someone reintroduced a shuffle into a per-row tag."""
    df = QUERIES["train_test_split"](spark, sf_dir)
    assert "Exchange" not in executed_plan(df)


def test_pack_sequences_single_window_shuffle(spark, sf_dir):
    """Sharded packing needs exactly one Exchange (hash by shard for the
    running-sum window) — a second one would mean the window or the scan
    re-partitions needlessly."""
    plan = executed_plan(QUERIES["pack_sequences_lang"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_contamination_benchmark_broadcasts(spark, sf_dir):
    """The benchmark gram set is eval-suite-sized: the semi-join must build
    a broadcast on it, never shuffle the full corpus gram explode."""
    plan = executed_plan(QUERIES["contamination_ngram"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_vocabulary_broadcasts(spark, sf_dir):
    """Document frequency is vocabulary-sized — it must broadcast into the
    tf join rather than shuffling the term table a second time."""
    plan = executed_plan(QUERIES["tfidf_top_terms"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q9_like_filter_reaches_part_scan(spark, sf_dir):
    """The p_name LIKE filter must land in the part scan's data filters so
    the fact join only sees matching parts; all dims broadcast."""
    plan = executed_plan(QUERIES["q9_profit_by_nation"](spark, sf_dir))
    scan_lines = [l for l in plan.splitlines()
                  if "FileScan parquet" in l and "p_partkey" in l]
    assert scan_lines and "p_name" in scan_lines[0]
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_q4_exists_is_semi_join_not_inner_distinct(spark, sf_dir):
    """EXISTS must compile to a LeftSemi join — an inner join + distinct
    would duplicate orders rows across the shuffle before deduping."""
    plan = executed_plan(QUERIES["q4_late_orders"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "HashAggregate" in plan


def test_q16_blacklist_and_part_dim_broadcast(spark, sf_dir):
    """The NOT IN blacklist (6 rows) and the size-filtered part dim must
    both broadcast; the only fact shuffle is the distinct aggregation."""
    plan = executed_plan(QUERIES["q16_supplier_count"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_q19_part_prefilter_reaches_scan_and_broadcasts(spark, sf_dir):
    """The brand/size disjunction must filter the part scan before its
    broadcast — reading all parts to apply the filter post-join wastes
    the whole dim scan."""
    plan = executed_plan(QUERIES["q19_disjunctive_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    scan_lines = [l for l in plan.splitlines()
                  if "FileScan parquet" in l and "p_brand" in l]
    assert scan_lines, "part scan missing"


def test_q21_single_fact_scan_formulation(spark, sf_dir):
    """The EXISTS/NOT EXISTS pair must NOT re-probe the fact per row: the
    window formulation scans lineitem/orders/supplier exactly once each —
    3 scans total, versus one probe per correlated row."""
    plan = executed_plan(QUERIES["q21_sole_late_supplier"](spark, sf_dir))
    assert plan.count("FileScan parquet") == 3
    assert "BroadcastHashJoin" in plan  # supplier dim
    assert "Window" in plan


def test_zorder_values_whole_stage_codegen(spark, sf_dir):
    """The Morton bit-spread must stay inside codegen — a Python UDF here
    would put per-row Python in what should be pure JVM bit math."""
    plan = executed_plan(QUERIES["zorder_values"](spark, sf_dir))
    assert "*(1) Project" in plan  # the *(n) prefix marks codegen stages
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_is_map_side_only(spark, sf_dir):
    """Weighted sampling is a pure filter: any Exchange means someone
    added a shuffle to a per-row membership decision."""
    plan = executed_plan(QUERIES["weighted_sample_quality"](spark, sf_dir))
    assert "Exchange" not in plan


def test_chunk_documents_is_shuffle_free(spark, sf_dir):
    """Chunking is a flat-map: ANY Exchange means someone made a per-row
    explode shuffle the corpus text."""
    plan = executed_plan(QUERIES["chunk_documents_overlap"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate explode" in plan


def test_rebalance_only_shuffles_stratum_stats(spark, sf_dir):
    """Mixture rebalancing must shuffle only the tiny stratum aggregate
    and broadcast probabilities back — the corpus side stays a scan +
    broadcast-join + filter (no corpus-wide Exchange)."""
    plan = executed_plan(QUERIES["rebalance_mixture_sources"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_char_entropy_partial_aggregates(spark, sf_dir):
    """The (doc, char) count must partial-aggregate map-side so the
    shuffle carries at most |alphabet| rows per doc per partition — and
    no Python appears anywhere in the plan."""
    plan = executed_plan(QUERIES["text_char_entropy"](spark, sf_dir))
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_lm_model_broadcasts(spark, sf_dir):
    """The vocabulary-probability table is vocabulary-sized: it must
    broadcast back onto the token stream, never shuffle it a second
    time (same discipline as tf-idf)."""
    plan = executed_plan(QUERIES["unigram_lm_score"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_snapshot_diff_single_full_outer_join(spark, sf_dir):
    """The diff is ONE full-outer key join — a formulation that probed
    each side twice (exists + anti) would double the fact scans."""
    plan = executed_plan(QUERIES["snapshot_diff_orders"](spark, sf_dir))
    assert "FullOuter" in plan


def test_robust_outliers_broadcasts_group_stats(spark, sf_dir):
    """Group medians/MADs are group-cardinality sized: both must
    broadcast back onto the fact, never shuffle it again."""
    plan = executed_plan(QUERIES["robust_outliers_orders"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_skewed_join_aqe_plan_splits_skew(spark):
    """The entry's reason to exist: under deliberate key skew, AQE must
    carve the monster partition into parallel subtasks — the executed
    plan carries SortMergeJoin(skew=true). Runs at sf0.01 with
    test-scale thresholds (the byte knobs are the only scale-dependent
    part; the plan shape is identical at sf0.1 bench defaults)."""
    import os

    from etl_mark1_spark.catalog import QUERIES

    sf01 = "/root/testdata/sf0.01"
    if not os.path.isdir(sf01):
        pytest.skip("sf0.01 testdata not present")
    touched = ["spark.sql.adaptive.skewJoin.enabled",
               "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
               "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
               "spark.sql.adaptive.advisoryPartitionSizeInBytes",
               "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    saved = {}
    for k in touched:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    os.environ["SPARK_GRAFT_SKEW_THRESHOLD"] = "8k"
    os.environ["SPARK_GRAFT_SKEW_ADVISORY"] = "4k"
    try:
        df = QUERIES["skewed_join_aqe"](spark, sf01)
        df.collect()
        plan = executed_plan(df)
        assert "skew=true" in plan, plan
    finally:
        os.environ.pop("SPARK_GRAFT_SKEW_THRESHOLD", None)
        os.environ.pop("SPARK_GRAFT_SKEW_ADVISORY", None)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bm25_topk_is_ordered_limit(spark, sf_dir):
    """The top-k must compile to TakeOrderedAndProject — an ordered limit
    with per-partition pruning — never a global sort of all scores."""
    plan = executed_plan(QUERIES["bm25_search_docs"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_percentile_rank_has_no_empty_partition_window(spark, sf_dir):
    """Exact cume_dist without the single-partition sort: every window in
    the executed plan must partition by the prefix-sum shard column."""
    import re

    plan = executed_plan(QUERIES["quality_percentile_rank"](spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, plan
    assert all("_tps_q" in s for s in specs), specs


def test_ks_drift_has_no_empty_partition_window(spark, sf_dir):
    """Both CDF running sums ride the sharded prefix-sum windows."""
    import re

    plan = executed_plan(QUERIES["ks_drift_values"](spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, plan
    assert all("_tps_q" in s for s in specs), specs


def test_winsorize_broadcasts_cutoffs(spark, sf_dir):
    """The two percentile cutoffs are one broadcast row; the clip must
    not shuffle the fact table."""
    plan = executed_plan(QUERIES["winsorize_prices"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantile_digest_rollup_is_one_decomposable_aggregate(spark, sf_dir):
    """Digest construction must partial-aggregate map-side (the sketch
    merges in the exchange); the merge stage touches digests only."""
    plan = executed_plan(QUERIES["quantile_digest_merge"](spark, sf_dir))
    assert "partial_percentile_approx" in plan


def test_weighted_exact_k_uses_take_ordered(spark, sf_dir):
    """A-ES exact-k selection must compile to TakeOrderedAndProject
    (per-partition heaps + k-row merge), never a global sort."""
    df = QUERIES["weighted_sample_docs"](spark, sf_dir)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no sort shuffle


def test_edit_distance_join_has_no_cartesian(spark, sf_dir):
    """FastSS candidates are a hash equi-join on the variant signature —
    the plan must contain a hash join and no cartesian/NL product."""
    df = QUERIES["edit_distance_join_customers"](spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan


def test_similarity_joins_fan_collapsed_frames_out(spark, sf_dir):
    """The round-9 AQE size-vs-CPU cliff pin: both similarity joins
    collapse to distinct strings whose output is tiny in BYTES, so AQE
    coalesces it to one partition — serializing the CPU-heavy
    deletion-neighborhood / shingle explode behind it (measured 7.6 s
    vs 2.1 s on the sf0.1 edit-distance entry). The explicit
    round-robin fan-out must stay in the plan: a ROUNDROBIN exchange
    in each join's executed plan."""
    for name in ("edit_distance_join_customers", "setsim_join_docs"):
        plan = executed_plan(QUERIES[name](spark, sf_dir)).upper()
        assert "ROUNDROBIN" in plan, f"{name}: collapsed-frame fan-out gone"


def test_funnel_stages_share_user_partitioning(spark, sf_dir):
    """Every shuffle in the funnel hashes the user key (stage joins and
    aggregates co-partition); no window, no cartesian."""
    import re

    df = QUERIES["funnel_conversion_events"](spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan and "Window" not in plan
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert exchanges and all(c.startswith("user_id") for c in exchanges), \
        exchanges


def test_epoch_shuffle_windows_partition_by_shard(spark, sf_dir):
    """The per-shard ranking is the ONLY window and it partitions by the
    shard column — no single-partition global sort materializes."""
    import re

    df = QUERIES["epoch_shuffle_docs"](spark, sf_dir)
    plan = executed_plan(df)
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs and all("shard" in s for s in specs), specs
    assert "Exchange rangepartitioning" not in plan


def test_ngram_novelty_reuses_gram_exchange(spark, sf_dir):
    """The gram generation (higher-order exprs outside codegen) is the
    entry's dominant CPU cost; both consumers — per-doc totals and the
    gram-level min — must hang off ONE repartition exchange. A plan
    that evaluates the gram pipeline twice doubled the sf0.1 wall clock
    when measured (round 10). AQE applies exchange reuse at runtime, so
    materialize first and assert on the final adaptive plan."""
    df = QUERIES["ngram_novelty_docs"](spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "ReusedExchange" in plan, plan
