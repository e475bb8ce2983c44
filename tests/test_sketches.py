"""Sketch semantics (operators/sketches.py): HLL error bounds, lossless
rollup merges, exact heavy hitters; the exact variants' cross-engine
parity is the distinct_rollup_daily / heavy_hitter_types oracles."""

import pytest
from pyspark.sql import functions as F

from etl_mark1_spark.operators.sketches import (approx_ntile,
                                                exact_distinct_rollup,
                                                heavy_hitters,
                                                hll_estimate_over,
                                                hll_rollup)


@pytest.fixture()
def keyed(spark):
    # 20k rows, 1..2000 distinct ids spread over 4 groups
    return spark.range(20_000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % (500 * ((F.col("id") % 4) + 1))).alias("uid"))


def test_hll_estimate_within_bound(keyed):
    exact = {r.g: r.n_distinct for r in
             exact_distinct_rollup(keyed, ["g"], "uid").collect()}
    approx = {r.g: r.approx_distinct for r in
              hll_estimate_over(hll_rollup(keyed, ["g"], "uid"),
                                ["g"]).collect()}
    assert set(exact) == set(approx)
    for g, n in exact.items():
        # lgK=12 -> relative standard error ~1.6%; allow 4 sigma
        assert abs(approx[g] - n) <= max(2, 0.065 * n), (g, approx[g], n)


def test_hll_union_of_partials_matches_single_pass(keyed):
    """The scale contract: merging per-partition sketches estimates the
    same as sketching the raw rows in one pass. Not bit-identical — a
    union can densify a sparse-mode sketch and nudge the estimate by ~1 —
    so assert a sub-percent tolerance, far inside the sketch's own error."""
    direct = {r.g: r.approx_distinct for r in
              hll_estimate_over(hll_rollup(keyed, ["g"], "uid"),
                                ["g"]).collect()}
    split = keyed.withColumn("part", F.col("uid") % 7)
    merged = {r.g: r.approx_distinct for r in
              hll_estimate_over(hll_rollup(split, ["g", "part"], "uid"),
                                ["g"]).collect()}
    assert set(direct) == set(merged)
    for g in direct:
        assert abs(direct[g] - merged[g]) <= max(2, 0.005 * direct[g])


def test_exact_distinct_rollup_matches_count_distinct(keyed):
    via_rollup = {r.g: r.n_distinct for r in
                  exact_distinct_rollup(keyed, ["g"], "uid").collect()}
    direct = {r.g: r.n for r in
              keyed.groupBy("g")
              .agg(F.count_distinct("uid").alias("n")).collect()}
    assert via_rollup == direct


def test_heavy_hitters_exact_threshold(spark):
    # 135 rows: 100 'a', 30 'b', 5 'c'
    rows = [("a",)] * 100 + [("b",)] * 30 + [("c",)] * 5
    df = spark.createDataFrame(rows, "v string")
    top = {r.value: r.n for r in heavy_hitters(df, "v", 0.25).collect()}
    assert top == {"a": 100}                       # threshold 33.75
    both = {r.value for r in heavy_hitters(df, "v", 0.05).collect()}
    assert both == {"a", "b"}                      # threshold 6.75 excludes c
    # boundary: exactly at the threshold is included (>=)
    edge = {r.value for r in heavy_hitters(df, "v", 5 / 135).collect()}
    assert "c" in edge


def test_approx_ntile_counts_match_exact_ntile(spark):
    """The scale contract for quartiles_approx: sketch-cutoff buckets
    reproduce exact ntile populations within the rank-error band, every
    row lands in exactly one bucket, and buckets are value-ordered."""
    from pyspark.sql import Window
    n = 20_000
    # deterministic non-uniform values with no ties at the cutoffs
    df = spark.range(n).select(
        "id", (F.sin(F.col("id")) * 1000 + F.col("id") / 7).alias("v"))
    got = approx_ntile(df, "v", num_buckets=4)
    counts = {r.q: r.n for r in
              got.groupBy("q").agg(F.count(F.lit(1)).alias("n")).collect()}
    exact = {r.q: r.n for r in
             df.withColumn("q", F.ntile(4).over(
                 Window.orderBy("v", "id")).cast("bigint"))
             .groupBy("q").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {1, 2, 3, 4}
    assert sum(counts.values()) == n
    for q in exact:
        # accuracy=10000 -> rank error <= n/10000 = 2 rows per boundary
        assert abs(counts[q] - exact[q]) <= max(4, 0.01 * exact[q]), \
            (q, counts[q], exact[q])
    # bucket value ranges must be ordered and non-overlapping
    bounds = {r.q: (r.lo, r.hi) for r in
              got.groupBy("q").agg(F.min("v").alias("lo"),
                                   F.max("v").alias("hi")).collect()}
    for q in (1, 2, 3):
        assert bounds[q][1] <= bounds[q + 1][0]


def test_approx_ntile_plan_has_no_window_or_global_sort(spark):
    """The point of the operator: the executed plan must contain neither a
    Window node nor a single-partition global Sort — the two shapes that
    kill exact ntile at 100 TB."""
    df = spark.range(50_000).select(
        "id", (F.col("id") % 997).cast("double").alias("v"))
    out = approx_ntile(df, "v", num_buckets=4)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Sort" not in plan, plan
    # The only single-partition stage is the cutoff merge, and its input
    # is per-partition sketch PARTIALS (bytes per split), not data rows.
    assert "partial_percentile_approx" in plan, plan


def test_cms_exact_when_collision_free(spark):
    """With width far above key cardinality the estimate is exact."""
    from etl_mark1_spark.operators.sketches import cms_build, cms_estimate

    rows = [(f"k{i % 7}",) for i in range(700)]
    df = spark.createDataFrame(rows, ["k"])
    cms = cms_build(df, "k", width=1024, depth=4)
    got = {r["k"]: r["est_count"]
           for r in cms_estimate(cms, df.select("k").distinct(), "k",
                                 width=1024, depth=4).collect()}
    assert got == {f"k{i}": 100 for i in range(7)}


def test_cms_never_undercounts_under_forced_collisions(spark):
    """width=2 forces heavy collisions: estimates must stay >= truth and
    within the N-per-bucket worst case."""
    from collections import Counter

    from etl_mark1_spark.operators.sketches import cms_build, cms_estimate

    vals = [f"key{i % 11}" for i in range(1100)]
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    cms = cms_build(df, "k", width=2, depth=3)
    got = {r["k"]: r["est_count"]
           for r in cms_estimate(cms, df.select("k").distinct(), "k",
                                 width=2, depth=3).collect()}
    for k, true_n in truth.items():
        assert got[k] >= true_n
        assert got[k] <= len(vals)


def test_cms_merges_by_cell_sum(spark):
    """Two half-stream sketches summed cell-wise equal the full-stream
    sketch — the decomposability that makes CMS shardable."""
    from pyspark.sql import functions as F

    from etl_mark1_spark.operators.sketches import cms_build

    rows = [(f"k{i % 5}",) for i in range(500)]
    a = spark.createDataFrame(rows[:250], ["k"])
    b = spark.createDataFrame(rows[250:], ["k"])
    full = spark.createDataFrame(rows, ["k"])
    merged = (cms_build(a, "k").unionByName(cms_build(b, "k"))
              .groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt")))
    diff = merged.exceptAll(cms_build(full, "k")).count()
    assert diff == 0


def test_quantile_digest_merge_within_rank_bound(spark):
    """Digests built per shard, merged globally: every estimated quantile's
    true rank must sit within the documented N/k + N/accuracy bound."""
    from etl_mark1_spark.operators.sketches import (
        quantile_digest_quantiles, quantile_digest_rollup)

    n, k = 4000, 64
    vals = [((i * 7919) % n, float((i * 104729) % 10000)) for i in range(n)]
    df = spark.createDataFrame([(i % 5, v) for i, v in vals], ["g", "v"])
    rollup = quantile_digest_rollup(df, ["g"], "v", k=k)
    est = {r.q: r.value
           for r in quantile_digest_quantiles(
               rollup, [0.25, 0.5, 0.9], k=k).collect()}
    ordered = sorted(v for _, v in vals)
    bound = n / k + n / 10000 + 1
    for label, p in (("p25", 0.25), ("p50", 0.5), ("p90", 0.9)):
        rank = sum(1 for v in ordered if v <= est[label])
        assert abs(rank - p * n) <= bound, (label, rank, p * n)


def test_quantile_digest_merge_is_sharding_invariant_within_bound(spark):
    """One digest over everything vs four shard digests merged: both
    estimates must land within the rank bound of the same target — the
    mergeability property that lets rollups answer coarser ranges."""
    from etl_mark1_spark.operators.sketches import (
        quantile_digest_quantiles, quantile_digest_rollup)

    n, k = 2000, 64
    rows = [(i % 4, float((i * 31) % 997)) for i in range(n)]
    df = spark.createDataFrame(rows, ["shard", "v"])
    whole = quantile_digest_rollup(df.withColumn("shard", df.shard * 0),
                                   ["shard"], "v", k=k)
    sharded = quantile_digest_rollup(df, ["shard"], "v", k=k)
    ordered = sorted(v for _, v in rows)
    bound = n / k + n / 10000 + 1
    for rollup in (whole, sharded):
        got = {r.q: r.value for r in
               quantile_digest_quantiles(rollup, [0.5], k=k).collect()}
        rank = sum(1 for v in ordered if v <= got["p50"])
        assert abs(rank - 0.5 * n) <= bound


def test_exact_ntile_matches_window_ntile_with_ties(spark):
    """Bucket-for-bucket equal to ntile() OVER (ORDER BY v, id) on data
    full of ties, for bucket counts that do and don't divide n."""
    from pyspark.sql import Window

    from etl_mark1_spark.operators.sketches import exact_ntile

    rows = [(i, float((i * 13) % 7)) for i in range(101)]  # heavy ties
    df = spark.createDataFrame(rows, ["id", "v"])
    for k in (2, 4, 7, 10):
        got = {r.id: r.q
               for r in exact_ntile(df, "v", ["id"], k,
                                    num_shards=8).collect()}
        w = Window.orderBy("v", "id")
        want = {r.id: r.q for r in
                df.withColumn("q", F.ntile(k).over(w).cast("bigint"))
                .collect()}
        assert got == want, f"k={k}"


def test_exact_ntile_plan_has_no_empty_partition_window(spark):
    import re

    from etl_mark1_spark.operators.sketches import exact_ntile

    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v"))
    out = exact_ntile(df, "v", ["id"], 4, num_shards=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, plan
    assert all("_xnq" in s for s in specs), specs
