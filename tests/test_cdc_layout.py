"""CDC merge semantics (operators/cdc.py), Z-order layout pruning
(operators/layout.py), and deterministic weighted sampling
(operators/corpus.py:weighted_sample); cross-engine value parity is the
upsert_orders / scd2_customers / zorder_values / weighted_sample_quality
oracles."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_mark1_spark.operators.cdc import scd2_apply, upsert
from etl_mark1_spark.operators.corpus import md5_uniform, weighted_sample
from etl_mark1_spark.operators.layout import (quantize, spread_bits, zvalue,
                                              zorder_write)


# -- upsert -----------------------------------------------------------------

def test_upsert_updates_win_new_keys_append(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    updates = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k int, v string")
    out = {r.k: r.v for r in upsert(base, updates, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_upsert_composite_key_and_duplicate_update_keys(spark):
    base = spark.createDataFrame([(1, "x", 10.0)], "k1 int, k2 string, v double")
    # two update rows for the same key both survive (last-write-wins is the
    # caller's dedup job; upsert must not silently drop either)
    updates = spark.createDataFrame(
        [(1, "x", 11.0), (1, "x", 12.0)], "k1 int, k2 string, v double")
    rows = upsert(base, updates, ["k1", "k2"]).collect()
    assert sorted(r.v for r in rows) == [11.0, 12.0]


# -- scd2 -------------------------------------------------------------------

import datetime

SCD_SCHEMA = ("k int, attr string, extra string, valid_from timestamp, "
              "valid_to timestamp, is_current boolean")
T0 = datetime.datetime(2020, 1, 1)
T1 = datetime.datetime(2024, 6, 1)


def test_scd2_versions_changed_keeps_unchanged_opens_new(spark):
    current = spark.createDataFrame(
        [(1, "red", "e1", T0, None, True),
         (2, "blue", "e2", T0, None, True)],
        SCD_SCHEMA)
    incoming = spark.createDataFrame(
        [(1, "green"), (2, "blue"), (3, "black")], "k int, attr string")
    out = scd2_apply(current, incoming, ["k"], ["attr"], T1)
    rows = sorted(out.collect(), key=lambda r: (r.k, str(r.valid_from)))

    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    # key 1 changed: closed old row + new open row
    assert [(r.attr, r.is_current) for r in by_key[1]] == \
        [("red", False), ("green", True)]
    assert str(by_key[1][0].valid_to) == "2024-06-01 00:00:00"
    # untracked attribute carries forward into the new version
    assert by_key[1][1].extra == "e1"
    # key 2 unchanged: single open row untouched
    assert [(r.attr, r.is_current, r.valid_to) for r in by_key[2]] == \
        [("blue", True, None)]
    # key 3 new: first version opens at effective_ts
    assert [(r.attr, r.is_current, r.extra) for r in by_key[3]] == \
        [("black", True, None)]
    assert str(by_key[3][0].valid_from) == "2024-06-01 00:00:00"


def test_scd2_closed_history_and_absent_keys_pass_through(spark):
    current = spark.createDataFrame(
        [(1, "v1", None, T0, T1, False),     # closed history row
         (1, "v2", None, T1, None, True),    # its open successor
         (9, "keep", None, T0, None, True)],  # key absent from incoming
        SCD_SCHEMA)
    incoming = spark.createDataFrame([(1, "v2")], "k int, attr string")
    out = scd2_apply(current, incoming, ["k"], ["attr"],
                     "2025-01-01 00:00:00")
    rows = out.collect()
    assert len(rows) == 3            # nothing added, nothing lost
    assert {(r.k, r.attr, r.is_current) for r in rows} == \
        {(1, "v1", False), (1, "v2", True), (9, "keep", True)}


def test_scd2_null_transitions_version(spark):
    # NULL -> value and value -> NULL are real changes (null-safe compare)
    current = spark.createDataFrame(
        [(1, None, None, T0, None, True),
         (2, "x", None, T0, None, True)], SCD_SCHEMA)
    incoming = spark.createDataFrame(
        [(1, "now-set"), (2, None)], "k int, attr string")
    out = scd2_apply(current, incoming, ["k"], ["attr"], T1)
    open_attrs = {r.k: r.attr for r in out.filter("is_current").collect()}
    assert open_attrs == {1: "now-set", 2: None}
    assert out.filter("NOT is_current").count() == 2


# -- weighted sampling ------------------------------------------------------

def test_md5_uniform_range_and_determinism(spark):
    df = spark.range(2000).select(md5_uniform(F.col("id")).alias("u"))
    stats = df.agg(F.min("u").alias("lo"), F.max("u").alias("hi"),
                   F.avg("u").alias("mu")).first()
    assert 0.0 <= stats.lo and stats.hi < 1.0
    assert 0.4 < stats.mu < 0.6          # roughly uniform
    # same ids -> same values, regardless of partitioning
    a = df.collect()
    b = spark.range(2000).repartition(7).select(
        md5_uniform(F.col("id")).alias("u")).collect()
    assert sorted(r.u for r in a) == sorted(r.u for r in b)


def test_weighted_sample_membership_and_fraction(spark):
    df = spark.range(4000).select(F.col("id").alias("doc_id"),
                                  (F.col("id") % 100).alias("score"))
    out = weighted_sample(df, F.col("score") / 100.0)
    kept = {r.doc_id for r in out.collect()}
    # deterministic: second run identical
    assert {r.doc_id for r in out.collect()} == kept
    # expected fraction = avg(weight) ~ 0.495; allow sampling noise
    assert 0.40 < len(kept) / 4000 < 0.60
    # weight 0 rows can never survive, weight >= 1 always survive
    zero = weighted_sample(df, F.lit(0.0)).count()
    assert zero == 0
    assert weighted_sample(df, F.lit(5.0)).count() == 4000


# -- z-order ----------------------------------------------------------------

def _spread_py(v):
    v &= 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def test_spread_bits_and_zvalue_match_reference_bit_math(spark):
    vals = [0, 1, 2, 3, 255, 256, 0x5555, 0xAAAA, 0xFFFF]
    df = spark.createDataFrame([(a, b) for a in vals for b in vals],
                               "a long, b long")
    got = df.select("a", "b",
                    spread_bits(F.col("a")).alias("s"),
                    zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r.s == _spread_py(r.a)
        assert r.z == _spread_py(r.a) | (_spread_py(r.b) << 1)


def test_quantize_clamps_and_spans(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (999.0,)],
                               "x double")
    got = [r.q for r in
           df.select(quantize(F.col("x"), 0.0, 100.0).alias("q")).collect()]
    assert got[0] == 0 and got[1] == 0          # below-range clamps to 0
    assert got[3] == got[4] == 65535            # above-range clamps to max
    assert 0 < got[2] < 65535


def test_zorder_write_files_are_tight_in_both_dims(spark, tmp_path):
    # uniform grid over (x, y): a z-ordered layout must give every file a
    # small bounding rectangle in BOTH dimensions, which is exactly what
    # parquet min-max pruning needs. A single-column sort would leave y
    # spanning the full range in every file.
    n = 64
    df = spark.range(n * n).select(
        (F.col("id") % n).cast("double").alias("x"),
        (F.col("id") / n).cast("long").cast("double").alias("y"))
    path = str(tmp_path / "zorder")
    zorder_write(df, path, [("x", 0.0, float(n - 1)),
                            ("y", 0.0, float(n - 1))], num_files=16)

    files = glob.glob(path + "/*.parquet")
    assert len(files) >= 8
    spans = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        cols = {meta.schema.column(i).name: i
                for i in range(meta.num_columns)}
        lo_x = hi_x = lo_y = hi_y = None
        for rg in range(meta.num_row_groups):
            sx = meta.row_group(rg).column(cols["x"]).statistics
            sy = meta.row_group(rg).column(cols["y"]).statistics
            lo_x = sx.min if lo_x is None else min(lo_x, sx.min)
            hi_x = sx.max if hi_x is None else max(hi_x, sx.max)
            lo_y = sy.min if lo_y is None else min(lo_y, sy.min)
            hi_y = sy.max if hi_y is None else max(hi_y, sy.max)
        spans.append(((hi_x - lo_x) / (n - 1), (hi_y - lo_y) / (n - 1)))

    # average bounding-rectangle AREA across files: z-order keeps it small
    # (each file covers ~1/16 of the plane => area ~0.0625-0.25); any
    # layout that leaves one dimension unsorted has area ~1.0 per file.
    avg_area = sum(w * h for w, h in spans) / len(spans)
    assert avg_area < 0.5, spans
    # and a selective predicate on EACH dim individually skips most files
    for col_name in ("x", "y"):
        hit = sum(1 for f in files if _file_overlaps(
            pq.ParquetFile(f).metadata, col_name, 0.0, 0.2 * (n - 1)))
        assert hit < len(files), (col_name, spans)


def _file_overlaps(meta, col_name, lo, hi):
    cols = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
    for rg in range(meta.num_row_groups):
        s = meta.row_group(rg).column(cols[col_name]).statistics
        if s.min <= hi and s.max >= lo:
            return True
    return False


# -- incremental aggregate maintenance --------------------------------------

def test_merge_aggregates_equals_full_recompute(spark):
    full = spark.range(1000).select(
        (F.col("id") % 5).alias("k"), F.col("id").cast("double").alias("v"))
    history = full.filter(F.col("id") % 3 != 0)
    delta = full.filter(F.col("id") % 3 == 0)
    measures = {"n": ("v", "count"), "s": ("v", "sum"),
                "lo": ("v", "min"), "hi": ("v", "max")}
    base = history.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("lo"), F.max("v").alias("hi"))
    from etl_mark1_spark.operators.cdc import merge_aggregates
    merged = {r.k: (r.n, r.s, r.lo, r.hi)
              for r in merge_aggregates(base, delta, ["k"],
                                        measures).collect()}
    expect = {r.k: (r.n, r.s, r.lo, r.hi)
              for r in full.groupBy("k").agg(
                  F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                  F.min("v").alias("lo"), F.max("v").alias("hi")).collect()}
    assert merged == expect


def test_merge_aggregates_new_and_untouched_keys(spark):
    from etl_mark1_spark.operators.cdc import merge_aggregates
    base = spark.createDataFrame([(1, 2, 10.0), (2, 1, 5.0)],
                                 "k int, n long, s double")
    delta = spark.createDataFrame([(2, 7.0), (3, 1.0)], "k int, v double")
    got = {r.k: (r.n, r.s) for r in merge_aggregates(
        base, delta, ["k"], {"n": ("v", "count"), "s": ("v", "sum")}
    ).collect()}
    assert got == {1: (2, 10.0),      # untouched key passes through
                   2: (2, 12.0),      # merged
                   3: (1, 1.0)}       # brand-new key

    with pytest.raises(ValueError, match="not decomposable"):
        merge_aggregates(base, delta, ["k"], {"a": ("v", "avg")})


# -- compaction -------------------------------------------------------------

def test_compact_files_reduces_count_keeps_rows(spark, tmp_path):
    from etl_mark1_spark.operators.layout import compact_files
    path = str(tmp_path / "frag")
    df = spark.range(10_000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    df.repartition(40).write.parquet(path)
    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 30
    n = compact_files(spark, path, target_bytes=10 * 1024 * 1024)
    after = glob.glob(path + "/*.parquet")
    assert len(after) == n < before
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(10_000))


def test_snapshot_diff_classifies_changes_null_safely(spark):
    from etl_mark1_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)],
        ["k", "name", "v"])
    new = spark.createDataFrame(
        [(2, "b", 2.5), (3, "c", None), (4, "d", 4.0)],
        ["k", "name", "v"])
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(out) == {1, 2, 4}          # key 3 unchanged (null-safe)
    assert out[1].change_type == "delete" and out[1].old_name == "a"
    assert out[2].change_type == "update"
    assert (out[2].old_v, out[2].new_v) == (2.0, 2.5)
    assert out[4].change_type == "insert" and out[4].new_v == 4.0
    assert out[4].old_name is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(old, new.withColumnRenamed("v", "w"), ["k"])


# -- bucketed tables: the co-located join layout ------------------------------

def test_bucketed_tables_join_and_agg_without_shuffle(spark, sf_dir, tmp_path):
    """write_bucketed_table: two tables bucketed on the join key with the
    same bucket count must sort-merge-join with NO Exchange on either
    side (the scan reports the hash-clustering), and a groupBy on the
    bucket key must aggregate without its exchange — the storage layout
    that amortizes one bucketing shuffle across every downstream join or
    aggregation on that key."""
    from etl_mark1_spark.sources.writers import write_bucketed_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(orders, "orders_bkt", ["o_custkey"], 8,
                             sort_cols=["o_custkey"],
                             path=str(tmp_path / "orders_bkt"))
        write_bucketed_table(cust, "customer_bkt", ["c_custkey"], 8,
                             sort_cols=["c_custkey"],
                             path=str(tmp_path / "customer_bkt"))
        ob, cb = spark.table("orders_bkt"), spark.table("customer_bkt")

        joined = ob.join(cb, ob.o_custkey == cb.c_custkey) \
            .select("o_orderkey", "c_name")
        n = joined.count()
        assert n == orders.join(
            cust, orders.o_custkey == cust.c_custkey).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan   # neither side shuffles
        assert "SortMergeJoin" in plan

        agg = ob.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
        total = agg.agg(F.sum("n")).first()[0]
        assert total == orders.count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan  # clustering satisfies the agg
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")
