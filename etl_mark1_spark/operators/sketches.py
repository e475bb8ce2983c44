"""Sketch-based approximate aggregation: the mergeable-partial pattern.

Exact DISTINCT / percentiles over 100 TB force a full shuffle of every key
occurrence. The scale pattern is to aggregate ONCE into tiny mergeable
sketches (HLL for distinct, KLL/GK for quantiles, count-min for frequency)
partitioned by a rollup key (day, tenant, ...), persist those, and answer
any coarser query by MERGING sketches — no second pass over the raw data.
This is the continuous-aggregate / hypertable-rollup idea: a year of
distinct-user queries over any date range costs a scan of 365 sketch rows,
not 100 TB.

Spark 4 ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``), so the whole pipeline stays
JVM-side; a union of per-partition sketches built at the same lgK is
lossless with respect to the single-pass sketch.

The exact variants here (two-phase distinct rollup, exact heavy hitters)
are shuffle-disciplined formulations of the same questions for when the
answer must be exact — both oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hll_rollup", "hll_estimate_over", "exact_distinct_rollup",
           "heavy_hitters", "approx_ntile", "cms_build", "cms_estimate",
           "quantile_digest_rollup", "quantile_digest_quantiles",
           "two_phase_prefix_sum", "exact_ntile"]


def hll_rollup(df: DataFrame, keys: list[str], col: str,
               lgk: int = 12) -> DataFrame:
    """One HLL sketch per ``keys`` group over ``col`` — the materialized
    rollup. ~2^lgk bytes per group regardless of cardinality; map-side
    partial sketches merge in the exchange, so the shuffle carries
    sketches, not raw keys."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("hll"))


def hll_estimate_over(rollup: DataFrame, group_cols: list[str]) -> DataFrame:
    """Answer a coarser-grained distinct count by merging rollup sketches.
    ``group_cols`` must be a subset of the rollup's key columns; the raw
    data is never touched."""
    return rollup.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll"))
        .cast("bigint").alias("approx_distinct"))


def exact_distinct_rollup(df: DataFrame, keys: list[str],
                          col: str) -> DataFrame:
    """Exact per-group distinct counts via the two-phase formulation:
    dedup (keys, col) pairs first (map-side partial dedup shrinks the
    exchange to unique pairs), then count per group. Equivalent to
    COUNT(DISTINCT col) but with the shuffle bounded by unique pairs
    instead of raw rows — the exact-answer sibling of :func:`hll_rollup`.
    """
    return (df.select(*keys, col).distinct()
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct")))


def heavy_hitters(df: DataFrame, col: str | Column,
                  min_share: float) -> DataFrame:
    """Exact heavy hitters: values of ``col`` occurring in at least
    ``min_share`` of rows. Two aggregations over already-reduced counts —
    the global total re-aggregates the per-value counts — and the share
    test cross-multiplies (n * 1/share >= total) so the comparison stays
    in exact integers when ``min_share`` is a unit fraction."""
    c = F.col(col) if isinstance(col, str) else col
    counts = df.groupBy(c.alias("value")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("n") >= F.col("total") * F.lit(min_share))
            .select("value", "n"))


def approx_ntile(df: DataFrame, col: str, num_buckets: int = 4,
                 accuracy: int = 10000, out_col: str = "q") -> DataFrame:
    """Scale-safe ntile: sketch quantile cutoffs + map-side bucketing.

    Exact ``ntile(n) OVER (ORDER BY col)`` plans a WindowExec with no
    PARTITION BY — every row moves to ONE partition for a global sort, a
    scale-killer at 100 TB. This computes the ``num_buckets - 1`` interior
    cutoffs with a single decomposable aggregate (``approx_percentile``,
    KLL-style sketch with rank error <= rows/accuracy per cutoff; partial
    sketches merge map-side), broadcasts the one-row cutoff frame, and
    assigns buckets with a pure map-side comparison chain — no sort, no
    window, no single-partition stage.

    Bucket populations match exact ntile within ~2*rows/accuracy per
    boundary plus the mass of values tied exactly at a cutoff (ties all
    land in the lower bucket, where ntile would split them by rank).

    Buckets are contiguous value ranges and ordered: every value in
    bucket i is <= every value in bucket i+1, and equal values always
    share a bucket — which is what lets two-phase prefix sums (see
    operators/corpus.py:pack_sequences) use these buckets as parallel
    shards of a global ordering.

    Returns ``df`` plus a BIGINT ``out_col`` column in ``1..num_buckets``.
    """
    probs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = df.agg(F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probs]),
        F.lit(accuracy)).alias("_cuts"))
    bucket: Column = F.lit(1)
    for i in range(num_buckets - 1):
        bucket = bucket + F.when(F.col(col) > F.col("_cuts")[i],
                                 1).otherwise(0)
    return (df.crossJoin(F.broadcast(cuts))
            .withColumn(out_col, bucket.cast("bigint"))
            .drop("_cuts"))


# -- count-min sketch -------------------------------------------------------

def cms_build(df: DataFrame, key_col: str, width: int = 2048,
              depth: int = 4) -> DataFrame:
    """Count-min sketch of a key column as a (seed, bucket, cnt) table —
    the frequency sketch completing the trio with HLL (distinct) and the
    Bloom filter (membership).

    Decomposable like hll_rollup: each task emits at most depth*width
    partial cells regardless of row count (map-side combine), two
    sketches merge by summing cells, and the whole sketch is
    depth*width*16 bytes no matter how many billions of rows it
    summarizes. Seeded xxhash64 rows play the pairwise-independent hash
    family."""
    cells = df.select(F.explode(F.array(*[
        F.struct(F.lit(s).alias("seed"),
                 F.pmod(F.xxhash64(F.col(key_col), F.lit(s)),
                        F.lit(width)).alias("bucket"))
        for s in range(depth)])).alias("c"))
    return (cells.groupBy(F.col("c.seed").alias("seed"),
                          F.col("c.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(cms: DataFrame, keys: DataFrame, key_col: str,
                 width: int = 2048, depth: int = 4) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a cms_build sketch:
    min over the depth rows of the key's bucket count. Estimates never
    undercount; overcounts come only from bucket collisions (expected
    excess <= N/width per seed, and the min over seeds keeps the best
    row). The sketch is depth*width cells, so it BROADCASTS onto the
    (usually tiny) key set."""
    probes = keys.select(key_col, F.explode(F.array(*[
        F.struct(F.lit(s).alias("seed"),
                 F.pmod(F.xxhash64(F.col(key_col), F.lit(s)),
                        F.lit(width)).alias("bucket"))
        for s in range(depth)])).alias("p"))
    joined = probes.join(
        F.broadcast(cms),
        (F.col("p.seed") == F.col("seed"))
        & (F.col("p.bucket") == F.col("bucket")), "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("bigint").alias("est_count")))


# -- mergeable quantile digest ----------------------------------------------

def quantile_digest_rollup(df: DataFrame, keys: list[str], col: str,
                           k: int = 128,
                           accuracy: int = 10000) -> DataFrame:
    """Per-group mergeable quantile digest: ``k + 1`` equi-depth centroid
    values (the group's 0/k, 1/k, ..., k/k quantiles) plus the group row
    count — the quantile member of the sketch family (HLL = distinct,
    count-min = frequency, Bloom = membership).

    One decomposable aggregate builds every digest (``percentile_approx``
    is a KLL-style sketch whose partials merge map-side), each digest is
    ~8(k+1) bytes regardless of group size, and any coarser grouping is
    answered by :func:`quantile_digest_quantiles` over digests alone —
    the raw rows are never touched again, the hypertable-rollup property
    that makes "p95 over any date range" affordable at 100 TB.
    """
    probs = [i / k for i in range(k + 1)]
    return df.groupBy(*keys).agg(
        F.percentile_approx(col, F.array(*[F.lit(p) for p in probs]),
                            F.lit(accuracy)).alias("centroids"),
        F.count(col).alias("n"))


def quantile_digest_quantiles(rollup: DataFrame, probs: list[float],
                              k: int = 128) -> DataFrame:
    """Merge a :func:`quantile_digest_rollup` into global quantile
    estimates: each group's interior centroid ``i`` carries mass ``n/k``
    at its value (the right endpoint of equi-depth bin ``i``), and the
    merged estimate for ``p`` is the smallest centroid whose cumulative
    mass reaches ``p * N``. Returns (q, value) with q = 'p25'-style
    labels.

    Rank error: the sketch contributes <= n_g/accuracy per group and the
    equi-depth discretization <= n_g/k, so the merged estimate's true
    rank is within ~N/k + N/accuracy of target — with the defaults under
    1% of N. The merge itself runs over DIGESTS ONLY (groups x k rows,
    metadata-sized): the ORDER BY window below sorts that summary table,
    never the data, so a single-partition window is the right plan.
    """
    cent = (rollup.select("n", F.posexplode("centroids")
                          .alias("_i", "value"))
            .filter(F.col("_i") >= 1)
            .select("value",
                    (F.col("n").cast("double") / F.lit(k)).alias("_w")))
    total = cent.agg(F.sum("_w").alias("_total"))
    w = Window.orderBy("value", "_w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = (cent.withColumn("_cum", F.sum("_w").over(w))
           .crossJoin(F.broadcast(total)))
    targets = F.array(*[F.struct(F.lit(f"p{round(p * 100)}").alias("q"),
                                 F.lit(p).alias("_p")) for p in probs])
    probed = (cum.select("value", "_cum", "_total",
                         F.explode(targets).alias("t"))
              .filter(F.col("_cum") >= F.col("t._p") * F.col("_total")))
    return (probed.groupBy(F.col("t.q").alias("q"))
            .agg(F.min("value").alias("value")))


def two_phase_prefix_sum(df: DataFrame, order_col: str,
                         sum_cols: list[str],
                         num_shards: int = 32) -> DataFrame:
    """EXACT global running sums (inclusive, in ``order_col`` order) of
    each column in ``sum_cols``, without a single-partition window: the
    shared scale primitive behind global packing (corpus.py:
    pack_sequences), CDF construction (quality.py:ks_drift), and
    percentile ranks.

    Phase 1 shards rows into ``num_shards`` contiguous ``order_col``
    ranges via sketch quantile cutoffs (:func:`approx_ntile` — one
    decomposable aggregate; equal values always share a shard, so shard
    boundaries never split a tie group mid-sum); phase 2 computes
    within-shard prefix sums in parallel windows and folds shard totals
    into broadcast cumulative offsets (a triangular join over
    ``num_shards`` rows — metadata-sized). Output: ``df`` plus a
    ``{col}_cum`` BIGINT-or-original-typed column per requested column.

    Ties: all rows sharing an ``order_col`` value get DIFFERENT running
    sums (row order within ties follows the within-shard window, which is
    deterministic only up to tie order) — callers needing tie-collapsed
    semantics (CDFs) should pre-aggregate to distinct ``order_col`` rows
    first, as ks_drift does.
    """
    bucketed = approx_ntile(df, order_col, num_buckets=num_shards,
                            out_col="_tps_q")
    w = (Window.partitionBy("_tps_q").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    totals = bucketed.groupBy("_tps_q").agg(
        *[F.sum(c).alias(f"_tot_{c}") for c in sum_cols])
    offsets = (totals.alias("a")
               .join(F.broadcast(totals.alias("b")),
                     F.col("b._tps_q") < F.col("a._tps_q"), "left")
               .groupBy(F.col("a._tps_q").alias("_tps_q"))
               .agg(*[F.coalesce(F.sum(f"b._tot_{c}"), F.lit(0))
                      .alias(f"_off_{c}") for c in sum_cols]))
    out = bucketed
    for c in sum_cols:
        out = out.withColumn(f"_w_{c}", F.sum(c).over(w))
    out = out.join(F.broadcast(offsets), "_tps_q")
    for c in sum_cols:
        out = (out.withColumn(f"{c}_cum",
                              F.col(f"_w_{c}") + F.col(f"_off_{c}"))
               .drop(f"_w_{c}", f"_off_{c}"))
    return out.drop("_tps_q")


def exact_ntile(df: DataFrame, value_col: str,
                tiebreak_cols: list[str], num_buckets: int,
                out_col: str = "q", num_shards: int = 32) -> DataFrame:
    """EXACT ``ntile(num_buckets) OVER (ORDER BY value, tiebreaks)`` —
    identical bucket assignment to the SQL window, including the
    first-buckets-get-the-remainder size rule — without the
    single-partition global sort that window plans.

    Two-phase, like :func:`two_phase_prefix_sum`: sketch-cutoff shards of
    ``value_col`` (equal values never split across shards), exact
    within-shard ``row_number`` over (value, tiebreaks) in parallel
    windows, broadcast shard-count offsets to make the global rank, then
    the closed-form ntile bucket from (rank, n): the first ``n mod k``
    buckets hold ``n//k + 1`` rows, the rest ``n//k``.
    """
    bucketed = approx_ntile(df, value_col, num_buckets=num_shards,
                            out_col="_xnq")
    w = Window.partitionBy("_xnq").orderBy(value_col, *tiebreak_cols)
    counts = bucketed.groupBy("_xnq").agg(F.count(F.lit(1)).alias("_c"))
    offsets = (counts.alias("a")
               .join(F.broadcast(counts.alias("b")),
                     F.col("b._xnq") < F.col("a._xnq"), "left")
               .groupBy(F.col("a._xnq").alias("_xnq"))
               .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off")))
    total = counts.agg(F.sum("_c").alias("_n"))
    ranked = (bucketed
              .withColumn("_rn", F.row_number().over(w))
              .join(F.broadcast(offsets), "_xnq")
              .crossJoin(F.broadcast(total))
              .withColumn("_rank", F.col("_rn") + F.col("_off")))
    k = F.lit(num_buckets)
    qsize = F.floor(F.col("_n") / k)            # small-bucket size
    rem = F.col("_n") % k                       # buckets holding qsize+1
    big_span = rem * (qsize + 1)                # ranks in the big buckets
    bucket = (F.when(F.col("_rank") <= big_span,
                     F.floor((F.col("_rank") - 1) / (qsize + 1)) + 1)
              .otherwise(rem + F.floor((F.col("_rank") - 1 - big_span)
                                       / F.greatest(qsize, F.lit(1))) + 1))
    return (ranked.withColumn(out_col, bucket.cast("bigint"))
            .drop("_xnq", "_rn", "_off", "_n", "_rank"))
