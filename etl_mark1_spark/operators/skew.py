"""Skew-mitigation helpers for heavy aggregations at scale.

AQE's skew-join splitting handles joins, but a groupBy whose key
distribution is pathological (one key owning half the table) still funnels
one reducer. ``salted_aggregate`` is the classic two-phase rewrite: salt the
key space, partially aggregate per (key, salt), then merge partials per key
— two small shuffles instead of one hot one. Only decomposable aggregates
(sum/count/min/max and anything with a merge function) qualify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: merge function for each partial aggregate
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    group_by: list[str],
    aggregations: dict[str, str],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted groupBy: ``aggregations`` maps column -> fn name in
    {sum, count, min, max}; outputs are aliased ``{col}_{fn}`` like the A1
    aggregate step. Results are identical to a direct groupBy — the salt
    only changes the shuffle shape.
    """
    for fn in aggregations.values():
        if fn not in _MERGE:
            raise ValueError(f"{fn} is not decomposable; use a direct groupBy")

    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*group_by, "_salt").agg(*[
        F.expr(f"{fn}(`{col}`)").alias(f"_p_{col}_{fn}")
        for col, fn in aggregations.items()
    ])
    return partial.groupBy(*group_by).agg(*[
        _MERGE[fn](F.col(f"_p_{col}_{fn}")).alias(f"{col}_{fn}")
        for col, fn in aggregations.items()
    ])


def salted_join(left: DataFrame, right: DataFrame, on: list[str] | str,
                how: str = "inner", num_salts: int = 16) -> DataFrame:
    """Skew-proof equi-join: salt the (big, skewed) left side with a random
    bucket and replicate the right side across all buckets, so one hot key
    spreads over ``num_salts`` reducers instead of funneling into one.

    Results are identical to ``left.join(right, on, how)`` — salt never
    reaches the output. Cost: the right side shuffles ``num_salts``-fold,
    so use it when right is small-ish but past the broadcast threshold and
    AQE's skew splitting hasn't kicked in (e.g. a forced sort-merge against
    a pre-partitioned table). ``how`` supports inner/left joins (the
    replicated right side makes right/full-outer dedup ambiguous — refused).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            "salted_join supports inner/left joins; a replicated right side "
            "cannot express right/full outer semantics")
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=42) * num_salts).cast("int"))
    salts = left.sparkSession.range(num_salts) \
        .select(F.col("id").cast("int").alias("_salt"))
    replicated = right.crossJoin(salts)
    return (salted_left.join(replicated, [*keys, "_salt"], how)
            .drop("_salt"))


def key_skew_report(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Skew diagnostic for a prospective shuffle key: the top-``top_k``
    keys by row count with their corpus share and their ratio to the
    mean per-key load — the report that decides, BEFORE a 100 TB
    shuffle, whether a key needs salting (`salted_aggregate` /
    `salted_join`) or AQE skew-join can absorb it (rule of thumb: a
    head key holding >> 1/parallelism of the rows will straggle).

    One per-key count with map-side partials; the summary scalars
    (total rows, key cardinality) aggregate that key-cardinality frame
    and broadcast back onto it; top-k is orderBy+limit, which compiles
    to TakeOrderedAndProject (per-partition heaps, no global sort).
    Returns (rank, key, cnt, share, skew_ratio) — ``skew_ratio`` is the
    key's count over the mean per-key count."""
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    summary = counts.agg(F.sum("cnt").alias("_total"),
                         F.count(F.lit(1)).alias("_nkeys"))
    top = counts.orderBy(F.desc("cnt"), "key").limit(top_k)
    w = Window.orderBy(F.desc("cnt"), "key")
    return (top.crossJoin(F.broadcast(summary))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .select("rank", "key", "cnt",
                    F.round(F.col("cnt") / F.col("_total"), 6)
                    .alias("share"),
                    F.round(F.col("cnt") * F.col("_nkeys")
                            / F.col("_total"), 6).alias("skew_ratio")))
