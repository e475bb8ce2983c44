"""Skew-mitigation helpers for heavy aggregations at scale.

AQE's skew-join splitting handles joins, but a groupBy whose key
distribution is pathological (one key owning half the table) still funnels
one reducer. ``salted_aggregate`` is the classic two-phase rewrite: salt the
key space, partially aggregate per (key, salt), then merge partials per key
— two small shuffles instead of one hot one. Only decomposable aggregates
(sum/count/min/max and anything with a merge function) qualify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
