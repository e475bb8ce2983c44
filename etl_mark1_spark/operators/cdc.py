"""Change-data-capture operators: keyed upsert (MERGE) and SCD Type 2.

The reference's sinks are append/overwrite only (writers at
backend/services/duckdb_engine.py:370-395 and connectors/builtin.py write
whole results); a warehouse-grade pipeline also needs keyed merges. Both
operators here are pure DataFrame algebra — one shuffle on the merge key,
broadcastable when the change batch is small — so they compose with any
sink (including ``write_file(partition_by=...)``) and survive scale: no
driver-side diffing, no per-row Python.

At 100 TB the copy-on-write pattern is: partition the base table on a
stable key bucket, apply :func:`upsert` / :func:`scd2_apply` only to the
partitions the change batch touches (predicate on the bucket column prunes
the rest), and rewrite those partitions atomically.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["upsert", "scd2_apply", "merge_aggregates", "snapshot_diff"]


def upsert(existing: DataFrame, updates: DataFrame,
           key_cols: list[str]) -> DataFrame:
    """MERGE semantics by key: rows of ``updates`` win over same-key rows of
    ``existing``; unmatched existing rows pass through; new keys append.

    Shape: one left-anti join on the key (shuffle on key, or broadcast of
    ``updates`` when small — Spark picks via AQE) + a union. Schemas must
    agree by name (``unionByName``) so callers can evolve column order
    freely.
    """
    survivors = existing.join(updates.select(*key_cols).distinct(),
                              key_cols, "left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_ts: str,
    *,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: apply an ``incoming`` snapshot of
    (key, tracked attributes) to a versioned ``current`` dimension.

    ``current`` carries ``valid_from``/``valid_to``/``is_current``; a key
    whose tracked attributes changed gets its open row closed at
    ``effective_ts`` and a new open row appended. Unchanged keys, already-
    closed history rows, and keys absent from ``incoming`` pass through
    untouched. New keys open their first version at ``effective_ts``.

    One equi-join on the key decides changed/new; comparisons are null-safe
    (``<=>``) so NULL -> value transitions version correctly.
    """
    eff = F.lit(effective_ts).cast("timestamp")
    dim_cols = current.columns
    attr_cols = [c for c in dim_cols
                 if c not in (valid_from_col, valid_to_col, current_col)]

    open_rows = current.filter(F.col(current_col))
    closed_rows = current.filter(~F.col(current_col))

    inc = incoming.withColumn("_inc_present", F.lit(True))
    joined = open_rows.withColumn("_cur_present", F.lit(True)).alias("cur") \
        .join(inc.alias("inc"), key_cols, "full_outer")

    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"cur.{c}").eqNullSafe(F.col(f"inc.{c}"))
         for c in tracked_cols],
    )
    # presence markers, not null-probes: an incoming row whose tracked
    # attributes are all NULL is still a real version
    has_cur = F.coalesce(F.col("cur._cur_present"), F.lit(False))
    has_inc = F.coalesce(F.col("inc._inc_present"), F.lit(False))

    def cur_row(valid_to, is_current):
        return [F.col(f"cur.{c}").alias(c) for c in attr_cols] + [
            F.col(f"cur.{valid_from_col}").alias(valid_from_col),
            valid_to.alias(valid_to_col),
            is_current.alias(current_col),
        ]

    # 1. open rows whose key is untouched or unchanged: pass through
    unchanged = joined.filter(has_cur & (~has_inc | ~changed)) \
        .select(*cur_row(F.col(f"cur.{valid_to_col}"), F.lit(True)))
    # 2. open rows with a changed incoming version: close at effective_ts
    closed_out = joined.filter(has_cur & has_inc & changed) \
        .select(*cur_row(eff, F.lit(False)))

    # 3. new versions (changed keys) + first versions (new keys)
    def inc_row(filter_expr):
        rows = joined.filter(filter_expr)
        cols = []
        for c in attr_cols:
            if c in key_cols:
                cols.append(F.coalesce(F.col(f"cur.{c}"),
                                       F.col(f"inc.{c}")).alias(c))
            elif c in inc.columns:
                cols.append(F.col(f"inc.{c}").alias(c))
            else:  # untracked attribute: carry forward from current
                cols.append(F.col(f"cur.{c}").alias(c))
        return rows.select(*cols, eff.alias(valid_from_col),
                           F.lit(None).cast("timestamp").alias(valid_to_col),
                           F.lit(True).alias(current_col))

    new_versions = inc_row(has_cur & has_inc & changed)
    first_versions = inc_row(~has_cur)

    return (closed_rows
            .unionByName(unchanged)
            .unionByName(closed_out)
            .unionByName(new_versions)
            .unionByName(first_versions))


_MERGE_FNS = {"sum", "count", "min", "max"}


def merge_aggregates(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Incremental maintenance of a keyed aggregate table: fold a batch of
    NEW raw rows (``delta``) into an existing aggregate (``base``) without
    recomputing from the full history.

    ``measures`` maps output column -> (source column, fn) with fn in
    {sum, count, min, max} — the decomposable aggregates, whose partials
    combine associatively: sum/count add, min/max take the extreme. The
    result equals aggregating (history + delta) from scratch (the
    incremental_agg_orders oracle states exactly that), but costs one
    aggregation of the delta plus one outer join on the key — at 100 TB
    that is the difference between touching a day of data and a decade.
    Averages and other ratios belong as sum+count pairs, finalized at
    read time. Deletions/updates need a retraction stream (send the old
    row negated for sum/count; min/max are not retractable — rebuild the
    touched keys instead).
    """
    for out, (_, fn) in measures.items():
        if fn not in _MERGE_FNS:
            raise ValueError(
                f"measure {out!r}: {fn!r} is not decomposable; "
                f"supported: {sorted(_MERGE_FNS)}")

    aggs = []
    for out, (src, fn) in measures.items():
        col = (F.count(F.lit(1)) if fn == "count"
               else getattr(F, fn)(F.col(src)))
        aggs.append(col.alias(out))
    delta_agg = delta.groupBy(*key_cols).agg(*aggs)

    b, d = base.alias("b"), delta_agg.alias("d")
    joined = b.join(d, key_cols, "full_outer")
    out_cols = [
        F.coalesce(*[F.col(f"{side}.{k}") for side in ("b", "d")]).alias(k)
        for k in key_cols
    ]
    for out, (_, fn) in measures.items():
        bc, dc = F.col(f"b.{out}"), F.col(f"d.{out}")
        if fn in ("sum", "count"):
            combined = (F.coalesce(bc, F.lit(0)) + F.coalesce(dc, F.lit(0)))
        elif fn == "min":
            combined = F.least(bc, dc)  # least/greatest ignore NULLs
        else:
            combined = F.greatest(bc, dc)
        out_cols.append(combined.alias(out))
    return joined.select(*out_cols)


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: list[str]) -> DataFrame:
    """Change feed between two table snapshots (e.g. two versions of a
    sources/versioned.py table): one row per changed key with
    ``change_type`` in {insert, update, delete}. Unchanged keys are
    dropped — the feed is proportional to churn, not table size.

    One full-outer join on the key; change detection compares the
    null-safe struct of all non-key columns JVM-side. Downstream this is
    the input to incremental maintenance (merge_aggregates on the
    update/insert rows) or replication. At 100 TB: bucket both snapshots
    on the key so the join is co-partitioned, and prune untouched
    partitions first when the writer records which it rewrote.
    """
    payload = [c for c in old.columns if c not in key_cols]
    if payload != [c for c in new.columns if c not in key_cols]:
        raise ValueError("snapshot schemas differ; diff requires the same "
                         "column set on both sides")
    # qualified alias references, not df[col]: both snapshots may share
    # one lineage (e.g. two versions derived from the same base), where
    # attribute-id resolution is ambiguous in a self-join
    o = old.alias("_diff_old")
    n = new.alias("_diff_new")

    def oc(c):
        return F.col(f"_diff_old.{c}")

    def nc(c):
        return F.col(f"_diff_new.{c}")

    cond = reduce(lambda a, b: a & b,
                  [oc(k).eqNullSafe(nc(k)) for k in key_cols])
    joined = o.join(n, cond, "full_outer")
    old_key_null = reduce(lambda a, b: a & b,
                          [oc(k).isNull() for k in key_cols])
    new_key_null = reduce(lambda a, b: a & b,
                          [nc(k).isNull() for k in key_cols])
    changed = ~F.struct(*[oc(c) for c in payload]).eqNullSafe(
        F.struct(*[nc(c) for c in payload]))
    change_type = (
        F.when(old_key_null, F.lit("insert"))
        .when(new_key_null, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    keys = [F.coalesce(nc(k), oc(k)).alias(k) for k in key_cols]
    news = [nc(c).alias(f"new_{c}") for c in payload]
    olds = [oc(c).alias(f"old_{c}") for c in payload]
    return (joined.withColumn("change_type", change_type)
            .filter(F.col("change_type").isNotNull())
            .select(*keys, F.col("change_type"), *news, *olds))


def pit_lookup(facts: DataFrame, dim: DataFrame, key_cols: list[str],
               fact_ts: str = "ts", valid_from_col: str = "valid_from",
               valid_to_col: str = "valid_to",
               how: str = "left") -> DataFrame:
    """Point-in-time lookup against an SCD2 dimension: each fact row
    joins the dimension VERSION that was valid at its timestamp
    (``valid_from <= ts < valid_to``; open rows have NULL ``valid_to``)
    — the query side of :func:`scd2_apply`, and the thing that makes
    slowly-changing dimensions worth keeping (training labels and
    reports reproduce as-of the event, not as-of today).

    Shape at scale: the join keys stay the EQUALITY keys, so this plans
    as an ordinary hash/sort-merge join with the validity window as a
    residual predicate — never a range-only cross product; each key's
    versions are few, so the residual filter touches a handful of rows
    per fact.
    """
    cond = None
    for k in key_cols:
        c = facts[k] == dim[k]
        cond = c if cond is None else cond & c
    cond = cond & (facts[fact_ts] >= dim[valid_from_col]) \
        & (dim[valid_to_col].isNull() | (facts[fact_ts] < dim[valid_to_col]))
    joined = facts.join(dim, cond, how)
    drop = [dim[k] for k in key_cols]
    for c in drop:
        joined = joined.drop(c)
    return joined
