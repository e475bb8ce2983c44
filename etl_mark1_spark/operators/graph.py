"""Iterative graph algorithms as DataFrame joins.

The reference has no graph surface at all (its engine stops at SQL over
files — backend/services/duckdb_engine.py); connected components already
live in operators/dedup.py as the dedup clustering step. This module adds
the other workhorse iterative shape — fixed-iteration PageRank — because
training-data pipelines use it for source/document authority weighting
(rank hosts in a link graph, weight co-citation neighborhoods).

Scale shape: one edge-list self-describing table, degree aggregation once,
then per iteration exactly one join (edges x ranks, shuffled on the edge
key) + one aggregation (contributions by destination, map-side partials).
Rank state is one row per node — never collected to the driver. Fixed
iteration count keeps the whole thing a static plan that an oracle can
reproduce as chained CTEs; convergence-tested variants wrap the same loop
body (see dedup._cluster_min_label for the loud-failure pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str = "src",
               dst: str = "dst", *, oriented: bool = False) -> DataFrame:
    """Undirected view of an edge list: both directions, deduplicated.

    ``oriented=True`` is the caller's guarantee that the input is already
    DISTINCT in a canonical ``src < dst`` orientation (what
    :func:`coorder_edges` emits): the reversed direction then cannot
    collide with the forward set, so the post-union dedup — a full
    shuffle of the DOUBLED edge list, the single largest step of an
    undirected build at scale — is skipped with identical output."""
    both = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .union(edges.select(F.col(dst).alias("src"),
                                F.col(src).alias("dst"))))
    return both if oriented else both.distinct()


def coorder_edges(df: DataFrame, group_col: str = "l_orderkey",
                  item_col: str = "l_partkey") -> DataFrame:
    """Co-occurrence edge list: one (src < dst) pair per distinct item
    pair sharing a group — the standard graph build for co-purchase /
    co-citation graphs. ONE aggregation (map-side partial collect_set)
    + a map-side nested-transform pair explode, instead of equi-self-
    joining the fact with itself: the fact shuffles once, not twice, and
    the join disappears (measured 1.6s vs 2.2s on the sf0.1 co-order
    graph). Pair count is C(k, 2) per group — bounded by group size
    (orders cap at a handful of items); a group so hot its pair
    explosion dominates needs the same pre-capping either formulation
    would.
    """
    groups = df.groupBy(group_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("_items"))
    pairs = groups.select(F.explode(F.flatten(F.transform(
        "_items",
        lambda x, i: F.transform(
            F.slice("_items", i + 2, F.size("_items")),
            lambda y: F.struct(x.alias("src"), y.alias("dst")))))
        ).alias("_e"))
    return pairs.select("_e.src", "_e.dst").distinct()


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             undirected: bool = True, oriented: bool = False) -> DataFrame:
    """Fixed-iteration PageRank over an edge list; returns (node, rank).

    rank_{k+1}(v) = (1-d)/N + d * sum over in-neighbors u of
    rank_k(u) / outdeg(u). The undirected default symmetrizes edges, which
    also guarantees no dangling nodes (every node has out-degree >= 1);
    with ``undirected=False`` dangling mass leaks, as in the classic
    simplified formulation — both behaviors reproduce exactly in SQL.
    ``oriented=True`` (undirected inputs only) asserts the edge list is
    already distinct and canonically ``src < dst`` ordered — what
    :func:`coorder_edges` emits — letting :func:`symmetrize` skip its
    doubled-edge dedup shuffle (see there).

    The edge list is checkpointed once (every iteration joins it; without
    the cut each round re-derives the edge build), the intermediate rank
    plans stay lazy (small fixed depth), and the final ranks materialize
    as a tiny checkpoint before the edge blocks are released — repeated
    calls hold only the result table. Convergence-driven variants add a
    per-round checkpoint + release like dedup's label loop.
    """
    from etl_mark1_spark.operators.dedup import release_checkpoint

    g = symmetrize(edges, src, dst, oriented=oriented) if undirected else (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct())
    # Attach the out-degree to the edge table ONCE (round 8): the old
    # loop joined ranks AND the degree table every iteration; carrying
    # ``deg`` (one BIGINT) on the checkpointed edges halves the
    # per-iteration join count. The contribution stays ``rank / deg`` —
    # the same double division the SQL oracle replays, so results are
    # bit-identical (a precomputed 1/deg weight would not be).
    # Round-14: degrees come from a groupBy + join, NOT a count window
    # over src. A window partitioned by node puts EVERY edge of a hub in
    # one task with no partial aggregation — a straggler/OOM cliff on
    # power-law graphs (guide §2.5); the groupBy gets map-side partials,
    # and the deg join is a JOIN, so AQE's skew handling can split a hot
    # src partition at runtime (skew-split applies to joins only, never
    # to windows).
    raw = g.localCheckpoint()
    deg = raw.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    g = raw.join(deg, "src").localCheckpoint()
    release_checkpoint(raw)  # the annotated edges supersede it
    nodes = (g.select(F.col("src").alias("node"))
             .union(g.select(F.col("dst").alias("node"))).distinct()) \
        .localCheckpoint()
    n = nodes.count()  # one scalar; the driver holds a single long
    base = (1.0 - damping) / n

    ranks = nodes.select("node", (F.lit(1.0) / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            g.join(ranks, g.src == ranks.node)
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
        )
        incoming = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        # nodes with no in-edges (directed case) fall back to the base term
        ranks = (
            nodes.join(incoming, "node", "left")
            .select("node",
                    (F.lit(base) + F.lit(damping)
                     * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"))
        )
    # materialize the (tiny: one row per node) result, then free the edge
    # blocks — callers keep a checkpoint-backed rank table and repeated
    # calls leave executor storage flat apart from it
    out = ranks.select("node", F.round("rank", 7).alias("rank")) \
        .localCheckpoint()
    for upstream in (g, nodes):
        release_checkpoint(upstream)
    return out


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Connected components over an undirected edge list: returns
    (node, cluster_id) where cluster_id is the minimum node id in the
    component — the public face of the dedup clustering core
    (dedup._cluster_min_label): driver union-find below the sparse-graph
    threshold, pointer-jumping min-label propagation above it (O(log
    diameter) rounds, loud non-convergence). Node ids must be one
    numeric space; bipartite graphs offset one side.

    Oracle-checkable: the same labeling is a recursive min-label closure
    in ANSI SQL (see catalog/behavior_graph.py:connected_components_parts), so the whole
    distributed clustering machinery is differential-tested against
    DuckDB, not just golden-replayed."""
    from etl_mark1_spark.operators.dedup import _cluster_min_label

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ids = (e.select(F.col("src").alias("node"))
           .union(e.select(F.col("dst").alias("node"))).distinct())
    return _cluster_min_label(ids, e, "node")


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst", *, oriented: bool = False) -> DataFrame:
    """Per-node triangle counts: (node, n_triangles) for every node in at
    least one triangle — the local clustering signal (community density,
    link-spam detection) next to PageRank's authority and connected
    components' identity.

    Degree-ordered orientation + edge-iterator intersection, the classic
    distributed formulation: each undirected edge is kept once, pointing
    from its lower-(degree, id) endpoint, which bounds every node's
    OUT-degree by O(sqrt(m)) — so out-adjacency lists are always small
    enough to carry as array columns, hub or not. Each edge (u, v) then
    counts its triangles as |N+(u) ∩ N+(v)| via one map-side
    array_intersect; vertex w closes a triangle exactly once, at the
    unique edge between its two in-neighbors (every DAG-oriented
    triangle has one vertex of in-degree 2). Nothing wedge-shaped is
    ever materialized: the largest intermediate is the edge list
    carrying two bounded arrays, vs the Σ outdeg² wedge join (measured
    240M rows on a 1.2M-edge co-order graph) of the naive formulation.
    Shuffles: degree agg, adjacency agg, two edge-adjacency joins, count
    agg. ``oriented=True`` as in :func:`pagerank`: the input is already
    a distinct ``src < dst`` canonical form, so the undirected build
    skips its doubled-edge dedup shuffle.
    """
    # Round-14: endpoint degrees come from ONE groupBy (map-side
    # partials) joined back onto the edges, not count windows over the
    # symmetric edge list. The round-13 window formulation put every
    # edge of a hub node into a single task with no partial aggregation
    # — the pre-orientation edge list is exactly where hubs are still
    # unbounded, so on a power-law graph the window is a straggler/OOM
    # cliff (guide §2.5), and the driver's bench measured it SLOWER at
    # fixture scale too (5.10 s vs 3.52 s r12). Degree joins are joins,
    # so AQE skew-split can break a hot u/v partition at runtime; the
    # collect_list below runs only on the ORIENTED list, where
    # out-degree is O(sqrt m)-bounded, hub or not.
    e = symmetrize(edges, src, dst, oriented=oriented)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    o = (e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
         .join(deg.select(F.col("src").alias("u"),
                          F.col("deg").alias("du")), "u")
         .join(deg.select(F.col("src").alias("v"),
                          F.col("deg").alias("dv")), "v")
         .filter((F.col("du") < F.col("dv"))
                 | ((F.col("du") == F.col("dv"))
                    & (F.col("u") < F.col("v"))))
         .select("u", "v"))
    adj = o.groupBy("u").agg(F.collect_list("v").alias("_n"))
    closed = (o.join(adj.withColumnRenamed("_n", "_nu"), "u")
              .join(adj.select(F.col("u").alias("v"),
                               F.col("_n").alias("_nv")), "v")
              .select("u", "v",
                      F.array_intersect("_nu", "_nv").alias("_w"))
              .filter(F.size("_w") > 0))
    w_counts = closed.select(F.explode("_w").alias("node"),
                             F.lit(1).alias("_c"))
    uv_counts = closed.select(
        F.explode(F.array("u", "v")).alias("node"),
        F.size("_w").alias("_c"))
    return (w_counts.unionByName(uv_counts)
            .groupBy("node")
            .agg(F.sum("_c").cast("bigint").alias("n_triangles")))
