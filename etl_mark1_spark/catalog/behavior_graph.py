"""Behavioral analytics (cohort/funnel) + graph algorithms.

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

@query("cohort_retention", """
    WITH firsts AS (SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE))
                           AS cohort_day
                    FROM events GROUP BY user_id),
         activity AS (SELECT DISTINCT user_id,
                             CAST(date_trunc('day', ts) AS DATE) AS day
                      FROM events)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity JOIN firsts USING (user_id)
    WHERE date_diff('day', cohort_day, day) <= 7
    GROUP BY 1, 2
""")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each subsequent day they return (first week). Two aggregations
    over the deduped (user, day) activity plus one equi-join on user_id —
    the cohort dimension derives from the same scan, no second pass."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"))
    activity = ev.distinct()
    firsts = activity.groupBy("user_id").agg(
        F.min("day").alias("cohort_day"))
    return (activity.join(firsts, "user_id")
            .withColumn("day_offset",
                        F.datediff("day", "cohort_day").cast("bigint"))
            .filter(F.col("day_offset") <= 7)
            .groupBy("cohort_day", "day_offset")
            .agg(F.count(F.lit(1)).cast("bigint").alias("active_users")))


@query("token_repetition", """
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(1.0 - count(DISTINCT tok) * 1.0 / count(*), 6) AS rep_ratio
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY doc_id
""")
def token_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio (1 - distinct/total tokens) — the
    boilerplate/spam signal for corpus quality filtering. One explode +
    one aggregation with map-side partials; the text column never
    shuffles, only (doc_id, token)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return (toks.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.round(1.0 - F.count_distinct("tok")
                         / F.count(F.lit(1)), 6).alias("rep_ratio")))


@query("text_char_entropy", """
    WITH chars AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch
        FROM documents WHERE length(text) > 0
    ),
    freq AS (
        SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
        FROM chars GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY 1)
    SELECT f.doc_id,
           round(-sum((c / n) * ln(c / n)), 6) AS char_entropy
    FROM freq f JOIN tot USING (doc_id)
    GROUP BY f.doc_id
""")
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy as a perplexity proxy for quality
    filtering (functions/text.py:char_entropy_stats): explode -> partial-
    aggregated (doc, char) counts -> per-doc fold; the shuffle is bounded
    by alphabet size per doc. Must agree with the oracle's SQL formulation
    to 6 decimals."""
    from etl_mark1_spark.functions.text import char_entropy_stats

    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return char_entropy_stats(docs)


@query("pagerank_parts", """
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    sym AS (
        SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    nodes AS (SELECT src AS node FROM sym UNION SELECT dst FROM sym),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
    r0 AS (SELECT node, 1.0 / cnt AS rank FROM nodes, n),
    i1 AS (
        SELECT g.dst AS node, sum(r.rank / d.deg) AS s
        FROM sym g JOIN r0 r ON g.src = r.node JOIN deg d ON g.src = d.src
        GROUP BY g.dst
    ),
    r1 AS (
        SELECT nd.node, (1.0 - 0.85) / (SELECT cnt FROM n)
                        + 0.85 * coalesce(i.s, 0.0) AS rank
        FROM nodes nd LEFT JOIN i1 i ON nd.node = i.node
    ),
    i2 AS (
        SELECT g.dst AS node, sum(r.rank / d.deg) AS s
        FROM sym g JOIN r1 r ON g.src = r.node JOIN deg d ON g.src = d.src
        GROUP BY g.dst
    ),
    r2 AS (
        SELECT nd.node, (1.0 - 0.85) / (SELECT cnt FROM n)
                        + 0.85 * coalesce(i.s, 0.0) AS rank
        FROM nodes nd LEFT JOIN i2 i ON nd.node = i.node
    ),
    i3 AS (
        SELECT g.dst AS node, sum(r.rank / d.deg) AS s
        FROM sym g JOIN r2 r ON g.src = r.node JOIN deg d ON g.src = d.src
        GROUP BY g.dst
    ),
    r3 AS (
        SELECT nd.node, (1.0 - 0.85) / (SELECT cnt FROM n)
                        + 0.85 * coalesce(i.s, 0.0) AS rank
        FROM nodes nd LEFT JOIN i3 i ON nd.node = i.node
    )
    SELECT node, round(rank, 7) AS rank FROM r3
""")
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.py) over the co-order
    part graph (parts that appear in the same order are neighbors) —
    authority weighting as three join+aggregate rounds, rank state one
    row per node, never collected. The oracle replays the exact float
    recurrence as chained CTEs."""
    from etl_mark1_spark.operators.graph import pagerank

    from etl_mark1_spark.operators.graph import coorder_edges

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return pagerank(coorder_edges(li), iterations=3, damping=0.85,
                    oriented=True)


@query("connected_components_parts", """
    WITH RECURSIVE
    edges AS (
        SELECT DISTINCT l_partkey AS a, l_suppkey + 1000000 AS b
        FROM lineitem WHERE l_quantity = 1 AND l_discount >= 0.09
    ),
    sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.label FROM reach r JOIN sym e ON e.a = r.node
        WHERE r.label < e.b
    )
    SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
""")
def connected_components_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the (sparse) part–supplier bipartite graph
    (supplier nodes offset by 1e6) — the dedup clustering core
    (graph.py:connected_components → dedup._cluster_min_label)
    differential-tested against a recursive min-label closure in DuckDB
    instead of only golden replays. The filter keeps the graph sparse and
    multi-component (75 components at sf0.01), so the labeling is
    non-trivial on both sides; ids and labels are exact integers, so the
    comparison is hash-exact."""
    from etl_mark1_spark.operators.graph import connected_components

    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_quantity") == 1) & (F.col("l_discount") >= 0.09)))
    edges = li.select(F.col("l_partkey").alias("src"),
                      (F.col("l_suppkey") + 1000000).alias("dst")).distinct()
    return connected_components(edges)


@query("triangle_count_parts", """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.a = e1.b
        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS node FROM tri)
    GROUP BY node
""")
def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-order part graph
    (operators/graph.py:triangle_count) — local clustering density, the
    third graph workhorse beside pagerank_parts and
    connected_components_parts. The Spark side runs the degree-ordered
    orientation (out-degree bounded by O(sqrt(m)), skew-proof); the
    oracle counts the same triangles orientation-free via id-ordered
    edges — the counts agree exactly because triangle identity is
    orientation-invariant."""
    from etl_mark1_spark.operators.graph import triangle_count

    from etl_mark1_spark.operators.graph import coorder_edges

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return triangle_count(coorder_edges(li), oriented=True)


@query("funnel_view_click_purchase", """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE event_type = 'click' AND ts > t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE event_type = 'purchase' AND ts > t2
        GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
        SELECT 'view' AS stage,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 'view>click', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 'view>click>purchase', CAST(count(*) AS BIGINT) FROM s3
    )
""")
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel: users who viewed, then clicked after their
    first view, then purchased after that click — the classic product
    conversion query. Shape at scale: each stage is one filtered
    aggregation down to user cardinality joined to the previous stage's
    (strictly shrinking) user set — stage frames shuffle on user_id and
    AQE broadcasts them once they fit; the event log is scanned once per
    stage with the event-type filter pushed to the scan."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == "click")
          .join(s1, "user_id").filter(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "purchase")
          .join(s2, "user_id").filter(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.lit(name).alias("stage"),
                      F.count(F.lit(1)).cast("bigint").alias("n_users"))

    return (stage(s1, "view")
            .unionAll(stage(s2, "view>click"))
            .unionAll(stage(s3, "view>click>purchase")))


