"""Dedup family + similarity search basics (extension).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Dedup family (extension)
# ---------------------------------------------------------------------------

@query("dedup_exact_documents", """
    SELECT doc_id, text FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
""")
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup keeping the smallest doc_id (deterministic)."""
    from etl_mark1_spark.operators.dedup import dedup_exact

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_exact(docs, "text", "doc_id", keep="min_id")


# ---------------------------------------------------------------------------
# Similarity search (extension)
# ---------------------------------------------------------------------------

def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 1) -> list[float]:
    row = (t(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") == vec_id).select("embedding").first())
    return [float(x) for x in row[0]]


@query("embedding_cosine_topk", """
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 6)
               AS similarity
    FROM embeddings e, q
    WHERE e.vec_id <> 1
    ORDER BY similarity DESC, e.vec_id
    LIMIT 10
""")
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 against the vec_id=1 embedding."""
    from etl_mark1_spark.operators.similarity import cosine_topk

    qv = _query_vector(spark, sf_dir, 1)
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 1)
    return cosine_topk(emb, qv, k=10)


@query("snapshot_diff_orders", """
    WITH base AS (
        SELECT o_orderkey,
               round(o_totalprice, 2) AS price,
               o_orderstatus AS status
        FROM orders
    ),
    old AS (SELECT * FROM base),
    new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0
                    THEN CAST(round(CAST(price AS DECIMAL(18,2))
                              * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
                    ELSE price END AS price,
               status
        FROM base WHERE o_orderkey % 13 != 0
        UNION ALL
        SELECT o_orderkey + 100000000, price, 'NEW'
        FROM base WHERE o_orderkey % 1000 = 0
    )
    SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN NOT (o.price IS NOT DISTINCT FROM n.price
                          AND o.status IS NOT DISTINCT FROM n.status)
                     THEN 'update'
           END AS change_type,
           n.price AS new_price, n.status AS new_status,
           o.price AS old_price, o.status AS old_status
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE (CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN NOT (o.price IS NOT DISTINCT FROM n.price
                          AND o.status IS NOT DISTINCT FROM n.status)
                     THEN 'update' END) IS NOT NULL
""")
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two snapshots (operators/cdc.py:snapshot_diff):
    repriced keys surface as updates, retired keys as deletes, new keys
    as inserts; unchanged keys are absent, so the feed is churn-sized.
    One full-outer key join with null-safe struct comparison."""
    from etl_mark1_spark.operators.cdc import snapshot_diff

    base = (t(spark, sf_dir, "orders")
            .select("o_orderkey",
                    F.round("o_totalprice", 2).alias("price"),
                    F.col("o_orderstatus").alias("status")))
    repriced = F.when(
        F.col("o_orderkey") % 10 == 0,
        F.round(F.col("price").cast("decimal(18,2)")
                * F.lit(1.1).cast("decimal(2,1)"), 2).cast("double")
    ).otherwise(F.col("price"))
    new = (base.filter(F.col("o_orderkey") % 13 != 0)
           .select("o_orderkey", repriced.alias("price"), "status")
           .unionAll(base.filter(F.col("o_orderkey") % 1000 == 0)
                     .select((F.col("o_orderkey") + 100000000)
                             .alias("o_orderkey"),
                             "price", F.lit("NEW").alias("status"))))
    return snapshot_diff(base, new, ["o_orderkey"])


