"""Rank fusion and retrieval-quality evaluation.

The repo's search stack now has two independent rankers — lexical BM25
(``operators/corpus.py:bm25_topk`` / the persisted-index path in
``operators/indexing.py``) and vector ANN (``operators/similarity.py``)
— and a production retrieval pipeline fuses them and MEASURES them.
This module adds both halves:

* :func:`rrf_fuse` — Reciprocal Rank Fusion (Cormack, Clarke & Büttcher,
  SIGIR 2009; public): ``score(d) = sum over rankings 1/(k0 + rank_d)``.
  Rank-based, so heterogeneous score scales (BM25 logs vs cosine) fuse
  without calibration — the reason RRF is the default hybrid in most
  search engines.
* :func:`ndcg_at_k` / :func:`mrr_at_k` — the standard offline eval
  metrics over a ranked result and graded relevance labels.

Everything is rank arithmetic over already-small ranked frames (top-N
per ranker), so the plans are window + aggregate over N rows per query —
driver-scale inputs, exact SQL-reproducible outputs. The reference has
no ranking surface at all (its search is SQL LIKE,
backend/services/duckdb_engine.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ranked(df: DataFrame, id_col: str, score_col: str,
            ascending: bool) -> DataFrame:
    """(id, rank) from a scored frame — rank 1 is best; ties break on id
    so the ranking is engine-reproducible."""
    order = [F.col(score_col).asc() if ascending
             else F.col(score_col).desc(), F.col(id_col).asc()]
    return df.select(
        F.col(id_col),
        F.row_number().over(Window.orderBy(*order)).alias("rank"))


def rrf_fuse(rankings: list[tuple[DataFrame, str, bool]],
             id_col: str = "doc_id", k0: int = 60,
             top_k: int | None = None,
             round_digits: int = 6) -> DataFrame:
    """Reciprocal Rank Fusion of N scored rankings. Each input is
    ``(df, score_col, ascending)`` — ``df`` carrying (id_col, score_col),
    ``ascending=True`` for distance-like scores. A document absent from
    a ranking contributes nothing for it (the standard convention).
    Returns (id_col, rrf_score) descending, id tie-break.

    k0=60 is the paper's constant. The fusion is a union of (id, rank)
    rows + one aggregation; inputs are top-N ranker outputs, so every
    stage is N-row-scale."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [_ranked(df, id_col, score_col, asc)
             for df, score_col, asc in rankings]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    fused = (out.groupBy(id_col)
             .agg(F.round(F.sum(F.lit(1.0) / (F.lit(k0) + F.col("rank"))),
                          round_digits).alias("rrf_score"))
             .orderBy(F.col("rrf_score").desc(), F.col(id_col)))
    return fused.limit(top_k) if top_k is not None else fused


def rrf_search_persisted(spark, path: str, terms: list[str],
                         top_n: int = 50, top_k: int = 10, k0: int = 60,
                         num_buckets: int | None = None) -> DataFrame:
    """Hybrid retrieval against the PERSISTED index: BM25
    (operators/indexing.py:bm25_search_persisted) fused with the
    conjunctive summed-tf ranker over the same pruned live postings
    (read_search_postings -> conjunctive_search) by Reciprocal Rank
    Fusion — the production "one index, many rankers, one fused page"
    shape, completing the tokenize-once path for hybrids. Both rankers
    read only the query terms' token buckets and honor tombstones, so
    fusion inherits deletion-correctness for free; the fusion itself is
    rank arithmetic over two <= ``top_n``-row frames."""
    from etl_mark1_spark.operators.indexing import (DEFAULT_BUCKETS,
                                                    bm25_search_persisted,
                                                    conjunctive_search,
                                                    read_search_postings)

    nb = DEFAULT_BUCKETS if num_buckets is None else num_buckets
    bm = bm25_search_persisted(spark, path, terms, top_k=top_n,
                               num_buckets=nb)
    cj = conjunctive_search(
        read_search_postings(spark, path, terms, num_buckets=nb),
        terms, top_k=top_n)
    return rrf_fuse([(bm, "bm25", False), (cj, "score", False)],
                    k0=k0, top_k=top_k)


def ndcg_at_k(ranked: DataFrame, labels: DataFrame, k: int = 10,
              id_col: str = "doc_id", rank_col: str = "rank",
              rel_col: str = "rel", round_digits: int = 6) -> DataFrame:
    """nDCG@k of a ranking against graded relevance labels: one row
    ``(ndcg double)``. DCG uses the standard gain ``(2^rel - 1) /
    log2(rank + 1)``; the ideal ordering is relevance-descending with id
    tie-break. ``ranked`` carries (id_col, rank_col 1-based); ``labels``
    carries (id_col, rel_col >= 0) for EVERY candidate document (absent
    ids count as relevance 0 via the left join). Both frames are
    ranking-scale; the metric is two k-row aggregations."""
    got = (ranked.filter(F.col(rank_col) <= k)
           .join(labels.select(id_col, rel_col), id_col, "left")
           .select((F.coalesce(F.col(rel_col), F.lit(0))).alias("r"),
                   F.col(rank_col).alias("i")))
    dcg = got.agg(F.sum((F.pow(F.lit(2.0), F.col("r")) - 1.0)
                        / F.log2(F.col("i") + 1.0)).alias("dcg"))
    # ideal@k: an ordered LIMIT first (TakeOrderedAndProject — per-
    # partition heaps, no global sort even over a corpus-sized label
    # set), THEN the positional window over the surviving <= k rows.
    ideal = (labels
             .orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
             .limit(k)
             .select(F.col(rel_col).alias("r"),
                     F.row_number().over(
                         Window.orderBy(F.col(rel_col).desc(),
                                        F.col(id_col).asc())).alias("i"))
             .agg(F.sum((F.pow(F.lit(2.0), F.col("r")) - 1.0)
                        / F.log2(F.col("i") + 1.0)).alias("idcg")))
    # coalesce BEFORE the division: a ranking with no rows inside top-k
    # sums to NULL, and the idcg>0 branch would propagate it — an empty
    # ranking scores 0.0, not NULL (round-12 ADVICE fix; pinned in
    # tests/test_ranking.py).
    return (dcg.crossJoin(ideal)
            .select(F.round(
                F.when(F.col("idcg") > 0,
                       F.coalesce(F.col("dcg"), F.lit(0.0))
                       / F.col("idcg"))
                .otherwise(F.lit(0.0)), round_digits).alias("ndcg")))


def mrr_at_k(ranked: DataFrame, labels: DataFrame, k: int = 10,
             id_col: str = "doc_id", rank_col: str = "rank",
             rel_col: str = "rel", min_rel: int = 1,
             round_digits: int = 6) -> DataFrame:
    """Reciprocal rank of the first result with relevance >= ``min_rel``
    within the top k; 0.0 if none. One row ``(mrr double)``."""
    hit = (ranked.filter(F.col(rank_col) <= k)
           .join(labels.select(id_col, rel_col), id_col, "left")
           .filter(F.coalesce(F.col(rel_col), F.lit(0)) >= min_rel)
           .agg(F.min(rank_col).alias("first_hit")))
    return hit.select(F.round(
        F.when(F.col("first_hit").isNotNull(),
               F.lit(1.0) / F.col("first_hit")).otherwise(F.lit(0.0)),
        round_digits).alias("mrr"))


def hybrid_text_vector_search(spark, text_path: str, ivf_path: str,
                              terms: list[str], query_vec: list[float],
                              top_n: int = 50, top_k: int = 10,
                              k0: int = 60, nprobe: int | None = None,
                              num_buckets: int | None = None) -> DataFrame:
    """The production RAG retrieval shape: lexical BM25 over the
    persisted TEXT index fused with a cosine probe of the persisted
    VECTOR (IVF) index by Reciprocal Rank Fusion — one corpus, two
    modalities, one ranked page, no score calibration (RRF is
    rank-based, so BM25 logs and cosine similarities fuse as-is).
    The caller guarantees the two indexes share an id space (doc_id ==
    vec_id — the natural layout when documents and their embeddings are
    ingested together). Both sides honor their index's tombstones, so a
    takedown deleted from both (text delete_from_index + ivf_delete)
    vanishes from the fused page with no rebuild on either side.
    ``nprobe=None`` probes every centroid (exact vector side — what an
    oracle or a final re-rank wants); smaller nprobe trades recall for
    a partition-pruned probe."""
    from etl_mark1_spark.operators.indexing import (DEFAULT_BUCKETS,
                                                    bm25_search_persisted)
    from etl_mark1_spark.operators.similarity import ivf_topk_persisted

    nb = DEFAULT_BUCKETS if num_buckets is None else num_buckets
    bm = bm25_search_persisted(spark, text_path, terms, top_k=top_n,
                               num_buckets=nb)
    nn = (ivf_topk_persisted(spark, ivf_path, query_vec, k=top_n,
                             nprobe=nprobe)
          .withColumnRenamed("vec_id", "doc_id"))
    return rrf_fuse([(bm, "bm25", False), (nn, "similarity", False)],
                    k0=k0, top_k=top_k)
