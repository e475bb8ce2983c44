"""Catalog entries for retrieval quality: winnowing fingerprints and
MOSS-style fingerprint matching (operators/winnow.py), reciprocal-rank
hybrid fusion and offline ranking metrics (operators/ranking.py) — the
measure-and-fuse half of the search stack the round-11/12 index
lifecycle opened. The reference's search surface is SQL LIKE
(backend/services/duckdb_engine.py); these are part of the LLM-pipeline
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

#: shared DuckDB fragment: winnowing fingerprints (k=3 word grams,
#: window w=4) over the normalized token stream — the exact construction
#: operators/winnow.py:winnow_fingerprints runs (all-minima variant; see
#: the module docstring for why the distinct-value signature is
#: tie-rule-independent).
_WINNOW_SQL = r"""
    WITH d AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 substr(md5(array_to_string(tk[i:i+2], ' ')), 1, 16)
                   AS ghash,
                 len(tk) - 2 AS n_grams
          FROM d, LATERAL (SELECT unnest(range(1, len(tk) - 1)) AS i)
          WHERE len(tk) >= 3),
    wm AS (SELECT doc_id, pos, n_grams,
                  min(ghash) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW
                                   AND 3 FOLLOWING) AS wmin
           FROM g),
    fp AS (SELECT DISTINCT doc_id, wmin AS fp
           FROM wm WHERE pos <= n_grams - 3)
"""


@query("winnow_fingerprints_docs", _WINNOW_SQL + """
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
           min(fp) AS fp_min, max(fp) AS fp_max
    FROM fp GROUP BY doc_id
""")
def winnow_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing signature per document (operators/winnow.py,
    Schleimer et al. 2003): distinct window-minimum 3-gram hashes at
    w=4, projected as (n_fps, fp_min, fp_max) per doc — the full
    signature set restated scalar-safe (count + order statistics pin the
    set's size and extremes; winnow_match_docs exercises the set
    contents relationally). Gram hashing is one map-side posexplode;
    the window minimum is per-document; the only corpus shuffle carries
    the ~|doc|/w surviving hashes."""
    from etl_mark1_spark.operators.winnow import winnow_fingerprints

    return (winnow_fingerprints(t(spark, sf_dir, "documents"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_fps"),
                 F.min("fp").alias("fp_min"),
                 F.max("fp").alias("fp_max")))


@query("winnow_match_docs", _WINNOW_SQL + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 3
""")
def winnow_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS match step (operators/winnow.py:winnow_similar_pairs):
    document pairs sharing >= 3 winnowing fingerprints — substring-level
    overlap detection with the paper's guarantee (any shared run of
    >= w + k - 1 = 6 words contributes a shared fingerprint). Candidates
    meet on fingerprint EQUALITY (bucket-sized join tasks, never
    all-pairs), then one pair-count aggregation — the same
    never-quadratic shape as the MinHash/FastSS families."""
    from etl_mark1_spark.operators.winnow import winnow_similar_pairs

    return winnow_similar_pairs(t(spark, sf_dir, "documents"),
                                min_shared=3)


@query("snippet_window_docs", r"""
    WITH d AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    p AS (SELECT doc_id, i AS pos
          FROM d, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i)
          WHERE tk[i] IN ('hash', 'join', 'vector')),
    s AS (SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY doc_id ORDER BY pos
                                RANGE BETWEEN CURRENT ROW
                                AND 19 FOLLOWING) AS n
          FROM p),
    r AS (SELECT doc_id, pos, n,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY n DESC, pos) AS rn
          FROM s)
    SELECT doc_id, CAST(pos AS BIGINT) AS snippet_start,
           CAST(n AS BIGINT) AS n_hits
    FROM r WHERE rn = 1
""")
def snippet_window_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity snippet selection (operators/indexing.py:best_window):
    per matching document, the 20-token window with the most query-term
    occurrences for {hash, join, vector}, earliest start on ties — the
    highlight window a result page shows and the proximity signal
    bag-of-words ranking lacks. Pushed isin on positional postings, a
    per-document RANGE window over the hit positions only (candidates
    start at hits, which provably contain the optimum), one struct-max
    rollup — work scales with matching postings, never the corpus."""
    from etl_mark1_spark.operators.indexing import (
        best_window, build_positional_postings)

    return best_window(
        build_positional_postings(t(spark, sf_dir, "documents")),
        ["hash", "join", "vector"], width=20)


@query("index_segment_report_docs", r"""
    WITH d AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    tok AS (SELECT doc_id, unnest(tk) AS token FROM d),
    p AS (SELECT token, doc_id, count(*) AS tf
          FROM tok WHERE token <> '' GROUP BY token, doc_id),
    t AS (SELECT token, count(*) AS df, sum(tf) AS cf
          FROM p GROUP BY token)
    SELECT ('0x' || substr(md5(token), 1, 4))::INTEGER % 64 AS bucket,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(df) AS BIGINT) AS n_postings,
           CAST(sum(cf) AS BIGINT) AS total_tf,
           CAST(max(df) AS BIGINT) AS max_df
    FROM t GROUP BY 1
""")
def index_segment_report_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket segment report (operators/indexing.py:segment_report):
    distinct tokens, posting rows, occurrences, and heaviest-token df
    for each of the 64 md5 token buckets — the skew check run before
    sizing the persisted index's bucket count (a bucket is one scan
    task at query time). Green externally confirms the md5 bucket
    arithmetic end-to-end across engines — the same function a query
    uses at lookup time to prune partitions."""
    from etl_mark1_spark.operators.indexing import (build_postings,
                                                    segment_report)

    return segment_report(build_postings(t(spark, sf_dir, "documents")))


@query("qlm_search_docs", r"""
    WITH d AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    tok AS (SELECT doc_id, unnest(tk) AS token FROM d),
    p AS (SELECT token, doc_id, count(*) AS tf
          FROM tok WHERE token <> '' GROUP BY token, doc_id),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM p GROUP BY 1),
    c AS (SELECT sum(tf) AS csize FROM p),
    dict AS (SELECT token, sum(tf) AS cf FROM p GROUP BY 1
             HAVING token IN ('hash', 'join', 'vector')),
    cand AS (SELECT DISTINCT doc_id FROM p
             WHERE token IN ('hash', 'join', 'vector'))
    SELECT doc_id,
           round(sum(ln((coalesce(m.tf, 0) + 2000.0 * dict.cf / csize)
                        / (dl + 2000.0))), 6) AS ql_score
    FROM cand CROSS JOIN dict
    LEFT JOIN p m USING (doc_id, token)
    JOIN dl USING (doc_id), c
    GROUP BY doc_id
    ORDER BY ql_score DESC, doc_id
    LIMIT 10
""")
def qlm_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing
    (operators/indexing.py:qlm_topk — Zhai & Lafferty 2001), the third
    classic lexical ranker beside BM25 and tf-idf, run against the
    index-lifecycle frames (postings + dictionary + doc lengths):
    top-10 for {hash, join, vector} at mu=2000. Spark scores matched
    terms RELATIVE to the collection prior and adds the prior sum once
    per candidate (no per-missing-term work); the oracle brute-forces
    the textbook candidate x term cross product — same numbers to 6dp,
    which is exactly the algebraic-rearrangement confirmation."""
    from etl_mark1_spark.operators.indexing import (build_postings,
                                                    postings_dictionary,
                                                    qlm_topk)

    p = build_postings(t(spark, sf_dir, "documents"))
    doclens = p.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl"))
    return qlm_topk(p, postings_dictionary(p), doclens,
                    ["hash", "join", "vector"], top_k=10)


#: shared DuckDB fragment: the two rankers the hybrid entries fuse —
#: BM25 (exactly bm25_search_docs' construction) and conjunctive
#: summed-tf, both over the query {hash, join, vector}, both ranked by
#: (score DESC, doc_id) on the ROUNDED score so ranks are
#: engine-reproducible.
_RANKERS_SQL = r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS tok
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    q AS (SELECT * FROM toks WHERE tok IN ('hash', 'join', 'vector')),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM q GROUP BY 1, 2),
    dft AS (SELECT tok, count(DISTINCT doc_id) AS df FROM q GROUP BY 1),
    bm25 AS (
      SELECT doc_id,
             round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * 2.2
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                   6) AS bm25
      FROM tf JOIN dl USING (doc_id) JOIN dft USING (tok), stats
      GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50),
    conj AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
      FROM tf GROUP BY doc_id HAVING count(*) = 3
      ORDER BY score DESC, doc_id LIMIT 50),
    r1 AS (SELECT doc_id,
                  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
           FROM bm25),
    r2 AS (SELECT doc_id,
                  row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           FROM conj)
"""


@query("hybrid_rrf_search_docs", _RANKERS_SQL + """
    SELECT doc_id,
           round(sum(1.0 / (60 + rank)), 6) AS rrf_score
    FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
    GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
""")
def hybrid_rrf_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (operators/ranking.py,
    Cormack et al. 2009): BM25 top-50 fused with the conjunctive
    summed-tf top-50 for the query {hash, join, vector} at k0=60 —
    rank-based fusion needs no score calibration between heterogeneous
    rankers, which is why it is the production default for
    lexical+semantic hybrids. Each ranker is its existing pushed-filter
    plan; fusion is a union of two 50-row (id, rank) frames + one
    aggregation — driver-scale arithmetic after corpus-scale
    retrieval."""
    from etl_mark1_spark.operators.corpus import bm25_topk
    from etl_mark1_spark.operators.indexing import (build_postings,
                                                    conjunctive_search)
    from etl_mark1_spark.operators.ranking import rrf_fuse

    docs = t(spark, sf_dir, "documents")
    terms = ["hash", "join", "vector"]
    bm = bm25_topk(docs, terms, top_k=50)
    cj = conjunctive_search(build_postings(docs), terms, top_k=50)
    return rrf_fuse([(bm, "bm25", False), (cj, "score", False)],
                    top_k=10)


@query("retrieval_ndcg_eval", _RANKERS_SQL + """
    , got AS (
      SELECT coalesce(lbl.rel, 0) AS r, r1.rank AS i
      FROM r1 LEFT JOIN (
        SELECT doc_id, count(DISTINCT tok) AS rel FROM q GROUP BY doc_id
      ) lbl USING (doc_id)
      WHERE r1.rank <= 10),
    dcg AS (SELECT sum((pow(2.0, r) - 1.0) / log2(i + 1.0)) AS dcg
            FROM got),
    ideal AS (
      SELECT sum((pow(2.0, r) - 1.0) / log2(i + 1.0)) AS idcg
      FROM (SELECT rel AS r,
                   row_number() OVER (ORDER BY rel DESC, doc_id) AS i
            FROM (SELECT doc_id, count(DISTINCT tok) AS rel
                  FROM q GROUP BY doc_id
                  ORDER BY rel DESC, doc_id LIMIT 10)) ),
    hit AS (
      SELECT min(r1.rank) AS first_hit
      FROM r1 JOIN (
        SELECT doc_id, count(DISTINCT tok) AS rel FROM q GROUP BY doc_id
      ) lbl USING (doc_id)
      WHERE r1.rank <= 10 AND lbl.rel >= 3)
    SELECT round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6)
             AS ndcg,
           round(CASE WHEN first_hit IS NOT NULL THEN 1.0 / first_hit
                      ELSE 0.0 END, 6) AS mrr
    FROM dcg, ideal, hit
""")
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline ranking eval (operators/ranking.py:ndcg_at_k + mrr_at_k):
    nDCG@10 and MRR@10 of the BM25 ranking against term-coverage
    relevance labels (rel(doc) = number of the 3 query terms present,
    0-3; MRR's hit bar is all 3). One row (ndcg, mrr). The label frame
    is eval-set-sized by construction; the ideal ranking takes an
    ordered LIMIT before any positional window, so nothing here sorts a
    corpus. The oracle replays the whole computation — ranker, labels,
    DCG, ideal DCG, first-hit — from first principles in SQL."""
    from etl_mark1_spark.operators.corpus import bm25_topk
    from etl_mark1_spark.operators.indexing import build_postings
    from etl_mark1_spark.operators.ranking import _ranked, mrr_at_k, ndcg_at_k

    docs = t(spark, sf_dir, "documents")
    terms = ["hash", "join", "vector"]
    ranked = _ranked(bm25_topk(docs, terms, top_k=50), "doc_id", "bm25",
                     ascending=False)
    labels = (build_postings(docs)
              .filter(F.col("token").isin(terms))
              .groupBy("doc_id")
              .agg(F.count_distinct("token").alias("rel")))
    ndcg = ndcg_at_k(ranked, labels, k=10)
    mrr = mrr_at_k(ranked, labels, k=10, min_rel=3)
    return ndcg.crossJoin(mrr)
