"""kNN/ANN search, set-similarity join, mixtures, BM25, keep-best dedup.

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.catalog.dedup_similarity import _query_vector

@query("knn_join_embeddings", """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id <= 10),
    e AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ev
          FROM embeddings WHERE vec_id > 10),
    pairs AS (SELECT query_id, neighbor_id,
                     round(list_cosine_similarity(ev, qv), 6) AS similarity
              FROM e, q),
    ranked AS (SELECT *, CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
               FROM pairs)
    SELECT query_id, neighbor_id, similarity, rank
    FROM ranked WHERE rank <= 3
""")
def knn_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN JOIN (operators/similarity.py:knn_join): top-3 cosine
    neighbors for each of ten query vectors in one operation — the
    batch-query form of similarity search. The query set broadcasts onto
    one table scan (no shuffled cartesian); only the similarity rows
    shuffle, on the query id."""
    from etl_mark1_spark.operators.similarity import knn_join

    emb = t(spark, sf_dir, "embeddings")
    return knn_join(emb.filter(F.col("vec_id") <= 10),
                    emb.filter(F.col("vec_id") > 10), k=3)


@query("cms_event_counts", """
    SELECT event_type, CAST(count(*) AS BIGINT) AS est_count
    FROM events GROUP BY event_type
""")
def cms_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event frequencies estimated through a count-min sketch
    (operators/sketches.py:cms_build/cms_estimate) — the frequency
    sketch completing the HLL/Bloom/CMS trio. The sketch is
    depth x width cells regardless of stream size; partials combine
    map-side and merge by cell-sum. The oracle is the EXACT count: CMS
    never undercounts, and at width 2048 with single-digit key
    cardinality every key has at least one collision-free row
    (deterministic for this data — seeds and hash are fixed), so the
    min-over-seeds estimate equals the true count; planted-collision
    unit tests exercise the overcount direction."""
    from etl_mark1_spark.operators.sketches import cms_build, cms_estimate

    events = t(spark, sf_dir, "events")
    cms = cms_build(events, "event_type")
    keys = events.select("event_type").distinct()
    return cms_estimate(cms, keys, "event_type")


@query("setsim_join_docs", r"""
    WITH t0 AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    p AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
          FROM t0 WHERE len(tk) >= 3),
    d AS (SELECT doc_id,
                 list_distinct(list(array_to_string(tk[i:i+2], ' '))) AS s
          FROM p GROUP BY doc_id),
    tk2 AS (SELECT doc_id, unnest(s) AS tok FROM d),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM tk2 a JOIN tk2 b
               ON a.tok = b.tok AND a.doc_id < b.doc_id),
    j AS (SELECT doc_a, doc_b,
            CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
            / CAST(len(x.s) + len(y.s)
                   - len(list_intersect(x.s, y.s)) AS DOUBLE) AS jac
          FROM cand JOIN d x ON x.doc_id = cand.doc_a
                    JOIN d y ON y.doc_id = cand.doc_b)
    SELECT doc_a, doc_b, round(jac, 6) AS jaccard
    FROM j WHERE jac >= 0.6
""")
def setsim_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join (operators/dedup.py:setsim_join,
    PPJoin-style prefix filtering): all document pairs with 3-gram
    shingle-set Jaccard >= 0.6 — 100% recall by construction, unlike the
    LSH families. The ORACLE proves that recall claim independently: it
    evaluates Jaccard over EVERY co-occurring pair with no prefix
    filter, so a single pair missed by the prefix logic fails the
    comparison."""
    from etl_mark1_spark.operators.dedup import setsim_join

    return setsim_join(t(spark, sf_dir, "documents"),
                       threshold=0.6, ngram=3)


@query("token_budget_mixture", r"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END
               AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    b(source, budget) AS (VALUES ('src1', 400), ('src2', 700),
                                 ('src3', 100000)),
    r AS (SELECT d.doc_id, d.source, d.n_tokens,
                 sum(d.n_tokens) OVER (PARTITION BY d.source
                   ORDER BY d.h, d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - d.n_tokens AS before_sum, b.budget
          FROM d JOIN b USING (source))
    SELECT doc_id, source, n_tokens FROM r WHERE before_sum < budget
""")
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-budgeted mixture sampling
    (operators/corpus.py:sample_to_token_budget): fill src1 to 400
    tokens, src2 to 700, keep all of src3 (budget above its size), drop
    every other source — documents taken in md5-of-id order so the mix
    is re-run stable. Broadcast budget table; one per-stratum
    running-sum window."""
    from etl_mark1_spark.operators.corpus import sample_to_token_budget

    return sample_to_token_budget(
        t(spark, sf_dir, "documents"),
        {"src1": 400, "src2": 700, "src3": 100000})


@query("curation_quality_chain", r"""
    WITH gate AS (
      SELECT doc_id, source, text,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_words,
             CAST(len(list_filter(
                 list_filter(string_split_regex(lower(text), '\s+'),
                             t -> t <> ''),
                 t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(regexp_extract_all(text, '#'))
                  + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT)
               AS n_symbols
      FROM documents),
    surv AS (SELECT doc_id, source, text FROM gate
             WHERE n_words >= 50 AND n_words <= 100000
               AND 10 * n_alpha >= 8 * n_words
               AND 10 * n_symbols <= n_words),
    d AS (SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ',
                                                        'g'))), ' ') AS tk
          FROM surv),
    p AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
          FROM d WHERE len(tk) >= 8),
    g AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
                 array_to_string(tk[i:i+7], ' ') AS gram
          FROM p),
    f AS (SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2),
    h AS (SELECT g.doc_id, g.i FROM g JOIN f USING (gram)),
    isl AS (SELECT doc_id, i,
              max(i + 7) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM h),
    isl2 AS (SELECT doc_id, i,
               sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             FROM isl),
    spans AS (SELECT doc_id, min(i) AS s, max(i) + 7 AS e
              FROM isl2 GROUP BY doc_id, island),
    tok AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM d),
    tok2 AS (SELECT doc_id, CAST(i AS BIGINT) AS i, tk[i] AS tok FROM tok),
    kept AS (SELECT t2.doc_id, t2.i, t2.tok FROM tok2 t2
             WHERE NOT EXISTS (SELECT 1 FROM spans sp
                               WHERE sp.doc_id = t2.doc_id
                                 AND t2.i BETWEEN sp.s AND sp.e)),
    clean AS (SELECT d0.doc_id, coalesce(k.ct, '') AS clean_text
              FROM d d0 LEFT JOIN (SELECT doc_id,
                                          string_agg(tok, ' ' ORDER BY i)
                                            AS ct
                                   FROM kept GROUP BY doc_id) k
                USING (doc_id)),
    ct AS (SELECT c.doc_id, s.source,
             CAST(CASE WHEN length(trim(clean_text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(clean_text), '\s+')) END
               AS BIGINT) AS n_tokens,
             md5(CAST(c.doc_id AS VARCHAR)) AS hsh
           FROM clean c JOIN surv s USING (doc_id)),
    b(source, budget) AS (VALUES ('src1', 300), ('src2', 300),
                                 ('src3', 300)),
    r AS (SELECT ct.doc_id, ct.source, ct.n_tokens,
            sum(ct.n_tokens) OVER (PARTITION BY ct.source
              ORDER BY ct.hsh, ct.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - ct.n_tokens AS before_sum, b.budget
          FROM ct JOIN b USING (source))
    SELECT doc_id, source, n_tokens FROM r WHERE before_sum < budget
""")
def curation_quality_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain in one lineage, each stage an operator
    from this repo: Gopher gate (word-count + alphabetic + symbol rules
    — the language-agnostic subset, since this synthetic corpus fails
    the English-stopword rule by design) -> span-level substring strip
    -> exact token-budget mixture over the CLEANED text. The oracle
    replays all three stages as one chained CTE, so the composition —
    not just each stage — is differential-tested."""
    from etl_mark1_spark.functions.text import gopher_quality_flags
    from etl_mark1_spark.operators.corpus import sample_to_token_budget
    from etl_mark1_spark.operators.spans import strip_duplicate_spans

    docs = t(spark, sf_dir, "documents")
    gate = (gopher_quality_flags(docs)
            .filter("ok_word_count AND ok_alpha_words AND ok_symbol_ratio")
            .select("doc_id"))
    surv = docs.join(gate, "doc_id", "left_semi")
    cleaned = strip_duplicate_spans(surv)
    with_src = cleaned.join(surv.select("doc_id", "source"), "doc_id")
    return sample_to_token_budget(
        with_src, {"src1": 300, "src2": 300, "src3": 300},
        text_col="clean_text")


@query("temperature_mixture_sources", """
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 < 7 THEN 'web'
                    WHEN doc_id % 10 < 9 THEN 'books'
                    ELSE 'code' END AS stratum
        FROM documents),
    c AS (SELECT stratum, count(*) AS n FROM d GROUP BY 1),
    m AS (SELECT min(pow(n, 0.3)) AS mn FROM c),
    p AS (SELECT stratum, mn / pow(n, 0.3) AS keep FROM c, m)
    SELECT d.doc_id, d.stratum
    FROM d JOIN p USING (stratum)
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < keep
""")
def temperature_mixture_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature flattening at alpha=0.7 over a deliberately skewed
    70/20/10 stratum split (the synthetic sources are uniform, which
    would make the filter inert): keep probability (n_min/n_s)^0.3 per
    stratum (operators/corpus.py:temperature_mixture) — the
    multilingual-sampling standard, as a broadcast-probability map-side
    md5 filter. The smallest stratum survives whole; the differential
    check covers the probability arithmetic AND the md5 membership."""
    from etl_mark1_spark.operators.corpus import temperature_mixture

    docs = t(spark, sf_dir, "documents").withColumn(
        "stratum",
        F.when(F.col("doc_id") % 10 < 7, "web")
        .when(F.col("doc_id") % 10 < 9, "books")
        .otherwise("code"))
    return (temperature_mixture(docs, alpha=0.7, strata_col="stratum")
            .select("doc_id", "stratum"))


@query("sample_per_group_lang", """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    WHERE rn <= 20
""")
def sample_per_group_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 documents per language, chosen by md5-of-id rank
    (operators/corpus.py:sample_per_group) — the deterministic
    fixed-quota sampler (eval-set quotas), stable under re-runs and
    repartitioning; ranking windows partition by group, so languages
    sample in parallel."""
    from etl_mark1_spark.operators.corpus import sample_per_group

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_per_group(docs, "lang", 20)


@query("winsorize_prices", """
    WITH cuts AS (
        SELECT quantile_cont(o_totalprice, 0.01) AS lo,
               quantile_cont(o_totalprice, 0.99) AS hi
        FROM orders)
    SELECT o_orderkey,
           round(least(greatest(o_totalprice, lo), hi), 2) AS clipped
    FROM orders, cuts
""")
def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize order prices to the [p1, p99] range
    (plans/quality.py:winsorize, exact mode for oracle parity; the
    approx sketch mode is the 100 TB default) — cutoffs are a one-row
    broadcast, the clip a map-side expression."""
    from etl_mark1_spark.plans.quality import winsorize

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return (winsorize(orders, "o_totalprice", 0.01, 0.99,
                      out_col="clipped")
            .select("o_orderkey", F.round("clipped", 2).alias("clipped")))


@query("collocations_pmi_docs", r"""
    WITH d AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS tk
      FROM documents),
    bg AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT tk, unnest(range(1, len(tk))) AS i
            FROM d WHERE len(tk) >= 2)),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    uni AS (SELECT tok AS w, count(*) AS c
            FROM (SELECT unnest(tk) AS tok FROM d) GROUP BY 1),
    n2 AS (SELECT sum(c2) AS n2 FROM c2),
    n1 AS (SELECT sum(c) AS n1 FROM uni)
    SELECT w1, w2, CAST(c2 AS BIGINT) AS n,
           round(ln((c2 * 1.0 / n2)
                    / ((ua.c * 1.0 / n1) * (ub.c * 1.0 / n1))), 6) AS pmi
    FROM c2
    JOIN uni ua ON ua.w = w1
    JOIN uni ub ON ub.w = w2, n2, n1
    WHERE c2 >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
""")
def collocations_pmi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information
    (operators/corpus.py:collocations_pmi) — adjacent pairs co-occurring
    far above chance, min count 5; map-side bigrams, exact integer
    probabilities, ordered-limit top-k."""
    from etl_mark1_spark.operators.corpus import collocations_pmi

    return collocations_pmi(t(spark, sf_dir, "documents"))


@query("bm25_search_docs", r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS tok
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    q AS (SELECT * FROM toks WHERE tok IN ('hash', 'join', 'vector')),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM q GROUP BY 1, 2),
    dft AS (SELECT tok, count(DISTINCT doc_id) AS df FROM q GROUP BY 1)
    SELECT doc_id,
           round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                     * tf * 2.2
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                 6) AS bm25
    FROM tf JOIN dl USING (doc_id) JOIN dft USING (tok), stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
""")
def bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the query {hash, join, vector}
    (operators/corpus.py:bm25_topk) — lexical ranked retrieval: the token
    stream filters to query terms before anything shuffles, corpus stats
    and per-term document frequencies broadcast, and the top-k is an
    ordered limit, never a global sort."""
    from etl_mark1_spark.operators.corpus import bm25_topk

    return bm25_topk(t(spark, sf_dir, "documents"),
                     ["hash", "join", "vector"])


@query("quality_percentile_rank", """
    SELECT doc_id, n_chars,
           round(cume_dist() OVER (ORDER BY n_chars), 6) AS pct_rank
    FROM documents
""")
def quality_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative percentile rank of document length
    (operators/corpus.py:percentile_rank) — normalizes a raw quality
    signal into [0, 1] so 'keep the top 30%' transfers across sources.
    The oracle's cume_dist window is a single-partition sort; the Spark
    side computes the identical number as per-distinct-value counts +
    the shared two-phase prefix sum + a value-keyed join back."""
    from etl_mark1_spark.operators.corpus import percentile_rank

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return percentile_rank(docs, "n_chars")


@query("dedup_keep_best_docs", r"""
    WITH d AS (
      SELECT doc_id, n_chars,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS k
      FROM documents),
    r AS (
      SELECT doc_id, n_chars,
             row_number() OVER (PARTITION BY k
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM d)
    SELECT doc_id, n_chars FROM r WHERE rn = 1
""")
def dedup_keep_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the BEST duplicate (operators/dedup.py:
    dedup_keep_best): one survivor per normalized text, chosen as the
    longest copy (ties -> smallest doc_id) instead of dedup_exact's
    arbitrary-but-deterministic min-id. The max_by aggregation moves only
    (score, id) through the shuffle; the oracle replays the choice as a
    ranked window. Reference surface: keyed dedup step
    (backend/services/duckdb_engine.py dedup op) which keeps an arbitrary
    row — this is the curation-grade refinement."""
    from etl_mark1_spark.functions.text import normalized_text
    from etl_mark1_spark.operators.dedup import dedup_keep_best

    docs = (t(spark, sf_dir, "documents")
            .withColumn("_k", normalized_text("text")))
    return (dedup_keep_best(docs, key_col="_k", score_col="n_chars",
                            id_col="doc_id")
            .select("doc_id", "n_chars"))


@query("bigram_lm_score", r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS tk
      FROM documents),
    bg AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
            FROM d WHERE len(tk) >= 2)),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(tk) AS tok FROM d)),
    p AS (SELECT w1, w2, (c2 + 1) * 1.0 / (c1 + v) AS p
          FROM c2 JOIN c1 USING (w1), v)
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(p)), 6) AS avg_logprob
    FROM bg b JOIN p USING (w1, w2)
    GROUP BY b.doc_id
""")
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average bigram log-probability per document under a corpus-trained
    add-one-smoothed bigram LM (operators/corpus.py:bigram_logprob_score)
    — the conditional upgrade of unigram_lm_score: scrambled or
    concatenated text has plausible unigrams but implausible transitions.
    Bigrams are built map-side (arrays_zip of shifted slices, no
    self-join); the model shuffle-joins back on (w1, w2)."""
    from etl_mark1_spark.operators.corpus import bigram_logprob_score

    return bigram_logprob_score(t(spark, sf_dir, "documents"))


@query("ks_drift_values", """
    WITH u AS (
      SELECT value AS v, 1 AS ia, 0 AS ib FROM events
      WHERE event_id % 2 = 0
      UNION ALL
      SELECT value, 0, 1 FROM events WHERE event_id % 2 = 1),
    c AS (SELECT v, sum(ia) AS ca, sum(ib) AS cb FROM u GROUP BY v),
    s AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cum_a,
                 sum(cb) OVER (ORDER BY v) AS cum_b
          FROM c),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c)
    SELECT round(max(abs(cum_a * 1.0 / na - cum_b * 1.0 / nb)), 6)
             AS ks_stat,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b
    FROM s, t
""")
def ks_drift_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift between even/odd event slices'
    value distributions (plans/quality.py:ks_drift) — the binning-free
    sibling of psi_drift_chars. The Spark side computes both empirical
    CDFs with the two-phase sharded prefix sum (no single-partition
    window); the oracle replays them as one global SQL window, which
    DuckDB can afford at oracle scale."""
    from etl_mark1_spark.plans.quality import ks_drift

    ev = t(spark, sf_dir, "events")
    return ks_drift(ev.filter(F.col("event_id") % 2 == 0),
                    ev.filter(F.col("event_id") % 2 == 1),
                    "value")


# SimHash is md5-based precisely so fingerprints are engine-reproducible;
# cash that in: the oracle rebuilds all 64 vote sums from the md5 hex in
# SQL (bit j = bit j%8 of digest byte j//8, little-endian — matching
# np.unpackbits(..., bitorder='little') in dedup.with_simhash) and
# reassembles the signed two's-complement signature.
_SIMHASH_VOTES = ",\n             ".join(
    f"sum(2 * ((CAST(('0x' || substr(h, {2 * (j // 8) + 1}, 2)) AS INT)"
    f" >> {j % 8}) & 1) - 1) AS v{j}"
    for j in range(64))
_SIMHASH_SIG = "\n             + ".join(
    f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(63))


@query("simhash_docs", rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents),
    h AS (SELECT doc_id, md5(t) AS h FROM tok),
    v AS (SELECT doc_id,
             {_SIMHASH_VOTES}
          FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id,
             CAST({_SIMHASH_SIG}
             + (CASE WHEN v63 > 0 THEN -9223372036854775808 ELSE 0 END)
               AS BIGINT) AS simhash
            FROM v)
    SELECT d.doc_id, coalesce(sig.simhash, 0) AS simhash
    FROM documents d LEFT JOIN sig USING (doc_id)
""")
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (Arrow-batched Pandas UDF). md5-based
    so fingerprints are process- AND engine-stable — which upgrades this
    from a rows-only check to an EXACT oracle: DuckDB recomputes every
    one of the 64 vote sums from the same md5 bits and must reproduce
    the signature bit-for-bit."""
    from etl_mark1_spark.operators.dedup import with_simhash

    return with_simhash(
        t(spark, sf_dir, "documents").select("doc_id", "text")) \
        .select("doc_id", "simhash")





@query("token_index_stats_docs", r"""
    WITH d AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(tk) AS token FROM d),
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents)
    SELECT token,
           CAST(count(*) AS BIGINT) AS df,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc,
           round(ln((nd - count(*) + 0.5) / (count(*) + 0.5) + 1), 6) AS idf
    FROM tok, n
    WHERE token <> ''
    GROUP BY token, nd
    HAVING count(*) >= 25
""")
def token_index_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index dictionary stats (operators/corpus.py:
    token_index_stats over inverted_index): per-token document
    frequency, posting range, and BM25 idf for tokens in >= 25 docs.
    Postings stay ROWS (token, doc_id) — a posting-list column would
    concentrate a stopword's corpus-wide set in one task — and every
    rollup aggregate is algebraic (count/min/max), so map-side partials
    collapse stopwords before the shuffle. The reference's search
    surface stops at SQL LIKE; this is the build side of bm25_search's
    scorer."""
    from etl_mark1_spark.operators.corpus import token_index_stats

    return token_index_stats(t(spark, sf_dir, "documents"), min_df=25)
