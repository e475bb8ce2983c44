"""Corpus-preparation operators (training-data pipeline).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Corpus-preparation operators (training-data pipeline; operators/corpus.py)
# ---------------------------------------------------------------------------

@query("train_test_split", """
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 4)) AS INTEGER) % 100 < 80
                THEN 'train' ELSE 'test' END AS split
    FROM documents
""")
def train_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-hash 80/20 split — membership is a pure function
    of doc_id (identical in any engine), never of partitioning or rand()."""
    from etl_mark1_spark.operators.corpus import train_test_split

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return train_test_split(docs)


@query("stratified_sample_lang", """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS _rn,
               count(*) OVER (PARTITION BY lang) AS _n
        FROM documents
    ) WHERE _rn <= ceil(_n * 0.2)
""")
def stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20% per-language sample, picked in md5-of-id order —
    reproducible across engines/runs, unlike Bernoulli sampleBy."""
    from etl_mark1_spark.operators.corpus import stratified_sample

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "lang", 0.2)


@query("tfidf_top_terms", """
    WITH terms AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> w <> '')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    docfreq AS (SELECT term, count(DISTINCT doc_id) AS df_count
                FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents)
    SELECT doc_id, term,
           round(tf * ln(n.n / df_count), 6) AS tfidf,
           CAST(row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(tf * ln(n.n / df_count), 6) DESC, term)
             AS BIGINT) AS rank
    FROM tf JOIN docfreq USING (term) CROSS JOIN n
    QUALIFY rank <= 3
""")
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by tf-idf: two aggregations (map-side
    partials) + broadcast vocabulary join + one window."""
    from etl_mark1_spark.operators.corpus import tfidf_top_terms

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_top_terms(docs, k=3)


@query("contamination_ngram", """
    WITH words AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id, source, array_to_string(w[i:i+3], ' ') AS g
        FROM words, UNNEST(range(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 4
    )
    SELECT DISTINCT doc_id FROM grams
    WHERE source <> 'src0'
      AND g IN (SELECT g FROM grams WHERE source = 'src0')
""")
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination sweep: documents outside source src0 that share a
    word 4-gram with the src0 'benchmark' set (semi-join on grams; the
    benchmark side broadcasts)."""
    from etl_mark1_spark.operators.corpus import ngram_contamination

    docs = t(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("source") != "src0").select("doc_id", "text"),
        docs.filter(F.col("source") == "src0").select("text"),
        n=4,
    )


@query("pii_redact", """
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   text || ' contact: user' || doc_id ||
                   '@example.com or +1 (555) 010-' ||
                   lpad(CAST(doc_id AS VARCHAR), 4, '0'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g'
           ) AS clean_text
    FROM documents
""")
def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over synthesized contact strings (the corpus itself
    is clean): chained global regexp_replace, JVM-side."""
    from etl_mark1_spark.operators.corpus import redact_pii

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact: user"), F.col("doc_id"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        ).alias("text"),
    )
    return redact_pii(docs).select("doc_id", "clean_text")


@query("pack_sequences_lang", """
    SELECT doc_id, lang, n_chars,
           CAST(floor((sum(n_chars) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_chars) / 2048)
             AS BIGINT) AS seq_id
    FROM documents
""")
def pack_sequences_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 2048-char training sequences, sharded
    by lang so each shard packs in parallel (one running-sum window)."""
    from etl_mark1_spark.operators.corpus import pack_sequences

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return pack_sequences(docs, budget=2048, size_col="n_chars",
                          shard_col="lang")


@query("pack_sequences_global", """
    SELECT doc_id, n_chars,
           CAST(floor((sum(n_chars) OVER (
                           ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                       - n_chars) / 2048)
             AS BIGINT) AS seq_id
    FROM documents
""")
def pack_sequences_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsharded packing over the whole corpus — the oracle is the naive
    single-partition global window, but the Spark plan is the two-phase
    exact prefix sum (sketch-cutoff id ranges packing in parallel +
    broadcast cumulative offsets; operators/corpus.py:pack_sequences).
    Integer arithmetic end-to-end, so the equality is hash-exact."""
    from etl_mark1_spark.operators.corpus import pack_sequences

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return pack_sequences(docs, budget=2048, size_col="n_chars")


@query("chunk_documents_overlap", """
    SELECT d.doc_id,
           s.k AS chunk_id,
           s.k * 320 AS chunk_start,
           substring(d.text, CAST(s.k * 320 + 1 AS INTEGER), 400)
               AS chunk_text
    FROM documents d
    JOIN (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k
          FROM documents) AS s
      ON s.k <= (greatest(length(d.text) - 80, 1) - 1) // 320
    WHERE d.text IS NOT NULL
""")
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 400-char chunks with 80-char overlap (stride 320) —
    retrieval/training chunking as a pure flat-map (no shuffle, no
    Python; chunk ids are functions of the row, so backfills reproduce
    them). Oracle: the same integer arithmetic via generate_series."""
    from etl_mark1_spark.operators.corpus import chunk_documents

    docs = t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_chars=400, overlap=80)


@query("rebalance_mixture_sources", """
    WITH counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    with_p AS (
        SELECT source, n, 1.0 / count(*) OVER () AS p FROM counts
    ),
    probs AS (
        SELECT source, min(n / p) OVER () * p / n AS keep FROM with_p
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN probs pr ON d.source = pr.source
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < pr.keep
""")
def rebalance_mixture_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing: every source deterministically
    downsampled toward the smallest one (uniform targets). Stratum stats
    are a tiny aggregate, probabilities broadcast back, membership is the
    md5-of-id filter — identical row set in any engine, which is exactly
    what the oracle checks."""
    from etl_mark1_spark.operators.corpus import rebalance_mixture

    docs = t(spark, sf_dir, "documents")
    return rebalance_mixture(docs, strata_col="source") \
        .select("doc_id", "source")


@query("curation_chunks", """
    WITH kept AS (
        SELECT doc_id, lang, text FROM documents
        WHERE n_chars >= 100 AND text IS NOT NULL
    ),
    deduped AS (
        SELECT doc_id, lang, text FROM kept
        WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY text)
    ),
    chunks AS (
        SELECT d.doc_id, d.lang,
               s.k AS chunk_id,
               substring(d.text, CAST(s.k * 320 + 1 AS INTEGER), 400)
                   AS chunk_text
        FROM deduped d
        JOIN (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k
              FROM documents) AS s
          ON s.k <= (greatest(length(d.text) - 80, 1) - 1) // 320
    ),
    counted AS (
        SELECT doc_id, lang, chunk_id,
               CASE WHEN length(trim(chunk_text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(chunk_text), '\\s+'))
               END AS n_tokens
        FROM chunks
    )
    SELECT doc_id, chunk_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor((sum(n_tokens) OVER (
                           PARTITION BY lang ORDER BY doc_id, chunk_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens) / 512)
             AS BIGINT) AS seq_id
    FROM counted
""")
def curation_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level curation composite — the full training-shard prep as
    ONE lazy lineage: length gate -> exact dedup (min-id keep) ->
    overlapping 400/80 chunking -> whitespace token counts -> 512-token
    sequence packing sharded by lang. Every stage is a deterministic
    function of row content (integer math + md5-free ordering), so the
    SQL oracle reproduces the whole pipeline hash-exactly. The reference
    would round-trip CSV between each of these five steps
    (executor/engine.py:209-216); here Catalyst fuses the gate into the
    scan and the only shuffles are the dedup group and the per-lang
    packing window."""
    from etl_mark1_spark.functions.text import whitespace_token_count
    from etl_mark1_spark.operators.corpus import chunk_documents, pack_sequences
    from etl_mark1_spark.operators.dedup import dedup_exact

    docs = (t(spark, sf_dir, "documents")
            .filter((F.col("n_chars") >= 100) & F.col("text").isNotNull())
            .select("doc_id", "lang", "text"))
    deduped = dedup_exact(docs, "text", "doc_id", keep="min_id")
    chunks = chunk_documents(deduped, chunk_chars=400, overlap=80,
                             keep_cols=("lang",))
    counted = chunks.select(
        "doc_id", "lang", "chunk_id",
        whitespace_token_count(F.col("chunk_text")).cast("bigint")
        .alias("n_tokens"))
    packed = pack_sequences(
        counted.withColumn("_ord", F.struct("doc_id", "chunk_id")),
        budget=512, size_col="n_tokens", shard_col="lang", id_col="_ord")
    return packed.select("doc_id", "chunk_id", "n_tokens", "seq_id")


@query("curation_pipeline", """
    WITH kept AS (
        SELECT doc_id, text FROM documents
        WHERE lang = 'en' AND n_chars BETWEEN 100 AND 500
    ),
    deduped AS (
        SELECT doc_id, text FROM kept
        WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY text)
    )
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 4)) AS INTEGER) % 100 < 80
                THEN 'train' ELSE 'test' END AS split
    FROM deduped
""")
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composite: language + length gate -> exact dedup
    (min-id keep) -> deterministic split. One lazy lineage — Catalyst fuses
    the filters into the scan and the whole chain optimizes as one plan,
    the property the reference loses by materializing CSV between nodes
    (executor/engine.py:209-216)."""
    from etl_mark1_spark.operators.corpus import train_test_split
    from etl_mark1_spark.operators.dedup import dedup_exact

    docs = (t(spark, sf_dir, "documents")
            .filter((F.col("lang") == "en")
                    & F.col("n_chars").between(100, 500))
            .select("doc_id", "text"))
    return train_test_split(dedup_exact(docs)).select("doc_id", "split")


@query("resample_ffill_events", """
    WITH actual AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(sum(value), 2) AS _actual
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
               FROM actual GROUP BY 1),
    grid AS (
        SELECT b.user_id,
               UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    )
    SELECT g.user_id, g.bucket,
           last_value(a._actual IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS UNBOUNDED PRECEDING) AS val
    FROM grid g LEFT JOIN actual a
      ON g.user_id = a.user_id AND g.bucket = a.bucket
""")
def resample_ffill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly grid with gap buckets forward-filled
    (operators/timeseries.py) — the metrics/feature-pipeline resample."""
    from etl_mark1_spark.operators.timeseries import resample_ffill

    return resample_ffill(t(spark, sf_dir, "events"))


@query("seasonal_decompose_events", """
    WITH actual AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(sum(value), 2) AS _actual
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
               FROM actual GROUP BY 1),
    grid AS (
        SELECT b.user_id,
               UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    ),
    series AS (
        SELECT g.user_id, g.bucket,
               last_value(a._actual IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS val
        FROM grid g LEFT JOIN actual a
          ON g.user_id = a.user_id AND g.bucket = a.bucket
    ),
    ints AS (
        SELECT user_id, bucket, val,
               CAST(epoch(bucket) / 3600 AS BIGINT) % 24 AS phase,
               CAST(round(val * 100) AS BIGINT) AS iv
        FROM series
    ),
    tr AS (
        SELECT user_id, bucket, val, phase, iv,
               CASE WHEN count(iv) OVER w1 = 24
                     AND count(iv) OVER w2 = 24
                    THEN sum(iv) OVER w1 + sum(iv) OVER w2 END AS ts,
               CASE WHEN count(iv) OVER w1 = 24
                     AND count(iv) OVER w2 = 24
                    THEN iv * 48 - (sum(iv) OVER w1 + sum(iv) OVER w2)
               END AS det
        FROM ints
        WINDOW w1 AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
               w2 AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
    ),
    seas AS (
        SELECT user_id, phase, sum(det) AS gs, count(*) AS gn
        FROM tr WHERE det IS NOT NULL GROUP BY 1, 2
    )
    SELECT t.user_id, t.bucket, t.val,
           floor((t.ts / 4800.0) * 1e6 + 0.5) / 1e6 AS trend,
           CASE WHEN t.ts IS NOT NULL
                THEN floor((s.gs / s.gn / 4800.0) * 1e6 + 0.5) / 1e6
           END AS seasonal,
           CASE WHEN t.ts IS NOT NULL
                THEN floor((t.det / 4800.0 - s.gs / s.gn / 4800.0)
                           * 1e6 + 0.5) / 1e6
           END AS resid
    FROM tr t LEFT JOIN seas s
      ON t.user_id = s.user_id AND t.phase = s.phase
""")
def seasonal_decompose_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of each user's hourly value series
    (operators/timeseries.py:seasonal_decompose, period 24 via the
    classical 2xMA centered trend): value = trend + seasonal + resid,
    incomplete-window edges NULL. The oracle replays the exact window
    arithmetic; phases use epoch hours, identical under the pinned UTC
    session."""
    from etl_mark1_spark.operators.timeseries import (resample_ffill,
                                                      seasonal_decompose)

    series = resample_ffill(t(spark, sf_dir, "events"))
    return seasonal_decompose(series, period=24)


@query("resample_interpolate_events", """
    WITH actual AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(sum(value), 2) AS _actual
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
               FROM actual GROUP BY 1),
    grid AS (
        SELECT b.user_id,
               UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    ),
    j AS (
        SELECT g.user_id, g.bucket, a._actual,
               last_value(a._actual IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS pv,
               last_value(CASE WHEN a._actual IS NOT NULL THEN g.bucket END
                          IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS pb,
               first_value(a._actual IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN a._actual IS NOT NULL THEN g.bucket END
                           IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        FROM grid g LEFT JOIN actual a
          ON g.user_id = a.user_id AND g.bucket = a.bucket
    )
    SELECT user_id, bucket,
           floor(CASE
             WHEN _actual IS NOT NULL THEN _actual
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (date_diff('second', pb, bucket) * 1.0
                                 / date_diff('second', pb, nb))
             ELSE coalesce(pv, nv) END * 1e6 + 0.5) / 1e6 AS val
    FROM j
""")
def resample_interpolate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly grid with gaps LINEARLY interpolated between the
    nearest observed buckets (operators/timeseries.py:
    resample_interpolate) — time-weighted, edge buckets nearest-filled.
    The smooth counterpart of resample_ffill_events for continuous
    signals."""
    from etl_mark1_spark.operators.timeseries import resample_interpolate

    return resample_interpolate(t(spark, sf_dir, "events"))


@query("expectations_customer", """
    SELECT 'min_rows' AS rule, count(*) >= 1000 AS passed,
           round(CAST(count(*) AS DOUBLE), 6) AS actual FROM customer
    UNION ALL
    SELECT 'custkey_unique',
           (count(c_custkey) - count(DISTINCT c_custkey)) = 0,
           round(CAST(count(c_custkey) - count(DISTINCT c_custkey)
                 AS DOUBLE), 6) FROM customer
    UNION ALL
    SELECT 'segment_not_null',
           avg(CASE WHEN c_mktsegment IS NULL THEN 1.0 ELSE 0.0 END) <= 0.0,
           round(avg(CASE WHEN c_mktsegment IS NULL THEN 1.0 ELSE 0.0 END),
                 6) FROM customer
    UNION ALL
    SELECT 'acctbal_range',
           count(CASE WHEN c_acctbal NOT BETWEEN -2000 AND 12000
                 THEN 1 END) = 0,
           round(CAST(count(CASE WHEN c_acctbal NOT BETWEEN -2000 AND 12000
                 THEN 1 END) AS DOUBLE), 6) FROM customer
    UNION ALL
    SELECT 'segment_values',
           count(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING',
                 'FURNITURE', 'MACHINERY', 'HOUSEHOLD')
                 AND c_mktsegment IS NOT NULL THEN 1 END) = 0,
           round(CAST(count(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE',
                 'BUILDING', 'FURNITURE', 'MACHINERY', 'HOUSEHOLD')
                 AND c_mktsegment IS NOT NULL THEN 1 END) AS DOUBLE), 6)
    FROM customer
""")
def expectations_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative quality expectations — five rules, ONE aggregation pass
    (the reference's A7 score generalized into per-rule gates)."""
    from etl_mark1_spark.plans.quality import check_expectations

    return check_expectations(t(spark, sf_dir, "customer"), [
        {"name": "min_rows", "kind": "row_count_min", "min": 1000},
        {"name": "custkey_unique", "kind": "unique", "column": "c_custkey"},
        {"name": "segment_not_null", "kind": "not_null",
         "column": "c_mktsegment"},
        {"name": "acctbal_range", "kind": "in_range", "column": "c_acctbal",
         "lo": -2000, "hi": 12000},
        {"name": "segment_values", "kind": "accepted_values",
         "column": "c_mktsegment",
         "values": ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
                    "HOUSEHOLD"]},
    ])


@query("leakage_safe_split", """
    SELECT d.doc_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(c.canon AS VARCHAR)),
                                             1, 4)) AS INTEGER) % 100 < 80
                THEN 'train' ELSE 'test' END AS split
    FROM documents d
    JOIN (SELECT text, min(doc_id) AS canon FROM documents GROUP BY text) c
      ON d.text = c.text
""")
def leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split hashed on the duplicate group's canonical id, so identical
    documents can never straddle train/test (memorized eval leakage)."""
    from etl_mark1_spark.operators.corpus import leakage_safe_split

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return leakage_safe_split(docs).select("doc_id", "split")


_NTILE_SQL = """
    SELECT q, count(*) AS n, round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (SELECT o_totalprice,
                 CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)
                   AS BIGINT) AS q
          FROM orders)
    GROUP BY q
"""


@query("ntile_quartiles", _NTILE_SQL)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quartile assignment + per-bucket bounds, WITHOUT the
    single-partition global sort the ntile window plans: two-phase exact
    ranking (operators/sketches.py:exact_ntile — sketch-cutoff shards,
    parallel within-shard row_number, broadcast offsets, closed-form
    ntile bucket from (rank, n)). The oracle runs the real window in
    DuckDB, so the formulation is proven bucket-for-bucket identical —
    including the first-buckets-get-the-remainder size rule and the
    (price, orderkey) tie order. ``quartiles_approx`` below stays as the
    cheaper sketch-only variant (no exact ranks, 1%-band buckets)."""
    from etl_mark1_spark.operators.sketches import exact_ntile

    orders = t(spark, sf_dir, "orders")
    return (exact_ntile(orders, "o_totalprice", ["o_orderkey"], 4)
            .groupBy("q")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi"))
            .select("q", "n", "lo", "hi"))


@query("quartiles_approx")
def quartiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for ntile_quartiles: approx_percentile cutoffs computed
    in one decomposable aggregate, broadcast, and applied as a map-side
    bucket expression (operators/sketches.py:approx_ntile) — the executed
    plan contains NO window and NO single-partition sort. Checked against
    exact ntile bucket counts within a 1% band (scripts/check_oracle.py
    APPROX_ORACLES; rank error at accuracy=10000 over 15k rows is <2
    rows, so the band is generous) plus a plan assertion + exact-count
    test in tests/test_sketches.py."""
    from etl_mark1_spark.operators.sketches import approx_ntile

    orders = t(spark, sf_dir, "orders")
    return (approx_ntile(orders, "o_totalprice", num_buckets=4)
            .groupBy("q")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi")))


@query("streaming_hll_distinct")
def streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming + sketch composition: distinct users per tumbling hour
    estimated with DataSketches HLL INSIDE the streaming aggregation —
    per-window state is one ~4 KB sketch regardless of user cardinality,
    the shape that keeps streaming distinct-count state bounded at
    firehose scale (exact streaming dropDuplicates state grows with the
    horizon's key count). Runs in complete mode for the batch-parity
    drain, where Spark IGNORES the watermark and retains every window's
    state for the horizon — the bounded-state property here is per-window
    (one sketch each), not window eviction; in a live append/update-mode
    deployment the same watermark would also evict finalized windows.
    Checked against exact per-hour COUNT(DISTINCT) within the sketch band
    (scripts/check_oracle.py APPROX_ORACLES)."""
    from etl_mark1_spark.streaming.events import (
        read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("window"))
           .agg(F.hll_sketch_estimate(
               F.hll_sketch_agg("user_id", F.lit(12)))
               .cast("bigint").alias("approx_distinct"))
           .select(F.col("window").start.cast("timestamp_ntz")
                   .alias("window_start"),
                   "approx_distinct"))
    return run_available_now(agg, table_name="stream_hll_out",
                             output_mode="complete")


@query("quantile_digest_merge")
def quantile_digest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile member of the mergeable-sketch family (HLL = distinct,
    count-min = frequency, Bloom = membership): per-month equi-depth
    digests of o_totalprice built with ONE decomposable aggregate
    (operators/sketches.py:quantile_digest_rollup), then global
    p25/p50/p75/p90 answered by MERGING the digests — the raw rows are
    never rescanned, the property that makes "p95 over any date range"
    affordable at 100 TB.

    Output is (q, n_below): the estimates' exact ranks, computed by one
    extra validation pass so the error-band oracle
    (scripts/check_oracle.py APPROX_ORACLES) can hold each estimate's
    true rank within 4% of target — covering the documented N/k + N/
    accuracy rank-error bound. The validation pass is harness glue, not
    part of the operator."""
    from etl_mark1_spark.operators.sketches import (
        quantile_digest_quantiles, quantile_digest_rollup)

    orders = t(spark, sf_dir, "orders").withColumn(
        "_y", F.year("o_orderdate")).withColumn(
        "_m", F.month("o_orderdate"))
    rollup = quantile_digest_rollup(orders, ["_y", "_m"], "o_totalprice")
    est = quantile_digest_quantiles(rollup, [0.25, 0.5, 0.75, 0.9])
    return (orders.crossJoin(F.broadcast(est))
            .filter(F.col("o_totalprice") <= F.col("value"))
            .groupBy("q")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_below")))


_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_volume", _Q7_SQL)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way join with a disjunctive nation pair filter +
    per-year rollup; both nation dimensions broadcast."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q7_SQL, sources={
        name: t(spark, sf_dir, name)
        for name in ("supplier", "lineitem", "orders", "customer", "nation")
    }, limit=None)


_Q9_SQL = """
    SELECT n_name AS nation,
           CAST(year(l_shipdate) AS BIGINT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, o_year
"""


@query("q9_profit_by_nation", _Q9_SQL)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: fact-to-part/supplier joins with a LIKE filter
    pushed at the part scan, profit rollup by nation and year."""
    from etl_mark1_spark.plans.sql import execute_sql

    return execute_sql(spark, _Q9_SQL, sources={
        name: t(spark, sf_dir, name)
        for name in ("lineitem", "part", "supplier", "nation")
    }, limit=None)


@query("salted_join_lineitem", """
    SELECT l_orderkey, l_linenumber, o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
""")
def salted_join_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted equi-join (operators/skew.py): results must be
    IDENTICAL to the plain join — the oracle is the plain SQL join, which
    is the whole point of the check."""
    from etl_mark1_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    return salted_join(li, orders, "l_orderkey", num_salts=8)


@query("skewed_join_aqe", """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_orderkey END
              AS k,
              l_extendedprice, l_returnflag
          FROM lineitem) s
    JOIN orders ON o_orderkey = s.k
    GROUP BY l_returnflag
""")
def skewed_join_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately pathological join skew handled by AQE, measured in the
    bench rather than just configured: a third of lineitem collapses onto
    ONE key, the join is hinted to sort-merge (no broadcast escape), and
    AQE's runtime skew-split carves the monster partition into parallel
    subtasks (OptimizeSkewedJoin; plan shows ``skew=true`` — asserted in
    tests/test_plans.py). The skew thresholds are lowered because the
    defaults (256 MB) are sized for real clusters — at 100 TB the same
    plan triggers with stock settings — and AQE's runtime SMJ->broadcast
    conversion is suppressed because at 100 TB the probe side wouldn't
    fit an executor (at bench scale it would, which would silently dodge
    the skew path being measured). Conf set is per-session and
    semantics-preserving (skew split never changes results — the oracle
    is the plain join; static broadcast plans elsewhere in this catalog
    use explicit hints and are unaffected).
    """
    import os

    from etl_mark1_spark.operators.dedup import ensure_parallelism

    thr = os.environ.get("SPARK_GRAFT_SKEW_THRESHOLD", "256k")
    adv = os.environ.get("SPARK_GRAFT_SKEW_ADVISORY", "64k")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thr)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # skew splits happen at MAP-OUTPUT boundaries: the toy-scale parquet is
    # one row group = ONE effective mapper, making the skewed reduce block
    # a single unsplittable chunk. ensure_parallelism fans the narrow scan
    # out to real mappers (no-op on any real-scale multi-split table).
    li = ensure_parallelism(t(spark, sf_dir, "lineitem")).select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("l_orderkey")).alias("k"),
        "l_extendedprice", "l_returnflag")
    orders = t(spark, sf_dir, "orders").select("o_orderkey")
    # group on a fact-side column: grouping on a dim-side column was
    # observed to suppress OptimizeSkewedJoin in Spark 4.1 (the skewed
    # shuffle read stays un-split), defeating the thing being measured
    return (li.hint("merge")
            .join(orders, li.k == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.sum("l_extendedprice"), 2).alias("revenue")))




@query("length_bucketed_batches_docs", r"""
    WITH tk AS (
      SELECT doc_id,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+'))
                  END AS BIGINT) AS n_tokens
      FROM documents),
    b AS (
      SELECT doc_id, n_tokens,
             CAST(CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32 WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128 WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512 WHEN n_tokens <= 1024 THEN 1024 WHEN n_tokens <= 2048 THEN 2048 WHEN n_tokens <= 4096 THEN 4096 WHEN n_tokens <= 8192 THEN 8192 WHEN n_tokens <= 16384 THEN 16384 WHEN n_tokens <= 32768 THEN 32768 ELSE 65536 END AS BIGINT) AS bucket
      FROM tk),
    r AS (SELECT *, row_number() OVER (PARTITION BY bucket
                                       ORDER BY doc_id) - 1 AS rk
          FROM b)
    SELECT doc_id, n_tokens, bucket,
           CAST(rk // greatest(256 // bucket, 1) AS BIGINT) AS batch_idx
    FROM r ORDER BY doc_id
""")
def length_bucketed_batches_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic batching (operators/corpus.py:
    length_bucketed_batches): documents pad up to the next power-of-two
    token bucket and fill per-bucket batches of max(1, 256 // bucket)
    docs in doc_id order — the padding-waste reducer for variable-length
    training. Per-bucket ranks come from the shared two-phase prefix sum
    over one indicator column per bucket (buckets are few and huge — the
    worst window skew — so no per-bucket window ever sorts a bucket's
    full row set); the oracle replays the bucketing and fill arithmetic
    with a plain window."""
    from etl_mark1_spark.functions.text import whitespace_token_count
    from etl_mark1_spark.operators.corpus import length_bucketed_batches

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", whitespace_token_count("text").cast("long")
        .alias("n_tokens"))
    return (length_bucketed_batches(docs, budget=256)
            .select("doc_id", "n_tokens", "bucket", "batch_idx"))
