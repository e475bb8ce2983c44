"""Funnel/cohort events, fixed-budget sampling, round-5 additions.

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.catalog.behavior_graph import cohort_retention

# ---------------------------------------------------------------------------
# Behavioral event analytics (operators/funnel.py) + fixed-budget sampling
# ---------------------------------------------------------------------------

@query("funnel_conversion_events", """
    WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t
           GROUP BY e.user_id)
    SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
           CAST(count(*) AS BIGINT) AS n_users FROM s1
    UNION ALL SELECT 2, 'click', count(*) FROM s2
    UNION ALL SELECT 3, 'purchase', count(*) FROM s3
""")
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel view -> click -> purchase
    (operators/funnel.py:funnel_counts): a user reaches a stage only
    with an event strictly after their earliest completion of the
    previous stage. The reference answers this only via hand-written
    SQL passthrough (backend/services/duckdb_engine.py:84-119); here it
    is an operator — a chain of per-user min-aggregates and user-keyed
    equi-joins, no windows, no per-user event arrays."""
    from etl_mark1_spark.operators.funnel import funnel_counts

    return funnel_counts(t(spark, sf_dir, "events"),
                         ["view", "click", "purchase"])


@query("cohort_retention_events", """
    WITH act AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS p
                 FROM events),
    cohorts AS (SELECT user_id, min(p) AS cohort FROM act GROUP BY user_id)
    SELECT c.cohort,
           CAST(datediff('day', c.cohort, a.p) / 7 AS BIGINT)
               AS period_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM act a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
""")
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle
    (operators/funnel.py:cohort_retention): users bucketed by first-
    activity ISO week, distinct-counted per (cohort, weeks-elapsed)
    cell. Two user-keyed aggregates + one join; offsets are exact
    7-day multiples in both engines (both truncate to Monday), so the
    day-diff division is integer-exact."""
    from etl_mark1_spark.operators.funnel import cohort_retention

    return cohort_retention(t(spark, sf_dir, "events"))


@query("weighted_sample_docs", """
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             floor(pow(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                               1, 8)) AS BIGINT)
                       / 4294967296.0, 1.0 / n_chars) * 1e12 + 0.5) / 1e12
                 AS wkey
      FROM documents WHERE n_chars > 0)
    ORDER BY wkey DESC, doc_id LIMIT 50
""")
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-50 length-weighted sample without replacement
    (operators/corpus.py:weighted_sample_exact_k, Efraimidis-Spirakis
    A-ES keys u^(1/w) on md5-uniform u): the fixed-budget counterpart
    of the Bernoulli weighted_sample. TakeOrderedAndProject selection
    (per-partition heaps, k-row driver merge); keys rounded
    tie-deterministically to 12 decimals so both engines' libm pow
    agree on the boundary row."""
    from etl_mark1_spark.operators.corpus import weighted_sample_exact_k

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_exact_k(docs, F.col("n_chars"), 50)


@query("seasonal_decompose_interp_events", """
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
    ),
    series AS (
        SELECT user_id, bucket,
               floor(CASE
                 WHEN _actual IS NOT NULL THEN _actual
                 WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   pv + (nv - pv) * (date_diff('second', pb, bucket) * 1.0
                                     / date_diff('second', pb, nb))
                 ELSE coalesce(pv, nv) END * 1e6 + 0.5) / 1e6 AS val
        FROM j
    ),
    ints AS (
        SELECT user_id, bucket, val,
               CAST(epoch(bucket) / 3600 AS BIGINT) % 24 AS phase,
               CAST(round(val * 1000000) AS BIGINT) AS iv
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
           floor((t.ts / 48000000.0) * 1e6 + 0.5) / 1e6 AS trend,
           CASE WHEN t.ts IS NOT NULL
                THEN floor((s.gs / s.gn / 48000000.0) * 1e6 + 0.5) / 1e6
           END AS seasonal,
           CASE WHEN t.ts IS NOT NULL
                THEN floor((t.det / 48000000.0
                            - s.gs / s.gn / 48000000.0) * 1e6 + 0.5) / 1e6
           END AS resid
    FROM tr t LEFT JOIN seas s
      ON t.user_id = s.user_id AND t.phase = s.phase
""")
def seasonal_decompose_interp_events(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Seasonal decomposition over the INTERPOLATED (6-decimal) series
    with ``value_scale=10**6`` (operators/timeseries.py): the lossless
    pairing the default 2-decimal quantum cannot give interpolated
    input. The oracle chains the interpolation CTEs into the exact
    scaled-integer window arithmetic at the 1e6 quantum — proving the
    scale parameter is engine-exact, not just documented."""
    from etl_mark1_spark.operators.timeseries import (resample_interpolate,
                                                      seasonal_decompose)

    series = resample_interpolate(t(spark, sf_dir, "events"))
    return seasonal_decompose(series, period=24, value_scale=10**6)


@query("epoch_shuffle_docs", """
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':3'),
                                     1, 8)) AS BIGINT) AS hv
      FROM documents)
    SELECT doc_id, CAST(hv % 16 AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 16
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
""")
def epoch_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-3 deterministic global shuffle of the corpus
    (operators/corpus.py:epoch_shuffle): shard + within-shard position
    as pure functions of (doc_id, epoch) — a different pseudo-random
    order per epoch, bit-identical on re-run. No global sort: the only
    exchange is the per-shard ranking window over
    corpus/num_shards-sized partitions."""
    from etl_mark1_spark.operators.corpus import epoch_shuffle

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, num_shards=16, epoch=3)


@query("edit_distance_join_customers", """
    SELECT a.c_custkey AS a, b.c_custkey AS b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
""")
def edit_distance_join_customers(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """All customer-name pairs within edit distance 1
    (operators/dedup.py:edit_distance_join): FastSS deletion-
    neighborhood candidates via a hashed bucket equi-join (full recall,
    never all-pairs), exact JVM levenshtein verify. The oracle IS the
    quadratic cross join — affordable at sf0.01, which is exactly why
    the operator exists for anything bigger."""
    from etl_mark1_spark.operators.dedup import edit_distance_join

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return edit_distance_join(cust, cust, text_col="c_name",
                              id_col="c_custkey", max_dist=1,
                              self_join=True)


@query("streaming_session_window", """
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS seq
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM numbered GROUP BY user_id, seq
""")
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session-window streaming aggregation
    (streaming/events.py:session_window_agg): the engine merges per-user
    gap-30min sessions and evicts state by watermark — no custom state
    code. Drained append-mode via the flush-punctuation idiom
    (punctuated_events_dir): one sentinel row past every real event
    pushes the final watermark over all real session ends, so the drain
    equals the batch gaps-and-islands answer exactly (the oracle uses
    ``>=`` on the gap to mirror session_window's half-open end).
    session_end reports the LAST EVENT time (window.end minus the gap)
    for direct SQL comparability."""
    from etl_mark1_spark.streaming.events import (
        punctuated_events_dir, read_events_stream, run_available_now,
        session_window_agg)

    src = punctuated_events_dir(spark, f"{sf_dir}/events.parquet")
    agg = session_window_agg(read_events_stream(spark, src))
    out = run_available_now(agg, table_name="stream_sessions",
                            output_mode="append")
    return (out.filter(F.col("user_id") >= 0)
            .select("user_id",
                    F.col("session_window.start").cast("timestamp_ntz")
                    .alias("session_start"),
                    (F.col("session_window.end")
                     - F.expr("INTERVAL 30 MINUTES")).cast("timestamp_ntz")
                    .alias("session_end"),
                    "n_events", "value_sum"))


@query("weighted_sample_per_lang", """
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
                 PARTITION BY lang
                 ORDER BY floor(pow(CAST(('0x' || substring(
                              md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                              / 4294967296.0, 1.0 / n_chars)
                          * 1e12 + 0.5) / 1e12 DESC, doc_id) AS rk
      FROM documents WHERE n_chars > 0)
    WHERE rk <= 30
""")
def weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-30-per-language length-weighted sample
    (operators/corpus.py:weighted_sample_per_group): grouped A-ES —
    fixed per-stratum budgets with quality/length bias, groups sampled
    in parallel under a per-group ranking window."""
    from etl_mark1_spark.operators.corpus import weighted_sample_per_group

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample_per_group(docs, F.col("n_chars"), 30,
                                     group_col="lang")


@query("nb_lang_classifier", r"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split(lower(trim(regexp_replace(
                 text, '\s+', ' ', 'g'))), ' ')) AS token
      FROM documents),
    tk AS (SELECT * FROM toks WHERE token <> ''),
    word AS (SELECT token, lang AS label, count(*) AS cnt
             FROM tk GROUP BY 1, 2),
    cls AS (SELECT lang AS label, count(*) AS n_tokens FROM tk GROUP BY 1),
    pri AS (SELECT lang AS label, CAST(count(*) AS DOUBLE) AS n_docs
            FROM documents GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    voc AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v FROM word),
    dlen AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
    seen AS (SELECT t.doc_id, w.label, sum(ln(w.cnt + 1.0)) AS s
             FROM tk t JOIN word w ON t.token = w.token GROUP BY 1, 2),
    scores AS (
      SELECT d.doc_id, c.label,
             floor((ln(p.n_docs / tot.n)
                    - d.n * ln(c.n_tokens + voc.v)
                    + coalesce(se.s, 0.0)) * 1e6 + 0.5) / 1e6 AS score
      FROM dlen d
      CROSS JOIN cls c
      CROSS JOIN tot
      CROSS JOIN voc
      JOIN pri p ON p.label = c.label
      LEFT JOIN seen se ON se.doc_id = d.doc_id AND se.label = c.label),
    ranked AS (
      SELECT doc_id, label, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, label) AS rk,
             lead(score) OVER (PARTITION BY doc_id
                               ORDER BY score DESC, label) AS nxt
      FROM scores)
    SELECT doc_id, label AS predicted_lang, round(score - nxt, 6) AS margin
    FROM ranked WHERE rk = 1
""")
def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A TRAINED MODEL with an exact oracle: multinomial Naive Bayes
    language classification (operators/nbayes.py) trained on the corpus
    and applied back to it — training is two aggregations over the
    token stream, inference one broadcast join + per-(doc, label) sum,
    and because every ln() input is an exact integer count, DuckDB
    replays the whole train-plus-predict pipeline value-for-value
    (scores quantized tie-deterministically at 1e-6 before the argmax
    so float summation order cannot flip a prediction). NB: this
    corpus's lang labels share one vocabulary, so the entry checks
    ENGINE PARITY of the trained model; classification semantics are
    pinned by tests/test_nbayes.py's planted separable corpus."""
    from etl_mark1_spark.operators.nbayes import nb_predict, nb_train

    docs = t(spark, sf_dir, "documents")
    model = nb_train(docs)
    return nb_predict(docs, model, out_col="predicted_lang")


@query("fuzzy_dedup_customers", """
    WITH RECURSIVE
    ed AS (SELECT a.c_custkey AS da, b.c_custkey AS db
           FROM customer a JOIN customer b
             ON a.c_custkey < b.c_custkey
            AND levenshtein(a.c_name, b.c_name) <= 1),
    sym AS (SELECT da AS a, db AS b FROM ed UNION SELECT db, da FROM ed),
    nodes AS (SELECT c_custkey AS node FROM customer),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
        WHERE r.label < s.b
    )
    SELECT node AS c_custkey, min(label) AS cluster_id
    FROM reach GROUP BY node
""")
def fuzzy_dedup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity dedup: connected components over the edit-distance-1
    name graph (edit_distance_join candidates -> exact levenshtein edges
    -> min-label clustering), each customer labeled with its component's
    minimum key — the dedup-family composition for near-identical NAMES
    where shingle similarity is meaningless. Oracle-exact: the edge set
    is exact (FastSS has full recall, verify is exact), so the
    clustering must equal the recursive min-label closure over the
    all-pairs cross join."""
    from etl_mark1_spark.operators.dedup import (_cluster_min_label,
                                                 edit_distance_join)

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    edges = edit_distance_join(cust, cust, text_col="c_name",
                               id_col="c_custkey", max_dist=1,
                               self_join=True) \
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return _cluster_min_label(cust.select("c_custkey"), edges, "c_custkey")


@query("dup_cluster_histogram", """
    WITH RECURSIVE
    named AS (
        SELECT c_custkey,
               substr(md5(CAST(c_custkey % 450 AS VARCHAR)), 1, 10) AS base,
               CAST(floor(c_custkey / 450) AS INT) AS j
        FROM customer),
    ents AS (
        SELECT c_custkey,
               substr(base, 1, j) || 'z' || substr(base, j + 2) AS name
        FROM named),
    reps AS (SELECT name, min(c_custkey) AS rep_id,
                    count(*) AS n_members
             FROM ents GROUP BY name),
    ed AS (SELECT a.rep_id AS da, b.rep_id AS db
           FROM reps a JOIN reps b
             ON a.rep_id < b.rep_id
            AND levenshtein(a.name, b.name) <= 2),
    sym AS (SELECT da AS a, db AS b FROM ed UNION SELECT db, da FROM ed),
    nodes AS (SELECT rep_id AS node FROM reps),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
        WHERE r.label < s.b
    ),
    clusters AS (SELECT node, min(label) AS cluster_id
                 FROM reach GROUP BY node),
    sizes AS (SELECT c.cluster_id, sum(r.n_members) AS sz
              FROM clusters c JOIN reps r ON r.rep_id = c.node
              GROUP BY c.cluster_id)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY sz
""")
def dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup REPORT a curation run reads before committing to a
    dedup pass: the cluster-size histogram of the edit-distance entity
    graph. TPC-H-style sequential names chain into one giant component
    (every consecutive serial is distance 1 — the degenerate case), so
    the entry PLANTS a realistic entity universe instead: each customer
    key joins a family around an md5-hex base name (random enough that
    families sit far apart) perturbed at one member-specific position —
    families of size 3 and 4 whose members are pairwise distance 2.
    FastSS k=2 candidates -> exact levenshtein edges -> min-label
    components -> two grouped counts; the oracle replays the identical
    synthesis and a recursive closure over the rep graph.

    REPRESENTATIVE GRAPH (round 11): exact-duplicate members are
    distance 0, so component structure over CUSTOMERS equals component
    structure over UNIQUE NAMES with each name weighted by its member
    count. The old shape materialized every C(v, 2) same-name id pair
    just to throw the pairs into connected components — quadratic in
    copies, and the board's worst 10x ratio (13.4x). Now one groupBy
    collapses customers to (name, rep_id, n_members); the FastSS join
    and min-label run at unique-name cardinality (scale-invariant for
    this synthesis), and cluster sizes are SUM(n_members) — the only
    corpus-sized work left is the initial aggregation. At 100 TB the
    histogram is tiny by construction and the join is the
    duplicate-collapsed FastSS bucket join, never all-pairs."""
    from etl_mark1_spark.operators.dedup import (_cluster_min_label,
                                                 edit_distance_join)

    key = F.col("c_custkey")
    base = F.substring(F.md5((key % 450).cast("string")), 1, 10)
    j = F.floor(key / 450).cast("int")
    name = F.concat(F.substring(base, 1, j),
                    F.lit("z"),
                    base.substr(j + 2, F.lit(9)))
    ents = t(spark, sf_dir, "customer").select(
        "c_custkey", name.alias("name"))
    reps = ents.groupBy("name").agg(
        F.min("c_custkey").alias("c_custkey"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"))
    edges = edit_distance_join(reps.select("c_custkey", "name"),
                               text_col="name",
                               id_col="c_custkey", max_dist=2,
                               self_join=True) \
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    clusters = _cluster_min_label(reps.select("c_custkey"), edges,
                                  "c_custkey")
    return (clusters.join(reps.select("c_custkey", "n_members"),
                          "c_custkey")
            .groupBy("cluster_id")
            .agg(F.sum("n_members").alias("_sz"))
            .groupBy(F.col("_sz").cast("bigint").alias("cluster_size"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters")))
