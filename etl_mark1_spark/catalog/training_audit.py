"""Training-corpus audit entries (round 10, second tranche): exact
water-filling budget allocation, readability scoring, Luhn-validated
payment-card PII, n-gram novelty, OOV rate, and invisible-codepoint
stripping — the release-audit and mixture-design surface a training-data
pipeline runs after dedup/decontam and before sharding.

Every entry is oracle-exact and follows the catalog's output-typing
convention (scalar carriers, BIGINT counts, rounded doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

#: the invisible codepoints, injected as literal characters into the
#: DuckDB oracle regexes (RE2 has no \uhhhh escape; literal codepoints
#: inside a character class work in both engines). Must stay in sync
#: with operators/encoding.py:INVISIBLE_CLASS.
_INV = "\u200b\u200c\u200d\u2060\ufeff\u00ad"


@query("token_budget_waterfill", r"""
    WITH c AS (
      SELECT source,
             CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END)
               AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    r AS (SELECT source, n_tokens,
                 row_number() OVER (ORDER BY n_tokens, source) AS i,
                 sum(n_tokens) OVER (ORDER BY n_tokens, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
                 count(*) OVER () AS m
          FROM c),
    k AS (SELECT max(CASE WHEN s + n_tokens * (m - i) <= 27000
                          THEN i END) AS istar,
                 max(CASE WHEN s + n_tokens * (m - i) <= 27000
                          THEN s END) AS sstar,
                 max(m) AS mm
          FROM r),
    f AS (SELECT source, n_tokens,
                 round(CASE WHEN istar IS NULL THEN 27000 * 1.0 / mm
                            WHEN istar < mm
                            THEN (27000 - sstar) * 1.0 / (mm - istar)
                       END, 6) AS cap
          FROM r, k)
    SELECT source, n_tokens, cap,
           round(CASE WHEN cap IS NULL THEN n_tokens * 1.0
                      ELSE least(n_tokens * 1.0, cap) END, 6)
             AS alloc_tokens
    FROM f
""")
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact water-filling of a 27k-token global budget across sources
    (operators/corpus.py:waterfill_budget): one cap ``c`` with
    ``sum min(n_s, c) = budget``, found closed-form on the sorted
    per-source aggregate — no iteration, no driver loop. The fixture corpus
    carries ~27.2k tokens, so at sf0.01 the knee lands MID-distribution
    (small sources survive whole, large ones are trimmed) — the branch
    worth pinning; the unit tests cover the all-capped and
    everything-fits arms against a brute-force reference. The oracle replays the knee construction with window
    functions over the identical aggregate."""
    from etl_mark1_spark.operators.corpus import waterfill_budget

    return waterfill_budget(t(spark, sf_dir, "documents"), budget=27000)


@query("readability_docs", r"""
    WITH d AS (SELECT doc_id,
                      replace(text, ' table ', ' table. ') AS tx
               FROM documents),
    m AS (SELECT doc_id,
                 CASE WHEN length(trim(tx)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(tx), '\s+'))
                 END AS w,
                 greatest(len(regexp_extract_all(tx, '[.!?]+')), 1) AS s,
                 len(regexp_extract_all(lower(tx), '[aeiouy]+')) AS sy
          FROM d)
    SELECT doc_id, CAST(w AS BIGINT) AS n_words,
           CAST(s AS BIGINT) AS n_sentences,
           CAST(sy AS BIGINT) AS n_syllables,
           round(CASE WHEN w > 0 THEN 206.835 - 1.015 * (w * 1.0 / s)
                      - 84.6 * (sy * 1.0 / w) END, 4) AS flesch
    FROM m
""")
def readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document
    (functions/text.py:flesch_reading_ease): vowel-group syllables,
    terminator-run sentences, whitespace words — all codegen'd regex
    counts in ONE scan, no shuffle at any size. The synthetic corpus has
    no sentence terminators, so the entry plants them deterministically
    (every ' table ' becomes ' table. ') with the same literal replace
    on both engines; the formula's fixed operation order keeps the
    double bit-identical before the round."""
    from etl_mark1_spark.functions.text import (flesch_reading_ease,
                                                sentence_count,
                                                syllable_count,
                                                whitespace_token_count)

    tx = F.replace(F.col("text"), F.lit(" table "), F.lit(" table. "))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        whitespace_token_count(tx).cast("bigint").alias("n_words"),
        sentence_count(tx).cast("bigint").alias("n_sentences"),
        syllable_count(tx).cast("bigint").alias("n_syllables"),
        F.round(flesch_reading_ease(tx), 4).alias("flesch"))


@query("pii_luhn_docs", r"""
    WITH d AS (
      SELECT doc_id, text
             || CASE WHEN doc_id % 13 = 0
                     THEN ' card 4539578763621486' ELSE '' END
             || CASE WHEN doc_id % 13 = 1
                     THEN ' acct 5555555555554444' ELSE '' END
             || CASE WHEN doc_id % 17 = 0
                     THEN ' ref 4539578763621487' ELSE '' END
             || CASE WHEN doc_id % 19 = 0
                     THEN ' id 378282246310005' ELSE '' END AS tx
      FROM documents),
    c AS (SELECT doc_id, unnest(regexp_extract_all(tx, '[0-9]{13,19}'))
                 AS num
          FROM d),
    v AS (SELECT doc_id,
                 (length(num) >= 13 AND
                  list_sum(list_transform(range(1, length(num) + 1),
                    i -> CASE WHEN i % 2 = 0 THEN
                           CASE WHEN CAST(substr(reverse(num), i, 1)
                                          AS INT) * 2 > 9
                                THEN CAST(substr(reverse(num), i, 1)
                                          AS INT) * 2 - 9
                                ELSE CAST(substr(reverse(num), i, 1)
                                          AS INT) * 2 END
                         ELSE CAST(substr(reverse(num), i, 1) AS INT)
                         END)) % 10 = 0) AS ok
          FROM c)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
    FROM v GROUP BY doc_id
""")
def pii_luhn_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment-card PII audit (operators/corpus.py:scan_card_numbers):
    every 13-19 digit run, Luhn-validated — the checksum is what
    separates redaction-worthy card numbers from card-shaped noise, so
    the entry plants BOTH kinds (three Luhn-valid test numbers on
    doc_id mod 13/13/19 residues, one checksum-broken near-miss on mod
    17) and the oracle recomputes the checksum digit-by-digit with list
    lambdas. Spark side is a pure array expression inside the scan — no
    explode, no shuffle, no UDF."""
    from etl_mark1_spark.operators.corpus import scan_card_numbers

    tx = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 13 == 0,
               " card 4539578763621486").otherwise(""),
        F.when(F.col("doc_id") % 13 == 1,
               " acct 5555555555554444").otherwise(""),
        F.when(F.col("doc_id") % 17 == 0,
               " ref 4539578763621487").otherwise(""),
        F.when(F.col("doc_id") % 19 == 0,
               " id 378282246310005").otherwise(""))
    docs = t(spark, sf_dir, "documents").select("doc_id",
                                                tx.alias("text"))
    return scan_card_numbers(docs)


@query("ngram_novelty_docs", r"""
    WITH t0 AS (SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS w
                FROM documents),
    p AS (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
          FROM t0 WHERE len(w) >= 5),
    dg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram
           FROM p),
    f AS (SELECT gram, min(doc_id) AS first_doc FROM dg GROUP BY gram)
    SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           round(avg(CASE WHEN f.first_doc = dg.doc_id
                          THEN 1.0 ELSE 0.0 END), 6) AS novel_frac
    FROM dg JOIN f USING (gram) GROUP BY dg.doc_id
""")
def ngram_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-5-gram novelty per document
    (operators/corpus.py:ngram_novelty): the fraction of a document's
    distinct 5-grams first seen (min doc id) in that document — the
    residual-duplication score quality filters threshold on after span
    dedup. Spark ships grams as 8-byte xxhash64 keys (the keying cannot
    change min-doc attribution, so the oracle's raw-string replay still
    matches); one deduped explode, one gram-level min, one join back."""
    from etl_mark1_spark.operators.corpus import ngram_novelty

    return ngram_novelty(t(spark, sf_dir, "documents"), n=5)


@query("oov_rate_docs", r"""
    WITH tk AS (SELECT doc_id,
                       unnest(list_filter(
                         string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS tok
                FROM documents),
    v AS (SELECT tok FROM (
            SELECT tok, count(*) AS c FROM tk GROUP BY tok
            ORDER BY c DESC, tok LIMIT 10)),
    s AS (SELECT doc_id, count(*) AS n_tokens,
                 sum(CASE WHEN tok IN (SELECT tok FROM v)
                          THEN 0 ELSE 1 END) AS n_oov
          FROM tk GROUP BY doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_oov * 1.0 / greatest(n_tokens, 1), 6) AS oov_rate
    FROM s
""")
def oov_rate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the corpus's own top-10 tokens
    (operators/corpus.py:oov_rate) — the tokenizer-fit diagnostic. The
    top-k vocabulary comes from one counted-and-capped aggregation
    (TakeOrderedAndProject, deterministic count-then-token tie-break —
    the fixture corpus ties exactly at the rank-10 boundary, which is
    the case worth pinning), then broadcasts into a map-side membership
    test over each document's token array: phase 2 adds no shuffle."""
    from etl_mark1_spark.operators.corpus import oov_rate

    return oov_rate(t(spark, sf_dir, "documents"), vocab_size=10)


@query("invisible_chars_docs", rf"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN chr(65279) ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
                  THEN replace(text, ' ', ' ' || chr(8203))
                  ELSE text END ||
             CASE WHEN doc_id % 11 = 0
                  THEN chr(173) || 'tail' ELSE '' END AS tx
      FROM documents),
    m AS (SELECT doc_id,
                 length(tx)
                 - length(regexp_replace(tx, '[{_INV}]', '', 'g'))
                   AS n_invisible,
                 length(regexp_replace(tx, '[{_INV}]', '', 'g'))
                   AS clean_chars
          FROM d)
    SELECT doc_id, CAST(n_invisible AS BIGINT) AS n_invisible,
           CAST(clean_chars AS BIGINT) AS clean_chars
    FROM m WHERE n_invisible > 0
""")
def invisible_chars_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invisible-codepoint audit (operators/encoding.py:strip_invisible /
    invisible_count): zero-width space/joiner/non-joiner, word joiner,
    BOM, soft hyphen — the dedup-evasion characters that must be
    stripped before any hashing or blocklist keying. The entry plants
    three evasion shapes (ZWSP after every space, a BOM prefix, a
    soft-hyphen suffix) on different doc_id residues so overlaps occur,
    then reports per-document invisible counts and the cleaned length.
    One codegen'd regexp per side; the counts are codepoint-based so
    both engines agree."""
    from etl_mark1_spark.operators.encoding import (invisible_count,
                                                    strip_invisible)

    tx = F.concat(
        F.when(F.col("doc_id") % 7 == 0, "\ufeff").otherwise(""),
        F.when(F.col("doc_id") % 5 == 0,
               F.replace(F.col("text"), F.lit(" "),
                         F.lit(" \u200b"))).otherwise(F.col("text")),
        F.when(F.col("doc_id") % 11 == 0, "\u00adtail").otherwise(""))
    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    invisible_count(tx).cast("bigint")
                    .alias("n_invisible"),
                    F.length(strip_invisible(tx)).cast("bigint")
                    .alias("clean_chars"))
            .filter(F.col("n_invisible") > 0))


@query("containment_join_docs", r"""
    WITH t0 AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ',
                                                    'g'))), ' ') AS tk
      FROM documents),
    p AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
          FROM t0 WHERE len(tk) >= 3),
    d AS (SELECT doc_id,
                 list_distinct(list(array_to_string(tk[i:i+2], ' '))) AS s
          FROM p GROUP BY doc_id),
    tk2 AS (SELECT doc_id, unnest(s) AS tok FROM d),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM tk2 a JOIN tk2 b
               ON a.tok = b.tok AND a.doc_id <> b.doc_id),
    j AS (SELECT doc_a, doc_b,
                 CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
                 / CAST(len(x.s) AS DOUBLE) AS cont
          FROM cand JOIN d x ON x.doc_id = cand.doc_a
                    JOIN d y ON y.doc_id = cand.doc_b)
    SELECT doc_a, doc_b, round(cont, 6) AS containment
    FROM j WHERE cont >= 0.8
""")
def containment_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed set-containment self-join at 0.8 over 3-gram shingles
    (operators/dedup.py:containment_join) — the quote/excerpt detector:
    a chunk embedded in a larger document has tiny Jaccard but
    containment ~1, so this is the dedup granularity the symmetric
    joins miss. The ORACLE evaluates containment over EVERY
    co-occurring directed pair with no prefix or positional filter, so
    any pair the filters wrongly prune fails the comparison — the same
    recall-proof structure as setsim_join_docs."""
    from etl_mark1_spark.operators.dedup import containment_join

    return containment_join(t(spark, sf_dir, "documents"),
                            threshold=0.8, ngram=3)


@query("tokenizer_fertility_lang", r"""
    WITH d AS (
      SELECT lang,
             text || ' v' || CAST(doc_id AS VARCHAR) || '.2 #'
                  || CAST(doc_id % 7 AS VARCHAR) AS tx
      FROM documents),
    m AS (SELECT lang,
                 CASE WHEN length(trim(tx)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(tx), '\s+'))
                 END AS ws,
                 len(regexp_extract_all(tx,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe,
                 length(tx) AS ch
          FROM d)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS n_words,
           CAST(sum(bpe) AS BIGINT) AS n_tokens,
           round(sum(bpe) * 1.0 / sum(ws), 6) AS fertility,
           round(sum(ch) * 1.0 / sum(bpe), 6) AS chars_per_token
    FROM m GROUP BY lang
""")
def tokenizer_fertility_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word plus chars per token (functions/text.py:bpe_ish_token_count) —
    the standard multilingual-tokenizer fit diagnostic (a language with
    high fertility is underserved by the vocabulary and pays more
    sequence length per word). The fixture text is pure lowercase words
    (fertility would pin at 1.0), so the entry plants digits and
    punctuation deterministically per doc; all aggregates are algebraic
    sums — one shuffle at language cardinality."""
    from etl_mark1_spark.functions.text import (bpe_ish_token_count,
                                                whitespace_token_count)

    tx = F.concat(F.col("text"), F.lit(" v"),
                  F.col("doc_id").cast("string"), F.lit(".2 #"),
                  (F.col("doc_id") % 7).cast("string"))
    d = t(spark, sf_dir, "documents").select(
        "lang", whitespace_token_count(tx).alias("_ws"),
        bpe_ish_token_count(tx).alias("_bpe"),
        F.length(tx).alias("_ch"))
    return (d.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("_ws").cast("bigint").alias("n_words"),
                 F.sum("_bpe").cast("bigint").alias("n_tokens"),
                 F.round(F.sum("_bpe") / F.sum("_ws"), 6)
                 .alias("fertility"),
                 F.round(F.sum("_ch") / F.sum("_bpe"), 6)
                 .alias("chars_per_token")))


@query("release_audit_sources", r"""
    WITH d AS (
      SELECT doc_id, source,
             text || CASE WHEN doc_id % 13 = 0
                          THEN ' card 4539578763621486' ELSE '' END
                  || CASE WHEN doc_id % 17 = 0
                          THEN ' ref 4539578763621487' ELSE '' END AS tx
      FROM documents),
    luhn AS (
      SELECT doc_id,
             max(CASE WHEN length(num) >= 13 AND
                  list_sum(list_transform(range(1, length(num) + 1),
                    i -> CASE WHEN i % 2 = 0 THEN
                           CASE WHEN CAST(substr(reverse(num), i, 1)
                                          AS INT) * 2 > 9
                                THEN CAST(substr(reverse(num), i, 1)
                                          AS INT) * 2 - 9
                                ELSE CAST(substr(reverse(num), i, 1)
                                          AS INT) * 2 END
                         ELSE CAST(substr(reverse(num), i, 1) AS INT)
                         END)) % 10 = 0 THEN 1 ELSE 0 END) AS has_card
      FROM (SELECT doc_id,
                   unnest(regexp_extract_all(tx, '[0-9]{13,19}')) AS num
            FROM d)
      GROUP BY doc_id),
    m AS (SELECT d.doc_id, d.source,
                 coalesce(luhn.has_card, 0) AS has_card,
                 CASE WHEN length(trim(d.tx)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(d.tx), '\s+'))
                 END AS w,
                 greatest(len(regexp_extract_all(d.tx, '[.!?]+')), 1) AS s,
                 len(regexp_extract_all(lower(d.tx), '[aeiouy]+')) AS sy
          FROM d LEFT JOIN luhn ON luhn.doc_id = d.doc_id)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(has_card) AS BIGINT) AS n_card_docs,
           round(avg(CASE WHEN w > 0 THEN 206.835 - 1.015 * (w * 1.0 / s)
                          - 84.6 * (sy * 1.0 / w) END), 4) AS mean_flesch
    FROM m GROUP BY source
""")
def release_audit_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed per-source release audit — the one-frame report a
    release manager reads before shipping a shard set: document volume,
    Luhn-confirmed card-number carriers (the redaction-blocking PII
    class; same planted residues as ``pii_luhn_docs``), and mean
    readability. Everything computes inside the document scan (the card
    flag is a map-side array expression, readability is regex counts),
    so the whole audit is ONE shuffle at source cardinality; the oracle
    recomposes all three signals independently."""
    from etl_mark1_spark.functions.text import flesch_reading_ease
    from etl_mark1_spark.operators.corpus import luhn_valid

    tx = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 13 == 0,
               " card 4539578763621486").otherwise(""),
        F.when(F.col("doc_id") % 17 == 0,
               " ref 4539578763621487").otherwise(""))
    cands = F.regexp_extract_all(tx, F.lit(r"[0-9]{13,19}"), F.lit(0))
    has_card = (F.size(F.filter(cands, luhn_valid)) > 0).cast("int")
    d = t(spark, sf_dir, "documents").select(
        "source", has_card.alias("_card"),
        flesch_reading_ease(tx).alias("_flesch"))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("_card").cast("bigint").alias("n_card_docs"),
                 F.round(F.avg("_flesch"), 4).alias("mean_flesch")))


@query("key_skew_report_events", """
    WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
               FROM events GROUP BY user_id),
    s AS (SELECT sum(cnt) AS total, count(*) AS nkeys FROM c),
    r AS (SELECT key, cnt,
                 CAST(row_number() OVER (ORDER BY cnt DESC, key)
                      AS BIGINT) AS rank
          FROM c)
    SELECT rank, key, cnt,
           round(cnt * 1.0 / total, 6) AS share,
           round(cnt * nkeys * 1.0 / total, 6) AS skew_ratio
    FROM r, s WHERE rank <= 5
""")
def key_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew diagnostic (operators/skew.py:key_skew_report):
    top-5 user_id keys by event count with corpus share and
    mean-load ratio — the report that decides whether a key needs
    salting (salted_aggregate/salted_join) or AQE skew-join absorbs
    it, run BEFORE committing a 100 TB shuffle to that key. One
    map-side-partial count; top-k compiles to TakeOrderedAndProject;
    the summary scalars broadcast onto the 5-row frame."""
    from etl_mark1_spark.operators.skew import key_skew_report

    return key_skew_report(t(spark, sf_dir, "events"), "user_id",
                           top_k=5)


@query("shard_plan_sources", """
    SELECT source,
           CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(greatest(ceil(sum(strlen(text)) / 65536.0), 1) AS BIGINT)
             AS n_shards,
           round(sum(strlen(text))
                 / greatest(ceil(sum(strlen(text)) / 65536.0), 1), 2)
             AS mean_shard_bytes
    FROM documents GROUP BY source
""")
def shard_plan_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-count sizing pass (sources/writers.py:plan_shards) at a
    64 KiB fixture target: per-source byte volume, rows, ceil-division
    shard count, and the resulting mean shard size — run before
    write_training_shards so shards land near the loader-friendly
    target. One algebraic aggregation at source cardinality."""
    from etl_mark1_spark.sources.writers import plan_shards

    return plan_shards(t(spark, sf_dir, "documents"),
                       target_bytes=65536)


@query("dedup_survivorship_docs", """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0
                  THEN 'boilerplate notice variant '
                       || CAST(doc_id % 7 AS VARCHAR)
                  ELSE text END AS tx
      FROM documents),
    g AS (SELECT tx, CAST(min(doc_id) AS BIGINT) AS survivor,
                 CAST(count(*) AS BIGINT) AS n_copies,
                 CAST((count(*) - 1) * strlen(tx) AS BIGINT)
                   AS bytes_saved
          FROM d GROUP BY tx)
    SELECT survivor, n_copies, bytes_saved
    FROM g WHERE n_copies > 1
""")
def dedup_survivorship_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup survivorship report: per duplicate cluster, the
    keep-first survivor id, the copy count, and the bytes the dedup
    pass reclaims — the accounting a storage owner reads next to the
    dedup run itself. The fixture corpus has no verbatim duplicates, so
    the entry plants seven boilerplate clusters on doc_id residues
    (both engines replay the synthesis). One hash aggregation keyed on
    the text (at 100 TB: key on the md5 digest so bodies never carry
    through the shuffle — corpus_datacard_sources does exactly that);
    the n_copies > 1 filter bounds the output to actual clusters."""
    tx = F.when(F.col("doc_id") % 11 == 0,
                F.concat(F.lit("boilerplate notice variant "),
                         (F.col("doc_id") % 7).cast("string"))) \
        .otherwise(F.col("text"))
    return (t(spark, sf_dir, "documents").select(
        "doc_id", tx.alias("_tx"))
        .groupBy("_tx")
        .agg(F.min("doc_id").cast("bigint").alias("survivor"),
             F.count(F.lit(1)).cast("bigint").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("survivor", "n_copies",
                ((F.col("n_copies") - 1) * F.octet_length("_tx"))
                .cast("bigint").alias("bytes_saved")))


@query("embedding_norm_shards", """
    WITH n AS (
      SELECT vec_id % 4 AS shard,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(nrm), 6) AS mean_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm
    FROM n GROUP BY shard
""")
def embedding_norm_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm audit per ingest shard (vec_id mod 4 stands in
    for the producing encoder shard): a shard whose norms collapse to 0
    or blow up marks a broken encoder run BEFORE the vectors poison an
    ANN index. The norm is a JVM-side ``aggregate`` fold inside the
    scan (float -> double cast first, so both engines square identical
    doubles in identical order); one shuffle at shard cardinality."""
    emb = t(spark, sf_dir, "embeddings")
    nrm = F.sqrt(F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return (emb.select((F.col("vec_id") % 4).cast("bigint").alias("shard"),
                       nrm.alias("_n"))
            .groupBy("shard")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
                 F.round(F.avg("_n"), 6).alias("mean_norm"),
                 F.round(F.min("_n"), 6).alias("min_norm"),
                 F.round(F.max("_n"), 6).alias("max_norm")))


@query("embedding_dim_variance", """
    WITH p AS (
      SELECT r.i AS dim, CAST(t.embedding[r.i + 1] AS DOUBLE) AS v
      FROM embeddings t,
           LATERAL (SELECT unnest(range(len(t.embedding))) AS i) r),
    s AS (SELECT dim, count(*) AS n, sum(v) AS sv, sum(v * v) AS svv
          FROM p GROUP BY dim)
    SELECT CAST(dim AS BIGINT) AS dim,
           round(sv / n, 6) AS mean,
           round(svv / n - (sv / n) * (sv / n), 6) AS variance
    FROM s
""")
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance over the embedding column — the
    dead-dimension audit (a coordinate with ~0 variance carries no
    signal; PCA and product-quantization codebooks degrade silently on
    such dims). One posexplode + one 64-group aggregation of algebraic
    sums; the variance derives from (n, sum, sumsq) partials, so the
    shuffle carries three doubles per dimension regardless of corpus
    size. Rounded to 6: the engines accumulate in different orders."""
    emb = t(spark, sf_dir, "embeddings")
    p = emb.select(F.posexplode("embedding").alias("dim", "_v")) \
        .select("dim", F.col("_v").cast("double").alias("_v"))
    return (p.groupBy(F.col("dim").cast("bigint").alias("dim"))
            .agg(F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_s"),
                 F.sum(F.col("_v") * F.col("_v")).alias("_ss"))
            .select("dim",
                    F.round(F.col("_s") / F.col("_n"), 6).alias("mean"),
                    F.round(F.col("_ss") / F.col("_n")
                            - (F.col("_s") / F.col("_n"))
                            * (F.col("_s") / F.col("_n")), 6)
                    .alias("variance")))


_DIALOG_SYNTH_SQL = """
      SELECT doc_id,
             'user: ' || substr(text, 1, 80)
             || ' assistant: ' || substr(text, 81, 80)
             || CASE WHEN doc_id % 5 = 0
                     THEN ' assistant: ' || substr(text, 161, 30)
                     ELSE '' END
             || CASE WHEN doc_id % 3 = 0
                     THEN ' user: ' || substr(text, 191, 40)
                     ELSE '' END AS tx
      FROM documents"""


def _dialog_synth_col():
    """The Spark mirror of _DIALOG_SYNTH_SQL: two guaranteed turns per
    doc, a planted assistant-assistant alternation violation on the
    mod-5 residue, and a third user turn on the mod-3 residue (both
    residues together exercise overlap)."""
    return F.concat(
        F.lit("user: "), F.substring("text", 1, 80),
        F.lit(" assistant: "), F.substring("text", 81, 80),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(" assistant: "),
                        F.substring("text", 161, 30))).otherwise(""),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" user: "),
                        F.substring("text", 191, 40))).otherwise(""))


@query("dialog_turns_docs", rf"""
    WITH d AS ({_DIALOG_SYNTH_SQL}),
    m AS (SELECT doc_id,
                 string_split(regexp_replace(replace(tx, chr(1), ''),
                   '\b(user|assistant): ', chr(1) || '\1: ', 'g'),
                   chr(1)) AS parts
          FROM d),
    p AS (SELECT doc_id, parts, unnest(range(1, len(parts))) AS i
          FROM m),
    t AS (SELECT doc_id, CAST(i AS BIGINT) AS turn_idx,
                 parts[i + 1] AS part
          FROM p
          WHERE regexp_matches(parts[i + 1], '^(user|assistant): ')),
    u AS (SELECT doc_id, turn_idx,
                 regexp_extract(part, '^(user|assistant): ', 1) AS role,
                 trim(regexp_replace(part, '^(user|assistant): ', ''))
                   AS utterance
          FROM t)
    SELECT doc_id, turn_idx, role, utterance,
           CAST(CASE WHEN length(utterance) = 0 THEN 0
                ELSE len(string_split_regex(utterance, '\s+')) END
             AS BIGINT) AS n_words
    FROM u
""")
def dialog_turns_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-transcript parsing
    (operators/sentences.py:parse_dialog_turns): 'role: utterance'
    dialogs exploded to one row per turn — the shape turn-level
    filtering, alternation checks, and loss masking all consume. The
    sentinel-insert-then-split segmentation is deliberately
    lookahead-free so the RE2-based oracle replays it exactly; all the
    regexp work rides the scan, and the only plan operator beyond the
    projection is the posexplode."""
    from etl_mark1_spark.operators.sentences import parse_dialog_turns

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", _dialog_synth_col().alias("text"))
    return parse_dialog_turns(docs)


@query("dialog_hygiene_docs", rf"""
    WITH d AS ({_DIALOG_SYNTH_SQL}),
    m AS (SELECT doc_id,
                 string_split(regexp_replace(replace(tx, chr(1), ''),
                   '\b(user|assistant): ', chr(1) || '\1: ', 'g'),
                   chr(1)) AS parts
          FROM d),
    p AS (SELECT doc_id, parts, unnest(range(1, len(parts))) AS i
          FROM m),
    t AS (SELECT doc_id, i AS turn_idx,
                 regexp_extract(parts[i + 1],
                                '^(user|assistant): ', 1) AS role
          FROM p
          WHERE regexp_matches(parts[i + 1], '^(user|assistant): ')),
    v AS (SELECT doc_id, turn_idx, role,
                 lag(role) OVER (PARTITION BY doc_id
                                 ORDER BY turn_idx) AS prev
          FROM t)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_turns,
           CAST(CASE WHEN arg_min(role, turn_idx) = 'user'
                THEN 1 ELSE 0 END AS INT) AS opens_user,
           CAST(sum(CASE WHEN role = prev THEN 1 ELSE 0 END)
             AS BIGINT) AS n_violations
    FROM v GROUP BY doc_id
""")
def dialog_hygiene_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialog hygiene per transcript
    (operators/sentences.py:dialog_alternation_report): turn count,
    user-opening flag, and alternation violations (consecutive
    same-role turns — the planted assistant-assistant residue), the
    screen an instruction pipeline runs before chat-template encoding.
    One per-doc aggregation over the exploded turns; the ordered
    collect carries (turn_idx, role) pairs only."""
    from etl_mark1_spark.operators.sentences import (
        dialog_alternation_report, parse_dialog_turns)

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", _dialog_synth_col().alias("text"))
    rep = dialog_alternation_report(parse_dialog_turns(docs))
    return rep.select("doc_id", "n_turns",
                      F.col("opens_user").cast("int").alias("opens_user"),
                      "n_violations")


#: literal chat-template / tokenizer control sequences whose presence in
#: pretraining text corrupts template handling (or marks template
#: leakage from synthetic data): scan BEFORE training, strip or drop.
SPECIAL_TOKENS = ("<|endoftext|>", "<|im_start|>", "</s>", "<s>",
                  "[INST]", "<<SYS>>")


@query("special_token_scan_docs", r"""
    WITH d AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 21 = 0
                          THEN ' <|endoftext|> tail' ELSE '' END
                  || CASE WHEN doc_id % 23 = 0
                          THEN ' says [INST] loudly' ELSE '' END
                  || CASE WHEN doc_id % 25 = 0
                          THEN ' x</s><s>y' ELSE '' END AS tx
      FROM documents),
    m AS (SELECT doc_id,
                 array_to_string(list_filter([
                     CASE WHEN contains(tx, '<|endoftext|>')
                          THEN '<|endoftext|>' END,
                     CASE WHEN contains(tx, '<|im_start|>')
                          THEN '<|im_start|>' END,
                     CASE WHEN contains(tx, '</s>') THEN '</s>' END,
                     CASE WHEN contains(replace(tx, '</s>', ''), '<s>')
                          THEN '<s>' END,
                     CASE WHEN contains(tx, '[INST]') THEN '[INST]' END,
                     CASE WHEN contains(tx, '<<SYS>>') THEN '<<SYS>>' END
                   ], x -> x IS NOT NULL), ',') AS tokens_found
          FROM d)
    SELECT doc_id, tokens_found,
           CAST(len(string_split(tokens_found, ',')) AS BIGINT) AS n_kinds
    FROM m WHERE tokens_found <> ''
""")
def special_token_scan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Special-token contamination scan: documents carrying literal
    chat-template / tokenizer control sequences (planted on three
    residues, including the '</s><s>' adjacency whose '<s>' must NOT
    also fire on the substring inside '</s>' — the membership test
    masks '</s>' out first). All literal `contains` checks inside the
    scan; output is the sorted comma-joined token list per affected
    doc, a scalar carrier per the catalog convention."""
    tx = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 21 == 0,
               " <|endoftext|> tail").otherwise(""),
        F.when(F.col("doc_id") % 23 == 0,
               " says [INST] loudly").otherwise(""),
        F.when(F.col("doc_id") % 25 == 0, " x</s><s>y").otherwise(""))
    masked = F.replace(tx, F.lit("</s>"), F.lit(""))
    found = F.filter(F.array(
        F.when(tx.contains("<|endoftext|>"), "<|endoftext|>"),
        F.when(tx.contains("<|im_start|>"), "<|im_start|>"),
        F.when(tx.contains("</s>"), "</s>"),
        F.when(masked.contains("<s>"), "<s>"),
        F.when(tx.contains("[INST]"), "[INST]"),
        F.when(tx.contains("<<SYS>>"), "<<SYS>>")),
        lambda x: x.isNotNull())
    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.array_join(found, ",").alias("tokens_found"),
                    F.size(found).cast("bigint").alias("n_kinds"))
            .filter(F.col("n_kinds") > 0))


@query("code_blocks_docs", r"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 6 = 0 THEN
                    substr(text, 1, 50) || ' ```' || substr(text, 51, 30)
                    || '``` ' || substr(text, 81, 40)
                  WHEN doc_id % 6 = 3 THEN
                    '```' || substr(text, 1, 20) || '``` mid '
                    || '```' || substr(text, 21, 10) || '```'
                  ELSE text END AS tx
      FROM documents),
    m AS (SELECT doc_id,
                 regexp_extract_all(tx, '```[^`]*```') AS blocks
          FROM d)
    SELECT doc_id,
           CAST(len(blocks) AS BIGINT) AS n_blocks,
           CAST(CASE WHEN len(blocks) = 0 THEN 0
                ELSE list_sum(list_transform(blocks,
                     b -> length(b) - 6)) END AS BIGINT) AS block_chars
    FROM m WHERE len(blocks) > 0
""")
def code_blocks_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fenced code-block extraction stats: block count and inner
    character volume per document (fences planted on two residues, one
    with two blocks) — the split a code-aware pipeline makes before
    routing code and prose to different quality filters. One codegen'd
    ``regexp_extract_all`` with a negated-class body (portable to RE2 —
    no non-greedy needed); counts are array expressions in the scan, no
    explode, no shuffle."""
    tx = F.when(
        F.col("doc_id") % 6 == 0,
        F.concat(F.substring("text", 1, 50), F.lit(" ```"),
                 F.substring("text", 51, 30), F.lit("``` "),
                 F.substring("text", 81, 40))) \
        .when(F.col("doc_id") % 6 == 3,
              F.concat(F.lit("```"), F.substring("text", 1, 20),
                       F.lit("``` mid ```"),
                       F.substring("text", 21, 10), F.lit("```"))) \
        .otherwise(F.col("text"))
    blocks = F.regexp_extract_all(tx, F.lit(r"```[^`]*```"), F.lit(0))
    chars = F.aggregate(blocks, F.lit(0).cast("bigint"),
                        lambda acc, b: acc + F.length(b) - 6)
    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.size(blocks).cast("bigint").alias("n_blocks"),
                    chars.alias("block_chars"))
            .filter(F.col("n_blocks") > 0))


@query("streaming_interval_join", """
    SELECT v.event_id AS view_event, c.event_id AS click_event,
           v.user_id AS user_id,
           CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
    FROM events v JOIN events c
      ON v.event_type = 'view' AND c.event_type = 'click'
     AND c.user_id = v.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
""")
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join
    (streaming/events.py:interval_join_streams): clicks attributed to
    same-user views within 2 hours, both sides live streams — the
    missing member of the streaming family next to the stream-static
    enrich. The time-bounded condition plus dual watermarks is what
    bounds the state store (buffered views expire once the click
    watermark passes view.ts + 2h), so at 100 TB/day state is sized by
    the attribution window, not the stream. AvailableNow over the
    bounded fixture delivers everything in-watermark, so append-mode
    output equals the batch interval join — the oracle."""
    from etl_mark1_spark.streaming.events import (interval_join_streams,
                                                  read_events_stream,
                                                  run_available_now)

    path = f"{sf_dir}/events.parquet"
    views = (read_events_stream(spark, path)
             .filter(F.col("event_type") == "view")
             .select("event_id", "ts", "user_id"))
    clicks = (read_events_stream(spark, path)
              .filter(F.col("event_type") == "click")
              .select("event_id", "ts", "user_id"))
    joined = interval_join_streams(views, clicks, upper="2 hours")
    out = joined.select(
        F.col("event_id").alias("view_event"),
        F.col("event_id_r").alias("click_event"),
        F.col("user_id"),
        (F.unix_micros("ts_r") - F.unix_micros("ts")).cast("bigint")
        .alias("gap_us"))
    return run_available_now(out, table_name="stream_ivjoin_out",
                             output_mode="append")


@query("loss_mask_spans_docs", rf"""
    WITH d AS ({_DIALOG_SYNTH_SQL}),
    m AS (SELECT doc_id,
                 string_split(regexp_replace(replace(tx, chr(1), ''),
                   '\b(user|assistant): ', chr(1) || '\1: ', 'g'),
                   chr(1)) AS parts
          FROM d),
    p AS (SELECT doc_id, parts, unnest(range(1, len(parts))) AS i
          FROM m),
    t AS (SELECT doc_id, CAST(i AS BIGINT) AS turn_idx,
                 regexp_extract(parts[i + 1],
                                '^(user|assistant): ', 1) AS role,
                 trim(regexp_replace(parts[i + 1],
                                     '^(user|assistant): ', ''))
                   AS utterance
          FROM p
          WHERE regexp_matches(parts[i + 1], '^(user|assistant): ')),
    r AS (SELECT doc_id, turn_idx, role, utterance,
                 length(role) + 2 + length(utterance) + 1 AS rlen
          FROM t),
    s AS (SELECT doc_id, turn_idx, role,
                 coalesce(sum(rlen) OVER (
                     PARTITION BY doc_id ORDER BY turn_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) + length(role) + 2 AS start_char,
                 length(utterance) AS ulen
          FROM r)
    SELECT doc_id, turn_idx,
           CAST(start_char AS BIGINT) AS start_char,
           CAST(start_char + ulen AS BIGINT) AS end_char
    FROM s WHERE role = 'assistant'
""")
def loss_mask_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT loss-mask table (operators/sentences.py:loss_mask_spans):
    [start, end) character offsets of every ASSISTANT utterance in the
    canonical "role: utterance\\n" rendering — the collator input that
    confines loss to assistant tokens without re-tokenizing per epoch.
    Offsets are a per-document running sum over the exploded turns
    (window partitioned by the doc key — tasks scale with documents,
    a transcript's turns are bounded); the oracle replays the rendering
    arithmetic with a SQL window."""
    from etl_mark1_spark.operators.sentences import (loss_mask_spans,
                                                     parse_dialog_turns)

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", _dialog_synth_col().alias("text"))
    return loss_mask_spans(parse_dialog_turns(docs))


@query("blocklist_scan_docs", r"""
    WITH pats(term) AS (
      VALUES ('table hash'), ('slow key'), ('vector small'),
             ('hash'), ('spark'), ('zz missing phrase')),
    d AS (SELECT doc_id,
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS tx
          FROM documents),
    m AS (SELECT doc_id, term FROM d, pats
          WHERE position(term IN tx) > 0)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
           min(term) AS first_term
    FROM m GROUP BY doc_id
""")
def blocklist_scan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-scan safety pass (operators/matching.py:
    multi_pattern_scan — Aho-Corasick over a broadcast automaton): per
    document, how many of the banned phrases occur and the smallest
    matched one. The pattern set deliberately nests ('hash' inside
    'table hash') so the automaton's suffix-link outputs are exercised
    under external confirmation, and includes an absent phrase. Scan
    cost is O(doc_len + matches) INDEPENDENT of dictionary size — the
    naive contains()-OR alternative grows the codegen tree with every
    term (the round-8 expression-size cliff) and pays O(terms x
    doc_len); at a 10k-phrase production blocklist only the automaton
    shape survives. No shuffle: the report is a projection of the
    corpus scan."""
    from etl_mark1_spark.operators.matching import multi_pattern_scan

    return multi_pattern_scan(
        t(spark, sf_dir, "documents"),
        ["table hash", "slow key", "vector small", "hash", "spark",
         "zz missing phrase"])
