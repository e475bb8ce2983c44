"""Web-corpus curation entries: URL normalization, domain rollups, caps,
blocklists (extension family; operators/web.py).

The ``documents`` table has no URL column, so each entry ATTACHES a
deterministic synthetic URL computed from ``doc_id`` with pure column
arithmetic — the oracle SQL rebuilds the same strings in DuckDB, then
derives the EXPECTED canonical form from the synthesis components (host
slot -> registered domain, default ports always dropped, utm params
removed) while the Spark side runs the real parser/normalizer over the
URL string. A parser bug that mishandles any synthesized shape (userinfo
aside: ports, www, trailing slash, utm mix, fragments) breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

#: Host slot -> (raw host with case/www noise, its registered domain).
_HOSTS = [
    ("Example.COM", "example.com"),
    ("www.example.com", "example.com"),
    ("blog.example.co.uk", "example.co.uk"),
    ("News.Portal.org", "portal.org"),
    ("cdn.portal.org", "portal.org"),
    ("shop.example.co.uk", "example.co.uk"),
    ("wiki.knowledge.net", "knowledge.net"),
    ("tracker.spamcdn.biz", "spamcdn.biz"),
]


#: Memoized checkpointed synth-URL frames, keyed by (application id,
#: analyzed input plan). ``localCheckpoint`` pins executor storage blocks
#: for the session lifetime; without the cache every invocation of the ~8
#: web entries leaked a fresh copy (round-8 ADVICE). One frame per
#: distinct input (sf_dir x column set) bounds the session footprint to a
#: handful of narrow ids+url tables.
_SYNTH_CACHE: dict = {}


def _with_synth_urls(df: DataFrame) -> DataFrame:
    """Deterministic URL per doc_id (pure column arithmetic, mirrored
    bit-for-bit by :data:`_URL_CTE`): Knuth-multiplier host slot, http on
    every 11th id, explicit default port on every 5th, trailing slash on
    every 6th, utm params mixed into two of three query shapes, fragment
    on every 4th."""
    did = F.col("doc_id")
    h = ((did * F.lit(2654435761)) % 8 + 1).cast("int")
    host = F.element_at(F.array(*[F.lit(r) for r, _ in _HOSTS]), h)
    scheme = F.when(did % 11 == 0, F.lit("http")).otherwise(F.lit("https"))
    port = F.when(
        did % 5 == 0,
        F.when(scheme == "https", F.lit(":443")).otherwise(F.lit(":80")),
    ).otherwise(F.lit(""))
    path = F.concat(F.lit("/articles/"), (did % 1000).cast("string"),
                    F.when(did % 6 == 0, F.lit("/")).otherwise(F.lit("")))
    qk = (did % 7).cast("string")
    qs = (F.when(did % 3 == 0, F.concat(F.lit("?utm_source=feed&id="), qk))
          .when(did % 3 == 1, F.concat(F.lit("?id="), qk,
                                       F.lit("&utm_campaign=x")))
          .otherwise(F.lit("")))
    frag = F.when(did % 4 == 0, F.lit("#frag")).otherwise(F.lit(""))
    # Materialize the synthesized URL so downstream plans see a plain
    # column, as they would reading a real crawl table. Left lazy, the
    # synth CASE re-inlines into every reference the normalizer makes
    # (split/element_at each repeat their input tree), and the isnotnull
    # null-filter a domain equi-join pushes to the scan repeats the full
    # composition enough to blow the JIT method limit — domain_capped_docs
    # fell off whole-stage codegen to interpreted rows (2.7 s vs ~0.7 s
    # peers at sf0.01) before this cut. Narrow ids+url rows only.
    # Cache key: the CANONICALIZED analyzed plan. The plain analyzed
    # plan string embeds per-read expression ids (doc_id#2L vs doc_id#4L
    # on byte-identical reads), so keying on it never hits and every
    # invocation leaked one pinned localCheckpoint (round-10 ADVICE);
    # canonicalization normalizes expression ids away, making identical
    # reads of the same (sf_dir x column set) collide as intended.
    # Canonicalization ALSO erases output names (aliases canonicalize
    # nameless), so the schema joins the key — otherwise two reads
    # differing only in a rename would share a frame with the wrong
    # column names. tests/test_web_curation_cache.py asserts repeat
    # invocations leave the persistent-RDD count flat.
    key = (df.sparkSession.sparkContext.applicationId,
           df.schema.simpleString(),
           df._jdf.queryExecution().analyzed().canonicalized().toString())
    hit = _SYNTH_CACHE.get(key)
    if hit is not None:
        return hit
    out = df.withColumn(
        "url", F.concat(scheme, F.lit("://"), host, port, path, qs, frag)) \
        .localCheckpoint()
    _SYNTH_CACHE[key] = out
    return out


#: DuckDB CTE producing (doc_id, lang, source, url, url_norm, domain):
#: ``url`` rebuilds the Spark synthesis; ``url_norm``/``domain`` state the
#: EXPECTED normalization from the components, independent of any parsing.
_URL_CTE = """
WITH parts AS (
    SELECT doc_id, lang, source,
           CAST((doc_id * 2654435761) % 8 AS INT) + 1 AS h,
           CASE WHEN doc_id % 11 = 0 THEN 'http' ELSE 'https' END AS scheme,
           CASE WHEN doc_id % 3 = 0
                    THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
                WHEN doc_id % 3 = 1
                    THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
                         || '&utm_campaign=x'
                ELSE '' END AS qs,
           CASE WHEN doc_id % 3 IN (0, 1)
                    THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
                ELSE '' END AS qs_norm
    FROM documents
), hosted AS (
    SELECT *,
           (['Example.COM', 'www.example.com', 'blog.example.co.uk',
             'News.Portal.org', 'cdn.portal.org', 'shop.example.co.uk',
             'wiki.knowledge.net', 'tracker.spamcdn.biz'])[h] AS host,
           (['example.com', 'example.com', 'example.co.uk', 'portal.org',
             'portal.org', 'example.co.uk', 'knowledge.net',
             'spamcdn.biz'])[h] AS domain
    FROM parts
), urls AS (
    SELECT doc_id, lang, source, domain,
           scheme || '://' || host
           || CASE WHEN doc_id % 5 = 0 THEN
                  CASE WHEN scheme = 'https' THEN ':443' ELSE ':80' END
              ELSE '' END
           || '/articles/' || CAST(doc_id % 1000 AS VARCHAR)
           || CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END
           || qs
           || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url,
           scheme || '://'
           || CASE WHEN lower(host) LIKE 'www.%' THEN substr(lower(host), 5)
              ELSE lower(host) END
           || '/articles/' || CAST(doc_id % 1000 AS VARCHAR)
           || qs_norm AS url_norm
    FROM hosted
)
"""


@query("url_normalize_docs", _URL_CTE + """
    SELECT doc_id, url, url_norm, domain FROM urls
""")
def url_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize crawl URLs with the REAL parser (operators/web.py:
    normalize_url — lowercase scheme/host, strip www and default ports,
    drop fragments and utm params, trim trailing slash) plus
    public-suffix-aware registered-domain extraction; the oracle derives
    the expected canonical strings from the synthesis components. Pure
    column expressions — the plan is a single codegen'd projection, no
    shuffle, 100 TB normalizes at scan speed."""
    from etl_mark1_spark.operators.web import with_normalized_urls

    docs = _with_synth_urls(t(spark, sf_dir, "documents").select("doc_id"))
    return with_normalized_urls(docs).select("doc_id", "url", "url_norm",
                                             "domain")


@query("domain_stats_docs", _URL_CTE + """
    SELECT domain,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           min(doc_id) AS first_doc
    FROM urls GROUP BY domain ORDER BY domain
""")
def domain_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain rollup (the crawl-curation dashboard cut): doc
    count, language spread, earliest id per domain. One hash aggregate
    with map-side partials over the map-side URL attach."""
    from etl_mark1_spark.operators.web import with_normalized_urls

    docs = _with_synth_urls(
        t(spark, sf_dir, "documents").select("doc_id", "lang", "source"))
    return (with_normalized_urls(docs)
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.min("doc_id").alias("first_doc")))


@query("domain_capped_docs", _URL_CTE + """
    SELECT domain,
           count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS kept_ids_sum
    FROM (
        SELECT domain, doc_id,
               row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        FROM urls
    ) WHERE rn <= 100
    GROUP BY domain ORDER BY domain
""")
def domain_capped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every domain at 100 docs keeping the smallest doc_ids
    (operators/web.py:domain_cap — two-phase: under-cap domains bypass the
    sort via a broadcast anti-join, only the Zipf head pays the per-domain
    window). ``kept_ids_sum`` pins WHICH rows survived, not just how
    many. At sf0.01 three domains are over the cap and two under, so both
    branches execute."""
    from etl_mark1_spark.operators.web import domain_cap, with_normalized_urls

    docs = _with_synth_urls(t(spark, sf_dir, "documents").select("doc_id"))
    capped = domain_cap(with_normalized_urls(docs), cap=100)
    return (capped.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("doc_id").alias("kept_ids_sum")))


@query("blocklist_filtered_docs", _URL_CTE + """
    SELECT domain, count(*) AS n_docs
    FROM urls
    WHERE domain NOT IN ('spamcdn.biz', 'knowledge.net')
    GROUP BY domain ORDER BY domain
""")
def blocklist_filtered_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop blocklisted registered domains via the broadcast left-anti
    join (operators/web.py:filter_blocklist); the corpus never shuffles
    for the filter itself. Output is the surviving per-domain census."""
    from etl_mark1_spark.operators.web import (filter_blocklist,
                                               with_normalized_urls)

    docs = _with_synth_urls(t(spark, sf_dir, "documents").select("doc_id"))
    blocked = spark.createDataFrame(
        [("spamcdn.biz",), ("knowledge.net",)], ["domain"])
    kept = filter_blocklist(with_normalized_urls(docs), blocked)
    return kept.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"))


_ROBOTS_SITE0 = """# site0 policy
User-agent: trainingbot
Disallow: /private/
Allow: /private/pub/

User-agent: *
Disallow: /
"""
_ROBOTS_SITE1 = "User-agent: *\nDisallow: /tmp/\nCrawl-delay: 2\n"


@query("robots_filter_docs", """
SELECT doc_id,
       'https://site' || (doc_id % 3) || '.example' ||
       CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN '/articles/' || doc_id
           WHEN 1 THEN '/private/' || doc_id
           WHEN 2 THEN '/private/pub/' || doc_id
           ELSE '/tmp/' || doc_id
       END AS url,
       NOT ((doc_id % 3 = 0 AND doc_id % 4 = 1)
            OR (doc_id % 3 = 1 AND doc_id % 4 = 3)) AS robots_allowed
FROM documents
""")
def robots_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots filtering for a crawler identity: site0 has a
    trainingbot-specific group (its * group would deny EVERYTHING — group
    selection must pick the specific one), with a longer Allow carving
    /private/pub/ back out of /private/; site1 has only a * group denying
    /tmp/; site2 publishes no robots at all. The oracle states every
    URL's verdict from the (host, path) synthesis branches."""
    from etl_mark1_spark.operators.web import (filter_robots_allowed,
                                               robots_rules)

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    path = (F.when(did % 4 == 0, F.concat(F.lit("/articles/"), did))
             .when(did % 4 == 1, F.concat(F.lit("/private/"), did))
             .when(did % 4 == 2, F.concat(F.lit("/private/pub/"), did))
             .otherwise(F.concat(F.lit("/tmp/"), did)))
    urls = d.select(
        "doc_id",
        F.concat(F.lit("https://site"), did % 3, F.lit(".example"), path)
         .alias("url"))
    robots = spark.createDataFrame(
        [("site0.example", _ROBOTS_SITE0), ("site1.example", _ROBOTS_SITE1)],
        "domain string, robots_txt string")
    rules = robots_rules(robots, "trainingbot")
    return filter_robots_allowed(urls, rules, keep_denied=True) \
        .select("doc_id", "url", "robots_allowed")


#: Expected SURT key stated from the synthesis components (hosted CTE):
#: reversed www-stripped lowercase host labels, ')', the /articles path
#: (trailing slash always trimmed), then the sorted utm-free query —
#: which for the synthesized single-param shapes is qs_norm itself.
_SURT_EXPR = """
    array_to_string(list_reverse(string_split(
        CASE WHEN lower(h2.host) LIKE 'www.%' THEN substr(lower(h2.host), 5)
             ELSE lower(h2.host) END, '.')), ',')
    || ')/articles/' || CAST(u.doc_id % 1000 AS VARCHAR) || h2.qs_norm
"""


@query("surt_keys_docs", _URL_CTE + """
    SELECT u.doc_id, u.url, """ + _SURT_EXPR + """ AS surt
    FROM urls u JOIN hosted h2 ON u.doc_id = h2.doc_id
""")
def surt_keys_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT frontier keys (operators/web.py:surt_key — the Internet
    Archive's Sort-friendly URI Reordering Transform): reversed host
    labels + canonical path/query, so lexicographic order clusters a
    crawl frontier by registrable domain (per-site politeness locality,
    per-domain prefix-range scans). The Spark side runs the real parser
    over the noisy synthesized URL (case, www, default ports, utm,
    fragments, trailing slash, all eight host slots); the oracle states
    the expected key from the synthesis components without parsing.
    Pure codegen projection — 100 TB keys at scan speed."""
    from etl_mark1_spark.operators.web import surt_key

    docs = _with_synth_urls(t(spark, sf_dir, "documents").select("doc_id"))
    return docs.select("doc_id", "url",
                       surt_key(F.col("url")).alias("surt"))


@query("url_frontier_docs", _URL_CTE + """
    , keyed AS (
      SELECT u.doc_id, """ + _SURT_EXPR + """ AS surt
      FROM urls u JOIN hosted h2 ON u.doc_id = h2.doc_id)
    SELECT surt,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_variants
    FROM keyed GROUP BY surt
""")
def url_frontier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier dedup (operators/web.py:url_frontier_dedup):
    collapse scheme/case/www/port/utm/fragment/slash/param-order URL
    variants onto their SURT key, keeping the smallest doc_id as the
    canonical fetch and counting collapsed variants (doc_ids sharing a
    host slot and article number mod 1000 collide by construction, so
    n_variants > 1 rows exercise the merge). One hash aggregate on the
    key, map-side partials, (key, id) rows only — page payloads never
    shuffle."""
    from etl_mark1_spark.operators.web import url_frontier_dedup

    docs = _with_synth_urls(t(spark, sf_dir, "documents").select("doc_id"))
    return url_frontier_dedup(docs)


@query("crawl_delay_domains", """
    WITH ds AS (SELECT DISTINCT doc_id % 100 AS d FROM documents)
    SELECT 'site' || CAST(d AS VARCHAR) || '.example' AS domain,
           CASE WHEN d % 3 = 0 THEN 0.5 * (d % 4)
                WHEN d % 11 <> 7 THEN CAST(1 + d % 5 AS DOUBLE)
                ELSE NULL END AS crawl_delay
    FROM ds
""")
def crawl_delay_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness table for the frontier scheduler (operators/web.py:
    robots_crawl_delays): per-domain Crawl-delay under RFC 9309 group
    selection — a trainingbot-specific group's delay overrides the *
    group's (and its ABSENCE of one yields NULL, no fallback), the
    minimum wins within a group, and domains whose robots state no
    delay surface NULL. The synthesized robots bodies branch on the
    domain index (every 3rd domain gets a specific group, every 11th-
    mod-7 * group omits its delay); the oracle states the selected
    delay from the same arithmetic without parsing."""
    from etl_mark1_spark.operators.web import robots_crawl_delays

    d = t(spark, sf_dir, "documents") \
        .select((F.col("doc_id") % 100).alias("d")).distinct()
    star_delay = F.when(
        F.col("d") % 11 != 7,
        F.concat(F.lit("Crawl-delay: "),
                 (F.col("d") % 5 + 1).cast("string"), F.lit("\n"))
    ).otherwise(F.lit(""))
    tb_group = F.when(
        F.col("d") % 3 == 0,
        F.concat(F.lit("\nUser-agent: trainingbot\nAllow: /\n"
                       "Crawl-delay: "),
                 ((F.col("d") % 4).cast("double") * 0.5).cast("string"),
                 F.lit("\n"))
    ).otherwise(F.lit(""))
    robots = d.select(
        F.concat(F.lit("site"), F.col("d").cast("string"),
                 F.lit(".example")).alias("domain"),
        F.concat(F.lit("User-agent: *\nDisallow: /tmp/\n"),
                 star_delay, tb_group).alias("robots_txt"))
    return robots_crawl_delays(robots, "trainingbot")


@query("sitemap_frontier_docs", """
    SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS domain,
           'https://site' || CAST(doc_id % 20 AS VARCHAR)
               || '.example/articles/' || CAST(doc_id AS VARCHAR) AS loc,
           CASE WHEN doc_id % 4 <> 0
                THEN '2026-' || lpad(CAST(1 + doc_id % 9 AS VARCHAR), 2, '0')
                     || '-15' END AS lastmod,
           CASE WHEN doc_id % 3 = 0 THEN (doc_id % 10) / 10.0 END AS priority
    FROM documents
""")
def sitemap_frontier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier seeding from XML sitemaps (operators/web.py:
    sitemap_urls): each of 20 synthetic domains publishes a sitemap
    whose <url> entries mix optional fields (every 4th doc omits
    <lastmod>, only every 3rd carries <priority>) — the alignment trap
    parallel-xpath parsers fail; the per-block parser must recover each
    entry's OWN fields. The Spark side BUILDS the XML per domain (an
    ordered string_agg of the per-doc blocks) and parses it back; the
    oracle states every row from the synthesis arithmetic without
    touching XML. Parsing is regexp/array built-ins — map-side."""
    from etl_mark1_spark.operators.web import sitemap_urls

    did = F.col("doc_id")
    dom = F.concat(F.lit("site"), (did % 20).cast("string"),
                   F.lit(".example"))
    lastmod = F.when(
        did % 4 != 0,
        F.concat(F.lit("<lastmod>2026-"),
                 F.lpad((did % 9 + 1).cast("string"), 2, "0"),
                 F.lit("-15</lastmod>"))).otherwise(F.lit(""))
    prio = F.when(
        did % 3 == 0,
        F.concat(F.lit("<priority>"),
                 ((did % 10) / F.lit(10.0)).cast("string"),
                 F.lit("</priority>"))).otherwise(F.lit(""))
    block = F.concat(
        F.lit("<url><loc>https://"), dom, F.lit("/articles/"),
        did.cast("string"), F.lit("</loc>"), lastmod, prio,
        F.lit("</url>"))
    sitemaps = (t(spark, sf_dir, "documents")
                .select(dom.alias("domain"), did.alias("doc_id"),
                        block.alias("_blk"))
                .groupBy("domain")
                .agg(F.concat(
                    F.lit('<?xml version="1.0"?><urlset>'),
                    F.concat_ws("", F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("doc_id", "_blk"))),
                        lambda s: s["_blk"])),
                    F.lit("</urlset>")).alias("sitemap_xml")))
    return sitemap_urls(sitemaps)


@query("frontier_schedule_docs", """
    WITH ds AS (SELECT doc_id % 20 AS d, doc_id FROM documents),
    agg AS (SELECT d,
                   CAST(count(*) AS BIGINT) AS n_seeded,
                   CAST(count(DISTINCT doc_id % 400) AS BIGINT) AS n_unique
            FROM ds GROUP BY d),
    del AS (SELECT DISTINCT d,
                   CASE WHEN d % 3 = 0 THEN 0.5 * (d % 4)
                        WHEN d % 11 <> 7 THEN CAST(1 + d % 5 AS DOUBLE)
                        END AS crawl_delay
            FROM ds)
    SELECT 'site' || CAST(a.d AS VARCHAR) || '.example' AS domain,
           n_seeded, n_unique, crawl_delay,
           round(n_unique * coalesce(crawl_delay, 1.0) / 60.0, 6)
             AS est_minutes
    FROM agg a JOIN del USING (d)
""")
def frontier_schedule_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frontier chain COMPOSED end-to-end: sitemap-shaped seeds
    (each domain's locs collide on doc_id mod 400 — variant pressure)
    -> SURT canonicalization -> per-domain unique-fetch counts ->
    politeness join against RFC 9309 crawl delays -> the fetch-time
    estimate a scheduler budgets with (unique fetches x delay, default
    1 s). Every stage is the real operator (surt_key,
    robots_crawl_delays); the oracle restates the whole chain from the
    synthesis arithmetic. One aggregate + one broadcast-sized politeness
    join — payloads never shuffle."""
    from etl_mark1_spark.operators.web import (robots_crawl_delays,
                                               surt_key)

    did = F.col("doc_id")
    d = (did % 20)
    dom = F.concat(F.lit("site"), d.cast("string"), F.lit(".example"))
    loc = F.concat(F.lit("https://"), dom, F.lit("/articles/"),
                   (did % 400).cast("string"))
    seeds = t(spark, sf_dir, "documents").select(
        dom.alias("domain"), surt_key(loc).alias("_surt"))
    agg = (seeds.groupBy("domain")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_seeded"),
                F.countDistinct("_surt").cast("bigint").alias("n_unique")))

    dd = t(spark, sf_dir, "documents") \
        .select((F.col("doc_id") % 20).alias("d")).distinct()
    star_delay = F.when(
        F.col("d") % 11 != 7,
        F.concat(F.lit("Crawl-delay: "),
                 (F.col("d") % 5 + 1).cast("string"), F.lit("\n"))
    ).otherwise(F.lit(""))
    tb_group = F.when(
        F.col("d") % 3 == 0,
        F.concat(F.lit("\nUser-agent: trainingbot\nAllow: /\n"
                       "Crawl-delay: "),
                 ((F.col("d") % 4).cast("double") * 0.5).cast("string"),
                 F.lit("\n"))
    ).otherwise(F.lit(""))
    robots = dd.select(
        F.concat(F.lit("site"), F.col("d").cast("string"),
                 F.lit(".example")).alias("domain"),
        F.concat(F.lit("User-agent: *\nDisallow: /tmp/\n"),
                 star_delay, tb_group).alias("robots_txt"))
    delays = robots_crawl_delays(robots, "trainingbot")

    return (agg.join(F.broadcast(delays), "domain")
            .withColumn("est_minutes", F.round(
                F.col("n_unique") * F.coalesce(F.col("crawl_delay"),
                                               F.lit(1.0)) / 60.0, 6)))


@query("psl_registered_domains", """
    WITH h AS (
      SELECT doc_id, CAST(doc_id % 8 AS INT) AS v,
             CAST(doc_id // 8 % 50 AS VARCHAR) AS g
      FROM documents),
    synth AS (
      SELECT doc_id,
             CASE v
               WHEN 0 THEN 'www.blog.site' || g || '.co.uk'
               WHEN 1 THEN 'school' || g || '.k12.va.us'
               WHEN 2 THEN 'a.b.school' || g || '.k12.va.us'
               WHEN 3 THEN 'www.shop' || g || '.biz' || g || '.ck'
               WHEN 4 THEN 'sub' || g || '.www.ck'
               WHEN 5 THEN 'a' || g || '.ward.city.kawasaki.jp'
               WHEN 6 THEN 'x' || g || '.co.kawasaki.jp'
               ELSE 'deep.sub.example' || g || '.com'
             END AS host,
             CASE v
               WHEN 0 THEN 'site' || g || '.co.uk'
               WHEN 1 THEN 'school' || g || '.k12.va.us'
               WHEN 2 THEN 'school' || g || '.k12.va.us'
               WHEN 3 THEN 'shop' || g || '.biz' || g || '.ck'
               WHEN 4 THEN 'www.ck'
               WHEN 5 THEN 'city.kawasaki.jp'
               WHEN 6 THEN 'x' || g || '.co.kawasaki.jp'
               ELSE 'example' || g || '.com'
             END AS domain
      FROM h)
    SELECT doc_id, host, domain FROM synth
""")
def psl_registered_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL Public-Suffix-List semantics under external confirmation
    (operators/web.py:registered_domain_psl over the vendored snapshot,
    operators/psl_data.py): the synthesized host battery walks every
    rule class — 2-label literal (co.uk), 3-label literal (k12.va.us),
    wildcard TLD (*.ck), wildcard 3rd-level (*.kawasaki.jp), both
    exception shapes (!www.ck, !city.kawasaki.jp), and the default
    last-two-labels rule. The oracle does NOT re-run any resolver: it
    STATES the expected registrable domain per branch from the synthesis
    arithmetic, so a green row confirms the whole cascade (longest match
    first, exceptions beat wildcards) byte-for-byte. The resolver is one
    bounded literal-isin CASE — scan-speed codegen at any corpus size,
    and the same plan shape with the canonical 9k-rule PSL loaded via
    psl_data.parse_psl."""
    from etl_mark1_spark.operators.web import registered_domain_psl

    g = (F.col("doc_id") / 8).cast("long") % 50
    g = g.cast("string")
    v = (F.col("doc_id") % 8).cast("int")
    host = (F.when(v == 0, F.concat(F.lit("www.blog.site"), g,
                                    F.lit(".co.uk")))
            .when(v == 1, F.concat(F.lit("school"), g, F.lit(".k12.va.us")))
            .when(v == 2, F.concat(F.lit("a.b.school"), g,
                                   F.lit(".k12.va.us")))
            .when(v == 3, F.concat(F.lit("www.shop"), g, F.lit(".biz"), g,
                                   F.lit(".ck")))
            .when(v == 4, F.concat(F.lit("sub"), g, F.lit(".www.ck")))
            .when(v == 5, F.concat(F.lit("a"), g,
                                   F.lit(".ward.city.kawasaki.jp")))
            .when(v == 6, F.concat(F.lit("x"), g, F.lit(".co.kawasaki.jp")))
            .otherwise(F.concat(F.lit("deep.sub.example"), g,
                                F.lit(".com"))))
    docs = t(spark, sf_dir, "documents").select("doc_id",
                                                host.alias("host"))
    return docs.select("doc_id", "host",
                       registered_domain_psl(F.col("host")).alias("domain"))
