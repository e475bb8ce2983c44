"""HTML extraction entries (extension family; operators/html.py).

The ``documents`` table is already clean text, so each entry SYNTHESIZES a
deterministic HTML page around it with pure column arithmetic — the oracle
SQL rebuilds the page's *components* and states the EXPECTED extraction
output directly from them, independent of any parsing: a regression in tag
stripping, entity decoding, link harvesting, or the block classifier breaks
the value hash. The Spark side runs the real operators over the full HTML
string (the strip/link entries stay whole-stage codegen; main-content runs
the actual ``html.parser`` block classifier in mapInPandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t
from etl_mark1_spark.operators.html import (
    extract_links,
    extract_main_content,
    strip_html_tags,
)


@query("html_strip_docs", r"""
SELECT doc_id,
       'Doc ' || doc_id || ' Title ' || doc_id || ' '
           || trim(regexp_replace(text, '\s+', ' ', 'g'))
           || ' entities: <tag> & "q''s" end' AS stripped
FROM documents
""")
def html_strip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET-style tag strip over synthesized pages: title text survives,
    style/script bodies (including a ``</p>`` hidden inside a JS string
    and a ``<`` comparison) and comments vanish, the six common entities
    decode exactly once, whitespace collapses. The oracle never parses —
    it states the expected text from the synthesis components."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    html = F.concat(
        F.lit("<html><head><title>Doc "), did, F.lit("</title>"),
        F.lit('<style type="text/css">p { margin: '), (did % 7),
        F.lit("px; }</style>"),
        F.lit("<script>if (a < "), (did % 9),
        F.lit(') { s = "</p>"; }</script></head>'),
        F.lit("<body><!-- build "), did, F.lit(" --><h1>Title "), did,
        F.lit("</h1><p class=\"lead\">"), F.col("text"), F.lit("</p>"),
        F.lit("<p>entities: &lt;tag&gt; &amp; &quot;q&#39;s&quot;&nbsp;"
              "end</p></body></html>"))
    return (d.withColumn("html", html)
             .select("doc_id", strip_html_tags("html").alias("stripped")))


@query("html_links_docs", """
WITH gen AS (
    SELECT doc_id, unnest(range(doc_id % 4)) AS i FROM documents
)
SELECT doc_id, CAST(i AS INT) AS pos,
       'https://site' || ((doc_id * 7 + i) % 5) || '.example/p/'
           || (doc_id % 100) || '/' || i AS link
FROM gen
""")
def html_links_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor href harvesting: each doc carries ``doc_id % 4`` anchors
    (quote style alternating per doc so both extraction passes are
    exercised corpus-wide), plus non-anchor href noise (``<link>``,
    ``<area>``, a nameless ``<a>``) that must NOT be harvested. The
    oracle regenerates the expected (doc_id, pos, link) rows directly."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    n = (did % 4).cast("int")
    quote = F.when(did % 2 == 0, F.lit('"')).otherwise(F.lit("'"))

    def anchor(i):
        url = F.concat(F.lit("https://site"), (did * 7 + i) % 5,
                       F.lit(".example/p/"), did % 100, F.lit("/"), i)
        return F.concat(F.lit("<a class=t href="), quote, url, quote,
                        F.lit(">link "), i, F.lit("</a>"))

    anchors = F.when(
        n > 0,
        F.array_join(F.transform(F.sequence(F.lit(0), n - 1), anchor), " "),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><link rel="stylesheet" href="/style.css">'
              "</head><body><a name=\"top\">no href</a>"),
        anchors,
        F.lit('<area shape="rect" href="/map"></body></html>'))
    return extract_links(d.withColumn("html", html))


@query("html_main_content_docs", r"""
SELECT doc_id,
       trim(regexp_replace(
           'Paragraph one & lead of document ' || doc_id || ': '
               || substr(text, 1, 80), '\s+', ' ', 'g'))
       || chr(10) ||
       trim(regexp_replace(
           'Paragraph two of document ' || doc_id || ' continues: '
               || substr(text, 11, 80), '\s+', ' ', 'g')) AS main_text,
       CAST(2 AS INT) AS blocks_kept
FROM documents
""")
def html_main_content_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal end to end: the synthesized page wraps two
    planted article paragraphs in the full crawl-page furniture — head
    title, nav link bar, site header, link-farm aside, footer — and the
    classifier must keep EXACTLY the two paragraphs (entity in the first
    one decoded). The oracle states the planted paragraphs verbatim; any
    kept boilerplate or dropped article text breaks both the hash and
    blocks_kept."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    p1 = F.concat(F.lit("Paragraph one &amp; lead of document "), did,
                  F.lit(": "), F.substring(F.col("text"), 1, 80))
    p2 = F.concat(F.lit("Paragraph two of document "), did,
                  F.lit(" continues: "), F.substring(F.col("text"), 11, 80))
    html = F.concat(
        F.lit("<html><head><title>Site "), did % 5,
        F.lit('</title></head><body><nav><a href="/">Home</a> '
              '<a href="/a">About</a> <a href="/c">Contact</a></nav>'
              "<header><h1>The Portal, issue "), did % 12,
        F.lit("</h1></header><p>"), p1, F.lit("</p><p>"), p2,
        F.lit('</p><aside><a href="/buy">Buy now</a> '
              '<a href="/deal">cheap deals</a> ads</aside>'
              "<footer>contact us | terms</footer></body></html>"))
    out = extract_main_content(d.withColumn("html", html))
    return out.select("doc_id", "main_text", "blocks_kept")


@query("warc_ingest_docs", r"""
SELECT doc_id,
       'https://corpus.example/doc/' || doc_id AS url,
       '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
           || 'T12:00:00Z' AS warc_date,
       CAST(200 AS INT) AS http_status,
       'Home ' || trim(regexp_replace(text, '\s+', ' ', 'g')) AS clean_text
FROM documents
""")
def warc_ingest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl ingest chain end to end: each doc is wrapped into a
    byte-exact WARC response record (version line, WARC headers with
    Content-Length in bytes, HTTP envelope with its own Content-Length)
    built by pure column arithmetic, then the REAL parser
    (sources/warc.py:parse_warc_records) walks the bytes, peels the HTTP
    envelope, and the recovered HTML strips back to text. The oracle
    states every recovered field from the synthesis components — a parser
    off-by-one, header case bug, or envelope mix-up breaks the hash."""
    from etl_mark1_spark.sources.warc import parse_warc_records

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = F.concat(
        F.lit('<html><body><nav><a href="/">Home</a></nav><p>'),
        F.col("text"), F.lit("</p></body></html>"))
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
              "\r\nContent-Length: "),
        F.octet_length(body).cast("string"), F.lit("\r\n\r\n"), body)
    url = F.concat(F.lit("https://corpus.example/doc/"), did)
    date = F.concat(F.lit("2026-01-"),
                    F.lpad(((did % 28) + 1).cast("string"), 2, "0"),
                    F.lit("T12:00:00Z"))
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
        F.lit("\r\nWARC-Date: "), date,
        F.lit("\r\nContent-Type: application/http; msgtype=response"
              "\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"), http, F.lit("\r\n\r\n"))
    recs = parse_warc_records(
        d.select(rec.cast("binary").alias("content")))
    return recs.select(
        F.regexp_extract("url", r"doc/(\d+)$", 1).cast("bigint")
         .alias("doc_id"),
        "url", "warc_date", "http_status",
        strip_html_tags("text").alias("clean_text"))


@query("html_metadata_docs", """
SELECT doc_id,
       'Page ' || doc_id || ' & friends' AS page_title,
       CASE WHEN doc_id % 3 = 2 THEN NULL
            ELSE 'summary of page ' || doc_id END AS meta_description,
       CASE WHEN doc_id % 4 = 0
            THEN 'https://canon.example/p/' || doc_id
            ELSE NULL END AS canonical_url,
       CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'en' WHEN 1 THEN 'fr-ca' ELSE NULL
       END AS html_lang
FROM documents
""")
def html_metadata_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata sidecar extraction: titles carry an entity, the
    description meta alternates attribute order (name-first vs
    content-first), canonical links and lang attributes appear on
    planted subsets — absent pieces must surface as NULL, stated by the
    oracle from the synthesis branches."""
    from etl_mark1_spark.operators.html import extract_html_metadata

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    lang_attr = (F.when(did % 3 == 0, F.lit(' lang="en"'))
                  .when(did % 3 == 1, F.lit(" lang='FR-CA'"))
                  .otherwise(F.lit("")))
    desc = (F.when(did % 3 == 2, F.lit(""))
             .when(did % 2 == 0,
                   F.concat(F.lit('<meta name="description" content='
                                  '"summary of page '), did, F.lit('">')))
             .otherwise(
                 F.concat(F.lit('<meta content="summary of page '), did,
                          F.lit('" name=\'description\'>'))))
    canon = F.when(
        did % 4 == 0,
        F.concat(F.lit('<link rel="canonical" href='
                       '"https://canon.example/p/'), did, F.lit('">')),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html"), lang_attr, F.lit("><head><title>  Page "), did,
        F.lit(" &amp; friends </title>"), desc, canon,
        F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p></body></html>"))
    out = extract_html_metadata(d.withColumn("html", html))
    return out.select("doc_id", "page_title", "meta_description",
                      "canonical_url", "html_lang")
