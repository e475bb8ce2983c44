"""WARC source (sources/warc.py): fixture generator round-trips through
the strict record walker, per-record gzip members, the distributed
binaryFile reader, and format autodetect."""

import gzip

import pytest

from etl_mark1_spark.sources.warc import (
    make_warc,
    parse_warc,
    parse_warc_records,
    read_warc,
)

PAGES = [
    {"url": "https://a.example/1", "body": "<p>first page body</p>",
     "date": "2026-02-03T04:05:06Z"},
    {"url": "https://b.example/2", "body": "second — with utf-8 é",
     "status": 404, "content_type": "text/plain"},
]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        recs = list(parse_warc(make_warc(PAGES, gzip_per_record=gz)))
        assert [r["record_type"] for r in recs] == [
            "warcinfo", "response", "response"]
        r1, r2 = recs[1], recs[2]
        assert r1["url"] == "https://a.example/1"
        assert r1["warc_date"] == "2026-02-03T04:05:06Z"
        assert r1["http_status"] == 200
        assert r1["http_content_type"] == "text/html; charset=utf-8"
        assert r1["body"] == b"<p>first page body</p>"
        assert r2["http_status"] == 404
        # Content-Length counted BYTES, not chars (the é is 2 bytes)
        assert r2["body"].decode("utf-8") == "second — with utf-8 é"


def test_body_containing_separator_bytes_survives():
    # length-based slicing: a body embedding \r\n\r\nWARC/1.0 must not
    # split the record
    evil = "x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\ny"
    recs = list(parse_warc(make_warc(
        [{"url": "https://e.example", "body": evil}], with_warcinfo=False)))
    assert len(recs) == 1
    assert recs[0]["body"].decode() == evil


def test_truncated_record_raises_loudly():
    data = make_warc(PAGES, with_warcinfo=False)
    with pytest.raises(ValueError, match="truncated record"):
        list(parse_warc(data[:-30]))


def test_garbage_raises_with_offset():
    with pytest.raises(ValueError, match="no version line"):
        list(parse_warc(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_non_http_payload_passes_through():
    recs = list(parse_warc(make_warc([], with_warcinfo=True)))
    assert recs[0]["record_type"] == "warcinfo"
    assert recs[0]["http_status"] is None
    assert b"fixture generator" in recs[0]["body"]


def test_read_warc_distributed(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(make_warc(PAGES))
    (tmp_path / "b.warc.gz").write_bytes(
        make_warc([{"url": "https://c.example/3", "body": "third"}],
                  gzip_per_record=True))
    out = read_warc(spark, str(tmp_path)).orderBy("url").collect()
    assert [r.url for r in out] == [
        "https://a.example/1", "https://b.example/2", "https://c.example/3"]
    assert out[0].text == "<p>first page body</p>"
    assert out[1].http_status == 404
    assert out[2].path.endswith("b.warc.gz")
    # warcinfo records filtered by default
    assert all(r.record_type == "response" for r in out)


def test_read_warc_keeps_requested_types(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(make_warc(PAGES))
    out = read_warc(spark, str(tmp_path),
                    record_types=("warcinfo", "response"))
    assert out.count() == 3


def test_parse_warc_records_carries_columns(spark):
    df = spark.createDataFrame(
        [(7, make_warc([{"url": "https://x.example", "body": "b"}],
                       with_warcinfo=False))],
        "k int, content binary")
    row = parse_warc_records(df, carry_cols=("k",)).first()
    assert row.k == 7 and row.url == "https://x.example"


def test_format_autodetect_and_read_file(spark, tmp_path):
    from etl_mark1_spark.sources.readers import detect_format, read_file

    assert detect_format("seg-00001.warc") == "warc"
    assert detect_format("seg-00001.WARC.GZ") == "warc"
    assert detect_format("data.csv") == "csv"
    p = tmp_path / "seg.warc"
    p.write_bytes(make_warc(PAGES))
    assert read_file(spark, str(p)).count() == 2


def test_warc_to_html_pipeline(spark, tmp_path):
    """The intended composition: WARC ingest -> main-content extraction."""
    from etl_mark1_spark.operators.html import extract_main_content

    html = ("<html><body><nav><a href='/'>Home</a> <a href='/a'>A</a></nav>"
            "<p>the one real paragraph, long enough to pass the gate</p>"
            "<footer>terms</footer></body></html>")
    (tmp_path / "s.warc.gz").write_bytes(make_warc(
        [{"url": "https://p.example", "body": html}], gzip_per_record=True))
    docs = read_warc(spark, str(tmp_path)).select("url", "text")
    main = extract_main_content(docs, html_col="text", id_col="url").first()
    assert main.main_text == (
        "the one real paragraph, long enough to pass the gate")


# -- streaming ingest ----------------------------------------------------------

def test_stream_warc_picks_up_only_new_segments(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_mark1_spark.sources.warc import stream_warc

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (crawl / "seg1.warc.gz").write_bytes(make_warc(
        [{"url": "https://a.example/1", "body": "one"},
         {"url": "https://a.example/2", "body": "two"}],
        gzip_per_record=True))

    seen = []

    def grab(batch, _epoch):
        seen.extend((r.url, r.text) for r in batch.collect())

    def drain():
        q = (stream_warc(spark, str(crawl))
             .writeStream.foreachBatch(grab)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    assert sorted(seen) == [("https://a.example/1", "one"),
                            ("https://a.example/2", "two")]

    (crawl / "seg2.warc").write_bytes(make_warc(
        [{"url": "https://b.example/3", "body": "three"}]))
    seen.clear()
    drain()  # same checkpoint: only the NEW segment flows
    assert seen == [("https://b.example/3", "three")]


def test_stream_warc_to_dedup_ingest_sink(spark, tmp_path):
    """The crawl-to-corpus showpiece: stream WARC segments into the
    versioned dedup-on-ingest sink — a page re-crawled verbatim in a
    later segment must be rejected by the persisted index."""
    from pyspark.sql import functions as F

    from etl_mark1_spark.sources.versioned import read_table
    from etl_mark1_spark.sources.warc import stream_warc
    from etl_mark1_spark.streaming.events import dedup_ingest_sink

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    body = ("a genuinely long page body that the shingler can grip: "
            "spark streams warc segments into a versioned deduplicated "
            "corpus table with exactly once appends")
    (crawl / "seg1.warc").write_bytes(make_warc(
        [{"url": "https://site.example/page/1", "body": body},
         {"url": "https://site.example/page/2",
          "body": "a completely different second page about nothing "
                  "in particular, also long enough to shingle"}]))

    def drain():
        docs = stream_warc(spark, str(crawl)).select(
            F.regexp_extract("url", r"page/(\d+)$", 1).cast("bigint")
             .alias("doc_id"),
            "text")
        dedup_ingest_sink(docs, corpus, index, checkpoint=ckpt)

    drain()
    assert {r.doc_id for r in read_table(spark, corpus).collect()} == {1, 2}

    # re-crawl: page 1 verbatim under a NEW url/id + one genuinely new page
    (crawl / "seg2.warc").write_bytes(make_warc(
        [{"url": "https://site.example/page/7", "body": body},
         {"url": "https://site.example/page/8",
          "body": "and a third page, new content never seen before, "
                  "long enough to clear the shingle window"}]))
    drain()
    kept = {r.doc_id for r in read_table(spark, corpus).collect()}
    assert kept == {1, 2, 8}  # 7 rejected as a near-dup of 1
