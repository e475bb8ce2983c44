"""Property-based fuzz for the web-ingest surface: WARC record walker and
HTML block collector. Pure-Python properties (no Spark) — these are the
functions that face arbitrary crawl bytes in production."""

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_mark1_spark.operators.html import _extract_one
from etl_mark1_spark.sources.warc import make_warc, parse_warc

# bodies: arbitrary bytes INCLUDING record-separator lookalikes
_bodies = st.binary(min_size=0, max_size=300)
_urls = st.from_regex(r"https://[a-z]{1,8}\.example/[a-z0-9]{0,12}",
                      fullmatch=True)
_status = st.sampled_from([200, 301, 404, 500])


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.fixed_dictionaries(
        {"url": _urls, "body": _bodies, "status": _status}),
    min_size=0, max_size=6),
    st.booleans(), st.booleans())
def test_warc_roundtrip_arbitrary_bodies(pages, gz, info):
    """make_warc -> parse_warc is lossless for ANY body bytes (including
    embedded CRLFCRLF + 'WARC/1.0' lookalikes), any record count, both
    gzip layouts, with and without the warcinfo record."""
    data = make_warc(pages, gzip_per_record=gz, with_warcinfo=info)
    recs = list(parse_warc(data))
    responses = [r for r in recs if r["record_type"] == "response"]
    assert len(recs) == len(pages) + (1 if info else 0)
    for page, rec in zip(pages, responses):
        assert rec["url"] == page["url"]
        assert rec["http_status"] == page["status"]
        assert rec["body"] == page["body"]


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({"url": _urls, "body": _bodies}),
    min_size=1, max_size=3),
    st.integers(min_value=1, max_value=40))
def test_warc_truncation_always_loud(pages, cut):
    """Truncating a plain WARC stream anywhere inside the final record
    must raise, never silently drop or corrupt records."""
    data = make_warc(pages, with_warcinfo=False)
    cut = min(cut, len(data) - 1)
    try:
        recs = list(parse_warc(data[:-cut]))
    except ValueError:
        return  # loud — the contract
    # the only acceptable silent outcome: the cut removed ONLY trailing
    # separator bytes, leaving every record intact
    assert len(recs) == len(pages)
    assert all(r["body"] == p["body"] for r, p in zip(recs, pages))


@settings(max_examples=200, deadline=None)
@given(st.text(
    alphabet=st.sampled_from(list(
        "abc <>/=\"'&;!-ABCxyz0129\n\t.()pdivnavhrf")),
    min_size=0, max_size=400))
def test_html_collector_total_on_garbage(s):
    """The block collector never raises on arbitrary tag soup, and its
    output is always (str, int>=0, int>=kept)."""
    text, kept, total = _extract_one(s, 25, 0.4, "\n")
    assert isinstance(text, str)
    assert 0 <= kept <= total


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                                      exclude_characters="<>&"),
               min_size=30, max_size=200))
def test_html_single_paragraph_recovered(s):
    """A lone long paragraph of plain text always survives extraction
    with its words intact (whitespace-normalized)."""
    import re

    norm = re.sub(r"\s+", " ", s).strip()
    if len(norm) < 25:
        return
    text, kept, _ = _extract_one(f"<html><body><p>{s}</p></body></html>",
                                 25, 0.4, "\n")
    assert kept == 1 and text == norm
