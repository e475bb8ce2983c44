"""HTML extraction operators (operators/html.py): regex strip fast path,
link harvesting, and the block-classifier main-content extractor."""

import pytest
from pyspark.sql import functions as F

from etl_mark1_spark.operators.html import (
    _extract_one,
    extract_links,
    extract_main_content,
    strip_html_tags,
)

PAGE = """<html><head><title>Site title</title>
<style media="all">p { color: red; }</style>
<script type="text/javascript">if (1 < 2) { x = "</div>"; }</script>
</head><body>
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<header><h1>The Example Portal</h1></header>
<p class="lead">First real paragraph, comfortably long enough to keep.</p>
<!-- hidden <p>comment</p> -->
<p>Second &amp; final paragraph &lt;with entities&gt; &quot;quoted&#39;.</p>
<aside><a href='/buy'>Buy now</a> <a href='/deals'>cheap deals</a></aside>
<footer>contact us</footer>
</body></html>"""


def _strip(spark, s):
    return spark.range(1).select(
        strip_html_tags(F.lit(s)).alias("t")).first()["t"]


# -- strip_html_tags -----------------------------------------------------------

def test_strip_drops_script_style_comments_and_tags(spark):
    out = _strip(spark, PAGE)
    assert "color: red" not in out
    assert "1 < 2" not in out          # script body gone, incl. its quotes
    assert "hidden" not in out         # comments gone
    assert "<" not in out.replace("<with entities>", "")
    assert "First real paragraph, comfortably long enough to keep." in out
    # entities decoded exactly once
    assert 'Second & final paragraph <with entities> "quoted\'.' in out
    # boilerplate text SURVIVES the fast path (that's what main_content is for)
    assert "Home" in out and "contact us" in out


def test_strip_whitespace_collapse_and_trim(spark):
    assert _strip(spark, "  <p>a\n\n  b\tc</p> ") == "a b c"


def test_strip_no_double_entity_decode(spark):
    # "&amp;lt;" is the AUTHOR writing the literal text "&lt;"
    assert _strip(spark, "x &amp;lt; y") == "x &lt; y"


def test_strip_script_with_attributes_and_case(spark):
    s = '<SCRIPT defer src="x.js">alert(1)</ScRiPt>after'
    assert _strip(spark, s) == "after"


def test_strip_is_codegen_no_python(spark):
    df = spark.range(4).select(
        strip_html_tags(F.concat(F.lit("<p>"), F.col("id"), F.lit("</p>")))
        .alias("t"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# -- extract_links -------------------------------------------------------------

def test_extract_links_both_quote_styles_anchors_only(spark):
    df = spark.createDataFrame(
        [(1, '<a href="/a">x</a><link href="/style.css">'
             "<a class='b' href='/b'>y</a><area href='/map'>"),
         (2, "<p>no links</p>"),
         (3, None)],
        ["doc_id", "html"])
    rows = extract_links(df).collect()
    got = {(r.doc_id, r.pos, r.link) for r in rows}
    assert got == {(1, 0, "/a"), (1, 1, "/b")}


def test_extract_links_is_codegen_no_python(spark):
    df = spark.createDataFrame([(1, '<a href="/a">x</a>')],
                               ["doc_id", "html"])
    plan = extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# -- main-content block classifier (pure-Python core) --------------------------

def test_main_content_drops_boilerplate_keeps_article():
    text, kept, total = _extract_one(PAGE, 25, 0.4, "\n")
    assert text.splitlines() == [
        "First real paragraph, comfortably long enough to keep.",
        'Second & final paragraph <with entities> "quoted\'.',
    ]
    assert kept == 2
    # nav, header h1, aside, footer all flushed as blocks, all dropped
    assert total >= 6


def test_main_content_link_density_kills_link_farms():
    farm = ('<div><a href="/x">one link</a> <a href="/y">two link</a> '
            '<a href="/z">three link</a> and barely any prose</div>')
    text, kept, _ = _extract_one(farm, 25, 0.4, "\n")
    assert kept == 0 and text == ""


def test_main_content_smoothing_promotes_heading_between_paragraphs():
    html = ("<p>one good long paragraph here with enough characters</p>"
            "<h3>Head</h3>"
            "<p>another good long paragraph here with enough chars</p>")
    text, kept, total = _extract_one(html, 25, 0.4, "\n")
    assert kept == 3 and "Head" in text.splitlines()


def test_main_content_isolated_stub_dropped():
    assert _extract_one("<p>stub</p>", 25, 0.4, "\n") == ("", 0, 1)


def test_main_content_unclosed_and_misnested_tags_tolerated():
    html = ("<div><p>first long paragraph of an unclosed document body"
            "<p>second long paragraph also never closed, still extracted"
            "</b></div>")
    text, kept, _ = _extract_one(html, 25, 0.4, "\n")
    assert kept == 2
    assert text.splitlines()[0].startswith("first long paragraph")


def test_main_content_empty_and_none_inputs():
    assert _extract_one("", 25, 0.4, "\n") == ("", 0, 0)
    assert _extract_one(None, 25, 0.4, "\n") == ("", 0, 0)


def test_main_content_inline_whitespace_preserved():
    text, _, _ = _extract_one(
        "<p><b>foo</b> <i>bar baz qux quux corge grault</i></p>",
        25, 0.4, "\n")
    assert text == "foo bar baz qux quux corge grault"


# -- Spark plumbing ------------------------------------------------------------

def test_extract_main_content_dataframe(spark):
    df = spark.createDataFrame([(10, PAGE), (11, "<p>stub</p>"), (12, None)],
                               ["doc_id", "html"])
    out = extract_main_content(df).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [10, 11, 12]
    assert out[0].blocks_kept == 2
    assert out[0].main_text.startswith("First real paragraph")
    assert out[1].blocks_kept == 0 and out[1].main_text == ""
    assert out[2].blocks_total == 0
    assert dict(out[0].asDict()).keys() == {
        "doc_id", "main_text", "blocks_kept", "blocks_total"}


def test_html_steps_registered_in_cold_interpreter():
    """Importing steps.py ALONE must register the html operators — a DAG
    run in a fresh process otherwise silently passes the step through
    (P11 semantics), which is exactly how the bug would hide."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "from etl_mark1_spark.operators.steps import STEP_OPERATORS; "
         "assert 'html_strip' in STEP_OPERATORS; "
         "assert 'html_main_content' in STEP_OPERATORS; print('ok')"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.stdout.strip() == "ok", out.stderr


def test_html_step_operators_registered(spark):
    from etl_mark1_spark.operators.steps import apply_steps

    df = spark.createDataFrame(
        [(1, "<nav><a href='/'>Home</a></nav>"
             "<p>body paragraph long enough to pass the length gate</p>")],
        ["doc_id", "html"])
    stripped = apply_steps(df, [{"operator": "html_strip",
                                 "params": {"column": "html",
                                            "target_column": "text"}}])
    assert "Home" in stripped.first()["text"]
    main = apply_steps(df, [{"operator": "html_main_content",
                             "params": {"column": "html"}}])
    assert main.first()["main_text"] == (
        "body paragraph long enough to pass the length gate")


# -- differential: regex fast path vs real parser on tag-only documents --------

@pytest.mark.parametrize("html,expected", [
    ("<p>a</p><p>b</p>", "a b"),
    ("<ul><li>x</li><li>y</li></ul>", "x y"),
    ("<div>a<br>b</div>", "a b"),
    ('<td colspan="2">cell</td>', "cell"),
])
def test_strip_matches_parser_on_simple_structures(spark, html, expected):
    """On well-formed boilerplate-free HTML the fast path and a full parse
    agree (the fast path's contract: same text, no classification)."""
    assert _strip(spark, html) == expected


# -- metadata extraction --------------------------------------------------------

def test_extract_html_metadata(spark):
    from etl_mark1_spark.operators.html import extract_html_metadata

    pages = [
        (1, '<html lang="EN-us"><head><title> A &amp; B </title>'
            '<meta name="description" content="the summary">'
            '<link rel="canonical" href="https://c.example/1">'
            "</head><body>x</body></html>"),
        (2, "<html><head><meta content=\"flipped order\" "
            "name='description'></head><body>no title</body></html>"),
        (3, "<html><body>bare</body></html>"),
        (4, None),
    ]
    df = spark.createDataFrame(pages, "doc_id bigint, html string")
    out = {r.doc_id: r for r in extract_html_metadata(df).collect()}
    assert out[1].page_title == "A & B"
    assert out[1].meta_description == "the summary"
    assert out[1].canonical_url == "https://c.example/1"
    assert out[1].html_lang == "en-us"
    assert out[2].page_title is None
    assert out[2].meta_description == "flipped order"
    assert out[3].page_title is None and out[3].canonical_url is None
    assert out[4].page_title is None

    plan = extract_html_metadata(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
