"""Web-curation operators: URL normalization, registered domains, domain
caps, blocklists (operators/web.py + catalog/web_curation.py)."""

import pytest
from pyspark.sql import functions as F

from etl_mark1_spark.operators.web import (domain_cap, filter_blocklist,
                                           normalize_url, registered_domain,
                                           url_host, with_normalized_urls)


def _norm_one(spark, url: str):
    row = (spark.range(1)
           .select(normalize_url(F.lit(url)).alias("u")).collect()[0])
    return row.u


@pytest.mark.parametrize("raw,expected", [
    # case folding: scheme and host lower, path case preserved
    ("HTTPS://WWW.Example.COM/Path/To/X", "https://example.com/Path/To/X"),
    # default ports dropped, non-default kept
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),
    # userinfo stripped by host extraction, fragment dropped
    ("https://example.com/a#frag", "https://example.com/a"),
    # empty path -> "/", trailing slash trimmed on non-root
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com/a/b/", "https://example.com/a/b"),
    # utm params dropped wherever they sit; others keep their order
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?b=2&utm_medium=m&a=1",
     "https://example.com/a?b=2&a=1"),
    ("https://example.com/a?utm_campaign=c&q=1#f",
     "https://example.com/a?q=1"),
])
def test_normalize_url_cases(spark, raw, expected):
    assert _norm_one(spark, raw) == expected


def test_normalize_url_no_scheme_is_null(spark):
    assert _norm_one(spark, "example.com/a") is None
    assert _norm_one(spark, "not a url") is None


def test_url_host_strips_userinfo_and_port(spark):
    row = (spark.range(1).select(
        url_host(F.lit("https://User:Pw@Sub.Example.COM:8443/x")).alias("h"))
        .collect()[0])
    assert row.h == "sub.example.com"


@pytest.mark.parametrize("host,domain", [
    ("a.b.blog.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("co.uk", "co.uk"),                      # bare suffix passes through
    ("deep.sub.news.portal.org", "portal.org"),
    ("portal.org", "portal.org"),
    ("localhost", "localhost"),              # single label unchanged
    ("shop.example.com.au", "example.com.au"),
])
def test_registered_domain(spark, host, domain):
    row = (spark.range(1)
           .select(registered_domain(F.lit(host)).alias("d")).collect()[0])
    assert row.d == domain


def test_domain_from_raw_host_degenerate_www(spark):
    """Pin the INTENDED output for degenerate hosts where 'www' is itself
    a registrable label (round-8 ADVICE): deriving domain from the RAW
    host (the round-8 codegen fix) yields 'www.com' / 'www.co.uk' — the
    correct registrable domains — where the old normalized-host path
    stripped the www and yielded 'com' / 'co.uk'. The equivalence claim
    in with_normalized_urls is deliberately NOT strict here."""
    df = with_normalized_urls(spark.createDataFrame(
        [("https://www.com/x",), ("https://www.co.uk/y",),
         ("https://www.example.com/z",)], ["url"]))
    got = {r.url: r.domain for r in df.collect()}
    assert got == {"https://www.com/x": "www.com",
                   "https://www.co.uk/y": "www.co.uk",
                   "https://www.example.com/z": "example.com"}


def test_with_normalized_urls_is_shuffle_free(spark):
    df = with_normalized_urls(
        spark.range(10).select(
            F.concat(F.lit("https://www.Example.com/a/"),
                     F.col("id").cast("string")).alias("url")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_cap_keeps_smallest_ids_both_branches(spark):
    # big: 10 rows (over cap 3) -> keeps ids 0,1,2; small: 2 rows (under)
    rows = [("big.com", i) for i in range(10)] + \
           [("small.net", 100), ("small.net", 101)]
    df = spark.createDataFrame(rows, ["domain", "doc_id"])
    got = {(r.domain, r.doc_id)
           for r in domain_cap(df, cap=3).collect()}
    assert got == {("big.com", 0), ("big.com", 1), ("big.com", 2),
                   ("small.net", 100), ("small.net", 101)}


def test_domain_cap_is_deterministic_under_repartition(spark):
    rows = [("d%d.com" % (i % 5), i) for i in range(50)]
    df = spark.createDataFrame(rows, ["domain", "doc_id"])
    a = sorted(map(tuple, domain_cap(df, cap=4).collect()))
    b = sorted(map(tuple, domain_cap(df.repartition(7), cap=4).collect()))
    assert a == b and len(a) == 20


def test_filter_blocklist_broadcasts_anti_join(spark):
    df = spark.createDataFrame(
        [("spam.biz", 1), ("ok.org", 2), ("ok.org", 3)],
        ["domain", "doc_id"])
    blocked = spark.createDataFrame([("spam.biz",), ("spam.biz",)],
                                    ["domain"])
    kept = filter_blocklist(df, blocked)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_url_catalog_entries_run_and_agree_on_shape(spark):
    from etl_mark1_spark.catalog import QUERIES

    stats = QUERIES["domain_stats_docs"](spark, "/root/testdata/sf0.001")
    got = {r.domain: r.n_docs for r in stats.collect()}
    assert set(got) == {"example.com", "example.co.uk", "portal.org",
                        "knowledge.net", "spamcdn.biz"}
    assert sum(got.values()) == 500
    blocked = QUERIES["blocklist_filtered_docs"](
        spark, "/root/testdata/sf0.001")
    left = {r.domain for r in blocked.collect()}
    assert left == {"example.com", "example.co.uk", "portal.org"}


def test_domain_cap_salted_topk_matches_naive_window(spark):
    """The salted two-phase top-k must equal the single-window answer on
    a skewed corpus (one giant domain, several small), across salt
    counts — including salt_partitions > cap and = 1."""
    from pyspark.sql import Window

    rows = [("giant.com", i * 7 % 997) for i in range(900)] + \
           [("mid.org", 1000 + i) for i in range(40)] + \
           [("tiny.net", 2000)]
    df = spark.createDataFrame(rows, ["domain", "doc_id"]).repartition(8)
    w = Window.partitionBy("domain").orderBy(F.col("doc_id").asc())
    naive = sorted(map(tuple, df.withColumn("_rn", F.row_number().over(w))
                       .filter(F.col("_rn") <= 25).drop("_rn").collect()))
    for s in (1, 4, 64):
        got = sorted(map(tuple,
                         domain_cap(df, cap=25, salt_partitions=s).collect()))
        assert got == naive, f"salt_partitions={s}"


def test_web_steps_run_in_a_dag_pipeline(spark, tmp_path):
    """The web ops are registered step operators: a file_input ->
    normalize_urls -> domain_blocklist -> domain_cap -> file_output
    pipeline runs end-to-end through the DAG executor."""
    from etl_mark1_spark.plans.dag import PipelineExecutor

    src = str(tmp_path / "crawl.parquet")
    rows = [(i, f"https://WWW.Big.COM/p/{i}?utm_source=x") for i in range(9)]
    rows += [(100, "https://spam.biz/x"), (101, "http://Tiny.ORG:80/y/")]
    spark.createDataFrame(rows, ["doc_id", "url"]).write.parquet(src)
    out = str(tmp_path / "out.parquet")
    definition = {
        "nodes": [
            {"id": "in", "type": "file_input",
             "config": {"path": src, "format": "parquet"}},
            {"id": "tf", "type": "transform", "config": {"steps": [
                {"operator": "normalize_urls", "params": {}},
                {"operator": "domain_blocklist",
                 "params": {"domains": ["spam.biz"]}},
                {"operator": "domain_cap", "params": {"cap": 5}},
            ]}},
            {"id": "out", "type": "file_output",
             "config": {"path": out, "format": "parquet"}},
        ],
        "edges": [{"source": "in", "target": "tf"},
                  {"source": "tf", "target": "out"}],
    }
    report = PipelineExecutor(spark).execute(definition)
    assert report.status == "succeeded"
    got = spark.read.parquet(out)
    by_domain = {r.domain: r.n for r in
                 got.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    assert by_domain == {"big.com": 5, "tiny.org": 1}   # spam.biz dropped
    assert {r.url_norm for r in got.filter("domain = 'tiny.org'")
            .collect()} == {"http://tiny.org/y"}


def test_normalize_url_differential_grid(spark):
    """Differential test against an independent pure-Python reference
    normalizer over the full cross product of URL components (7680
    combos: schemes x userinfo x hosts x ports x paths x queries x
    fragments) — one Spark job, row-for-row equality."""
    import itertools

    def ref(scheme, user, host, port, path, query, frag):
        s = scheme.lower()
        h = host.lower()
        if h.startswith("www."):
            h = h[4:]
        pp = port
        if (s == "https" and port == ":443") or (s == "http"
                                                 and port == ":80"):
            pp = ""
        p = path or "/"
        if p.endswith("/"):
            p = p[:-1]
        if p == "":
            p = "/"
        params = [x for x in (query[1:].split("&") if query else [])
                  if x and not x.startswith("utm_")]
        q = "?" + "&".join(params) if params else ""
        return f"{s}://{h}{pp}{p}{q}"

    grid = list(itertools.product(
        ["http", "https", "ftp", "HTTPS"],
        ["", "user@", "a:b@"],
        ["example.com", "WWW.Example.COM", "sub.blog.example.co.uk",
         "localhost"],
        ["", ":80", ":443", ":8080"],
        ["", "/", "/a/b", "/a/b/", "/Path%20X"],
        ["", "?utm_source=x", "?a=1&utm_b=2&c=3", "?a=1&b=2"],
        ["", "#f"],
    ))
    rows = [(i, f"{s}://{u}{h}{pt}{p}{q}{fr}",
             ref(s, u, h, pt, p, q, fr))
            for i, (s, u, h, pt, p, q, fr) in enumerate(grid)]
    df = spark.createDataFrame(rows, ["i", "url", "expected"])
    bad = (df.withColumn("got", normalize_url(F.col("url")))
           .filter("got IS DISTINCT FROM expected")
           .select("url", "expected", "got").limit(5).collect())
    assert not bad, bad


# -- robots.txt (RFC 9309) -----------------------------------------------------

def test_robots_match_differential_grid(spark):
    """Differential test of the column-side RFC 9309 decision against an
    independent pure-Python reference matcher: seeded random rule sets
    (prefixes, '*' runs, trailing-'$' anchors, literal metacharacters
    INCLUDING '?', multi-byte UTF-8, allow/disallow mixes, octet-length
    ties) x generated URLs with and without query strings, one Spark
    job, row-for-row equality on the allow verdict. The reference
    matches against path+query and ranks by OCTET length (round-9
    ADVICE: feeding it the query-stripped path hid the '?'-rule and
    '$'-vs-query bugs)."""
    import random
    import re as _re

    from etl_mark1_spark.operators.web import filter_robots_allowed

    def ref_allowed(rules, target):
        best = None  # (octet length incl wildcards, is_allow)
        for rule, rpath in rules:
            has_end = rpath.endswith("$")
            body = rpath[:-1] if has_end else rpath
            pat = "^" + ".*".join(_re.escape(s) for s in body.split("*"))
            if has_end:
                pat += "$"
            if ("*" in rpath) or has_end:
                hit = _re.search(pat, target) is not None
            else:
                hit = target.startswith(rpath)
            if hit:
                key = (len(rpath.encode()), rule == "allow")
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]

    rng = random.Random(20260815)
    atoms = ["/a", "/b", "/cd", "x", "y", ".php", "*", "+", ".", "?q=",
             "é"]
    def rand_path_rule():
        body = "/" + "".join(rng.choice(atoms) for _ in range(rng.randint(1, 4))).lstrip("/")
        return body + ("$" if rng.random() < 0.3 else "")
    domains = [f"d{i}.example" for i in range(4)]
    rule_rows = [(dom, rng.choice(["allow", "disallow"]), rand_path_rule())
                 for dom in domains[:3]  # d3.example: no rules -> allowed
                 for _ in range(rng.randint(3, 8))]
    by_dom = {}
    for dom, rule, p in rule_rows:
        by_dom.setdefault(dom, []).append((rule, p))

    url_atoms = ["/a", "/b", "/cd", "x", "y", ".php", "+", ".", "z", "é"]
    q_atoms = ["q=1", "x=y", "utm=z", "q=", ""]
    urls = []
    for i in range(400):
        dom = rng.choice(domains)
        path = "/" + "".join(rng.choice(url_atoms)
                             for _ in range(rng.randint(0, 5))).lstrip("/")
        query = ("?" + rng.choice(q_atoms)) if rng.random() < 0.5 else ""
        target = path + query
        urls.append((i, f"https://{dom}{target}",
                     ref_allowed(by_dom.get(dom, []), target)))

    rules_df = spark.createDataFrame(rule_rows,
                                     ["domain", "rule", "path"])
    urls_df = spark.createDataFrame(urls, ["i", "url", "expected"])
    got = filter_robots_allowed(urls_df, rules_df, keep_denied=True)
    bad = (got.filter("robots_allowed IS DISTINCT FROM expected")
           .select("url", "expected", "robots_allowed").limit(5).collect())
    assert not bad, bad


def test_parse_robots_group_selection_and_syntax():
    from etl_mark1_spark.operators.web import parse_robots_text

    body = ("# comment\r\n"
            "User-agent: TrainingBot\r\n"
            "Disallow: /private/   # trailing comment\r\n"
            "Allow: /private/pub/\r\n"
            "\r\n"
            "User-agent: a\r\n"
            "User-agent: b\r\n"
            "Disallow: /shared/\r\n"
            "\r\n"
            "User-agent: *\r\n"
            "Disallow: /\r\n")
    # specific group wins; case-insensitive agent match
    assert parse_robots_text(body, "trainingbot") == [
        ("disallow", "/private/"), ("allow", "/private/pub/")]
    # consecutive User-agent lines share one group
    assert parse_robots_text(body, "B") == [("disallow", "/shared/")]
    # unknown agent falls back to *
    assert parse_robots_text(body, "nobody") == [("disallow", "/")]
    # empty Disallow allows everything; other fields end the header
    assert parse_robots_text("User-agent: *\nDisallow:\n", "x") == []
    assert parse_robots_text(None, "x") == []
    assert parse_robots_text("garbage no colons", "x") == []


def test_robots_filter_longest_match_allow_wins_tie(spark):
    from etl_mark1_spark.operators.web import (filter_robots_allowed,
                                               robots_rules)

    robots = spark.createDataFrame(
        [("s.example",
          "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n"
          "Disallow: /same/\nAllow: /same/\n")],
        "domain string, robots_txt string")
    rules = robots_rules(robots, "anybot")
    urls = spark.createDataFrame(
        [(1, "https://s.example/a/x"),       # denied
         (2, "https://s.example/a/b/x"),     # longer allow wins
         (3, "https://s.example/same/x"),    # equal length: allow wins
         (4, "https://s.example/other"),     # no match -> allowed
         (5, "https://s.example"),           # bare host -> '/' -> allowed
         (6, "https://unknown.example/a/x")],  # no rules -> allowed
        "doc_id bigint, url string")
    flagged = {r.doc_id: r.robots_allowed
               for r in filter_robots_allowed(urls, rules,
                                              keep_denied=True).collect()}
    assert flagged == {1: False, 2: True, 3: True, 4: True, 5: True,
                       6: True}
    # default mode drops denied rows
    kept = {r.doc_id
            for r in filter_robots_allowed(urls, rules).collect()}
    assert kept == {2, 3, 4, 5, 6}


def test_domain_expression_tree_stays_bounded(spark, sf_dir):
    """Codegen-size pin (round 8): deriving `domain` from the NORMALIZED
    url expression re-inlined the whole normalize tree into every host
    reference inside registered_domain — ~1,200 regexp nodes in the
    optimized plan, fused stages past the JIT method-size limit, 5x
    slowdown on domain_capped_docs. Keep the total regexp node count in
    the full capped plan bounded so a refactor can't reintroduce it."""
    from etl_mark1_spark.catalog import QUERIES

    df = QUERIES["domain_capped_docs"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    n_regexp = opt.count("regexp_")
    assert n_regexp < 200, f"domain plan regexp blowup: {n_regexp} nodes"


def test_robots_filter_wildcard_and_end_anchor(spark):
    """RFC 9309 special characters (round-8 ADVICE): '*' matches any run,
    a trailing '$' anchors to the URL end, other metacharacters are
    literal; wildcard octets count toward longest-match precedence. The
    match target is path+query (round-9 ADVICE): '/*.php$' must NOT deny
    '/x.php?p=1', and rules containing '?' must be able to match."""
    from etl_mark1_spark.operators.web import (filter_robots_allowed,
                                               robots_rules)

    robots = spark.createDataFrame(
        [("s.example",
          "User-agent: *\n"
          "Disallow: /*.php$\n"        # any target ending .php
          "Disallow: /tmp*/\n"         # wildcard mid-rule
          "Allow: /tmpfiles/ok/\n"     # longer than /tmp*/ -> wins
          "Disallow: /a$b/\n"          # '$' mid-rule is literal
          "Disallow: /search?q=\n")],  # '?' rules match path+query
        "domain string, robots_txt string")
    rules = robots_rules(robots, "anybot")
    urls = spark.createDataFrame(
        [(1, "https://s.example/index.php"),        # denied by /*.php$
         (2, "https://s.example/index.php?x=1"),    # target ends '?x=1',
                                                    # NOT '.php' -> allowed
         (3, "https://s.example/index.phpx"),       # NOT anchored match
         (4, "https://s.example/tmpfiles/secret"),  # denied by /tmp*/
         (5, "https://s.example/tmpfiles/ok/f"),    # longer allow wins
         (6, "https://s.example/a$b/x"),            # literal '$' rule
         (7, "https://s.example/aXb/x"),            # not the literal rule
         (8, "https://s.example/search?q=spam"),    # denied by the '?' rule
         (9, "https://s.example/search")]           # no query -> no match
        , "doc_id bigint, url string")
    flagged = {r.doc_id: r.robots_allowed
               for r in filter_robots_allowed(urls, rules,
                                              keep_denied=True).collect()}
    assert flagged == {1: False, 2: True, 3: True, 4: False, 5: True,
                       6: False, 7: True, 8: False, 9: True}


def test_robots_filter_octet_length_precedence(spark):
    """Rule precedence is OCTET length (RFC 9309), not character count: a
    rule path with multi-byte UTF-8 outranks an ASCII rule of equal
    character length. '/café' (5 chars, 6 octets) vs '/cafe7' (6 chars,
    6 octets) tie on octets -> Allow wins; vs '/caf' prefix (4 octets)
    the multi-byte rule is strictly longer."""
    from etl_mark1_spark.operators.web import (filter_robots_allowed,
                                               robots_rules)

    robots = spark.createDataFrame(
        [("s.example",
          "User-agent: *\n"
          "Disallow: /caf\n"           # 4 octets
          "Allow: /café\n"),      # 6 octets -> wins on /café…
         ("t.example",
          "User-agent: *\n"
          "Disallow: /xé\n"       # 4 octets
          "Allow: /xab\n")],           # 4 octets: tie -> Allow wins
        "domain string, robots_txt string")
    rules = robots_rules(robots, "anybot")
    urls = spark.createDataFrame(
        [(1, "https://s.example/café/menu"),   # allow (6) > deny (4)
         (2, "https://s.example/cafX/menu"),        # only deny matches
         (3, "https://t.example/xéq")],        # deny 4 octets, no tie
        "doc_id bigint, url string")
    flagged = {r.doc_id: r.robots_allowed
               for r in filter_robots_allowed(urls, rules,
                                              keep_denied=True).collect()}
    assert flagged == {1: True, 2: False, 3: False}


def test_robots_filter_broadcasts_and_stays_codegen(spark):
    from etl_mark1_spark.operators.web import (filter_robots_allowed,
                                               robots_rules)

    robots = spark.createDataFrame(
        [("s.example", "User-agent: *\nDisallow: /x/")],
        "domain string, robots_txt string")
    urls = spark.createDataFrame([(1, "https://s.example/x/1")],
                                 "doc_id bigint, url string")
    out = filter_robots_allowed(urls, robots_rules(robots, "b"),
                                keep_denied=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus side carries no Python (the parser ran on the tiny side)
    assert plan.count("ArrowEvalPython") <= 1


def test_robots_filter_step_operator(spark):
    from etl_mark1_spark.operators.steps import apply_steps

    df = spark.createDataFrame(
        [(1, "https://s.example/keep"), (2, "https://s.example/no/x")],
        "doc_id bigint, url string")
    out = apply_steps(df, [{
        "operator": "robots_filter",
        "params": {"robots": {"s.example": "User-agent: *\nDisallow: /no/"},
                   "user_agent": "trainingbot"}}])
    assert [r.doc_id for r in out.collect()] == [1]


def test_surt_key_canonicalizes_variants(spark):
    """Every crawl-variant axis collapses: scheme, case, www, default
    port, utm params, fragment, trailing slash, query-param ORDER."""
    from etl_mark1_spark.operators.web import surt_key

    urls = [
        "https://www.Example.co.uk/a/b?x=1&b=2",
        "http://example.co.uk:80/a/b/?b=2&x=1#frag",
        "HTTPS://EXAMPLE.CO.UK:443/a/b?utm_source=s&b=2&x=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r[0] for r in df.select(surt_key(F.col("url"))).collect()}
    assert got == {"uk,co,example)/a/b?b=2&x=1"}


def test_surt_key_root_path_and_non_url(spark):
    from etl_mark1_spark.operators.web import surt_key

    df = spark.createDataFrame(
        [("https://news.portal.org",), ("not a url",), (None,)], ["url"])
    got = [r[0] for r in df.select(surt_key(F.col("url"))).collect()]
    assert got == ["org,portal,news)/", None, None]


def test_url_frontier_dedup_keeps_min_id_per_key(spark):
    from etl_mark1_spark.operators.web import url_frontier_dedup

    rows = [
        (7, "https://www.site.com/p?id=1&utm_x=t"),
        (3, "http://site.com/p/?id=1"),        # same frontier key
        (5, "https://site.com/p?id=2"),        # different query value
        (9, "garbage"),                        # dropped, not mega-key'd
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    got = {r["surt"]: (r["canonical_id"], r["n_variants"])
           for r in url_frontier_dedup(df).collect()}
    assert got == {"com,site)/p?id=1": (3, 2),
                   "com,site)/p?id=2": (5, 1)}


def test_registered_domain_caller_suffix_table(spark):
    """Multi-label TLDs OUTSIDE the built-in fixture subset resolve
    correctly when the caller supplies its own PSL-derived table,
    including three-label suffixes (k12.va.us, pref.aichi.jp)."""
    from etl_mark1_spark.operators.web import registered_domain

    table = ("co.uk", "k12.va.us", "pref.aichi.jp")
    hosts = [
        ("www.school.k12.va.us", "school.k12.va.us"),
        ("a.b.school.k12.va.us", "school.k12.va.us"),
        ("k12.va.us", "k12.va.us"),            # bare suffix: pass-through
        ("www.pref.aichi.jp", "www.pref.aichi.jp"),  # www is registrable
        ("deep.blog.example.co.uk", "example.co.uk"),
        ("plain.example.net", "example.net"),
        ("localhost", "localhost"),
    ]
    df = spark.createDataFrame(hosts, ["host", "want"])
    got = df.select("host", "want",
                    registered_domain(F.col("host"), table).alias("got")) \
        .collect()
    for r in got:
        assert r["got"] == r["want"], (r["host"], r["got"], r["want"])


def test_registered_domain_rejects_malformed_suffix_table(spark):
    from etl_mark1_spark.operators.web import registered_domain

    with pytest.raises(ValueError, match="2 or 3 labels"):
        registered_domain(F.col("host"), ("uk",))


def test_registered_domain_default_table_unchanged(spark):
    """The default table must keep the round-8 pinned behavior bit-for-
    bit (green driver entries depend on it)."""
    from etl_mark1_spark.operators.web import registered_domain

    hosts = [
        ("blog.example.co.uk", "example.co.uk"),
        ("www.com", "www.com"),
        ("www.co.uk", "www.co.uk"),
        ("cdn.portal.org", "portal.org"),
        ("single", "single"),
    ]
    df = spark.createDataFrame(hosts, ["host", "want"])
    for r in df.select("want", registered_domain(F.col("host"))
                       .alias("got")).collect():
        assert r["got"] == r["want"]


def test_parse_robots_crawl_delay_group_selection():
    from etl_mark1_spark.operators.web import parse_robots_crawl_delay

    txt = """
User-agent: *
Disallow: /tmp/
Crawl-delay: 10

User-agent: trainingbot
Allow: /
Crawl-delay: 2.5
Crawl-delay: 1.5
"""
    # specific group wins; min of its several delays
    assert parse_robots_crawl_delay(txt, "trainingbot") == 1.5
    assert parse_robots_crawl_delay(txt, "otherbot") == 10.0


def test_parse_robots_crawl_delay_edge_cases():
    from etl_mark1_spark.operators.web import parse_robots_crawl_delay

    # a SELECTED specific group without a delay does not inherit *'s
    txt = "User-agent: *\nCrawl-delay: 9\n\nUser-agent: tb\nAllow: /\n"
    assert parse_robots_crawl_delay(txt, "tb") is None
    # non-numeric and negative values are ignored
    txt2 = "User-agent: *\nCrawl-delay: fast\nCrawl-delay: -3\n"
    assert parse_robots_crawl_delay(txt2, "tb") is None
    assert parse_robots_crawl_delay(None, "tb") is None
    assert parse_robots_crawl_delay("", "tb") is None
    # shared-header groups: both agents get the group's delay
    txt3 = "User-agent: a\nUser-agent: b\nCrawl-delay: 4\n"
    assert parse_robots_crawl_delay(txt3, "B") == 4.0


def test_robots_crawl_delays_frame(spark):
    from etl_mark1_spark.operators.web import robots_crawl_delays

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nCrawl-delay: 3\n"),
         ("b.example", "User-agent: *\nDisallow: /x\n"),
         ("c.example", None)],
        "domain string, robots_txt string")
    got = {r["domain"]: r["crawl_delay"]
           for r in robots_crawl_delays(robots, "tb").collect()}
    assert got == {"a.example": 3.0, "b.example": None, "c.example": None}


def test_sitemap_urls_optional_fields_stay_aligned(spark):
    """The misalignment trap: entry 1 has all fields, entry 2 omits
    lastmod, entry 3 omits priority — each row must keep ITS OWN
    values (parallel-xpath arrays would shift them)."""
    from etl_mark1_spark.operators.web import sitemap_urls

    xml = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/1</loc>
       <lastmod>2026-01-01</lastmod><priority>0.9</priority></url>
  <url><loc>https://a.example/2</loc><priority>0.3</priority></url>
  <url><loc>https://a.example/3</loc><lastmod>2026-03-03</lastmod></url>
  <url><lastmod>2026-04-04</lastmod></url>
</urlset>"""
    df = spark.createDataFrame([("a.example", xml)],
                               ["domain", "sitemap_xml"])
    got = sorted((r["loc"], r["lastmod"], r["priority"])
                 for r in sitemap_urls(df).collect())
    assert got == [
        ("https://a.example/1", "2026-01-01", 0.9),
        ("https://a.example/2", None, 0.3),
        ("https://a.example/3", "2026-03-03", None),
    ]  # the loc-less entry is dropped


def test_sitemap_index_locs(spark):
    from etl_mark1_spark.operators.web import sitemap_index_locs

    xml = """<sitemapindex>
  <sitemap><loc>https://a.example/s1.xml</loc>
           <lastmod>2026-01-01</lastmod></sitemap>
  <sitemap><loc>https://a.example/s2.xml</loc></sitemap>
</sitemapindex>"""
    df = spark.createDataFrame([("a.example", xml)],
                               ["domain", "sitemap_xml"])
    got = {r["sitemap_loc"] for r in sitemap_index_locs(df).collect()}
    assert got == {"https://a.example/s1.xml", "https://a.example/s2.xml"}


def test_sitemap_urls_bad_priority_and_empty(spark):
    from etl_mark1_spark.operators.web import sitemap_urls

    xml = ("<urlset><url><loc>https://x/1</loc>"
           "<priority>high</priority></url></urlset>")
    df = spark.createDataFrame([("x", xml), ("y", "not xml"), ("z", None)],
                               ["domain", "sitemap_xml"])
    got = sitemap_urls(df).collect()
    assert len(got) == 1
    assert got[0]["loc"] == "https://x/1" and got[0]["priority"] is None


def test_parse_robots_sitemaps_not_group_scoped():
    from etl_mark1_spark.operators.web import parse_robots_sitemaps

    txt = """User-agent: a
Sitemap: https://x/s1.xml
Disallow: /p

User-agent: *
Sitemap: https://x/s2.xml  # trailing comment
Sitemap: https://x/s1.xml
"""
    # every Sitemap line applies, order kept, duplicate kept
    assert parse_robots_sitemaps(txt) == [
        "https://x/s1.xml", "https://x/s2.xml", "https://x/s1.xml"]
    assert parse_robots_sitemaps(None) == []
    assert parse_robots_sitemaps("Sitemap:\nSitemap: ") == []


def test_robots_sitemap_locs_frame(spark):
    from etl_mark1_spark.operators.web import robots_sitemap_locs

    robots = spark.createDataFrame(
        [("a.example", "Sitemap: https://a.example/s.xml\nUser-agent: *\n"),
         ("b.example", "User-agent: *\nDisallow: /")],
        "domain string, robots_txt string")
    got = {(r["domain"], r["sitemap_loc"])
           for r in robots_sitemap_locs(robots).collect()}
    assert got == {("a.example", "https://a.example/s.xml")}


def test_sitemap_urls_randomized_roundtrip(spark):
    """Differential fuzz: random entries with random optional fields,
    whitespace padding, and tag spacing must parse back exactly."""
    import random

    from etl_mark1_spark.operators.web import sitemap_urls

    rng = random.Random(100)
    domains = []
    want = set()
    for d in range(8):
        dom = f"d{d}.example"
        blocks = []
        for u in range(rng.randrange(0, 6)):
            loc = f"https://{dom}/p{u}"
            lastmod = (f"2026-0{rng.randrange(1, 10)}-01"
                       if rng.random() < 0.5 else None)
            prio = (round(rng.randrange(0, 11) / 10, 1)
                    if rng.random() < 0.5 else None)
            ws = " " * rng.randrange(0, 3) + "\n" * rng.randrange(0, 2)
            b = f"<url{' ' if rng.random() < 0.3 else ''}><loc>{ws}{loc}{ws}</loc>"
            if lastmod:
                b += f"<lastmod>{lastmod}</lastmod>"
            if prio is not None:
                b += f"<priority>{prio}</priority>"
            b += "</url>"
            blocks.append(b)
            want.add((dom, loc, lastmod,
                      float(prio) if prio is not None else None))
        domains.append((dom, "<urlset>" + "\n".join(blocks) + "</urlset>"))
    df = spark.createDataFrame(domains, ["domain", "sitemap_xml"])
    got = {(r["domain"], r["loc"], r["lastmod"], r["priority"])
           for r in sitemap_urls(df).collect()}
    assert got == want


def test_registered_domain_psl_full_semantics(spark):
    """Round-10 VERDICT item: full PSL rule semantics — literal,
    wildcard (*.ck, *.kawasaki.jp), and exception (!www.ck,
    !city.kawasaki.jp) rules, longest match first, default rule
    fallback — against the vendored snapshot."""
    from etl_mark1_spark.operators.web import registered_domain_psl

    cases = [
        ("a.blog.example.co.uk", "example.co.uk"),    # literal2
        ("school.k12.va.us", "school.k12.va.us"),     # literal3, n==3
        ("www.school.k12.va.us", "school.k12.va.us"),  # literal3, n==4
        ("example.com", "example.com"),                # default rule
        ("deep.sub.example.com", "example.com"),       # default rule
        ("single", "single"),                          # no dot
        # wildcard *.ck: every 2nd level is a public suffix
        ("www.shop.biz.ck", "shop.biz.ck"),
        ("biz.ck", "biz.ck"),                          # == the suffix
        # exception !www.ck beats the wildcard
        ("www.ck", "www.ck"),
        ("sub.www.ck", "www.ck"),
        # wildcard *.kawasaki.jp (city 4th-level registries)
        ("x.co.kawasaki.jp", "x.co.kawasaki.jp"),
        ("a.x.co.kawasaki.jp", "x.co.kawasaki.jp"),
        # exception !city.kawasaki.jp
        ("city.kawasaki.jp", "city.kawasaki.jp"),
        ("ward.city.kawasaki.jp", "city.kawasaki.jp"),
        # jp prefecture literal2
        ("site.pref.aichi.jp", "pref.aichi.jp"),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases],
                               "host string")
    got = {r["host"]: r["dom"] for r in df.select(
        "host", registered_domain_psl(F.col("host")).alias("dom"))
        .collect()}
    for host, want in cases:
        assert got[host] == want, (host, got[host], want)


def test_parse_psl_official_format():
    """The parser accepts the canonical public_suffix_list.dat syntax:
    comments, section markers, wildcards, exceptions; private section
    dropped by default; deep rules surfaced in .skipped, not lost."""
    from etl_mark1_spark.operators.psl_data import parse_psl

    sample = """
// ===BEGIN ICANN DOMAINS===
com
// United Kingdom
co.uk
k12.va.us
*.ck
!www.ck
*.kawasaki.jp
!city.kawasaki.jp
a.very.deep.rule
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
// ===END PRIVATE DOMAINS===
"""
    rules = parse_psl(sample)
    assert "co.uk" in rules.literals2
    assert "k12.va.us" in rules.literals3
    assert "ck" in rules.wildcards1
    assert "kawasaki.jp" in rules.wildcards2
    assert "www.ck" in rules.exceptions2
    assert "city.kawasaki.jp" in rules.exceptions3
    assert "github.io" not in rules.literals2      # private dropped
    assert rules.skipped == ("a.very.deep.rule",)
    private = parse_psl(sample, icann_only=False)
    assert "github.io" in private.literals2


def test_registered_domain_psl_matches_legacy_on_literals(spark):
    """With a literals-only rule set the full resolver and the legacy
    fixture-scoped helper agree on every host shape."""
    from etl_mark1_spark.operators.psl_data import PslRules
    from etl_mark1_spark.operators.web import (MULTI_PART_SUFFIXES,
                                               registered_domain,
                                               registered_domain_psl)

    rules = PslRules(literals2=frozenset(MULTI_PART_SUFFIXES))
    hosts = ["a.b.example.co.uk", "example.co.uk", "co.uk", "x.com",
             "a.b.c.d.com.au", "plain", "sub.example.org"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = df.select(
        registered_domain(F.col("host")).alias("legacy"),
        registered_domain_psl(F.col("host"), rules).alias("full"))
    mismatches = out.filter(
        ~F.col("legacy").eqNullSafe(F.col("full"))).collect()
    assert not mismatches, mismatches


def test_registered_domain_psl_literal3_beats_wildcard1(spark):
    """Longest-match precedence: a 3-label literal rule under a wildcard
    TLD must prevail over the 2-label wildcard match (round-12 ADVICE
    regression — the exact reported repro: rules {*.aa, co.k12.aa},
    host alpha.co.k12.aa -> alpha.co.k12.aa, NOT co.k12.aa)."""
    from etl_mark1_spark.operators.psl_data import PslRules
    from etl_mark1_spark.operators.web import registered_domain_psl

    rules = PslRules(frozenset(), frozenset({"co.k12.aa"}),
                     frozenset({"aa"}), frozenset(),
                     frozenset(), frozenset())
    df = spark.createDataFrame(
        [("alpha.co.k12.aa",),   # lit3 match (suffix 3) beats wc1 (2)
         ("co.k12.aa",),         # the suffix itself: rule name == host
         ("beta.gamma.aa",),     # only wc1 matches -> gamma.aa is public
         ("beta.aa",)],          # wc1, n == 2: host itself
        "host string")
    got = {r["host"]: r["dom"] for r in df.select(
        "host", registered_domain_psl(F.col("host"), rules).alias("dom")
    ).collect()}
    assert got["alpha.co.k12.aa"] == "alpha.co.k12.aa"
    assert got["co.k12.aa"] == "co.k12.aa"
    assert got["beta.gamma.aa"] == "beta.gamma.aa"
    assert got["beta.aa"] == "beta.aa"


def test_registered_domain_psl_fuzz_vs_python_reference(spark):
    """Differential fuzz: random rule sets (literals, wildcards,
    exceptions) and random hosts vs an independent pure-Python
    implementation of the PSL algorithm (longest match, exceptions
    beat wildcards, default rule)."""
    import random

    from etl_mark1_spark.operators.psl_data import PslRules
    from etl_mark1_spark.operators.web import registered_domain_psl

    def py_registrable(host, rules):
        labels = host.split(".")
        n = len(labels)
        def last(k):
            return ".".join(labels[-k:])
        # matching suffix length per rule class (None = no match)
        best = 1                                  # default rule: the TLD
        if n >= 3 and last(3) in rules.exceptions3:
            best = 2                              # exception: suffix is
                                                  # one label SHORTER
        elif n >= 2 and last(2) in rules.exceptions2:
            best = 1
        else:
            cands = []
            # wildcard *.X.Y: suffix = <any>.X.Y (3 labels)
            if n >= 3 and last(2) in rules.wildcards2:
                cands.append(3)
            # wildcard *.X: suffix = <any>.X (2 labels)
            if n >= 2 and labels[-1] in rules.wildcards1:
                cands.append(2)
            if n >= 3 and last(3) in rules.literals3:
                cands.append(3)
            if n >= 2 and last(2) in rules.literals2:
                cands.append(2)
            best = max(cands, default=1)
        want = best + 1
        if n < want:
            return host
        return last(want)

    rng = random.Random(77)
    tlds = ["aa", "bb", "cc"]
    mids = ["co", "k12", "x"]
    names = ["alpha", "beta", "gamma", "www", "city"]
    for trial in range(25):
        lit2 = {f"{rng.choice(mids)}.{rng.choice(tlds)}"
                for _ in range(rng.randint(0, 3))}
        lit3 = {f"{rng.choice(mids)}.{rng.choice(mids)}.{rng.choice(tlds)}"
                for _ in range(rng.randint(0, 2))}
        wc1 = {rng.choice(tlds) for _ in range(rng.randint(0, 2))}
        wc2 = {f"{rng.choice(mids)}.{rng.choice(tlds)}"
               for _ in range(rng.randint(0, 2))}
        # DELIBERATE wc1∩lit3 overlap: a 3-label literal nested under a
        # wildcard TLD — the longest-match case the original seed never
        # generated (round-12 ADVICE hardening; the un-fixed cascade
        # resolved these through the wildcard and lost a label).
        lit3 |= {f"{rng.choice(mids)}.{rng.choice(mids)}.{t}"
                 for t in wc1 if rng.random() < 0.7}
        # and the symmetric wc2∩lit3 overlap (same suffix length — must
        # not change the answer, pinned anyway)
        lit3 |= {f"{rng.choice(mids)}.{b}" for b in wc2
                 if rng.random() < 0.5}
        exc2 = {f"{rng.choice(names)}.{t}" for t in wc1
                if rng.random() < 0.5}
        exc3 = {f"{rng.choice(names)}.{b}" for b in wc2
                if rng.random() < 0.5}
        rules = PslRules(frozenset(lit2), frozenset(lit3), frozenset(wc1),
                         frozenset(wc2), frozenset(exc2), frozenset(exc3))
        hosts = [".".join(rng.choice(names + mids)
                          for _ in range(rng.randint(0, 3)))
                 + ("." if rng.randint(0, 3) else "")
                 + rng.choice(tlds) for _ in range(30)]
        hosts = [h.lstrip(".") for h in hosts]
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        got = [(r["host"], r["dom"]) for r in df.select(
            "host", registered_domain_psl(F.col("host"), rules)
            .alias("dom")).collect()]
        for host, dom in got:
            assert dom == py_registrable(host, rules), \
                (trial, host, dom, rules)


def test_parse_psl_canonical_scale_bounded_plan(spark):
    """Full-PSL integration path (round-12 VERDICT ask): a synthetic
    rule file at canonical scale (~9k rules incl. plain TLDs, nested
    wildcards, exceptions, comments, a PRIVATE section) goes through
    parse_psl verbatim and drives registered_domain_psl correctly — and
    the PLAN SHAPE stays bounded: rule count only grows the isin literal
    sets (InSet hash lookups past the conversion threshold), never the
    number of plan nodes, so the 9k-rule production file cannot cross
    the codegen cliff the way a per-rule expression tree would."""
    import random

    from etl_mark1_spark.operators.psl_data import parse_psl
    from etl_mark1_spark.operators.web import registered_domain_psl

    rng = random.Random(99)
    tlds = [f"t{i}" for i in range(400)]
    mids = [f"m{i}" for i in range(60)]
    names = [f"n{i}" for i in range(40)]
    lines = ["// synthetic canonical-scale PSL", ""]
    lines += [f"// comment {i}" for i in range(20)]
    lit1 = tlds                                           # plain TLDs
    lit2 = sorted({f"{rng.choice(mids)}.{rng.choice(tlds)}"
                   for _ in range(4000)})
    lit3 = sorted({f"{rng.choice(mids)}.{rng.choice(mids)}."
                   f"{rng.choice(tlds)}" for _ in range(3000)})
    wc1 = sorted(rng.sample(tlds, 30))
    wc2 = sorted(rng.sample(lit2, 800))
    exc2 = sorted({f"{rng.choice(names)}.{b}" for b in wc1[:15]})
    exc3 = sorted({f"{rng.choice(names)}.{b}" for b in rng.sample(wc2, 150)})
    # force the reported wc1∩lit3 overlap class at scale too
    lit3 = sorted(set(lit3) | {f"{rng.choice(mids)}.{rng.choice(mids)}.{t}"
                               for t in wc1})
    lines += lit1 + lit2 + lit3
    lines += [f"*.{b}" for b in wc1 + wc2]
    lines += [f"!{e}" for e in exc2 + exc3]
    rng.shuffle(lines)       # rule order is arbitrary in the real file
    lines += ["// ===BEGIN PRIVATE DOMAINS===",
              "private.example", "*.private2.example",
              "// ===END PRIVATE DOMAINS==="]
    rules = parse_psl("\n".join(lines))
    assert len(rules.literals2) == len(lit2)
    assert len(rules.literals3) == len(lit3)
    assert (len(rules.wildcards1), len(rules.wildcards2)) == (30, 800)
    assert len(rules.exceptions2) == len(exc2)
    assert len(rules.exceptions3) == len(exc3)
    assert rules.skipped == ()
    assert "private.example" not in rules.literals2

    def py_registrable(host):
        labels = host.split(".")
        n = len(labels)

        def last(k):
            return ".".join(labels[-k:])

        if n >= 3 and last(3) in rules.exceptions3:
            best = 2
        elif n >= 2 and last(2) in rules.exceptions2:
            best = 1
        else:
            cands = [1]
            if n >= 3 and last(2) in rules.wildcards2:
                cands.append(3)
            if n >= 2 and labels[-1] in rules.wildcards1:
                cands.append(2)
            if n >= 3 and last(3) in rules.literals3:
                cands.append(3)
            if n >= 2 and last(2) in rules.literals2:
                cands.append(2)
            best = max(cands)
        want = best + 1
        return host if n < want else last(want)

    hosts = []
    for _ in range(120):
        depth = rng.randint(1, 3)
        hosts.append(".".join(rng.choice(names + mids)
                              for _ in range(depth))
                     + "." + rng.choice(mids) + "." + rng.choice(tlds))
    hosts += [f"{rng.choice(names)}.{b}" for b in rng.sample(wc2, 20)]
    hosts += list(exc3)[:20] + [f"x.{e}" for e in list(exc3)[:10]]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = df.select("host",
                    registered_domain_psl(F.col("host"), rules)
                    .alias("dom"))
    for r in out.collect():
        assert r["dom"] == py_registrable(r["host"]), r["host"]

    # plan-shape bound: node count must not scale with the 9k rules —
    # the same cascade compiled from the ~450-rule vendored snapshot
    # must have the IDENTICAL number of plan lines.
    big_plan = out._jdf.queryExecution().executedPlan() \
        .numberedTreeString().splitlines()
    small = df.select("host", registered_domain_psl(F.col("host"))
                      .alias("dom"))
    small_plan = small._jdf.queryExecution().executedPlan() \
        .numberedTreeString().splitlines()
    assert len(big_plan) == len(small_plan) <= 10, \
        (len(big_plan), len(small_plan))
