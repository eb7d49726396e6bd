"""robots.txt operators (operators/web.py): RFC 9309 group parsing and
longest-match-allow-wins verdicts on hand-built fixtures."""

from intelligent_ocr_spark.operators.web import robots_allowed, robots_star_rules

ROBOTS = (
    "# corpus-wide audit fixture\n"
    "User-agent: evilbot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: googlebot\n"
    "User-agent: *\n"           # a UA RUN: both agents share the group
    "Disallow: /private/\n"
    "Allow: /private/ok/\n"
    "Disallow: /tmp  # trailing comment\n"
    "Disallow:\n"                # empty = allow-all, must be dropped
    "Disallow: /wild/*/card\n"   # wildcard rule: out of scope, skipped
    "Crawl-delay: 3\n"
)


def test_star_rules_parsing(spark):
    robots = spark.createDataFrame(
        [("h.example.org", ROBOTS)], "host string, robots_txt string"
    )
    rules = {
        (r["is_allow"], r["path"])
        for r in robots_star_rules(robots).collect()
    }
    # evilbot's Disallow: / must NOT appear; comment stripped from /tmp;
    # empty and wildcard rules dropped
    assert rules == {
        (False, "/private/"),
        (True, "/private/ok/"),
        (False, "/tmp"),
    }


def test_robots_allowed_verdicts(spark):
    robots = spark.createDataFrame(
        [("h.example.org", ROBOTS)], "host string, robots_txt string"
    )
    pages = spark.createDataFrame(
        [
            ("https://h.example.org/private/x",),      # disallowed
            ("https://h.example.org/private/ok/y",),   # longer Allow wins
            ("https://h.example.org/tmpfile",),        # /tmp prefix: disallowed
            ("https://h.example.org/public/z",),       # no rule: allowed
            ("https://h.example.org/",),               # root, no rule: allowed
            ("https://other.example.org/private/x",),  # no robots: allowed
        ],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in robots_allowed(pages, robots).collect()}
    assert got == {
        "https://h.example.org/private/x": False,
        "https://h.example.org/private/ok/y": True,
        "https://h.example.org/tmpfile": False,
        "https://h.example.org/public/z": True,
        "https://h.example.org/": True,
        "https://other.example.org/private/x": True,
    }


def test_robots_tie_prefers_allow(spark):
    robots = spark.createDataFrame(
        [("t.example.org", "User-agent: *\nDisallow: /a/\nAllow: /a/b\nDisallow: /a/b")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame([("https://t.example.org/a/bc",)], "url string")
    (row,) = robots_allowed(pages, robots).collect()
    # /a/b appears as BOTH Allow and Disallow at equal length: RFC 9309
    # §2.2.2 resolves the tie to Allow
    assert row["allowed"] is True


# ---------------------------------------------------------------- links

LINK_PAGES = [
    (
        "http://a.example/d/1",
        '<html><a href="http://b.example/x">b</a>'
        '<a class="z" href="https://c.example:8080/y?q=1#f">c</a>'
        "<a href='http://squote.example/skip'>sq</a>"
        '<a href="/rel/skip">r</a><a href="mailto:x@y.example">m</a></html>',
    ),
    (
        "http://b.example/d/2",
        '<a href="http://a.example/z">a</a>'
        '<a href="http://b.example/self">self</a>',
    ),
    ("http://c.example/d/3", "no links at all"),
]


def test_extract_links_scope(spark):
    """Absolute double-quoted http(s) hrefs only; hosts cut at /:?#;
    relative / mailto / single-quoted anchors skipped; linkless pages
    emit nothing."""
    from intelligent_ocr_spark.operators.web import extract_links

    pages = spark.createDataFrame(LINK_PAGES, "url string, html string")
    got = sorted(tuple(r) for r in extract_links(pages).collect())
    assert got == [
        ("http://a.example/d/1", "a.example", "http://b.example/x", "b.example"),
        (
            "http://a.example/d/1",
            "a.example",
            "https://c.example:8080/y?q=1#f",
            "c.example",
        ),
        ("http://b.example/d/2", "b.example", "http://a.example/z", "a.example"),
        ("http://b.example/d/2", "b.example", "http://b.example/self", "b.example"),
    ]


def test_extract_links_zero_exchange_plan(spark):
    """The extraction itself is a projection + Generate: no shuffle."""
    from intelligent_ocr_spark.operators.web import extract_links

    pages = spark.createDataFrame(LINK_PAGES, "url string, html string")
    plan = extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_host_edges_dedup_and_self_loop(spark):
    """host_edges: distinct cross-host pairs; b→b self-link dropped."""
    from intelligent_ocr_spark.operators.web import extract_links, host_edges

    pages = spark.createDataFrame(
        LINK_PAGES + LINK_PAGES, "url string, html string"  # dup input rows
    )
    got = sorted(
        tuple(r) for r in host_edges(extract_links(pages)).collect()
    )
    assert got == [
        ("a.example", "b.example"),
        ("a.example", "c.example"),
        ("b.example", "a.example"),
    ]


def test_extract_anchor_texts(spark):
    """Plain-run anchor text captured alongside href; nested-tag and
    relative anchors skipped; zero-exchange plan."""
    from intelligent_ocr_spark.operators.web import extract_anchor_texts

    rows = [
        (
            "http://a.example/1",
            '<a href="http://b.example/x">spark engine docs</a>'
            '<a class="z" href="http://b.example/y">spark tutorial</a>'
            '<a href="http://c.example/z"><b>nested skipped</b></a>'
            '<a href="/rel">relative skipped</a>',
        ),
        ("http://d.example/2", '<a href="http://b.example/w">engine internals</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = sorted(tuple(r) for r in extract_anchor_texts(df).collect())
    assert got == [
        ("http://a.example/1", "http://b.example/x", "spark engine docs", "b.example"),
        ("http://a.example/1", "http://b.example/y", "spark tutorial", "b.example"),
        ("http://d.example/2", "http://b.example/w", "engine internals", "b.example"),
    ]
    plan = extract_anchor_texts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_host_anchor_profile_topk(spark):
    """Counts exact, rank by (count desc, term asc), capped at k."""
    from intelligent_ocr_spark.operators.web import (
        extract_anchor_texts,
        host_anchor_profile,
    )

    rows = [
        (
            "http://a.example/1",
            '<a href="http://b.example/x">spark engine docs</a>'
            '<a href="http://b.example/y">spark tutorial</a>',
        ),
        ("http://d.example/2", '<a href="http://b.example/w">engine internals</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = [
        tuple(r)
        for r in host_anchor_profile(extract_anchor_texts(df), k=3)
        .orderBy("dst_host", "rank")
        .collect()
    ]
    assert got == [
        ("b.example", "engine", 2, 1),
        ("b.example", "spark", 2, 2),
        ("b.example", "docs", 1, 3),
    ]


def test_parse_sitemaps(spark):
    """urlset and sitemapindex entries, loc trimming, optional lastmod,
    zero-exchange plan."""
    from intelligent_ocr_spark.operators.web import parse_sitemaps

    rows = [
        (
            "a.example",
            '<?xml version="1.0"?><urlset><url><loc> http://a.example/p1 </loc>'
            "<lastmod>2024-01-02</lastmod></url>"
            "<url><loc>http://a.example/p2</loc></url></urlset>",
        ),
        (
            "b.example",
            "<sitemapindex><sitemap><loc>http://b.example/s1.xml</loc>"
            "<lastmod>2024-02-03</lastmod></sitemap>"
            "<sitemap><loc>http://b.example/s2.xml</loc></sitemap></sitemapindex>",
        ),
    ]
    df = spark.createDataFrame(rows, "host string, sitemap_xml string")
    out = parse_sitemaps(df)
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        ("a.example", "url", "http://a.example/p1", "2024-01-02"),
        ("a.example", "url", "http://a.example/p2", None),
        ("b.example", "sitemap", "http://b.example/s1.xml", "2024-02-03"),
        ("b.example", "sitemap", "http://b.example/s2.xml", None),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_extract_links_root_relative_resolution(spark):
    """resolve_root_relative: '/path' joins scheme+host; '//host' and
    'a/b' path-relative stay out of scope; absolute links unchanged."""
    from intelligent_ocr_spark.operators.web import extract_links

    rows = [
        (
            "https://a.example:8443/d/1",
            '<a href="/rel/p?x=1">r</a><a href="http://b.example/x">b</a>'
            '<a href="//proto.example/skip">p</a><a href="path/rel">pr</a>'
            '<a href="/">root</a>',
        ),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = sorted(r.href for r in extract_links(df, resolve_root_relative=True).collect())
    assert got == [
        "http://b.example/x",
        "https://a.example:8443/",
        "https://a.example:8443/rel/p?x=1",
    ]
    # off by default: only the absolute link survives
    assert [r.href for r in extract_links(df).collect()] == ["http://b.example/x"]


def test_extract_links_base_resolved(spark):
    """Full relative resolution honoring <base href>: path/proto/root/
    query-relative hrefs resolve, fragments and foreign schemes drop,
    an absolute <base> rebases BOTH path- and root-relative links, a
    relative <base> is ignored; zero-exchange plan."""
    from intelligent_ocr_spark.operators.web import extract_links_base_resolved

    rows = [
        (
            "http://s.ex/dir/page.html",
            '<html><a href="img/x.html">i</a><a href="../up.html">u</a>'
            '<a href="//p.ex/q">p</a><a href="/root">r</a>'
            '<a href="#f">f</a><a href="mailto:a@b">m</a>'
            '<a href="http://abs.ex/z">a</a></html>',
        ),
        (
            "http://s.ex/dir/base.html",
            '<html><base href="http://cdn.ex/assets/deep/">'
            '<a href="img/y.png">c</a><a href="/rooty">r</a></html>',
        ),
        (
            "http://s.ex/dir/relbase.html",
            '<html><base href="/ignored/">'
            '<a href="still/rel.html">s</a></html>',
        ),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = extract_links_base_resolved(df)
    got = {(r.src_url, r.href): (r.resolved, r.dst_host) for r in out.collect()}
    assert got == {
        ("http://s.ex/dir/page.html", "img/x.html"):
            ("http://s.ex/dir/img/x.html", "s.ex"),
        ("http://s.ex/dir/page.html", "../up.html"):
            ("http://s.ex/up.html", "s.ex"),
        ("http://s.ex/dir/page.html", "//p.ex/q"): ("http://p.ex/q", "p.ex"),
        ("http://s.ex/dir/page.html", "/root"): ("http://s.ex/root", "s.ex"),
        ("http://s.ex/dir/page.html", "http://abs.ex/z"):
            ("http://abs.ex/z", "abs.ex"),
        ("http://s.ex/dir/base.html", "img/y.png"):
            ("http://cdn.ex/assets/deep/img/y.png", "cdn.ex"),
        ("http://s.ex/dir/base.html", "/rooty"):
            ("http://cdn.ex/rooty", "cdn.ex"),
        ("http://s.ex/dir/relbase.html", "still/rel.html"):
            ("http://s.ex/dir/still/rel.html", "s.ex"),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_anchor_retrieval_pairs(spark):
    """Cross-host anchors only; a pair needs >=2 distinct source hosts;
    n_mentions counts occurrences, n_src_hosts distinct supporters."""
    from intelligent_ocr_spark.operators.web import anchor_retrieval_pairs

    rows = [
        # two distinct hosts say "spark docs" about t.ex -> qualifies
        ("http://a.ex/1", "http://t.ex/d", "spark docs", "t.ex"),
        ("http://b.ex/2", "http://t.ex/d", "spark docs", "t.ex"),
        # one host repeating an anchor is ONE vote -> filtered
        ("http://a.ex/3", "http://t.ex/d", "engine", "t.ex"),
        ("http://a.ex/4", "http://t.ex/d", "engine", "t.ex"),
        # same-host anchor ignored entirely
        ("http://t.ex/5", "http://t.ex/d", "spark docs", "t.ex"),
    ]
    df = spark.createDataFrame(
        rows, "src_url string, href string, anchor string, dst_host string"
    )
    got = {
        (r.term, r.dst_host): (r.n_mentions, r.n_src_hosts)
        for r in anchor_retrieval_pairs(df).collect()
    }
    assert got == {
        ("spark", "t.ex"): (2, 2),
        ("docs", "t.ex"): (2, 2),
    }


def test_robots_crawl_delay(spark):
    """Crawl-delay from * groups only; max of multiple declarations;
    non-numeric ignored; hosts without a valid directive emit no row."""
    from intelligent_ocr_spark.operators.web import robots_crawl_delay

    rows = [
        ("a.ex", "User-agent: *\nCrawl-delay: 2\nDisallow: /x"),
        # two * groups -> max; evilbot's delay ignored
        ("b.ex", "User-agent: evilbot\nCrawl-delay: 99\n\n"
                 "User-agent: *\nCrawl-delay: 3\n\n"
                 "User-agent: *\nCrawl-delay: 7"),
        ("c.ex", "User-agent: *\nCrawl-delay: fast"),   # junk -> no row
        ("d.ex", "User-agent: *\nDisallow: /"),          # none -> no row
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {r.host: r.crawl_delay_s for r in robots_crawl_delay(df).collect()}
    assert got == {"a.ex": 2, "b.ex": 7}


def test_url_path_templates(spark):
    """Digit runs -> {N}, long-hex runs -> {H}; per-(host, template)
    counts with the MIN url as the deterministic example; singleton
    templates dropped at min_urls=2."""
    from intelligent_ocr_spark.operators.web import url_path_templates

    rows = [
        ("https://a.ex/article/101",),
        ("https://a.ex/article/7",),
        ("https://a.ex/cache/deadbeefcafe1234/img",),
        ("https://a.ex/cache/0123456789abcdef/img",),
        ("https://a.ex/about",),                       # singleton -> dropped
        ("https://b.ex/article/101",),                 # other host
        ("https://b.ex/article/2024/12/31",),
        ("https://b.ex/article/1999/01/02",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {
        (r.host, r.template): (r.n_urls, r.example_url)
        for r in url_path_templates(df).collect()
    }
    assert got == {
        ("a.ex", "/article/{N}"): (2, "https://a.ex/article/101"),
        ("a.ex", "/cache/{H}/img"): (2, "https://a.ex/cache/0123456789abcdef/img"),
        ("b.ex", "/article/{N}/{N}/{N}"): (2, "https://b.ex/article/1999/01/02"),
    }


def _resolve(spark, edges, rounds=5):
    from intelligent_ocr_spark.operators.web import resolve_redirect_chains

    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.url: (r.final_url, r.n_hops, r.resolved)
        for r in resolve_redirect_chains(df, rounds=rounds).collect()
    }


def test_redirect_chains_known_answers(spark):
    """Chains resolve with exact hop counts; loops and chains feeding a
    loop stay unresolved; duplicate observations collapse to min(dst);
    self-redirects drop."""
    edges = [
        ("a", "b"), ("b", "c"),            # a -2-> c, b -1-> c
        ("d", "d"),                         # self-redirect: dropped
        ("x", "y"), ("y", "x"),             # 2-loop
        ("w", "x"),                         # feeds the loop: unresolved
        ("m", "n"), ("m", "zzz"),           # disagreeing re-crawls -> min
    ]
    got = _resolve(spark, edges)
    assert got == {
        "a": ("c", 2, True),
        "b": ("c", 1, True),
        "m": ("n", 1, True),
        "w": (None, None, False),
        "x": (None, None, False),
        "y": (None, None, False),
    }


def test_redirect_chains_doubling_depth(spark):
    """A 9-hop chain resolves at rounds=4 (2^4 = 16 >= 9) but not at
    rounds=3 (2^3 = 8 < 9) — the documented depth contract."""
    chain = [(f"u{i}", f"u{i+1}") for i in range(9)]  # u0 -9-> u9
    deep = _resolve(spark, chain, rounds=4)
    assert deep["u0"] == ("u9", 9, True)
    assert deep["u8"] == ("u9", 1, True)
    shallow = _resolve(spark, chain, rounds=3)
    assert shallow["u0"] == (None, None, False)   # too deep: loop-equivalent
    assert shallow["u1"] == ("u9", 8, True)       # exactly at the cap


def test_redirect_chains_differential_replay(spark):
    """Pseudo-random functional map vs a pure-Python walk."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(30)]
    m = {}
    for s, d in edges:
        if s != d:
            m[s] = min(m.get(s, d), d)
    want = {}
    for s in m:
        cur, hops = m[s], 1
        while cur in m and hops <= 32:
            cur, hops = m[cur], hops + 1
        want[s] = (cur, hops, True) if cur not in m else (None, None, False)
    assert _resolve(spark, edges, rounds=5) == want


def test_extract_canonical_forms_and_plan(spark):
    from pyspark.sql import functions as F

    from intelligent_ocr_spark.operators.web import (
        canonical_alias_groups,
        extract_canonical,
    )

    rows = [
        # rel-then-href, absolute
        ("http://a.example/p/1",
         '<html><link rel="canonical" href="http://a.example/c/x"></html>'),
        # href-then-rel, root-relative -> resolves against page authority
        ("http://a.example/p/2",
         '<html><link href="/c/x" rel="canonical"><p>t</p></html>'),
        # path-relative -> full resolve_href chain (directory merge)
        ("http://a.example/p/3",
         '<html><link rel="canonical" href="../c/x"></html>'),
        # self-canonical
        ("http://a.example/c/x",
         '<html><link rel="canonical" href="http://a.example/c/x"></html>'),
        # first declaration wins
        ("http://a.example/p/4",
         '<link rel="canonical" href="http://a.example/c/first">'
         '<link rel="canonical" href="http://a.example/c/second">'),
        # none
        ("http://a.example/p/5", "<html><p>t</p></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r["url"]: (r["canonical"], r["is_self"])
           for r in extract_canonical(df).collect()}
    assert out["http://a.example/p/1"] == ("http://a.example/c/x", False)
    assert out["http://a.example/p/2"] == ("http://a.example/c/x", False)
    assert out["http://a.example/p/3"] == ("http://a.example/c/x", False)
    assert out["http://a.example/c/x"] == ("http://a.example/c/x", True)
    assert out["http://a.example/p/4"] == ("http://a.example/c/first", False)
    assert out["http://a.example/p/5"] == (None, None)

    plan = extract_canonical(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection

    fams = {r["canonical"]: (r["n_claimers"], r["n_aliases"], r["sample_alias"])
            for r in canonical_alias_groups(df).collect()}
    # /c/x family: three aliases + the self-canonical page itself
    assert fams == {"http://a.example/c/x":
                    (4, 3, "http://a.example/p/1")}
