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
